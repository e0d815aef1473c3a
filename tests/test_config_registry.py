import os

from adaptpoint_tpu.utils import EasyConfig, Registry


def test_easyconfig_recursive_merge(tmp_path):
    root = tmp_path / "cfgs"
    sub = root / "scanobjectnn"
    sub.mkdir(parents=True)
    (root / "default.yaml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    (sub / "default.yaml").write_text("b: 2\nnested:\n  y: 3\n")
    (sub / "leaf.yaml").write_text("c: 3\nnested:\n  z: 4\n")

    cfg = EasyConfig()
    cfg.load(str(sub / "leaf.yaml"), recursive=True)
    assert cfg.a == 1 and cfg.b == 2 and cfg.c == 3
    assert cfg.nested.x == 1 and cfg.nested.y == 3 and cfg.nested.z == 4


def test_easyconfig_cli_overrides():
    cfg = EasyConfig()
    cfg.update({"model": {"encoder_args": {"width": 32}}, "lr": 0.002})
    cfg.update_opts(["lr=0.01", "model.encoder_args.width=64", "mode=test",
                     "blocks=[1,2,3]"])
    assert cfg.lr == 0.01
    assert cfg.model.encoder_args.width == 64
    assert cfg.mode == "test"
    assert cfg.blocks == [1, 2, 3]


def test_easyconfig_dump_load_roundtrip(tmp_path):
    cfg = EasyConfig()
    cfg.update({"a": 1, "n": {"b": [1, 2]}})
    p = tmp_path / "out.yaml"
    cfg.dump(str(p))
    cfg2 = EasyConfig()
    cfg2.load(str(p))
    assert cfg2.a == 1 and cfg2.n.b == [1, 2]


def test_registry_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, x=1, **kwargs):
            self.x = x

    @REG.register_module(name="BarAlias")
    class Bar:
        def __init__(self, y):
            self.y = y

    foo = REG.build({"NAME": "Foo", "x": 5})
    assert isinstance(foo, Foo) and foo.x == 5
    bar = REG.build({"NAME": "BarAlias", "y": 2, "junk": 1})  # junk dropped
    assert bar.y == 2
    assert "Foo" in REG
