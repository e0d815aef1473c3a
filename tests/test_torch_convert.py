"""Reference-checkpoint conversion: layer-type conventions vs real torch
(cpu) modules, and a structural round-trip over the authoritative
PointNeXt-S classification state_dict layout.

The layout fixture (tests/fixtures/ref_pointnext_s_cls_state_dict.json,
key/shape pairs) was dumped from the reference model built with
cfgs/scanobjectnn/pointnext-s.yaml (openpoints/models/backbone/
pointnext.py + classification/cls.py) — data about the architecture, no
reference code. Semantic correctness of the kernel/BN transposes is pinned
against torch itself below; end-to-end logit parity additionally needs a
real trained .pth (not downloadable in this env) and is a standing order
in STATUS.md.
"""
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from adaptpoint_tpu.utils.torch_convert import (  # noqa: E402
    convert_reference_state_dict, _dense_kernel)

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "fixtures", "ref_pointnext_s_cls_state_dict.json")


def _torch():
    return pytest.importorskip("torch")


def test_convblock_convention_matches_torch_conv_bn_relu():
    """Conv2d(1x1, bias=False) + BatchNorm2d + ReLU (eval) == our ConvBlock
    with the converted kernel/BN — the exact SA-block composition."""
    torch = _torch()
    from adaptpoint_tpu.models.layers.blocks import ConvBlock

    cin, cout, b, m, k = 35, 32, 2, 6, 4
    g = torch.Generator().manual_seed(0)
    conv = torch.nn.Conv2d(cin, cout, (1, 1), bias=False)
    bn = torch.nn.BatchNorm2d(cout)
    with torch.no_grad():
        conv.weight.copy_(torch.randn(conv.weight.shape, generator=g))
        bn.weight.copy_(torch.rand(cout, generator=g) + 0.5)
        bn.bias.copy_(torch.randn(cout, generator=g))
        bn.running_mean.copy_(torch.randn(cout, generator=g))
        bn.running_var.copy_(torch.rand(cout, generator=g) + 0.5)
    conv.eval(), bn.eval()
    x = torch.randn(b, cin, m, k, generator=g)
    with torch.no_grad():
        ref = torch.relu(bn(conv(x))).permute(0, 2, 3, 1).numpy()

    block = ConvBlock(cout, norm_args={"norm": "bn"}, act_args={"act": "relu"})
    params = {"Dense_0": {"kernel": jnp.asarray(
                  _dense_kernel(conv.weight.detach().numpy()))},
              "NormAct_0": {"BatchNorm_0": {
                  "scale": jnp.asarray(bn.weight.detach().numpy()),
                  "bias": jnp.asarray(bn.bias.detach().numpy())}}}
    stats = {"NormAct_0": {"BatchNorm_0": {
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy())}}}
    ours = block.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                       training=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-5)


def test_linearblock_convention_matches_torch_linear_bn():
    """Linear(bias=False) + BatchNorm1d (eval) == our LinearBlock with the
    transposed kernel, ZERO-filled Dense bias, and converted BN."""
    torch = _torch()
    from adaptpoint_tpu.models.layers.blocks import LinearBlock

    cin, cout, b = 16, 8, 5
    g = torch.Generator().manual_seed(1)
    lin = torch.nn.Linear(cin, cout, bias=False)
    bn = torch.nn.BatchNorm1d(cout)
    with torch.no_grad():
        lin.weight.copy_(torch.randn(lin.weight.shape, generator=g))
        bn.weight.copy_(torch.rand(cout, generator=g) + 0.5)
        bn.bias.copy_(torch.randn(cout, generator=g))
        bn.running_mean.copy_(torch.randn(cout, generator=g))
        bn.running_var.copy_(torch.rand(cout, generator=g) + 0.5)
    lin.eval(), bn.eval()
    x = torch.randn(b, cin, generator=g)
    with torch.no_grad():
        ref = bn(lin(x)).numpy()

    block = LinearBlock(cout, norm_args={"norm": "bn"})
    params = {"Dense_0": {"kernel": jnp.asarray(
                  _dense_kernel(lin.weight.detach().numpy())),
                  "bias": jnp.zeros((cout,), jnp.float32)},
              "NormAct_0": {"BatchNorm_0": {
                  "scale": jnp.asarray(bn.weight.detach().numpy()),
                  "bias": jnp.asarray(bn.bias.detach().numpy())}}}
    stats = {"NormAct_0": {"BatchNorm_0": {
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy())}}}
    ours = block.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x.numpy()), training=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-5)


def _synth_state_dict(seed=0):
    rows = json.load(open(FIXTURE))
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in rows:
        if not shape:
            out[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):  # variances must be positive
            out[k] = (rng.random(shape) + 0.5).astype(np.float32)
        else:
            out[k] = rng.standard_normal(shape).astype(np.float32)
    return out


def _build_flagship():
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg

    repo = os.path.dirname(HERE)
    cfg = EasyConfig()
    cfg.load(os.path.join(repo, "cfgs/scanobjectnn/pointnext-s.yaml"),
             recursive=True)
    cfg.model.in_channels = cfg.model.encoder_args.in_channels
    model = build_model_from_cfg(cfg.model)
    pos = jnp.zeros((2, 64, 3))
    x = jnp.zeros((2, 64, 4))
    return model, model.init(jax.random.PRNGKey(0), pos, x, training=False), \
        pos, x


def test_full_structural_roundtrip():
    sd = _synth_state_dict()
    model, variables, pos, x = _build_flagship()
    new_vars, report = convert_reference_state_dict(sd, variables)
    # 84 reference keys = 72 tensors + 12 num_batches_tracked
    assert len(report.mapped) == 72
    assert len(report.dropped) == 12
    assert not report.unhandled and not report.missing
    assert sorted(report.zero_filled) == [
        "prediction/LinearBlock_0/Dense_0/bias",
        "prediction/LinearBlock_1/Dense_0/bias"]
    # spot-check value routing: BN running_var -> batch_stats var; conv
    # kernel -> transposed squeezed Dense kernel
    np.testing.assert_array_equal(
        np.asarray(new_vars["batch_stats"]["encoder"]["enc2_sa"]
                   ["ConvBlock_0"]["NormAct_0"]["BatchNorm_0"]["var"]),
        sd["encoder.encoder.2.0.convs.0.1.running_var"])
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["enc3_sa"]["ConvBlock_1"]
                   ["Dense_0"]["kernel"]),
        sd["encoder.encoder.3.0.convs.1.0.weight"][:, :, 0, 0].T)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["prediction"]["Dense_0"]["kernel"]),
        sd["prediction.head.4.0.weight"].T)
    # converted variables drive the real model
    logits = model.apply(new_vars, pos, x, training=False)
    assert logits.shape == (2, 15)
    assert np.isfinite(np.asarray(logits)).all()


def test_strict_rejects_unhandled_and_mismatch():
    sd = _synth_state_dict()
    model, variables, *_ = _build_flagship()
    bad = dict(sd)
    bad["encoder.encoder.1.1.convs.0.0.weight"] = \
        np.zeros((8, 8, 1, 1), np.float32)  # InvResMLP block: out of scope
    with pytest.raises(ValueError, match="unhandled"):
        convert_reference_state_dict(bad, variables)
    bad2 = dict(sd)
    bad2["prediction.head.4.0.weight"] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError):
        convert_reference_state_dict(bad2, variables)


def test_cli_roundtrip(tmp_path):
    torch = _torch()
    sd = _synth_state_dict(seed=3)
    src = tmp_path / "ref_ckpt.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}, "epoch": 17}, str(src))

    import importlib.util
    repo = os.path.dirname(HERE)
    spec = importlib.util.spec_from_file_location(
        "convert_torch_ckpt",
        os.path.join(repo, "scripts", "convert_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "converted.msgpack"
    mod.main(["--src", str(src), "--out", str(out),
              "--cfg", os.path.join(repo, "cfgs/scanobjectnn/pointnext-s.yaml")])

    from adaptpoint_tpu.utils.ckpt import load_pytree
    payload = load_pytree(str(out))
    assert payload["epoch"] == 17
    np.testing.assert_array_equal(
        np.asarray(payload["params"]["prediction"]["Dense_0"]["bias"]),
        sd["prediction.head.4.0.bias"])
