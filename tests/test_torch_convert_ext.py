"""Extended reference-checkpoint conversion coverage.

Each layout fixture (tests/fixtures/ref_layout_*.json, [key, shape] pairs)
was dumped from the ACTUAL reference torch model on CPU by
scripts/dump_ref_layouts.py — architecture data, no reference code:

- pointnext_b_cls      InvResMLP depth stages (PointNeXt-B protocol)
- pointnext_xl_s3dis   BaseSeg: PointNextDecoder + SegHead (S3DIS XL)
- pointnext_s_partseg  BasePartSeg: PointNextPartDecoder (curvenet cls_map)
- pointnet2_cls        PointNet2Encoder classification
- dgcnn_cls            DGCNN classification
- adaptpoint_gan       the {generator, discriminator} pair the reference
                       trainer saves every epoch (train_autoaug.py:71-78)

Structural roundtrips synthesize a state_dict with the fixture's exact
keys/shapes, convert strictly (every source key must map, every target
leaf must be covered), and drive the converted variables through the real
flax model forward.
"""
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from adaptpoint_tpu.utils.torch_convert import (  # noqa: E402
    convert_reference_state_dict, convert_reference_generator,
    convert_reference_discriminator)

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _fixture(name):
    return json.load(open(os.path.join(HERE, "fixtures",
                                       f"ref_layout_{name}.json")))


def _synth(rows, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in rows:
        if not shape:
            out[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):
            out[k] = (rng.random(shape) + 0.5).astype(np.float32)
        else:
            out[k] = rng.standard_normal(shape).astype(np.float32) * 0.05
    return out


def _build_from_cfg_file(rel, n=64):
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg

    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, rel), recursive=True)
    model = build_model_from_cfg(cfg.model)
    in_ch = int(cfg.model.encoder_args.in_channels)
    pos = jnp.zeros((2, n, 3))
    x = jnp.zeros((2, n, in_ch))
    return model, pos, x


def _assert_clean(report, n_tensors):
    assert not report.unhandled, report.unhandled[:5]
    assert not report.missing, report.missing[:5]
    assert len(report.mapped) == n_tensors


def _assert_export_identity(new_vars, rows, sd):
    """import -> export must return the original state_dict exactly (the
    head biases were zero-filled on import, so the mean-fold is a no-op)."""
    from adaptpoint_tpu.utils.torch_convert import (
        export_reference_state_dict)

    back, report = export_reference_state_dict(new_vars, rows)
    assert not report.unhandled
    assert set(back) == set(sd)
    for k in sd:
        if not k.endswith("num_batches_tracked"):
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def _n_tensors(rows):
    return sum(1 for k, _ in rows if not k.endswith("num_batches_tracked"))


@pytest.mark.slow
def test_invresmlp_roundtrip():
    """PointNeXt-B-style stages: SA block + InvResMLP depth blocks.
    (slow tier: forward-compile dominated, ~13s on the 1-vCPU box)"""
    from adaptpoint_tpu.models import build_model_from_cfg

    # mirrors scripts/dump_ref_layouts.py SPECS['pointnext_b_cls']
    model = build_model_from_cfg({
        "NAME": "BaseCls",
        "encoder_args": {
            "NAME": "PointNextEncoder", "width": 32, "in_channels": 4,
            "blocks": [1, 2, 3, 2, 1, 1], "strides": [1, 2, 2, 2, 2, 1],
            "radius": 0.15, "radius_scaling": 1.5, "nsample": 32,
            "expansion": 4, "sa_layers": 1, "sa_use_res": False,
            "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
            "group_args": {"NAME": "ballquery", "normalize_dp": True},
            "conv_args": {"order": "conv-norm-act"},
            "act_args": {"act": "relu"}, "norm_args": {"norm": "bn"}},
        "cls_args": {"NAME": "ClsHead", "num_classes": 15,
                     "mlps": [512, 256], "norm_args": {"norm": "bn1d"}}})
    pos, x = jnp.zeros((2, 64, 3)), jnp.zeros((2, 64, 4))
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)

    rows = _fixture("pointnext_b_cls")
    sd = _synth(rows)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    # spot-check: InvResMLP local-aggregation conv and pwconv routing
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["enc2_b1"]
                   ["LocalAggregation_0"]["ConvBlock_0"]["Dense_0"]["kernel"]),
        sd["encoder.encoder.2.1.convs.convs.0.0.weight"][:, :, 0, 0].T)
    np.testing.assert_array_equal(
        np.asarray(new_vars["batch_stats"]["encoder"]["enc2_b2"]
                   ["ConvBlock_1"]["NormAct_0"]["BatchNorm_0"]["mean"]),
        sd["encoder.encoder.2.2.pwconv.1.1.running_mean"])
    logits = model.apply(new_vars, pos, x, training=False)
    assert logits.shape == (2, 15) and np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_s3dis_xl_seg_roundtrip():
    """BaseSeg: XL encoder (InvResMLP) + PointNextDecoder + SegHead."""
    model, pos, x = _build_from_cfg_file("cfgs/s3dis/pointnext-xl.yaml",
                                         n=256)
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    rows = _fixture("pointnext_xl_s3dis")
    sd = _synth(rows, seed=1)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    # decoder FP stage and final seg-head conv routing
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["decoder"]["fp3"]["ConvBlock_0"]
                   ["Dense_0"]["kernel"]),
        sd["decoder.decoder.3.0.convs.0.0.weight"][:, :, 0].T)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["head"]["Dense_0"]["bias"]),
        sd["head.head.2.0.bias"])
    out = model.apply(new_vars, pos, x, training=False)
    assert out.shape == (2, 256, 13) and np.isfinite(np.asarray(out)).all()


def test_partseg_roundtrip():
    """BasePartSeg: PartDecoder (curvenet cls_map) + SegHead."""
    from adaptpoint_tpu.utils import EasyConfig
    from adaptpoint_tpu.models import build_model_from_cfg

    cfg = EasyConfig()
    cfg.load(os.path.join(REPO, "cfgs/shapenetpart/pointnext-s.yaml"),
             recursive=True)
    model = build_model_from_cfg(cfg.model)
    pos, x = jnp.zeros((2, 64, 3)), jnp.zeros((2, 64, 4))
    cls0 = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), pos, x, cls0,
                           training=False)
    rows = _fixture("pointnext_s_partseg")
    sd = _synth(rows, seed=2)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["decoder"]["global_conv2"]["Dense_0"]
                   ["bias"]),
        sd["decoder.global_conv2.0.0.bias"])
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["enc3_sa"]["skipconv"]
                   ["kernel"]),
        sd["encoder.encoder.3.0.skipconv.0.weight"][:, :, 0].T)
    out = model.apply(new_vars, pos, x, cls0, training=False)
    assert out.shape == (2, 64, 50) and np.isfinite(np.asarray(out)).all()


def test_pointnet2_roundtrip():
    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/pointnet++.yaml")
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    rows = _fixture("pointnet2_cls")
    sd = _synth(rows, seed=3)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["sa1"]["ConvBlock_2"]
                   ["Dense_0"]["kernel"]),
        sd["encoder.SA_modules.1.local_aggregations.0.SA_CONFIG_operator"
           ".convs.2.0.weight"][:, :, 0, 0].T)
    logits = model.apply(new_vars, pos, x, training=False)
    assert logits.shape == (2, 15) and np.isfinite(np.asarray(logits)).all()


def test_dgcnn_roundtrip():
    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/dgcnn.yaml")
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    rows = _fixture("dgcnn_cls")
    sd = _synth(rows, seed=4)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["fusion"]["Dense_0"]
                   ["kernel"]),
        sd["encoder.fusion_block.0.weight"][:, :, 0].T)
    logits = model.apply(new_vars, pos, x, training=False)
    assert logits.shape == (2, 15) and np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_gan_pair_roundtrip():
    """The reference model_gan.pth pair: augmentor + SN discriminator.
    (slow tier: augmentor forward-compile dominated, ~17s; the fast tier
    keeps GAN conversion smoke via test_gan_cli_roundtrip)"""
    from adaptpoint_tpu.adapt.augmentor import AdaptPoint_Augmentor
    from adaptpoint_tpu.adapt.discriminator import PointDiscriminator1

    pair = _fixture("adaptpoint_gan")
    g_sd, d_sd = _synth(pair["generator"], 5), _synth(pair["discriminator"], 6)

    gen = AdaptPoint_Augmentor(w_num_anchor=4, w_sigma=0.5, w_R_range=10,
                               w_S_range=3, w_T_range=0.25)
    cloud = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 3)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "wolf": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    g_vars = gen.init(rngs, cloud, training=False)
    g_new, g_rep = convert_reference_generator(g_sd, g_vars)
    assert not g_rep.unhandled and not g_rep.missing
    assert len(g_rep.mapped) == _n_tensors(pair["generator"])
    # affine params route untransposed; qkv kernel transposed
    np.testing.assert_array_equal(
        np.asarray(g_new["params"]["predict_prob_layer"]["grouper2"]
                   ["affine_alpha"]),
        g_sd["predict_prob_layer.pointset_grouper_list.2.affine_alpha"])
    np.testing.assert_array_equal(
        np.asarray(g_new["params"]["predict_prob_layer"]["mask_attn"]
                   ["to_qkv"]["kernel"]),
        g_sd["predict_prob_layer.localfeat_mask_selfattention.to_qkv"
             ".weight"].T)
    xyz, xyz_new = gen.apply(
        g_new, cloud, training=False,
        rngs={"wolf": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)})
    assert xyz_new.shape == cloud.shape
    assert np.isfinite(np.asarray(xyz_new)).all()

    # generator export identity: import -> export == original
    from adaptpoint_tpu.utils.torch_convert import (
        export_reference_generator, export_reference_discriminator)
    g_back, g_exp = export_reference_generator(g_new, pair["generator"])
    assert not g_exp.unhandled
    for k in g_sd:
        if not k.endswith("num_batches_tracked"):
            np.testing.assert_array_equal(g_back[k], g_sd[k], err_msg=k)

    dis = PointDiscriminator1(num_classes=15)
    d_vars = dis.init({"params": jax.random.PRNGKey(0)}, cloud,
                      training=False)
    d_new, d_rep = convert_reference_discriminator(d_sd, d_vars)
    assert not d_rep.unhandled and not d_rep.missing

    # discriminator export: raw weight, bias, and u roundtrip exactly;
    # _v is recomputed as normalize(W^T u) (flax stores no v)
    d_back, d_exp = export_reference_discriminator(d_new,
                                                   pair["discriminator"])
    assert not d_exp.missing
    for k in d_sd:
        if k.endswith((".original", ".bias", "._u")):
            np.testing.assert_allclose(d_back[k], d_sd[k], rtol=1e-6,
                                       err_msg=k)
    w = d_sd["fc1.parametrizations.weight.original"]
    u = d_sd["fc1.parametrizations.weight.0._u"]
    want_v = w.T @ u
    want_v = want_v / np.linalg.norm(want_v)
    np.testing.assert_allclose(
        d_back["fc1.parametrizations.weight.0._v"], want_v, rtol=1e-5)
    # raw weight keeps its values (kernel = original^T); sigma = u^T W v
    w = d_sd["fc1.parametrizations.weight.original"]
    np.testing.assert_array_equal(
        np.asarray(d_new["params"]["fc0"]["kernel"]), w.T)
    u = d_sd["fc1.parametrizations.weight.0._u"]
    v = d_sd["fc1.parametrizations.weight.0._v"]
    got_sigma = float(np.asarray(
        d_new["batch_stats"]["SpectralNorm_3"]["fc0/kernel/sigma"]))
    np.testing.assert_allclose(got_sigma, float(u @ w @ v), rtol=1e-6)
    prob = dis.apply(d_new, cloud, training=False)
    assert prob.shape == (2, 1)
    assert (np.asarray(prob) >= 0).all() and (np.asarray(prob) <= 1).all()


def test_gan_cli_roundtrip(tmp_path):
    """model_gan.pth -> converter CLI --gan -> our model_gan.msgpack layout
    (the file engine/adapt_main.py mode=resume restores G/D from)."""
    torch = pytest.importorskip("torch")
    import importlib.util

    pair = _fixture("adaptpoint_gan")
    blob = {part: {k: torch.from_numpy(np.asarray(v))
                   for k, v in _synth(rows, seed=8).items()}
            for part, rows in pair.items()}
    src = tmp_path / "model_gan.pth"
    torch.save(blob, str(src))

    spec = importlib.util.spec_from_file_location(
        "convert_torch_ckpt",
        os.path.join(REPO, "scripts", "convert_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "model_gan.msgpack"
    mod.main(["--gan", "--src", str(src), "--out", str(out), "--cfg",
              os.path.join(REPO,
                           "cfgs/scanobjectnn/pointnext-s_adaptpoint_1.yaml")])

    from adaptpoint_tpu.utils.ckpt import load_pytree
    payload = load_pytree(str(out))
    assert set(payload) == {"generator", "discriminator"}
    np.testing.assert_array_equal(
        np.asarray(payload["generator"]["params"]["predict_prob_layer"]
                   ["grouper0"]["affine_beta"]),
        np.asarray(blob["generator"]
                   ["predict_prob_layer.pointset_grouper_list.0.affine_beta"]))
    assert "batch_stats" in payload["discriminator"]

    # and BACK through the export CLI: .msgpack -> reference model_gan.pth
    espec = importlib.util.spec_from_file_location(
        "export_torch_ckpt",
        os.path.join(REPO, "scripts", "export_torch_ckpt.py"))
    emod = importlib.util.module_from_spec(espec)
    espec.loader.exec_module(emod)
    back = tmp_path / "model_gan_back.pth"
    emod.main(["--gan", "--src", str(out), "--out", str(back), "--layout",
               os.path.join(HERE, "fixtures",
                            "ref_layout_adaptpoint_gan.json")])
    blob2 = torch.load(str(back), map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(
        blob2["generator"]
        ["predict_prob_layer.extract_feat_list.1.net.0.weight"].numpy(),
        blob["generator"]
        ["predict_prob_layer.extract_feat_list.1.net.0.weight"].numpy())
    np.testing.assert_array_equal(
        blob2["discriminator"]
        ["fc2.parametrizations.weight.original"].numpy(),
        blob["discriminator"]
        ["fc2.parametrizations.weight.original"].numpy())


@pytest.mark.slow
def test_partseg_cli_roundtrip(tmp_path):
    """Convert CLI on a BasePartSeg checkpoint (exercises the cls0-init
    branch), then export CLI back to .pth — identity."""
    torch = pytest.importorskip("torch")
    import importlib.util

    rows = _fixture("pointnext_s_partseg")
    sd = _synth(rows, seed=10)
    src = tmp_path / "ref_partseg.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}, "epoch": 5}, str(src))

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REPO, "scripts", f"{name}.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return m

    cfgp = os.path.join(REPO, "cfgs/shapenetpart/pointnext-s.yaml")
    mid = tmp_path / "ours.msgpack"
    _load("convert_torch_ckpt").main(
        ["--src", str(src), "--out", str(mid), "--cfg", cfgp])
    out = tmp_path / "back.pth"
    _load("export_torch_ckpt").main(
        ["--src", str(mid), "--out", str(out), "--cfg", cfgp, "--layout",
         os.path.join(HERE, "fixtures", "ref_layout_pointnext_s_partseg.json")])
    blob = torch.load(str(out), map_location="cpu", weights_only=True)
    assert blob["epoch"] == 5
    for k in sd:
        if not k.endswith("num_batches_tracked"):
            np.testing.assert_array_equal(blob["model"][k].numpy(), sd[k],
                                          err_msg=k)


def test_export_roundtrip():
    """import -> export returns the original state_dict exactly (the
    zero-filled head biases make the mean-fold a no-op here)."""
    from adaptpoint_tpu.utils.torch_convert import (
        export_reference_state_dict)

    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/dgcnn.yaml")
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    rows = _fixture("dgcnn_cls")
    sd = _synth(rows, seed=9)
    new_vars, _ = convert_reference_state_dict(sd, variables)
    back, report = export_reference_state_dict(new_vars, rows)
    assert not report.unhandled
    assert set(back) == set(sd)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            assert int(back[k]) == 0
        else:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_cli_roundtrip(tmp_path):
    """our .msgpack -> export CLI -> reference-format .pth (loadable by
    torch with the exact reference key set)."""
    torch = pytest.importorskip("torch")
    import importlib.util

    from adaptpoint_tpu.utils.ckpt import save_pytree

    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/dgcnn.yaml")
    variables = model.init(jax.random.PRNGKey(1), pos, x, training=False)
    src = tmp_path / "ours.msgpack"
    save_pytree({"params": variables["params"],
                 "batch_stats": variables["batch_stats"], "epoch": 42},
                str(src))

    spec = importlib.util.spec_from_file_location(
        "export_torch_ckpt",
        os.path.join(REPO, "scripts", "export_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "exported.pth"
    mod.main(["--src", str(src), "--out", str(out),
              "--cfg", os.path.join(REPO, "cfgs/scanobjectnn/dgcnn.yaml"),
              "--layout", os.path.join(HERE, "fixtures",
                                       "ref_layout_dgcnn_cls.json")])

    blob = torch.load(str(out), map_location="cpu", weights_only=True)
    assert blob["epoch"] == 42
    rows = _fixture("dgcnn_cls")
    assert set(blob["model"]) == {k for k, _ in rows}
    for k, shape in rows:
        assert list(blob["model"][k].shape) == shape, k
    # kernel orientation: exported torch conv weight == our kernel^T
    np.testing.assert_allclose(
        blob["model"]["encoder.fusion_block.0.weight"].numpy()[:, :, 0],
        np.asarray(variables["params"]["encoder"]["fusion"]["Dense_0"]
                   ["kernel"]).T)


def test_optimizer_cli_roundtrip(tmp_path):
    """convert CLI --optimizer: torch AdamW moments ride the msgpack as
    'opt_moments' and splice into an optax adamw state (mu/nu routed and
    transposed exactly like their parameters)."""
    torch = pytest.importorskip("torch")
    optax = pytest.importorskip("optax")
    import importlib.util

    rows = _fixture("dgcnn_cls")
    sd = _synth(rows, seed=21)
    param_names = [k for k in sd if not k.endswith(
        ("running_mean", "running_var", "num_batches_tracked"))]
    rng = np.random.default_rng(22)
    opt_sd = {"param_groups": [{"params": list(range(len(param_names)))}],
              "state": {i: {"step": torch.tensor(7.0),
                            "exp_avg": torch.from_numpy(
                                rng.standard_normal(sd[n].shape)
                                .astype(np.float32)),
                            "exp_avg_sq": torch.from_numpy(
                                rng.random(sd[n].shape)
                                .astype(np.float32))}
                        for i, n in enumerate(param_names)}}
    src = tmp_path / "ref_with_opt.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()},
                "optimizer": opt_sd, "epoch": 7}, str(src))

    spec = importlib.util.spec_from_file_location(
        "convert_torch_ckpt",
        os.path.join(REPO, "scripts", "convert_torch_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "converted.msgpack"
    mod.main(["--src", str(src), "--out", str(out), "--optimizer",
              "--cfg", os.path.join(REPO, "cfgs/scanobjectnn/dgcnn.yaml")])

    from adaptpoint_tpu.utils.ckpt import load_pytree
    from adaptpoint_tpu.utils.torch_convert import splice_adam_state
    payload = load_pytree(str(out))
    om = payload["opt_moments"]
    assert int(om["count"]) == 7
    # kernel moments transpose with the kernel
    fusion_idx = param_names.index("encoder.fusion_block.0.weight")
    np.testing.assert_array_equal(
        np.asarray(om["mu"]["encoder"]["fusion"]["Dense_0"]["kernel"]),
        np.asarray(opt_sd["state"][fusion_idx]["exp_avg"])[:, :, 0].T)
    # zero moments for our extra head biases (no torch counterpart)
    assert not np.asarray(
        om["nu"]["prediction"]["LinearBlock_0"]["Dense_0"]["bias"]).any()

    tx = optax.adamw(1e-3)
    opt_state = splice_adam_state(tx.init(payload["params"]), om["mu"],
                                  om["nu"], int(om["count"]))

    def _find_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, tuple):  # plain tuples AND wrapper namedtuples
            for x in s:
                r = _find_adam(x)
                if r is not None:
                    return r
        if isinstance(s, dict):
            for x in s.values():
                r = _find_adam(x)
                if r is not None:
                    return r
        return None

    adam = _find_adam(opt_state)
    assert adam is not None and int(adam.count) == 7
    np.testing.assert_array_equal(
        np.asarray(adam.mu["encoder"]["fusion"]["Dense_0"]["kernel"]),
        np.asarray(om["mu"]["encoder"]["fusion"]["Dense_0"]["kernel"]))

    # and through OUR factory tx (inject_hyperparams-wrapped chain — the
    # structure mode=resume actually splices into)
    from adaptpoint_tpu.optim import build_optimizer_from_cfg
    tx2 = build_optimizer_from_cfg(payload["params"], lr=1e-3, NAME="adamw",
                                   weight_decay=0.05)
    spliced2 = splice_adam_state(tx2.init(payload["params"]), om["mu"],
                                 om["nu"], int(om["count"]))
    adam2 = _find_adam(spliced2)
    assert adam2 is not None and int(adam2.count) == 7
    np.testing.assert_array_equal(
        np.asarray(adam2.nu["encoder"]["head"]["ConvBlock_0"]["Dense_0"]
                   ["kernel"]),
        np.asarray(om["nu"]["encoder"]["head"]["ConvBlock_0"]["Dense_0"]
                   ["kernel"]))


def test_strict_rejects_foreign_keys():
    """A state_dict from a different architecture fails loudly."""
    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/dgcnn.yaml")
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    sd = _synth(_fixture("pointnet2_cls"), seed=7)
    with pytest.raises(ValueError):
        convert_reference_state_dict(sd, variables)


def test_pointmlp_roundtrip():
    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/pointmlp.yaml")
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    rows = _fixture("pointmlp_cls")
    sd = _synth(rows, seed=6)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["pre1_res0"]
                   ["_ConvBNAct_0"]["Dense_0"]["kernel"]),
        sd["encoder.pre_blocks_list.1.operation.0.net1.0.weight"][:, :, 0].T)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["grouper2"]["affine_alpha"]),
        sd["encoder.local_grouper_list.2.affine_alpha"])
    logits = model.apply(new_vars, pos, x, training=False)
    assert logits.shape == (2, 15) and np.isfinite(np.asarray(logits)).all()


def test_pointnet_roundtrip():
    model, pos, x = _build_from_cfg_file("cfgs/scanobjectnn/pointnet.yaml")
    variables = model.init(jax.random.PRNGKey(0), pos, x, training=False)
    rows = _fixture("pointnet_cls")
    sd = _synth(rows, seed=7)
    new_vars, report = convert_reference_state_dict(sd, variables)
    _assert_clean(report, _n_tensors(rows))
    _assert_export_identity(new_vars, rows, sd)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder"]["fstn"]["_MLPBN_3"]
                   ["Dense_0"]["kernel"]),
        sd["encoder.fstn.fc1.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(new_vars["batch_stats"]["encoder"]["_MLPBN_4"]
                   ["BatchNorm_0"]["mean"]),
        sd["encoder.bn3.running_mean"])
    logits = model.apply(new_vars, pos, x, training=False)
    assert logits.shape == (2, 15) and np.isfinite(np.asarray(logits)).all()
