"""SimpleView reference parity (VERDICT r4 weak-4): the renderer is the
risky half (perspective divide, ceil(x-0.5) pixel snap, harmonic-style
depth accumulation, view set), so it is pinned DIRECTLY against the live
reference implementation; the full model then gets the same converted-
weights logit-parity treatment as the other backbones.

Round-5 fixes this work uncovered: the round-1 renderer used different
views/euler composition and a nearest-pixel arithmetic-mean splat, and
_ResBlock's downsample was missing resnet's BN (resnet.py:186-190)."""
import importlib.util
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _dump_mod():
    spec = importlib.util.spec_from_file_location(
        "dump_ref_layouts", os.path.join(REPO, "scripts",
                                         "dump_ref_layouts.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_pcviews():
    mod = _dump_mod()
    mod._import_reference("/root/reference")
    import openpoints.models.backbone.simpleview_util as sv
    return sv.PCViews()


@pytest.mark.slow
def test_renderer_matches_reference():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    pv = _ref_pcviews()
    g = torch.Generator().manual_seed(3)
    pts = torch.randn(2, 256, 3, generator=g)
    pts = pts / pts.norm(dim=-1).max(dim=1, keepdim=True).values[..., None]
    ref = pv.get_img(pts).numpy()  # (B*6, 128, 128)

    from adaptpoint_tpu.models.backbone.simpleview import (_pc_views,
                                                           points2depth)
    rot, trans = _pc_views()
    p = jnp.asarray(pts.numpy())
    viewed = (jnp.einsum("bnc,vcd->bvnd", p, jnp.asarray(rot))
              - jnp.asarray(trans)[None, :, None, :])
    ours = np.asarray(points2depth(viewed.reshape(-1, 256, 3), 128))[..., 0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    assert (np.abs(ref) > 0).mean() > 0.005  # non-trivial image


@pytest.mark.slow
def test_simpleview_reference_logit_parity():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    mod = _dump_mod()
    mod._import_reference("/root/reference")
    from openpoints.models import build_model_from_cfg as build_ref

    ref_model = build_ref(mod._attrdict(mod.SPECS["simpleview_cls"]))
    rows = json.load(open(os.path.join(
        HERE, "fixtures", "ref_layout_simpleview_cls.json")))
    # fan-in-scaled weights keep activations O(1) through the 18-layer
    # trunk so the 5e-4 comparison is meaningful at logit scale
    rng = np.random.default_rng(41)
    sd = {}
    for k, shape in rows:
        if not shape:
            sd[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):
            sd[k] = (rng.random(shape) * 0.2 + 0.9).astype(np.float32)
        elif k.endswith(".weight") and len(shape) == 1:  # BN scales ~1
            sd[k] = (rng.random(shape) * 0.2 + 0.9).astype(np.float32)
        elif k.endswith(("running_mean", ".bias")):
            sd[k] = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            sd[k] = (rng.standard_normal(shape)
                     / np.sqrt(fan_in)).astype(np.float32)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})
    assert not missing and not unexpected
    ref_model.eval()

    g = torch.Generator().manual_seed(43)
    pts = torch.randn(2, 256, 3, generator=g)
    pts = pts / pts.norm(dim=-1).max(dim=1, keepdim=True).values[..., None]
    with torch.no_grad():
        ref_logits = ref_model({"pos": pts}).numpy()

    from adaptpoint_tpu.models.build import MODELS
    from adaptpoint_tpu.utils.torch_convert import (
        convert_reference_state_dict)

    model = MODELS.build({"NAME": "MVModel", "num_classes": 15,
                          "channels": 16, "resolution": 128})
    pos = jnp.asarray(pts.numpy())
    variables = model.init(jax.random.PRNGKey(0), pos, training=False)
    new_vars, report = convert_reference_state_dict(sd, variables)
    assert not report.unhandled and not report.missing, (
        report.unhandled[:5], report.missing[:5])

    logits = np.asarray(model.apply(new_vars, pos, training=False))
    assert logits.shape == ref_logits.shape
    np.testing.assert_allclose(logits, ref_logits, rtol=5e-4, atol=5e-4)
