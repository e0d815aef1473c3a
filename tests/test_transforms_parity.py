"""Registry parity + behavior checks for the round-3 transform additions.

The NAME list below is the complete set registered by the reference
(point_transform_cpu.py / point_transformer_gpu.py uncommented
``@DataTransforms.register_module()`` entries) — each must build from the
repo registry and run on a sample without changing shapes.
"""
import numpy as np
import pytest

from adaptpoint_tpu.transforms.transforms_factory import DataTransforms

REFERENCE_REGISTERED = [
    # point_transform_cpu.py
    "PointsToTensor", "RandomRotate", "RandomRotateZ", "RandomScale",
    "RandomScaleAndJitter", "RandomShift", "RandomScaleAndTranslate",
    "RandomFlip", "RandomJitter", "ChromaticAutoContrast",
    "ChromaticTranslation", "ChromaticJitter", "HueSaturationTranslation",
    "RandomDropFeature", "NumpyChromaticNormalize",
    # point_transformer_gpu.py
    "PointCloudToTensor", "PointCloudCenterAndNormalize", "PointCloudXYZAlign",
    "RandomDropout", "RandomHorizontalFlip", "PointCloudScaling",
    "PointCloudTranslation", "PointCloudScaleAndTranslate", "PointCloudJitter",
    "PointCloudScaleAndJitter", "PointCloudRotation", "ChromaticDropGPU",
    "ChromaticPerDropGPU", "ChromaticNormalize",
]


def _sample(rng):
    return {
        "pos": rng.standard_normal((128, 3)).astype(np.float32),
        "x": np.abs(rng.standard_normal((128, 6)).astype(np.float32)),
    }


def test_every_reference_name_registered():
    missing = [n for n in REFERENCE_REGISTERED
               if n not in DataTransforms.module_dict]
    assert not missing, f"unregistered reference transforms: {missing}"


@pytest.mark.parametrize("name", REFERENCE_REGISTERED)
def test_transform_runs_and_preserves_shape(name, rng_np):
    cls = DataTransforms.module_dict[name]
    t = cls()
    data = _sample(rng_np)
    n0 = data["pos"].shape[0]
    out = t(dict(data), rng_np)
    assert out["pos"].shape[1] == 3
    if name != "RandomDropout":  # dropout changes N by design
        assert out["pos"].shape[0] == n0


def test_random_rotate_is_rotation(rng_np):
    t = DataTransforms.module_dict["RandomRotate"](angle=[1, 1, 1])
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    # norms preserved by any rotation
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(pos, axis=1), rtol=1e-5)
    assert not np.allclose(out, pos)


def test_random_rotate_z_only_moves_xy(rng_np):
    t = DataTransforms.module_dict["RandomRotateZ"](angle=0.5, rotate_dim=2)
    data = _sample(rng_np)
    z0 = data["pos"][:, 2].copy()
    out = t(data, rng_np)["pos"]
    np.testing.assert_allclose(out[:, 2], z0, rtol=1e-6)


def test_random_scale_bounds(rng_np):
    t = DataTransforms.module_dict["RandomScale"](scale=[0.5, 0.6])
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    ratio = out[np.abs(pos).sum(1) > 0.5] / pos[np.abs(pos).sum(1) > 0.5]
    assert (ratio > 0.49).all() and (ratio < 0.61).all()


def test_random_scale_xyz_freeze(rng_np):
    t = DataTransforms.module_dict["RandomScale"](
        scale=[0.5, 0.6], scale_xyz=[False, True, False])
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    np.testing.assert_allclose(out[:, 0], pos[:, 0])
    np.testing.assert_allclose(out[:, 2], pos[:, 2])
    assert not np.allclose(out[:, 1], pos[:, 1])


def test_random_jitter_clip(rng_np):
    t = DataTransforms.module_dict["RandomJitter"](jitter_sigma=1.0,
                                                   jitter_clip=0.03)
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    assert np.abs(out - pos).max() <= 0.03 + 1e-6


def test_random_shift_bounds(rng_np):
    t = DataTransforms.module_dict["RandomShift"](shift=[0.1, 0.2, 0.0])
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    d = out - pos
    # per-axis constant shift within bounds; z untouched
    assert np.allclose(d, d[0:1], atol=1e-6)
    assert abs(d[0, 0]) <= 0.1 and abs(d[0, 1]) <= 0.2 and d[0, 2] == 0


def test_random_flip_signs(rng_np):
    t = DataTransforms.module_dict["RandomFlip"](p=1.0)
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    np.testing.assert_allclose(out[:, 0], -pos[:, 0])
    np.testing.assert_allclose(out[:, 1], -pos[:, 1])
    np.testing.assert_allclose(out[:, 2], pos[:, 2])


def test_chromatic_drop_gpu_all_or_nothing(rng_np):
    t = DataTransforms.module_dict["ChromaticDropGPU"](color_drop=1.1)
    data = _sample(rng_np)
    out = t(data, rng_np)
    assert (out["x"][:, :3] == 0).all()
    assert (out["x"][:, 3:] != 0).any()


def test_chromatic_per_drop_gpu_masks_rows(rng_np):
    t = DataTransforms.module_dict["ChromaticPerDropGPU"](color_drop=0.5)
    data = _sample(rng_np)
    x0 = data["x"].copy()
    out = t(data, rng_np)["x"]
    zeroed = (out[:, :3] == 0).all(axis=1)
    kept = ~zeroed
    assert zeroed.any() and kept.any()
    np.testing.assert_allclose(out[kept, :3], x0[kept, :3])
    np.testing.assert_allclose(out[:, 3:], x0[:, 3:])


def test_numpy_chromatic_normalize(rng_np):
    t = DataTransforms.module_dict["NumpyChromaticNormalize"](
        color_mean=[0.5, 0.5, 0.5], color_std=[0.2, 0.2, 0.2])
    data = _sample(rng_np)
    data["x"][:, :3] = rng_np.random((128, 3)) * 255.0
    src = data["x"][:, :3].copy()
    out = t(data, rng_np)["x"]
    np.testing.assert_allclose(out[:, :3], (src / 255.0 - 0.5) / 0.2,
                               rtol=1e-5)


def test_scale_and_translate_bounds(rng_np):
    t = DataTransforms.module_dict["PointCloudScaleAndTranslate"](
        scale=[0.9, 1.1], shift=[0.05, 0.05, 0.05])
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    assert not np.allclose(out, pos)
    assert np.abs(out - pos).max() < 0.15 * np.abs(pos).max() + 0.16


def test_scale_and_jitter_isotropic(rng_np):
    t = DataTransforms.module_dict["PointCloudScaleAndJitter"](
        scale=[0.5, 0.5], anisotropic=False, jitter_sigma=0.0,
        jitter_clip=0.0)
    data = _sample(rng_np)
    pos = data["pos"].copy()
    out = t(data, rng_np)["pos"]
    np.testing.assert_allclose(out, pos * 0.5, rtol=1e-5)
