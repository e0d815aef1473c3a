"""Point-cloud data transforms (host-side numpy, per sample).

Behavioral parity with the reference tensor transforms used by the configs
(openpoints/transforms/point_transformer_gpu.py:35-314 and
point_transform_cpu.py): PointsToTensor, PointCloudScaling,
PointCloudCenterAndNormalize (heights from the pre-centering gravity axis),
PointCloudRotation (per-axis uniform angles, random composition order), plus
jitter / dropout / translation / flip used by other configs.
"""
from __future__ import annotations

import numpy as np

from .transforms_factory import DataTransforms

__all__ = []


def _rot_single_axis(axis_ind: int, theta: float) -> np.ndarray:
    """Rotation matrix about a coordinate axis (Rodrigues for unit axes)."""
    c, s = np.cos(theta), np.sin(theta)
    m = np.eye(3, dtype=np.float64)
    a, b = [(1, 2), (0, 2), (0, 1)][axis_ind]
    m[a, a] = c
    m[b, b] = c
    sign = -1.0 if axis_ind == 1 else 1.0
    m[a, b] = -s * sign
    m[b, a] = s * sign
    return m


@DataTransforms.register_module()
class PointsToTensor:
    """No-op marker kept for config parity (point_transform_cpu.py:7-19):
    arrays stay numpy float32 until batch upload."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, data, rng):
        data["pos"] = np.asarray(data["pos"], np.float32)
        return data


@DataTransforms.register_module()
class PointCloudScaling:
    """Anisotropic random scaling (parity: point_transformer_gpu.py:135-166)."""

    def __init__(self, scale=(2.0 / 3.0, 3.0 / 2.0), anisotropic=True,
                 scale_xyz=(True, True, True), mirror=(0, 0, 0), **kwargs):
        self.scale_min, self.scale_max = float(scale[0]), float(scale[1])
        self.anisotropic = anisotropic
        self.scale_xyz = scale_xyz
        self.mirror = np.asarray(mirror, np.float32)
        self.use_mirroring = (self.mirror > 0).sum() != 0

    def __call__(self, data, rng):
        scale = rng.uniform(self.scale_min, self.scale_max,
                            size=3 if self.anisotropic else 1).astype(np.float32)
        if self.use_mirroring:
            mirror = (rng.random(3) > self.mirror).astype(np.float32) * 2 - 1
            scale = scale * mirror
        for i, s in enumerate(self.scale_xyz):
            if not s:
                scale[i] = 1.0
        data["pos"] = data["pos"] * scale
        return data


@DataTransforms.register_module()
class PointCloudCenterAndNormalize:
    """Height feature + centering + unit-sphere normalization
    (parity: point_transformer_gpu.py:35-68)."""

    def __init__(self, centering=True, normalize=True, gravity_dim=2,
                 append_xyz=False, **kwargs):
        self.centering = centering
        self.normalize = normalize
        self.gravity_dim = gravity_dim
        self.append_xyz = append_xyz

    def __call__(self, data, rng):
        pos = data["pos"]
        if self.append_xyz:
            data["heights"] = (pos - pos.min()).astype(np.float32)
        else:
            h = pos[:, self.gravity_dim:self.gravity_dim + 1]
            data["heights"] = (h - h.min()).astype(np.float32)
        if self.centering:
            pos = pos - pos.mean(axis=0, keepdims=True)
        if self.normalize:
            m = np.sqrt((pos ** 2).sum(axis=-1, keepdims=True)).max(axis=0, keepdims=True)
            pos = pos / m
        data["pos"] = pos.astype(np.float32)
        return data


@DataTransforms.register_module()
class PointCloudRotation:
    """Random rotation with per-axis uniform angles composed in random order
    (parity: point_transformer_gpu.py:267-314)."""

    def __init__(self, angle=(0.0, 0.0, 0.0), **kwargs):
        self.angle = np.asarray(angle, np.float64) * np.pi

    def __call__(self, data, rng):
        mats = []
        for axis_ind, bound in enumerate(self.angle):
            theta = rng.uniform(-bound, bound) if bound else 0.0
            mats.append(_rot_single_axis(axis_ind, theta))
        rng.shuffle(mats)
        rot = (mats[0] @ mats[1] @ mats[2]).astype(np.float32)
        data["pos"] = data["pos"] @ rot.T
        if "normals" in data:
            data["normals"] = data["normals"] @ rot.T
        return data


@DataTransforms.register_module()
class PointCloudXYZAlign:
    """Center in the xy plane, floor the gravity axis
    (parity: point_transformer_gpu.py:71-90)."""

    def __init__(self, gravity_dim=2, **kwargs):
        self.gravity_dim = gravity_dim

    def __call__(self, data, rng):
        pos = data["pos"] - data["pos"].mean(axis=0, keepdims=True)
        pos[:, self.gravity_dim] -= pos[:, self.gravity_dim].min()
        data["pos"] = pos.astype(np.float32)
        return data


@DataTransforms.register_module()
class PointCloudJitter:
    """Gaussian jitter, clipped (parity: point_transformer_gpu.py
    PointCloudJitter)."""

    def __init__(self, jitter_sigma=0.01, jitter_clip=0.05, **kwargs):
        self.sigma = jitter_sigma
        self.clip = jitter_clip

    def __call__(self, data, rng):
        noise = np.clip(rng.standard_normal(data["pos"].shape) * self.sigma,
                        -self.clip, self.clip).astype(np.float32)
        data["pos"] = data["pos"] + noise
        return data


@DataTransforms.register_module()
class RandomDropout:
    """Random point dropout (parity: point_transformer_gpu.py:95-110)."""

    def __init__(self, dropout_ratio=0.2, dropout_application_ratio=0.2, **kwargs):
        self.dropout_ratio = dropout_ratio
        self.dropout_application_ratio = dropout_application_ratio

    def __call__(self, data, rng):
        if rng.random() < self.dropout_application_ratio:
            n = len(data["pos"])
            keep = rng.permutation(n)[: int(n * (1 - self.dropout_ratio))]
            for k, v in data.items():
                if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == n:
                    data[k] = v[keep]
        return data


@DataTransforms.register_module()
class PointCloudTranslation:
    """Random translation (parity: point_transformer_gpu.py
    PointCloudTranslation)."""

    def __init__(self, shift=(0.2, 0.2, 0.0), **kwargs):
        self.shift = np.asarray(shift, np.float32)

    def __call__(self, data, rng):
        t = (rng.uniform(-1, 1, 3) * self.shift).astype(np.float32)
        data["pos"] = data["pos"] + t
        return data


@DataTransforms.register_module()
class RandomHorizontalFlip:
    """Flip along non-upright axes (parity: point_transformer_gpu.py:113-132)."""

    def __init__(self, upright_axis="z", aug_prob=0.95, **kwargs):
        self.upright_axis = {"x": 0, "y": 1, "z": 2}[upright_axis.lower()]
        self.horz_axes = [a for a in range(3) if a != self.upright_axis]
        self.aug_prob = aug_prob

    def __call__(self, data, rng):
        if rng.random() < self.aug_prob:
            for ax in self.horz_axes:
                if rng.random() < 0.5:
                    coord_max = data["pos"].max()
                    data["pos"][:, ax] = coord_max - data["pos"][:, ax]
                    if "normals" in data:
                        data["normals"][:, ax] = -data["normals"][:, ax]
        return data


@DataTransforms.register_module()
class ChromaticAutoContrast:
    """Blend colors toward full-range contrast (parity:
    point_transform_cpu.py:192-209)."""

    def __init__(self, p=0.2, blend_factor=None, **kwargs):
        self.p = p
        self.blend_factor = blend_factor

    def __call__(self, data, rng):
        if rng.random() < self.p:
            rgb = data["x"][:, :3]
            lo = rgb.min(0, keepdims=True)
            hi = rgb.max(0, keepdims=True)
            scale = 255.0 / np.maximum(hi - lo, 1e-12)
            contrast = (rgb - lo) * scale
            bf = rng.random() if self.blend_factor is None else self.blend_factor
            data["x"][:, :3] = (1 - bf) * rgb + bf * contrast
        return data


@DataTransforms.register_module()
class ChromaticTranslation:
    """Global color shift (parity: point_transform_cpu.py:213-223)."""

    def __init__(self, p=0.95, ratio=0.05, **kwargs):
        self.p = p
        self.ratio = ratio

    def __call__(self, data, rng):
        if rng.random() < self.p:
            tr = (rng.random((1, 3)) - 0.5) * 255 * 2 * self.ratio
            data["x"][:, :3] = np.clip(tr + data["x"][:, :3], 0, 255)
        return data


@DataTransforms.register_module()
class ChromaticJitter:
    """Per-point color noise (parity: point_transform_cpu.py:226-237)."""

    def __init__(self, p=0.95, std=0.005, **kwargs):
        self.p = p
        self.std = std

    def __call__(self, data, rng):
        if rng.random() < self.p:
            noise = rng.standard_normal((data["x"].shape[0], 3)) * self.std * 255
            data["x"][:, :3] = np.clip(noise + data["x"][:, :3], 0, 255)
        return data


@DataTransforms.register_module()
class RandomDropFeature:
    """Zero a feature slice with prob p (parity:
    point_transform_cpu.py:304-315)."""

    def __init__(self, feature_drop=0.2, drop_dim=(0, 3), **kwargs):
        self.p = feature_drop
        self.dim = list(drop_dim)

    def __call__(self, data, rng):
        if rng.random() < self.p:
            data["x"][:, self.dim[0]:self.dim[-1]] = 0
        return data


@DataTransforms.register_module()
class HueSaturationTranslation:
    """Random hue/saturation perturbation in HSV space (parity:
    point_transform_cpu.py:240-301, colorsys-equivalent vectorized
    conversions)."""

    def __init__(self, hue_max=0.5, saturation_max=0.2, **kwargs):
        self.hue_max = hue_max
        self.saturation_max = saturation_max

    @staticmethod
    def rgb_to_hsv(rgb):
        rgb = rgb.astype(np.float64)
        hsv = np.zeros_like(rgb)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        maxc = rgb[..., :3].max(-1)
        minc = rgb[..., :3].min(-1)
        hsv[..., 2] = maxc
        mask = maxc != minc
        span = np.where(mask, maxc - minc, 1.0)
        hsv[mask, 1] = (maxc - minc)[mask] / np.maximum(maxc[mask], 1e-12)
        rc = np.where(mask, (maxc - r) / span, 0.0)
        gc = np.where(mask, (maxc - g) / span, 0.0)
        bc = np.where(mask, (maxc - b) / span, 0.0)
        hsv[..., 0] = np.select([r == maxc, g == maxc],
                                [bc - gc, 2.0 + rc - bc], default=4.0 + gc - rc)
        hsv[..., 0] = (hsv[..., 0] / 6.0) % 1.0
        return hsv

    @staticmethod
    def hsv_to_rgb(hsv):
        rgb = np.empty_like(hsv)
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
        i = (h * 6.0).astype(np.uint8)
        f = (h * 6.0) - i
        p = v * (1.0 - s)
        q = v * (1.0 - s * f)
        t = v * (1.0 - s * (1.0 - f))
        i = i % 6
        conds = [s == 0.0, i == 1, i == 2, i == 3, i == 4, i == 5]
        rgb[..., 0] = np.select(conds, [v, q, p, p, t, v], default=v)
        rgb[..., 1] = np.select(conds, [v, v, v, q, p, p], default=t)
        rgb[..., 2] = np.select(conds, [v, p, t, v, v, q], default=p)
        return rgb

    def __call__(self, data, rng):
        hsv = self.rgb_to_hsv(data["x"][:, :3])
        hue_val = (rng.random() - 0.5) * 2 * self.hue_max
        sat_ratio = 1 + (rng.random() - 0.5) * 2 * self.saturation_max
        hsv[..., 0] = np.remainder(hue_val + hsv[..., 0] + 1, 1)
        hsv[..., 1] = np.clip(sat_ratio * hsv[..., 1], 0, 1)
        data["x"][:, :3] = np.clip(self.hsv_to_rgb(hsv), 0, 255)
        return data


@DataTransforms.register_module()
class ChromaticNormalize:
    """Scale colors to [0,1] and optionally standardize (parity:
    point_transformer_gpu.py:396-422 + NumpyChromaticNormalize)."""

    def __init__(self, color_mean=None, color_std=None, **kwargs):
        self.color_mean = (np.asarray(color_mean, np.float32)
                           if color_mean is not None else None)
        self.color_std = (np.asarray(color_std, np.float32)
                          if color_std is not None else None)

    def __call__(self, data, rng):
        rgb = data["x"][:, :3].astype(np.float32)
        if rgb.max() > 1:
            rgb = rgb / 255.0
        if self.color_mean is not None:
            rgb = (rgb - self.color_mean) / self.color_std
        data["x"][:, :3] = rgb
        return data


def mixup_target(target: np.ndarray, num_classes: int, lam: float,
                 smoothing: float = 0.0) -> np.ndarray:
    """Soft mixed one-hot targets (parity: timm mixup_target used by
    point_transformer_gpu.py:458-461)."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = np.full((len(target), num_classes), off, np.float32)
    y1[np.arange(len(target)), target] = on
    y2 = y1[::-1].copy()
    return y1 * lam + y2 * (1.0 - lam)


class Cutmix:
    """Batch-level point cutmix (parity: point_transformer_gpu.py:425-461):
    swap the trailing lam-fraction of points with the batch-flipped clouds
    and mix the targets. Applied host-side on the collated batch before
    upload (the reference applies it on the GPU batch)."""

    def __init__(self, cutmix_alpha=0.3, prob=1.0, label_smoothing=0.1,
                 num_classes=1000, **kwargs):
        self.cutmix_alpha = cutmix_alpha
        self.mix_prob = prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def __call__(self, batch: dict, rng: np.random.Generator):
        target = np.asarray(batch["y"])
        if rng.random() > self.mix_prob:
            y = mixup_target(target, self.num_classes, 1.0,
                             self.label_smoothing)
            return batch, y
        lam = float(rng.beta(self.cutmix_alpha, self.cutmix_alpha))
        n = batch["pos"].shape[1]
        n_mix = int(n * lam)
        if n_mix > 0:
            batch["pos"][:, -n_mix:] = batch["pos"][::-1][:, -n_mix:]
            if "x" in batch:
                batch["x"][:, -n_mix:] = batch["x"][::-1][:, -n_mix:]
        y = mixup_target(target, self.num_classes, lam, self.label_smoothing)
        return batch, y


# --------------------------------------------------------------------------
# Random* CPU family + remaining GPU-registered transforms (round 3): every
# transform NAME registered by the reference
# (point_transform_cpu.py:23-335, point_transformer_gpu.py:19-410) resolves
# here, so any reference YAML recipe builds unchanged.
# --------------------------------------------------------------------------


@DataTransforms.register_module()
class RandomRotate:
    """Per-axis uniform rotation composed as Rz@Ry@Rx
    (parity: point_transform_cpu.py:23-39; angles in units of pi)."""

    def __init__(self, angle=(0, 0, 1), **kwargs):
        self.angle = angle

    def __call__(self, data, rng):
        ax = rng.uniform(-self.angle[0], self.angle[0]) * np.pi
        ay = rng.uniform(-self.angle[1], self.angle[1]) * np.pi
        az = rng.uniform(-self.angle[2], self.angle[2]) * np.pi
        R = (_rot_single_axis(2, az) @ _rot_single_axis(1, ay)
             @ _rot_single_axis(0, ax))
        data["pos"] = (data["pos"] @ R.T).astype(np.float32)
        return data


@DataTransforms.register_module()
class RandomRotateZ:
    """Rotation about one axis, angle in units of pi
    (parity: point_transform_cpu.py:43-66; applied as pos @ R, i.e. the
    anti-clockwise convention of the reference)."""

    def __init__(self, angle=1.0, rotate_dim=2, random_rotate=True, **kwargs):
        self.angle = float(angle) * np.pi
        self.random_rotate = random_rotate
        self.rotate_dim = int(rotate_dim)

    def __call__(self, data, rng):
        theta = (rng.uniform(-self.angle, self.angle) if self.random_rotate
                 else self.angle)
        R = _rot_single_axis(self.rotate_dim, theta)
        data["pos"] = (data["pos"] @ R).astype(np.float32)
        return data


@DataTransforms.register_module()
class RandomScale:
    """Random (optionally anisotropic, mirrored) scaling
    (parity: point_transform_cpu.py:70-96)."""

    def __init__(self, scale=(0.8, 1.2), scale_anisotropic=False,
                 scale_xyz=(True, True, True), mirror=(-1, -1, -1), **kwargs):
        self.scale = scale
        self.scale_xyz = scale_xyz
        self.anisotropic = scale_anisotropic
        self.mirror = np.asarray(mirror, np.float32)
        self.use_mirroring = (self.mirror > 0).sum() != 0

    def __call__(self, data, rng):
        scale = rng.uniform(self.scale[0], self.scale[1],
                            3 if self.anisotropic else 1)
        if len(scale) == 1:
            scale = scale.repeat(3)
        if self.use_mirroring:
            m = (rng.random(3) > self.mirror).astype(np.float32) * 2 - 1
            scale = scale * m
        for i, s in enumerate(self.scale_xyz):
            if not s:
                scale[i] = 1.0
        data["pos"] = (data["pos"] * scale).astype(np.float32)
        return data


@DataTransforms.register_module()
class RandomScaleAndJitter:
    """Scale (+mirror) then clipped gaussian jitter
    (parity: point_transform_cpu.py:99-129)."""

    def __init__(self, scale=(0.8, 1.2), scale_xyz=(True, True, True),
                 scale_anisotropic=False, jitter_sigma=0.01, jitter_clip=0.05,
                 mirror=(-1, -1, -1), **kwargs):
        self.scale = scale
        self.scale_xyz = scale_xyz
        self.anisotropic = scale_anisotropic
        self.sigma = jitter_sigma
        self.clip = jitter_clip
        self.mirror = np.asarray(mirror, np.float32)
        self.use_mirroring = (self.mirror > 0).sum() != 0

    def __call__(self, data, rng):
        scale = rng.uniform(self.scale[0], self.scale[1],
                            3 if self.anisotropic else 1)
        if len(scale) == 1:
            scale = scale.repeat(3)
        if self.use_mirroring:
            m = (rng.random(3) > self.mirror).astype(np.float32) * 2 - 1
            scale = scale * m
        for i, s in enumerate(self.scale_xyz):
            if not s:
                scale[i] = 1.0
        jitter = np.clip(self.sigma * rng.standard_normal(
            (data["pos"].shape[0], 3)), -self.clip, self.clip)
        data["pos"] = (data["pos"] * scale + jitter).astype(np.float32)
        return data


@DataTransforms.register_module()
class RandomShift:
    """Uniform global shift (parity: point_transform_cpu.py:132-143 —
    the reference reads an undefined ``self.shift_range``; the intended
    per-axis ranges from ``shift`` are used here)."""

    def __init__(self, shift=(0.2, 0.2, 0), **kwargs):
        self.shift = np.asarray(shift, np.float32)

    def __call__(self, data, rng):
        shift = rng.uniform(-self.shift, self.shift, 3)
        data["pos"] = (data["pos"] + shift).astype(np.float32)
        return data


@DataTransforms.register_module()
class RandomScaleAndTranslate:
    """Scale then uniform shift (parity: point_transform_cpu.py:146-164 —
    the reference reads undefined ``self.anisotropic``/``self.shift_range``;
    implemented with per-axis scale ranges and ``shift`` bounds as
    intended)."""

    def __init__(self, scale=(0.9, 1.1), shift=(0.2, 0.2, 0),
                 scale_xyz=(1, 1, 1), **kwargs):
        self.scale = scale
        self.scale_xyz = np.asarray(scale_xyz, np.float32)
        self.shift = np.asarray(shift, np.float32)

    def __call__(self, data, rng):
        scale = rng.uniform(self.scale[0], self.scale[1], 3) * self.scale_xyz
        shift = rng.uniform(-self.shift, self.shift, 3)
        data["pos"] = (data["pos"] * scale + shift).astype(np.float32)
        return data


@DataTransforms.register_module()
class RandomFlip:
    """Independent x/y sign flips with probability p
    (parity: point_transform_cpu.py:167-177)."""

    def __init__(self, p=0.5, **kwargs):
        self.p = p

    def __call__(self, data, rng):
        if rng.random() < self.p:
            data["pos"][:, 0] = -data["pos"][:, 0]
        if rng.random() < self.p:
            data["pos"][:, 1] = -data["pos"][:, 1]
        return data


@DataTransforms.register_module()
class RandomJitter:
    """Clipped gaussian positional jitter
    (parity: point_transform_cpu.py:180-189)."""

    def __init__(self, jitter_sigma=0.01, jitter_clip=0.05, **kwargs):
        self.sigma = jitter_sigma
        self.clip = jitter_clip

    def __call__(self, data, rng):
        jitter = np.clip(self.sigma * rng.standard_normal(
            (data["pos"].shape[0], 3)), -self.clip, self.clip)
        data["pos"] = (data["pos"] + jitter).astype(np.float32)
        return data


@DataTransforms.register_module()
class ChromaticDropGPU:
    """Zero ALL colors with probability color_drop
    (parity: point_transformer_gpu.py:374-382; colors live in x[:, :3])."""

    def __init__(self, color_drop=0.2, **kwargs):
        self.color_drop = color_drop

    def __call__(self, data, rng):
        if rng.random() < self.color_drop:
            data["x"][:, :3] = 0
        return data


@DataTransforms.register_module()
class ChromaticPerDropGPU:
    """Per-point color dropout mask
    (parity: point_transformer_gpu.py:385-393)."""

    def __init__(self, color_drop=0.2, **kwargs):
        self.color_drop = color_drop

    def __call__(self, data, rng):
        keep = (rng.random((data["x"].shape[0], 1))
                > self.color_drop).astype(np.float32)
        data["x"][:, :3] *= keep
        return data


@DataTransforms.register_module()
class NumpyChromaticNormalize:
    """Optional mean/std color normalization with /255 auto-scaling
    (parity: point_transform_cpu.py:318-335)."""

    def __init__(self, color_mean=None, color_std=None, **kwargs):
        self.color_mean = (np.asarray(color_mean, np.float32)
                           if color_mean is not None else None)
        self.color_std = (np.asarray(color_std, np.float32)
                          if color_std is not None else None)

    def __call__(self, data, rng):
        x = np.asarray(data["x"], np.float32)
        if x[:, :3].max() > 1:
            x[:, :3] = x[:, :3] / 255.0
        if self.color_mean is not None:
            x[:, :3] = (x[:, :3] - self.color_mean) / self.color_std
        data["x"] = x
        return data


@DataTransforms.register_module()
class PointCloudToTensor(PointsToTensor):
    """Registered alias (parity: point_transformer_gpu.py:19-33)."""


@DataTransforms.register_module()
class PointCloudScaleAndTranslate:
    """Scale (+mirror) then uniform translation — the classification default
    (parity: point_transformer_gpu.py:183-214)."""

    def __init__(self, scale=(2. / 3, 3. / 2), scale_xyz=(True, True, True),
                 anisotropic=True, shift=(0.2, 0.2, 0.2), mirror=(0, 0, 0),
                 **kwargs):
        self.scale_min, self.scale_max = float(scale[0]), float(scale[1])
        self.scale_xyz = scale_xyz
        self.anisotropic = anisotropic
        self.shift = np.asarray(shift, np.float32)
        self.mirror = np.asarray(mirror, np.float32)
        self.use_mirroring = (self.mirror > 0).sum() != 0

    def __call__(self, data, rng):
        scale = rng.uniform(self.scale_min, self.scale_max,
                            size=3 if self.anisotropic else 1).astype(np.float32)
        if self.use_mirroring:
            m = (rng.random(3) > self.mirror).astype(np.float32) * 2 - 1
            scale = scale * m
        for i, s in enumerate(self.scale_xyz):
            if not s:
                scale[i] = 1.0
        translation = (rng.random(3).astype(np.float32) - 0.5) * 2 * self.shift
        data["pos"] = (data["pos"] * scale + translation).astype(np.float32)
        return data


@DataTransforms.register_module()
class PointCloudScaleAndJitter:
    """Scale (+mirror-scaling) then clipped gaussian jitter
    (parity: point_transformer_gpu.py:233-265; mirror semantics follow the
    reference: sign flips drawn per axis where mirror[i]==1)."""

    def __init__(self, scale=(2. / 3, 3. / 2), scale_xyz=(True, True, True),
                 anisotropic=True, jitter_sigma=0.01, jitter_clip=0.05,
                 mirror=(0, 0, 0), **kwargs):
        self.scale_min, self.scale_max = float(scale[0]), float(scale[1])
        self.scale_xyz = scale_xyz
        self.anisotropic = anisotropic
        self.sigma = jitter_sigma
        self.clip = jitter_clip
        self.mirror = np.asarray(mirror, np.float32)

    def __call__(self, data, rng):
        scale = rng.uniform(self.scale_min, self.scale_max,
                            size=3 if self.anisotropic else 1).astype(np.float32)
        m = np.round(rng.random(3)).astype(np.float32) * 2 - 1
        m = m * self.mirror + (1 - self.mirror)
        scale = scale * m
        for i, s in enumerate(self.scale_xyz):
            if not s:
                scale[i] = 1.0
        noise = np.clip(self.sigma * rng.standard_normal(
            (data["pos"].shape[0], 3)), -self.clip, self.clip)
        data["pos"] = (data["pos"] * scale + noise).astype(np.float32)
        return data
