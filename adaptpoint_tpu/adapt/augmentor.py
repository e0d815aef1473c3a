"""AdaptPoint learned augmentor (imitator): Deformation + Mask controllers.

TPU-native re-design of the reference augmentor
(openpoints/models_adaptpoint/generator_component4_15.py:118-718):

- ``AdaptPoint_Augmentor``: FPS M=4 anchors -> SAComponent predicts per-anchor
  9 R/S/T logits + per-point 2-class keep/drop mask -> squashed, range-bounded,
  randomly axis/dropout-masked local transforms -> Gaussian kernel regression
  -> unit-sphere normalization -> point dropout by mask column 0.
- ``SAComponent``: ConvBNReLU embedding; 4 stages of {pointwise expansion,
  PointsetGrouper (FPS/2 + ball query radii [.1,.2,.4,.8], k=24,
  anchor-normalized affine, max-pool)}; U-Net FP decode; Deformation head
  (kNN(24) anchor pooling + anchor self-attention + global max) and Mask head
  (per-point self-attention + global feature -> 2-logit gumbel-softmax,
  tau=0.1, hard straight-through).

Everything is channels-last; the grouped MLPs and attention run on the MXU;
randomness (axis choice, transform dropout, gumbel noise) comes from explicit
rng streams: 'wolf' and 'gumbel'.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .build import ADAPTMODELS
from .common import pointwolf_transform
from ..models.layers.blocks import compute_dtype, torch_linear_init
from ..ops import (ball_group, ball_query, fps_prefix_idx,
                   furthest_point_sample, index_points, knn_point,
                   nested_fps_enabled, three_interpolation)


def gumbel_softmax(rng, logits: jnp.ndarray, tau: float = 1.0,
                   hard: bool = False, axis: int = -1) -> jnp.ndarray:
    """Gumbel-softmax with straight-through hard sampling
    (parity: F.gumbel_softmax(tau=0.1, hard=True),
    generator_component4_15.py:714)."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    y = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y, axis=axis), logits.shape[axis],
                                dtype=y.dtype, axis=axis)
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


class ConvBNReLU(nn.Module):
    """Pointwise Dense + BN + act (parity: ConvBNReLU1D,
    generator_component4_15.py:93-105)."""

    channels: int
    bias: bool = True
    act: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        dt = compute_dtype()
        x = nn.Dense(self.channels, use_bias=self.bias, dtype=dt,
                     kernel_init=torch_linear_init)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, dtype=dt)(x)
        return nn.relu(x) if self.act else x


class PointsetGrouper(nn.Module):
    """FPS downsample + ball-query grouping with anchor-normalized affine and
    max-pool (parity: generator_component4_15.py:368-431)."""

    channels: int
    reduce: int
    kneighbors: int
    radius: float
    # input already in FPS selection order (groupers after the first):
    # FPS == arange (ops.fps_prefix_idx nested-FPS identity)
    input_fps_ordered: bool = False

    @nn.compact
    def __call__(self, xyz, points, training: bool = False):
        # xyz (B,N,3), points (B,N,C) -> new_xyz (B,N/r,3), new (B,N/r,C)
        npoint = xyz.shape[1] // self.reduce
        if self.input_fps_ordered and nested_fps_enabled():
            fps_idx = fps_prefix_idx(xyz.shape[0], npoint)
        else:
            from ..utils.fastpath import shared_first_fps_idx
            fps_idx = shared_first_fps_idx(xyz.shape[0], npoint)
            if fps_idx is None:
                fps_idx = furthest_point_sample(xyz, npoint)
        # fused kernel: centers + center feats + grouped feats in one pass.
        # splits=1/grad_splits=1: bf16 value gathers and gradient scatters
        # (1/3 resp. 1/2 of the MXU work) — ball SELECTION and indices stay
        # exact f32; the controller's grouped features feed a max-pool +
        # learned affine whose whole job is to produce augmentation logits,
        # so activation-grade rounding is immaterial (its attention already
        # runs bf16). ADAPTPOINT_TPU_CONTROLLER_EXACT=1 restores the exact
        # path for golden comparisons.
        import os as _os
        exact = _os.environ.get("ADAPTPOINT_TPU_CONTROLLER_EXACT", "0") == "1"
        alpha = self.param("affine_alpha", nn.initializers.ones,
                           (1, 1, 1, self.channels))
        beta = self.param("affine_beta", nn.initializers.zeros,
                          (1, 1, 1, self.channels))
        if exact:
            new_xyz, new_points, dpfj, _ = ball_group(
                self.radius, self.kneighbors, xyz, fps_idx, points,
                relative=False)
            grouped = dpfj[..., 3:]  # (B,K,np,C) neighbor-first
            # anchor normalization over K (generator_component4_15.py:419-430)
            grouped = (grouped - new_points[:, None, :, :]) * alpha + beta
            return new_xyz, jnp.max(grouped, axis=1)
        # fast path: fused max/min-pooled grouping — the (B,K,M,C) grouped
        # tensor never exists. max_k of the monotone per-channel affine
        # equals affine(fmax) where alpha >= 0 and affine(fmin) where
        # alpha < 0 (identical math, identical gradients through the
        # winning element).
        from ..ops import ball_group_max
        new_xyz, fi, fmax, fmin = ball_group_max(
            self.radius, self.kneighbors, xyz, fps_idx, points,
            splits=1, grad_splits=1)
        a = alpha[0]  # (1,1,C) over (B,M,C)
        pooled = jnp.where(a >= 0, (fmax - fi) * a, (fmin - fi) * a) + beta[0]
        return new_xyz, pooled


class AnchorSelfAttention(nn.Module):
    """QKV self-attention with relative-position embedding added to q/k/v
    (parity: Anchor_selfattention, generator_component4_15.py:434-480)."""

    dim: int
    head_num: int = 4

    @nn.compact
    def __call__(self, x, xyz, training: bool = False):
        b, m, c = x.shape
        dt = compute_dtype()
        head_dim = self.dim // self.head_num
        center = jnp.mean(xyz, axis=1, keepdims=True)
        rel = xyz - center
        pe = nn.Dense(self.dim, kernel_init=torch_linear_init, dtype=dt,
                      name="pos_embedding")(rel)
        pe = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                          epsilon=1e-5, dtype=dt, name="pos_bn")(pe)
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=dt,
                       kernel_init=torch_linear_init, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = q + pe, k + pe, v + pe

        def heads(t):
            return t.reshape(b, m, self.head_num, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = head_dim ** 0.5
        # bf16 attention matmuls (f32 softmax): head_dim is 16, so the f32
        # einsum runs the MXU at 1/12 efficiency — bf16 QK^T/AV is 4x and
        # the controller's attention logits tolerate bf16 rounding (the
        # reference computes in whatever autocast gives it)
        if m >= 512 and m % 8 == 0:
            # flash-style fused attention (ops/pallas/attention.py on TPU):
            # the (M,M) logits tile never leaves VMEM. The previous XLA
            # one-shot path wrote the (B,H,M,M) f32 logits to HBM — pure
            # bandwidth, measured 27.7 ms fwd / 33.8 ms fwd+bwd at the
            # (32,4,2048,16) mask-head training shape; FLOPs there are only
            # ~0.5 GFLOP. Same numerics class (bf16 QK^T/AV, f32 softmax).
            from ..ops import fused_self_attention as _fsa
            # pass q/k/v in the compute dtype: the kernel casts to bf16 for
            # its matmuls anyway, and bf16 inputs skip three (BH,N,d) HBM
            # convert copies each direction (~0.6 ms/step measured)
            qf = q.reshape(b * self.head_num, m, head_dim)
            kf = k.reshape(b * self.head_num, m, head_dim)
            vf = v.reshape(b * self.head_num, m, head_dim)
            out = _fsa(qf, kf, vf, scale).reshape(
                b, self.head_num, m, head_dim)
        else:
            # tiny-M path (anchor attention, M = num_anchors)
            attn = jnp.einsum("bhmd,bhnd->bhmn", q.astype(jnp.bfloat16),
                              k.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32) / scale
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhmn,bhnd->bhmd", attn.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, m, self.dim)
        out = nn.Dense(self.dim, kernel_init=torch_linear_init, dtype=dt,
                       name="res")(out)
        out = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                           epsilon=1e-5, dtype=dt, name="res_bn")(out)
        return out


class FeaturePropagationFuse(nn.Module):
    """3-NN interpolation + skip concat + ConvBNReLU fuse
    (parity: PointNetFeaturePropagation, generator_component4_15.py:330-365)."""

    out_channels: int

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, training: bool = False):
        # interpolate in the controller's compute dtype: the deepest level
        # receives the grouper's f32 pooled output, which blocked the fused
        # bf16 interpolation kernel AND paid a (B,N,3,C) f32 broadcast
        # multiply (~100 MB at the training shape). Downstream consumers
        # (ConvBNReLU fuse, mask/prob Dense) cast to this dtype anyway.
        points2 = points2.astype(compute_dtype())
        interp = three_interpolation(xyz1, xyz2, points2)
        x = jnp.concatenate([points1, interp], axis=-1) if points1 is not None else interp
        return ConvBNReLU(self.out_channels, bias=False)(x, training)


class ProduceFactor(nn.Module):
    """Deformation-controller head -> (B, M, 9) R/S/T logits
    (parity: Producefactor, generator_component4_15.py:534-585)."""

    kneighbors: int = 24
    out_channels: int = 1024

    @nn.compact
    def __call__(self, a_points, sa_x, sa_xyz, training: bool = False):
        m = a_points.shape[1]
        _, idx = knn_point(self.kneighbors, sa_xyz, a_points)  # (B,M,k)
        local = index_points(sa_x, idx)  # (B,M,k,C)
        local = jnp.max(local, axis=2)  # (B,M,C)
        local = local + AnchorSelfAttention(self.out_channels, 4,
                                            name="anchor_attn")(
            local, a_points, training)
        dt = compute_dtype()
        glob = nn.Dense(self.out_channels, use_bias=False, dtype=dt,
                        kernel_init=torch_linear_init, name="global_conv")(a_points)
        glob = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                            epsilon=1e-5, dtype=dt, name="global_bn")(glob)
        glob = jnp.max(glob, axis=1, keepdims=True)  # (B,1,C)
        glob = glob.astype(local.dtype) if local.dtype != glob.dtype else glob
        feat = jnp.concatenate([local, jnp.broadcast_to(glob, local.shape)], -1)
        prob = nn.Dense(9, use_bias=False, dtype=dt,
                        kernel_init=torch_linear_init, name="prob_head")(feat)
        prob = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                            epsilon=1e-5, dtype=dt, name="prob_bn")(prob)
        # transform math (rotations/scales in pointwolf) must be f32
        return prob.astype(jnp.float32)


class SAComponent(nn.Module):
    """Controller backbone: encoder stages + U-Net decode + two heads
    (parity: SAComponent, generator_component4_15.py:588-718)."""

    in_channel: int = 3
    embed_dim: int = 64
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    radii: Sequence[float] = (0.1, 0.2, 0.4, 0.8)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, a_index, rng_gumbel, training: bool = False):
        # x (B,N,3); a_index (B,M) anchor indices
        n = x.shape[1]
        a_points = index_points(x, a_index)
        xyz = x
        feat = ConvBNReLU(self.embed_dim, bias=False, name="embedding")(x, training)

        channels = [self.embed_dim]
        xyz_list, x_list = [xyz], [feat]
        last = self.embed_dim
        for i, exp in enumerate(self.dim_expansion):
            out_ch = last * exp
            feat = ConvBNReLU(out_ch, bias=False, name=f"pre{i}")(feat, training)
            # SELECTIVE remat: keeping all four grouped (B,K,M,3+C)
            # activations live for the backward OOMs at B=128 N=2048
            # (16.89G needed vs 15.75G hbm, measured), but deeper stages
            # are affordable — remat only stages whose *stage-input* B*N_i
            # meets the threshold. Default 132k: at B=128 N=2048 only
            # stage0 remats (754 ms gan_step vs 783 with stages 0-1 and
            # OOM with none); at the B=32 protocol nothing remats.
            # ADAPTPOINT_TPU_REMAT_THRESHOLD tunes the cutoff.
            import os as _os
            thresh = int(_os.environ.get("ADAPTPOINT_TPU_REMAT_THRESHOLD",
                                         132 * 1024))
            big = x.shape[0] * xyz.shape[1] >= thresh
            cls_grouper = (nn.remat(PointsetGrouper, static_argnums=(3,))
                           if big else PointsetGrouper)
            grouper = cls_grouper(out_ch, self.reducers[i],
                                  self.k_neighbors[i], self.radii[i],
                                  input_fps_ordered=i > 0,
                                  name=f"grouper{i}")
            xyz, feat = grouper(xyz, feat, training)
            xyz_list.append(xyz)
            x_list.append(feat)
            channels.append(out_ch)
            last = out_ch

        # deformation head reads the deepest stage (pre-decode)
        prob = ProduceFactor(24, last, name="head")(a_points, feat, xyz, training)

        # U-Net decode updating all levels (generator_component4_15.py:687-689)
        stages = len(self.dim_expansion)
        for i in range(stages):
            x_list[-(i + 2)] = FeaturePropagationFuse(
                channels[-(i + 2)], name=f"fp{i}")(
                xyz_list[-(i + 2)], xyz_list[-(i + 1)],
                x_list[-(i + 2)], x_list[-(i + 1)], training)

        # mask controller (generator_component4_15.py:704-714)
        mask_local = AnchorSelfAttention(self.embed_dim, 4, name="mask_attn")(
            x_list[0], xyz_list[0], training)
        mask_local = mask_local + x_list[0].astype(mask_local.dtype)
        dt = compute_dtype()
        mask_local = nn.Dense(3, use_bias=False, dtype=dt,
                              kernel_init=torch_linear_init,
                              name="mask_local")(mask_local)
        mask_local = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                  epsilon=1e-5, dtype=dt,
                                  name="mask_local_bn")(mask_local)
        mask_global = nn.Dense(3, use_bias=False, dtype=dt,
                               kernel_init=torch_linear_init,
                               name="mask_global")(x_list[-1])
        mask_global = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                                   epsilon=1e-5, dtype=dt,
                                   name="mask_global_bn")(mask_global)
        mask_global = jnp.max(mask_global, axis=1, keepdims=True)  # (B,1,3)
        masking = jnp.concatenate(
            [mask_local, jnp.broadcast_to(mask_global, mask_local.shape)], -1)
        masking = nn.Dense(2, use_bias=False, dtype=dt,
                           kernel_init=torch_linear_init,
                           name="mask_fuse")(masking)
        masking = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                               epsilon=1e-5, dtype=dt,
                               name="mask_fuse_bn")(masking)
        # gumbel sampling at tau=0.1 needs f32 logits (bf16 /0.1 saturates
        # the softmax into hard 0/1 too early)
        masking = gumbel_softmax(rng_gumbel, masking.astype(jnp.float32),
                                 tau=0.1, hard=True)
        return prob, masking


@ADAPTMODELS.register_module()
class AdaptPoint_Augmentor(nn.Module):
    """Imitator (parity: AdaptPoint_Augmentor,
    generator_component4_15.py:118-181). rngs: 'wolf' (axis/dropout/kernel
    projection), 'gumbel' (mask sampling)."""

    w_num_anchor: int = 4
    w_sigma: float = 0.5
    w_R_range: float = 10.0
    w_S_range: float = 3.0
    w_T_range: float = 0.25

    @nn.compact
    def __call__(self, xyz, training: bool = True):
        rng_wolf = self.make_rng("wolf")
        rng_gumbel = self.make_rng("gumbel")
        from ..utils.fastpath import shared_first_fps_idx
        fps_idx = shared_first_fps_idx(xyz.shape[0], self.w_num_anchor)
        if fps_idx is None:
            fps_idx = furthest_point_sample(xyz, self.w_num_anchor)
        anchors = index_points(xyz, fps_idx)
        probs, masking = SAComponent(name="predict_prob_layer")(
            xyz, fps_idx, rng_gumbel, training)
        xyz_new = pointwolf_transform(
            rng_wolf, xyz, anchors, sigma=self.w_sigma,
            r_range=self.w_R_range, s_range=self.w_S_range,
            t_range=self.w_T_range, probs=probs)
        xyz_new = xyz_new * masking[:, :, 0:1]  # learned point dropout
        return xyz, xyz_new
