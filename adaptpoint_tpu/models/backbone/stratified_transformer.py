"""Stratified Transformer, TPU-native dense formulation.

Parity: openpoints/models/backbone/Stratified_transformer.py:13-558
(grid_sample windowing, get_indice_pairs stratified key pairs, WindowAttention
with quantized relative-position bias tables, SwinTransformerBlock,
BasicLayer with shifted windows, TransitionDown, Upsample, KPConv stem,
StratifiedEncoder/StratifiedDecoder).

TPU-first redesign: the reference builds variable-length sparse index pairs
(index_0/index_1) and runs custom CUDA scatter-attention kernels
(pointops.attention_step1/2). That shape-dynamic formulation cannot compile
under XLA. Here every block instead uses STATIC query-centric attention:

  * window coords are hashed into a fixed number of buckets (B, W, K); all
    points of one window share a bucket, so in-window pairs are preserved
    exactly up to bucket capacity K (overflow keys are masked out, matching
    the reference's max_window_counts=64 truncation in spirit);
  * each query gathers its bucket's K fine keys plus K2 stratified keys —
    FPS-downsampled points from its 2x-size coarse window (the stratified
    pairs of get_indice_pairs, lines 27-44) — and runs one masked softmax
    over the fused key set: exact same attention semantics, dense shapes;
  * shifted windows alternate per block (lines 325-343);
  * the quantized relative-position bias (rel_query/rel_key/rel_value
    tables, lines 150-227) is contracted as einsum + take_along_axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import torch_linear_init
from ...ops import (ball_query, furthest_point_sample, index_points,
                    knn_point, three_interpolation)

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _window_coords(xyz, window_size: float, shifted: bool):
    """Integer window coords per point (parity: grid_sample/get_indice_pairs
    window_coord, lines 33-36 — odd blocks shift by ws/2)."""
    mn = jnp.min(xyz, axis=1, keepdims=True)
    shift = 0.5 * window_size if shifted else 0.0
    return jnp.floor((xyz - mn + shift) / window_size).astype(jnp.int32)


def _hash_wc(wc, num_buckets: int):
    h = (wc[..., 0] * 73856093) ^ (wc[..., 1] * 19349663) \
        ^ (wc[..., 2] * 83492791)
    return jnp.abs(h) % num_buckets


def _bucketize(wid, member_mask, num_buckets: int, capacity: int):
    """Scatter points into per-window buckets.

    wid (B,N) int32 bucket ids; member_mask (B,N) bool (False = point not a
    member, e.g. non-downsampled points for the stratified key set).
    Returns p2v (B, num_buckets, capacity) point indices (N = empty slot
    sentinel).
    """
    b, n = wid.shape
    wid = jnp.where(member_mask, wid, num_buckets)  # dump non-members
    order = jnp.argsort(wid, axis=1, stable=True)
    swid = jnp.take_along_axis(wid, order, axis=1)
    pos = jnp.arange(n)[None, :]
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool), swid[:, 1:] != swid[:, :-1]], axis=1)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0), axis=1)
    rank = pos - run_start
    # overflow (rank >= capacity) and non-members go to a trash row
    row = jnp.where((rank < capacity) & (swid < num_buckets),
                    swid, num_buckets)
    p2v = jnp.full((b, num_buckets + 1, capacity), n, jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    p2v = p2v.at[bidx, row, jnp.minimum(rank, capacity - 1)].set(
        order.astype(jnp.int32), mode="drop")
    return p2v[:, :num_buckets]


class WindowAttention(nn.Module):
    """Masked query-centric window attention with quantized relative-position
    bias (parity: Stratified_transformer.py:120-232)."""

    dim: int
    num_heads: int
    window_size: float
    quant_size: float
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, feats, xyz, key_idx, key_mask, training: bool = False):
        # feats (B,N,C), xyz (B,N,3), key_idx (B,N,Kt), key_mask (B,N,Kt)
        b, n, c = feats.shape
        h = self.num_heads
        hd = c // h
        scale = hd ** -0.5
        L = int((2 * self.window_size + 1e-4) // self.quant_size)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=_trunc02,
                       name="qkv")(feats)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        safe_idx = jnp.minimum(key_idx, n - 1)
        k_g = index_points(k, safe_idx).reshape(b, n, -1, h, hd)
        v_g = index_points(v, safe_idx).reshape(b, n, -1, h, hd)
        q = q.reshape(b, n, h, hd) * scale
        attn = jnp.einsum("bnhd,bnkhd->bnkh", q, k_g)

        # quantized relative position (lines 191-198)
        pos_k = index_points(xyz, safe_idx)           # (B,N,Kt,3)
        rel = xyz[:, :, None, :] - pos_k
        rel = jnp.round(rel * 100000) / 100000
        rel_idx = jnp.clip(
            ((rel + 2 * self.window_size - 1e-4) // self.quant_size)
            .astype(jnp.int32), 0, 2 * L - 1)          # (B,N,Kt,3)

        def table(name):
            return self.param(name, _trunc02, (2 * L, h, hd, 3))

        kt_shape = attn.shape[2]
        if self.rel_query:
            # qt[b,n,l,h,a] = q . Tq[l,:,a]; bias = sum_a qt at rel_idx
            qt = jnp.einsum("bnhd,lhda->bnlha", q, table("rel_query_table"))
            for a in range(3):
                idx_a = jnp.broadcast_to(rel_idx[..., a][..., None],
                                         (b, n, kt_shape, h))
                attn = attn + jnp.take_along_axis(qt[..., a], idx_a, axis=2)
        if self.rel_key:
            tk = table("rel_key_table")
            for a in range(3):
                tk_a = jnp.take(tk[..., a], rel_idx[..., a],
                                axis=0)                 # (B,N,Kt,h,hd)
                attn = attn + jnp.einsum("bnkhd,bnkhd->bnkh", k_g, tk_a)

        attn = jnp.where(key_mask[..., None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=2)
        attn = jnp.where(key_mask[..., None], attn, 0.0)
        out = jnp.einsum("bnkh,bnkhd->bnhd", attn, v_g)
        if self.rel_value:
            tv = table("rel_value_table")
            for a in range(3):
                tv_a = jnp.take(tv[..., a], rel_idx[..., a], axis=0)
                out = out + jnp.einsum("bnkh,bnkhd->bnhd", attn, tv_a)
        out = out.reshape(b, n, c)
        return nn.Dense(c, kernel_init=_trunc02, name="proj")(out)


class SwinBlock(nn.Module):
    """Pre-norm attention + MLP (parity: lines 235-263)."""

    dim: int
    num_heads: int
    window_size: float
    quant_size: float
    mlp_ratio: float = 4.0
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True

    @nn.compact
    def __call__(self, feats, xyz, key_idx, key_mask, training: bool = False):
        h = nn.LayerNorm(name="norm1")(feats)
        h = WindowAttention(self.dim, self.num_heads, self.window_size,
                            self.quant_size, self.rel_query, self.rel_key,
                            self.rel_value, name="attn")(
            h, xyz, key_idx, key_mask, training)
        feats = feats + h
        h = nn.LayerNorm(name="norm2")(feats)
        h = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=_trunc02,
                     name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, kernel_init=_trunc02, name="mlp2")(h)
        return feats + h


def _stratified_keys(xyz, window_size: float, shifted: bool, ds_idx,
                     num_buckets: int, capacity: int, ds_capacity: int):
    """Build per-query fused key sets: K in-window keys + K2 stratified
    (downsampled, same 2x coarse window, different fine window) keys
    (parity: get_indice_pairs, lines 13-45)."""
    b, n, _ = xyz.shape
    wc = _window_coords(xyz, window_size, shifted)
    wid = _hash_wc(wc, num_buckets)
    p2v = _bucketize(wid, jnp.ones((b, n), bool), num_buckets, capacity)
    fine_keys = index_points(p2v.astype(jnp.float32),
                             wid).astype(jnp.int32)     # (B,N,K)

    cwc = _window_coords(xyz, 2 * window_size, shifted)
    cwid = _hash_wc(cwc, num_buckets)
    is_ds = jnp.zeros((b, n), bool)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], ds_idx.shape)
    is_ds = is_ds.at[bidx, ds_idx].set(True)
    p2v_ds = _bucketize(cwid, is_ds, num_buckets, ds_capacity)
    strat_keys = index_points(p2v_ds.astype(jnp.float32),
                              cwid).astype(jnp.int32)   # (B,N,K2)

    key_idx = jnp.concatenate([fine_keys, strat_keys], axis=-1)
    valid = key_idx < n
    safe = jnp.minimum(key_idx, n - 1)
    wc_k = index_points(wc.astype(jnp.float32), safe).astype(jnp.int32)
    cwc_k = index_points(cwc.astype(jnp.float32), safe).astype(jnp.int32)
    same_fine = (wc_k == wc[:, :, None, :]).all(-1)
    same_coarse = (cwc_k == cwc[:, :, None, :]).all(-1)
    kf = fine_keys.shape[-1]
    mask_fine = valid[..., :kf] & same_fine[..., :kf]
    mask_strat = valid[..., kf:] & same_coarse[..., kf:] \
        & ~same_fine[..., kf:]
    return key_idx, jnp.concatenate([mask_fine, mask_strat], axis=-1)


class TransitionDown(nn.Module):
    """FPS + kNN grouped linear + maxpool (parity: lines 93-118)."""

    out_channels: int
    ratio: float = 0.25
    k: int = 16

    @nn.compact
    def __call__(self, feats, xyz, training: bool = False):
        m = max(int(xyz.shape[1] * self.ratio), 1)
        idx = furthest_point_sample(xyz, m)
        n_xyz = index_points(xyz, idx)
        _, nidx = knn_point(min(self.k, xyz.shape[1]), xyz, n_xyz)
        g = index_points(feats, nidx)                   # (B,M,k,C)
        g = nn.LayerNorm(name="norm")(g)
        g = nn.Dense(self.out_channels, use_bias=False, kernel_init=_trunc02,
                     name="linear")(g)
        return jnp.max(g, axis=2), n_xyz


def _fib_kernel_points(num: int, radius: float) -> np.ndarray:
    """Deterministic kernel-point disposition: center + Fibonacci sphere
    shell. Stands in for torch-points3d's optimized kernel files (the
    reference KPConvLayer loads pre-optimized dispositions); same capability,
    documented deviation."""
    pts = [np.zeros(3)]
    m = num - 1
    ga = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(m):
        z = 1 - 2 * (i + 0.5) / m
        r = np.sqrt(max(1 - z * z, 0.0))
        th = ga * i
        pts.append(radius * np.array([r * np.cos(th), r * np.sin(th), z]))
    return np.stack(pts).astype(np.float32)


class KPConv(nn.Module):
    """Rigid kernel-point convolution on a ball neighborhood
    (parity: KPConvLayer used by Stratified_transformer.py:367-418;
    linear influence relu(1 - d/sigma))."""

    out_channels: int
    point_influence: float
    num_kernel_points: int = 15
    radius_mult: float = 2.5
    nsample: int = 16

    @nn.compact
    def __call__(self, feats, xyz, training: bool = False):
        b, n, cin = feats.shape
        radius = self.radius_mult * self.point_influence
        idx = ball_query(radius, self.nsample, xyz, xyz)
        rel = index_points(xyz, idx) - xyz[:, :, None, :]  # (B,N,S,3)
        fj = index_points(feats, idx)                      # (B,N,S,Cin)
        kp = jnp.asarray(_fib_kernel_points(self.num_kernel_points,
                                            self.point_influence))
        d = jnp.linalg.norm(rel[:, :, :, None, :] - kp[None, None, None],
                            axis=-1)                       # (B,N,S,Kp)
        infl = jax.nn.relu(1.0 - d / self.point_influence)
        w = self.param("kernel_weights", _trunc02,
                       (self.num_kernel_points, cin, self.out_channels))
        # sum_j sum_k infl[j,k] * f_j @ W_k
        agg = jnp.einsum("bnsk,bnsc->bnkc", infl, fj)
        return jnp.einsum("bnkc,kco->bno", agg, w)


class KPConvSimpleBlock(nn.Module):
    """parity: lines 367-383."""

    out_channels: int
    point_influence: float

    @nn.compact
    def __call__(self, feats, xyz, training: bool = False):
        h = KPConv(self.out_channels, self.point_influence,
                   name="kpconv")(feats, xyz, training)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.98,
                         epsilon=1e-5, name="bn")(h)
        return nn.leaky_relu(h, negative_slope=0.2)


class KPConvResBlock(nn.Module):
    """parity: lines 385-418."""

    out_channels: int
    point_influence: float

    @nn.compact
    def __call__(self, feats, xyz, training: bool = False):
        d2 = self.out_channels // 4

        def unary(x, c, name):
            x = nn.Dense(c, use_bias=False, kernel_init=_trunc02,
                         name=f"{name}_lin")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.98,
                             epsilon=1e-5, name=f"{name}_bn")(x)
            return nn.leaky_relu(x, negative_slope=0.2)

        h = unary(feats, d2, "unary1")
        h = KPConv(d2, self.point_influence, name="kpconv")(h, xyz, training)
        h = unary(h, self.out_channels, "unary2")
        if feats.shape[-1] != self.out_channels:
            sc = nn.Dense(self.out_channels, use_bias=False,
                          kernel_init=_trunc02, name="shortcut_lin")(feats)
            sc = nn.BatchNorm(use_running_average=not training, momentum=0.98,
                              epsilon=1e-5, name="shortcut_bn")(sc)
        else:
            sc = feats
        return h + sc


class BasicLayer(nn.Module):
    """Swin blocks with alternating shifted windows + stratified keys
    (parity: lines 266-348)."""

    depth: int
    dim: int
    num_heads: int
    window_size: float
    quant_size: float
    downsample_scale: int = 4
    num_buckets: int = 64
    capacity: int = 48
    ds_capacity: int = 16
    out_channels: Optional[int] = None
    ratio: float = 0.25
    k: int = 16

    @nn.compact
    def __call__(self, feats, xyz, training: bool = False):
        n = xyz.shape[1]
        m = max(n // self.downsample_scale, 1)
        ds_idx = furthest_point_sample(xyz, m)
        for i in range(self.depth):
            key_idx, key_mask = _stratified_keys(
                xyz, self.window_size, shifted=(i % 2 == 1), ds_idx=ds_idx,
                num_buckets=min(self.num_buckets, n),
                capacity=min(self.capacity, n),
                ds_capacity=min(self.ds_capacity, m))
            feats = SwinBlock(self.dim, self.num_heads, self.window_size,
                              self.quant_size, name=f"blk{i}")(
                feats, xyz, key_idx, key_mask, training)
        if self.out_channels is not None:
            down_f, down_xyz = TransitionDown(
                self.out_channels, self.ratio, self.k,
                name="downsample")(feats, xyz, training)
            return feats, xyz, down_f, down_xyz
        return feats, xyz, None, None


@MODELS.register_module()
class StratifiedEncoder(nn.Module):
    """parity: lines 421-533 (KPConv stem + 4 stratified stages)."""

    in_channels: int = 4
    channels: Sequence[int] = (48, 96, 192, 384)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: float = 0.16
    quant_size: float = 0.01
    grid_size: float = 0.04
    sigma: float = 1.0
    ratio: float = 0.25
    k: int = 16
    num_buckets: int = 64
    capacity: int = 48
    ds_capacity: int = 16
    stem_transformer: bool = False

    @property
    def out_channels(self) -> int:
        return self.channels[-1]

    @property
    def channel_list(self):
        return list(self.channels)

    @nn.compact
    def _run(self, xyz, feats, training: bool):
        if feats is None:
            feats = xyz
        n_layers = len(self.channels)
        window_sizes = [self.window_size * (2 ** i) for i in range(n_layers)]
        quant_sizes = [self.quant_size * (2 ** i) for i in range(n_layers)]
        pi = self.grid_size * self.sigma
        feats = KPConvSimpleBlock(self.channels[0], pi,
                                  name="stem0")(feats, xyz, training)
        feats_stack, xyz_stack = [], []
        if not self.stem_transformer:
            feats = KPConvResBlock(self.channels[0], pi,
                                   name="stem1")(feats, xyz, training)
            feats_stack.append(feats)
            xyz_stack.append(xyz)
            feats, xyz = TransitionDown(self.channels[1], self.ratio, self.k,
                                        name="stem_down")(feats, xyz, training)
            start = 1
        else:
            start = 0
        for i in range(start, n_layers):
            out_ch = self.channels[i + 1] if i < n_layers - 1 else None
            feats, xyz, down_f, down_xyz = BasicLayer(
                self.depths[i], self.channels[i], self.num_heads[i],
                window_sizes[i], quant_sizes[i],
                num_buckets=self.num_buckets, capacity=self.capacity,
                ds_capacity=self.ds_capacity, out_channels=out_ch,
                ratio=self.ratio, k=self.k, name=f"layer{i}")(
                feats, xyz, training)
            feats_stack.append(feats)
            xyz_stack.append(xyz)
            if down_f is not None:
                feats, xyz = down_f, down_xyz
        return feats_stack, xyz_stack

    def __call__(self, xyz, feats=None, training: bool = False):
        return self._run(xyz, feats, training)

    def forward_cls_feat(self, xyz, feats=None, training: bool = False):
        fs, _ = self._run(xyz, feats, training)
        return jnp.max(fs[-1], axis=1)

    def forward_seg_feat(self, xyz, feats=None, training: bool = False):
        fs, xs = self._run(xyz, feats, training)
        return xs, fs


@MODELS.register_module()
class StratifiedDecoder(nn.Module):
    """Top-down 3-NN interpolation decoder (parity: lines 351-364, 535-558)."""

    channels: Sequence[int] = (48, 96, 192, 384)

    @property
    def out_channels(self) -> int:
        return self.channels[0]

    @nn.compact
    def __call__(self, xyz_stack, feats_stack, training: bool = False):
        feats = feats_stack[-1]
        xyz = xyz_stack[-1]
        n_layers = len(feats_stack)
        for j, i in enumerate(range(n_layers - 2, -1, -1)):
            skip_f, skip_x = feats_stack[i], xyz_stack[i]
            up = three_interpolation(
                skip_x, xyz,
                nn.Dense(skip_f.shape[-1], kernel_init=_trunc02,
                         name=f"up{j}_lin2")(nn.LayerNorm(
                             name=f"up{j}_norm2")(feats)))
            skip = nn.Dense(skip_f.shape[-1], kernel_init=_trunc02,
                            name=f"up{j}_lin1")(nn.LayerNorm(
                                name=f"up{j}_norm1")(skip_f))
            feats = skip + up
            xyz = skip_x
        return feats


@MODELS.register_module()
class StratifiedTransformer(nn.Module):
    """Encoder + decoder + seg head convenience wrapper."""

    encoder_args: Optional[dict] = None
    decoder_args: Optional[dict] = None
    num_classes: int = 13

    @nn.compact
    def __call__(self, xyz, feats=None, training: bool = False):
        enc = StratifiedEncoder(**(self.encoder_args or {}), name="encoder")
        fs_x, fs_f = enc.forward_seg_feat(xyz, feats, training)
        dec_args = dict(self.decoder_args or {})
        dec_args.setdefault("channels", enc.channels)
        h = StratifiedDecoder(**dec_args, name="decoder")(fs_x, fs_f, training)
        h = nn.Dense(h.shape[-1], kernel_init=_trunc02, name="head1")(h)
        h = nn.gelu(h)
        return nn.Dense(self.num_classes, kernel_init=_trunc02,
                        name="head2")(h)

    def forward_seg_feat(self, xyz, feats=None, training: bool = False):
        return xyz, self(xyz, feats, training)
