"""PointNeXt encoder/decoders, TPU-native (flax linen, channels-last).

Behavioral parity with the reference PointNeXt
(openpoints/models/backbone/pointnext.py:81-497): SA blocks with FPS + ball
query + grouped shared-MLP + max-pool + optional residual, InvResMLP depth
blocks, FP decoders, and per-stage radius/nsample scaling (_to_full_list,
pointnext.py:389-407). All grouped MLPs are channels-last Dense so the
(B*M*K, C) x (C, C') contraction rides the MXU; FPS dispatches to the Pallas
kernel on TPU.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..build import MODELS
from ..layers.blocks import CHANNEL_MAP, ConvBlock, create_act, torch_linear_init
from ..layers.group_layers import create_grouper, get_aggregation_features
from ...ops import (ball_group, eval_group_dtype, fps_prefix_idx, pad_query_idx,
                    furthest_point_sample, index_points, nested_fps_enabled,
                    three_interpolation)


def _aggregation_features_kfirst(p, dpfj, fi, feature_type):
    """get_aggregation_features for the fused (B,K,M,3+C) neighbor-first
    layout (parity: group.py:323-335; pool over axis 1 downstream). The fused
    kernel already emits [dp || fj], so dp_fj is a no-op."""
    if feature_type == "dp_fj":
        return dpfj
    dp, fj = dpfj[..., :3], dpfj[..., 3:]
    if feature_type in ("dp_fj_df", "dp_fi_df"):
        df = fj - fi[:, None, :, :]
        return jnp.concatenate([dpfj, df], axis=-1)
    if feature_type == "pi_dp_fj_df":
        df = fj - fi[:, None, :, :]
        pi = jnp.broadcast_to(p[:, None, :, :], dp.shape)
        return jnp.concatenate([pi, dpfj, df], axis=-1)
    if feature_type == "dp_df":
        df = fj - fi[:, None, :, :]
        return jnp.concatenate([dp, df], axis=-1)
    raise ValueError(feature_type)


def _pool(reduction: str):
    reduction = "mean" if reduction.lower() == "avg" else reduction.lower()
    if reduction == "max":
        return lambda x: jnp.max(x, axis=2)
    if reduction == "mean":
        return lambda x: jnp.mean(x, axis=2)
    if reduction == "sum":
        return lambda x: jnp.sum(x, axis=2)
    raise ValueError(reduction)


class LocalAggregation(nn.Module):
    """Grouped shared-MLP over each point's neighborhood, then pool.

    (parity: pointnext.py:27-78 LocalAggregation)
    channels: [in, ...]; channels[0] is remapped by CHANNEL_MAP[feature_type].
    """

    channels: Sequence[int]
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    group_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    feature_type: str = "dp_fj"
    reduction: str = "max"
    last_act: bool = True

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        group_args = dict(self.group_args or {})
        n = len(self.channels) - 1
        if group_args.get("NAME", "ballquery") == "ballquery":
            # fused path: query == support, identity query indices
            qidx = jnp.broadcast_to(
                jnp.arange(p.shape[1], dtype=jnp.int32)[None], p.shape[:2])
            _, fi, dpfj, _ = ball_group(
                float(group_args.get("radius", 0.1)),
                int(group_args.get("nsample", 16)), p, qidx, f,
                relative=group_args.get("relative_xyz", True),
                normalize_dp=group_args.get("normalize_dp", False),
                out_dtype=eval_group_dtype(training))
            x = _aggregation_features_kfirst(p, dpfj, fi, self.feature_type)
            pool_axis = 1
        else:
            grouper = create_grouper(group_args)
            dp, fj = grouper(p, p, f)
            x = get_aggregation_features(p, dp, f, fj, self.feature_type)
            pool_axis = 2
        for i in range(n):
            act = None if (i == n - 1 and not self.last_act) else self.act_args
            x = ConvBlock(self.channels[i + 1], norm_args=self.norm_args,
                          act_args=act, order=order)(x, training)
        red = "mean" if self.reduction.lower() == "avg" else self.reduction.lower()
        fn = {"max": jnp.max, "mean": jnp.mean, "sum": jnp.sum}[red]
        return fn(x, axis=pool_axis)


class SetAbstraction(nn.Module):
    """SA block: FPS downsample + grouped shared-MLP + max-pool (+ residual).

    (parity: pointnext.py:81-170 SetAbstraction)
    """

    in_channels: int
    out_channels: int
    layers: int = 1
    stride: int = 1
    group_args: Optional[dict] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    sampler: str = "fps"
    feature_type: str = "dp_fj"
    use_res: bool = False
    is_head: bool = False
    # input already in FPS selection order (set by the encoder for every
    # stage after the first subsample) -> FPS == arange (ops.fps_prefix_idx)
    input_fps_ordered: bool = False

    def _sample_idx(self, p, npoint: int):
        if (self.input_fps_ordered and self.sampler == "fps"
                and nested_fps_enabled()):
            return fps_prefix_idx(p.shape[0], npoint)
        if self.sampler == "fps" and nested_fps_enabled():
            # a caller-scoped precomputed FPS of this cloud (prefix
            # property; utils.fastpath.shared_first_fps) serves the first
            # subsampling stage without relaunching the kernel
            from ...utils.fastpath import shared_first_fps_idx
            shared = shared_first_fps_idx(p.shape[0], npoint)
            if shared is not None:
                return shared
        return furthest_point_sample(p, npoint)

    def _fused_trainbn_ok(self, training: bool, order: str) -> bool:
        """Gate for the fused TRAIN-mode (batch-stats BN) SA kernel
        (ops/pallas/satrainbn.py): training forwards of the standard
        2-conv bn+relu dp_fj stage, opted in via utils.fastpath
        ``fused_train_bn`` (env ADAPTPOINT_TPU_TRAIN_FUSED=1). Same f32
        numerics class as the unfused path — exact 3-split gathers/
        scatters, f32 conv matmuls, batch statistics over all (B,M,K)
        slots including the pad-with-first duplicates."""
        import os
        from ...utils.fastpath import fused_trainbn_active
        if not training or not fused_trainbn_active():
            return False
        if self.layers != 2 or self.feature_type != "dp_fj":
            return False
        if order != "conv-norm-act":
            return False
        if not (self.norm_args or {}).get("norm", "").startswith("bn"):
            return False
        if (self.act_args or {}).get("act") != "relu":
            return False
        if os.environ.get("ADAPTPOINT_TPU_KERNELS", "auto").lower() == "xla":
            return False
        if os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1":
            return True
        return jax.default_backend() == "tpu"

    def _fused_trainbn_stage(self, p, f, group_args, channels, use_res,
                             order, training):
        """Train SA stage through the fused train-BN Pallas kernel family.
        Declares the SAME parameter tree as the unfused path (skipconv +
        two ConvBlocks via the fused_sa handshake), runs gather + conv +
        batch-stats BN + relu + conv + BN + max entirely in VMEM, then
        re-enters each ConvBlock to record the kernel-computed batch
        statistics into its BatchNorm running averages."""
        from ...ops.pallas.satrainbn import sa_trainbn_pallas

        npoint = p.shape[1] // self.stride
        idx = self._sample_idx(p, npoint)

        skipconv = None
        if use_res and self.in_channels != channels[-1]:
            skipconv = nn.Dense(channels[-1], use_bias=True,
                                kernel_init=torch_linear_init,
                                name="skipconv")
        cbs, reads = [], []
        cin = channels[0]
        for i in range(2):
            act = None if (i == 1 and use_res) else self.act_args
            cb = ConvBlock(channels[i + 1], norm_args=self.norm_args,
                           act_args=act, order=order)
            reads.append(cb(jnp.zeros((1, 1, 1, cin), jnp.float32),
                            training, fused_sa="declare"))
            cbs.append(cb)
            cin = channels[i + 1]
        (w1, g1, b1), (w2, g2, b2) = reads

        new_p, fi, out, mu1, var1, mu2, var2 = sa_trainbn_pallas(
            float(group_args.get("radius", 0.1)),
            int(group_args.get("nsample", 16)), p, idx, f,
            w1, g1, b1, w2, g2, b2,
            relative=group_args.get("relative_xyz", True),
            normalize_dp=group_args.get("normalize_dp", False))
        cbs[0](jnp.zeros((1, 1, 1, channels[0]), jnp.float32), training,
               fused_sa=(mu1, var1))
        cbs[1](jnp.zeros((1, 1, 1, channels[1]), jnp.float32), training,
               fused_sa=(mu2, var2))

        act_fn = create_act(self.act_args)
        if use_res:
            identity = skipconv(fi) if skipconv is not None else fi
            out = act_fn(out + identity)
        else:
            # relu(max(x)) == max(relu(x)): the unfused path activates
            # pre-pool; relu is monotone so post-pool is identical
            out = act_fn(out)
        return new_p, out

    def _fused_eval_ok(self, training: bool, order: str,
                       n_support: int = 0) -> bool:
        """Gate for the fused eval SA kernels (ops/pallas/saeval.py):
        eval-mode (BN running stats) forwards with exactly two convs in the
        standard bn+relu conv-norm-act form and dp_fj features, on a TPU
        lowering (or the CPU interpreter test hook). Callers opt in via
        utils.fastpath.fused_eval (forward-only kernel) or
        utils.fastpath.fused_train (custom-VJP kernel — the differentiated
        fake-cloud feedback pass)."""
        import os
        from ...utils.fastpath import fused_eval_active, fused_train_active
        if training or not (fused_eval_active() or fused_train_active()):
            return False
        if n_support > 4096:
            # scene-scale support sets (S3DIS 16x15000) crash the Mosaic
            # compile helper (observed 2026-08-20 at N=15000; goldens
            # cover N<=2048) — such stages take the ball_group route
            return False
        if self.layers != 2 or self.feature_type != "dp_fj":
            return False
        if order != "conv-norm-act":
            return False
        if not (self.norm_args or {}).get("norm", "").startswith("bn"):
            return False
        if (self.act_args or {}).get("act") != "relu":
            return False
        if os.environ.get("ADAPTPOINT_TPU_KERNELS", "auto").lower() == "xla":
            return False
        if os.environ.get("ADAPTPOINT_TPU_PALLAS_INTERPRET", "0") == "1":
            return True
        return jax.default_backend() == "tpu"

    def _fused_eval_stage(self, p, f, group_args, channels, use_res, order,
                          training):
        """Eval SA stage through the fused Pallas kernel. Declares the SAME
        parameter tree as the unfused path (skipconv + two ConvBlocks, via
        1-row dummy applications that XLA dead-code-eliminates), folds each
        eval-mode BatchNorm into its conv (y = W x * s + (beta - mu * s),
        s = gamma / sqrt(var + eps)), and runs gather+MLP+max in VMEM.
        Under fused_train (the differentiated fake-cloud feedback pass) the
        custom-VJP variant runs instead — same forward, recompute-in-VMEM
        backward."""
        from ...ops.pallas.saeval import sa_eval_pallas, sa_train_pallas
        from ...utils.fastpath import frozen_params_active, fused_train_active
        if fused_train_active():
            # frozen_params (the GAN fake pass feeds a FROZEN classifier)
            # statically drops the weight-cotangent matmuls from the
            # custom-VJP backward — JAX cannot DCE custom_vjp outputs
            import functools as _ft
            kernel_fn = _ft.partial(sa_train_pallas,
                                    param_grads=not frozen_params_active())
        else:
            kernel_fn = sa_eval_pallas

        npoint = p.shape[1] // self.stride
        idx = self._sample_idx(p, npoint)
        # tile-unfriendly npoint (no mult-of-8 divisor, e.g. S3DIS
        # 15000/4 = 3750) would force an illegal M tile: pad the query
        # rows (BN is folded — pad rows are pure discarded compute) and
        # slice the outputs back below
        idx, m_orig = pad_query_idx(idx)

        skipconv = None
        if use_res and self.in_channels != channels[-1]:
            skipconv = nn.Dense(channels[-1], use_bias=True,
                                kernel_init=torch_linear_init,
                                name="skipconv")
        folded = []
        cin = channels[0]
        for i in range(2):
            act = None if (i == 1 and use_res) else self.act_args
            cb = ConvBlock(channels[i + 1], norm_args=self.norm_args,
                           act_args=act, order=order)
            _ = cb(jnp.zeros((1, 1, 1, cin), jnp.float32), False)
            pv = cb.variables["params"]
            bv = cb.variables["batch_stats"]
            wk = pv["Dense_0"]["kernel"].astype(jnp.float32)
            bn_p = pv["NormAct_0"]["BatchNorm_0"]
            bn_s = bv["NormAct_0"]["BatchNorm_0"]
            s = (bn_p["scale"].astype(jnp.float32)
                 / jnp.sqrt(bn_s["var"].astype(jnp.float32) + 1e-5))
            folded.append((wk * s[None, :],
                           bn_p["bias"].astype(jnp.float32)
                           - bn_s["mean"].astype(jnp.float32) * s))
            cin = channels[i + 1]
        (w1, b1), (w2, b2) = folded

        new_p, fi, out = kernel_fn(
            float(group_args.get("radius", 0.1)),
            int(group_args.get("nsample", 16)), p, idx, f, w1, b1, w2, b2,
            relative=group_args.get("relative_xyz", True),
            normalize_dp=group_args.get("normalize_dp", False))
        if m_orig is not None:
            new_p, fi, out = (new_p[:, :m_orig], fi[:, :m_orig],
                              out[:, :m_orig])
        act_fn = create_act(self.act_args)
        if use_res:
            identity = skipconv(fi) if skipconv is not None else fi
            out = act_fn(out + identity)
        else:
            # relu(max(x)) == max(relu(x)): the unfused path activates
            # pre-pool; relu is monotone so post-pool is identical
            out = act_fn(out)
        return new_p, out

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        all_aggr = (not self.is_head) and self.stride == 1
        use_res = self.use_res and not all_aggr and not self.is_head
        order = (self.conv_args or {}).get("order", "conv-norm-act")

        mid = self.out_channels // 2 if self.stride > 1 else self.out_channels
        channels = [self.in_channels] + [mid] * (self.layers - 1) + [self.out_channels]
        if not self.is_head:
            channels[0] = CHANNEL_MAP[self.feature_type](channels[0])

        if self.is_head:
            # stem: plain pointwise conv, no norm/act (pointnext.py:119-127)
            x = f
            for i in range(len(channels) - 1):
                x = ConvBlock(channels[i + 1], norm_args=None, act_args=None,
                              order=order)(x, training)
            return p, x

        group_args = dict(self.group_args or {})
        use_fused = (not all_aggr and
                     group_args.get("NAME", "ballquery") == "ballquery")

        # the train-BN kernel computes batch statistics over M rows, so
        # query padding (pad_query_idx) would bias them — tile-unfriendly
        # npoint stays on the unfused train path instead
        if (use_fused and (p.shape[1] // self.stride) % 8 == 0
                and self._fused_trainbn_ok(training, order)):
            return self._fused_trainbn_stage(p, f, group_args, channels,
                                             use_res, order, training)
        if use_fused and self._fused_eval_ok(training, order, p.shape[1]):
            return self._fused_eval_stage(p, f, group_args, channels,
                                          use_res, order, training)
        if use_fused:
            npoint = p.shape[1] // self.stride
            idx = self._sample_idx(p, npoint)
            new_p, fi, dpfj, _ = ball_group(
                float(group_args.get("radius", 0.1)),
                int(group_args.get("nsample", 16)), p, idx, f,
                relative=group_args.get("relative_xyz", True),
                normalize_dp=group_args.get("normalize_dp", False),
                out_dtype=eval_group_dtype(training))
            x = _aggregation_features_kfirst(new_p, dpfj, fi,
                                             self.feature_type)
            pool_axis = 1
        else:
            if not all_aggr:
                npoint = p.shape[1] // self.stride
                idx = self._sample_idx(p, npoint)
                new_p = index_points(p, idx)
            else:
                idx = None
                new_p = p
            fi = (index_points(f, idx) if idx is not None else f) \
                if (use_res or "df" in self.feature_type) else None
            if all_aggr:
                group_args["nsample"] = None
                group_args["radius"] = None
            grouper = create_grouper(group_args)
            dp, fj = grouper(new_p, p, f)
            x = get_aggregation_features(new_p, dp, fi, fj, self.feature_type)
            pool_axis = 2

        if use_res:
            if self.in_channels != channels[-1]:
                identity = nn.Dense(channels[-1], use_bias=True,
                                    kernel_init=torch_linear_init,
                                    name="skipconv")(fi)
            else:
                identity = fi

        for i in range(len(channels) - 1):
            act = None if (i == len(channels) - 2 and use_res) else self.act_args
            x = ConvBlock(channels[i + 1], norm_args=self.norm_args,
                          act_args=act, order=order)(x, training)
        x = jnp.max(x, axis=pool_axis)  # pool over neighbors
        if use_res:
            x = create_act(self.act_args)(x + identity)
        return new_p, x


class InvResMLP(nn.Module):
    """Inverted-residual MLP block (parity: pointnext.py:229-276)."""

    in_channels: int
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    aggr_args: Optional[dict] = None
    group_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    expansion: int = 1
    use_res: bool = True
    num_posconvs: int = 2
    less_act: bool = False

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        aggr = dict(self.aggr_args or {"feature_type": "dp_fj", "reduction": "max"})
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        identity = f
        x = LocalAggregation(
            channels=[self.in_channels, self.in_channels],
            norm_args=self.norm_args,
            act_args=self.act_args if self.num_posconvs > 0 else None,
            group_args=self.group_args, conv_args=self.conv_args,
            feature_type=aggr.get("feature_type", "dp_fj"),
            reduction=aggr.get("reduction", "max"))(p, f, training)
        mid = int(self.in_channels * self.expansion)
        if self.num_posconvs < 1:
            channels = []
        elif self.num_posconvs == 1:
            channels = [self.in_channels, self.in_channels]
        else:
            channels = [self.in_channels, mid, self.in_channels]
        for i in range(len(channels) - 1):
            act = self.act_args if (i != len(channels) - 2) and not self.less_act else None
            x = ConvBlock(channels[i + 1], norm_args=self.norm_args,
                          act_args=act, order=order)(x, training)
        if self.use_res and x.shape[-1] == identity.shape[-1]:
            x = x + identity
        return p, create_act(self.act_args)(x)


class FeaturePropagation(nn.Module):
    """FP upsampling: 3-NN interpolate + skip concat + MLP
    (parity: pointnext.py:173-226 FeaturePropogation, upsample branch)."""

    mlp: Sequence[int]  # [in_total, out, out, ...]
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None

    @nn.compact
    def __call__(self, p1, f1, p2, f2, training: bool = False):
        interp = three_interpolation(p1, p2, f2)
        x = jnp.concatenate([f1, interp], axis=-1) if f1 is not None else interp
        for c in self.mlp[1:]:
            x = ConvBlock(c, norm_args=self.norm_args or {"norm": "bn1d"},
                          act_args=self.act_args or {"act": "relu"})(x, training)
        return x


def _to_full_list(param, blocks, strides, param_scaling=1):
    """Per-stage/per-block radius & nsample expansion
    (parity: pointnext.py:389-407 _to_full_list)."""
    param_list = []
    if isinstance(param, (list, tuple)):
        for i, value in enumerate(param):
            value = list(value) if isinstance(value, (list, tuple)) else [value]
            if len(value) != blocks[i]:
                value += [value[-1]] * (blocks[i] - len(value))
            param_list.append(value)
    else:
        for i, stride in enumerate(strides):
            if stride == 1:
                param_list.append([param] * blocks[i])
            else:
                param_list.append([param] + [param * param_scaling] * (blocks[i] - 1))
                param *= param_scaling
    return param_list


@MODELS.register_module()
class PointNextEncoder(nn.Module):
    """PointNeXt encoder (parity: pointnext.py:310-456 PointNextEncoder)."""

    in_channels: int = 4
    width: int = 32
    blocks: Sequence[int] = (1, 4, 7, 4, 4)
    strides: Sequence[int] = (4, 4, 4, 4)
    block: str = "InvResMLP"
    nsample: Any = 32
    radius: Any = 0.1
    aggr_args: Optional[dict] = None
    group_args: Optional[dict] = None
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    conv_args: Optional[dict] = None
    sa_layers: int = 1
    sa_use_res: bool = False
    expansion: int = 4
    sampler: str = "fps"
    use_res: bool = True
    radius_scaling: float = 2.0
    nsample_scaling: float = 1.0

    @property
    def channel_list(self) -> List[int]:
        channels, width = [], self.width
        for stride in self.strides:
            if stride != 1:
                width *= 2
            channels.append(width)
        return channels

    @property
    def out_channels(self) -> int:
        return self.channel_list[-1]

    def _stage_params(self):
        radii = _to_full_list(self.radius, self.blocks, self.strides, self.radius_scaling)
        nsample = _to_full_list(self.nsample, self.blocks, self.strides, self.nsample_scaling)
        return radii, nsample

    @nn.compact
    def _encode(self, p0, f0, training: bool, return_all: bool):
        assert self.block == "InvResMLP", f"unsupported block {self.block}"
        aggr_args = dict(self.aggr_args or {"feature_type": "dp_fj", "reduction": "max"})
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "relu"}
        radii, nsample = self._stage_params()
        channels = self.channel_list

        if f0 is None:
            f0 = p0

        p, f = p0, f0
        ps, fs = [p0], [f0]
        in_ch = self.in_channels
        fps_ordered = False  # becomes True after the first FPS subsample
        for i in range(len(self.blocks)):
            is_head = i == 0 and self.strides[i] == 1
            group_args = dict(self.group_args or {"NAME": "ballquery"})
            group_args["radius"] = radii[i][0]
            group_args["nsample"] = nsample[i][0]
            p, f = SetAbstraction(
                in_channels=in_ch, out_channels=channels[i],
                layers=self.sa_layers if not is_head else 1,
                stride=self.strides[i], group_args=group_args,
                norm_args=norm_args, act_args=act_args, conv_args=self.conv_args,
                sampler=self.sampler,
                feature_type=aggr_args.get("feature_type", "dp_fj"),
                use_res=self.sa_use_res, is_head=is_head,
                input_fps_ordered=fps_ordered,
                name=f"enc{i}_sa")(p, f, training)
            if self.strides[i] > 1 and not is_head and self.sampler == "fps":
                fps_ordered = True
            in_ch = channels[i]
            for j in range(1, self.blocks[i]):
                block_group = dict(self.group_args or {"NAME": "ballquery"})
                block_group["radius"] = radii[i][j]
                block_group["nsample"] = nsample[i][j]
                p, f = InvResMLP(
                    in_channels=in_ch, aggr_args=aggr_args,
                    norm_args=norm_args, act_args=act_args,
                    group_args=block_group, conv_args=self.conv_args,
                    expansion=self.expansion, use_res=self.use_res,
                    name=f"enc{i}_b{j}")(p, f, training)
            ps.append(p)
            fs.append(f)
        if return_all:
            return ps, fs
        return p, f

    def __call__(self, p0, f0=None, training: bool = False):
        return self.forward_seg_feat(p0, f0, training)

    def forward_cls_feat(self, p0, f0=None, training: bool = False):
        _, f = self._encode(p0, f0, training, return_all=False)
        # final stage pools to (B, 1, C); squeeze like pointnext.py:441
        return f.squeeze(1) if f.shape[1] == 1 else jnp.max(f, axis=1)

    def forward_seg_feat(self, p0, f0=None, training: bool = False):
        return self._encode(p0, f0, training, return_all=True)


@MODELS.register_module()
class PointNextPartDecoder(nn.Module):
    """Part-seg decoder conditioned on the shape class
    (parity: pointnext.py:499-663 PointNextPartDecoder). Decoder stages run
    deep->shallow; the shallowest FP receives the class embedding concatenated
    to the stem-level features (pointnext.py:655-663). cls_map 'pointnet2'
    embeds the 16-dim one-hot with a 64-wide conv (pointnext.py:552-556,
    637-640); 'curvenet' concatenates global max-features of the two deepest
    stages with the raw one-hot (pointnext.py:541-551, 628-636).
    """

    encoder_channel_list: Sequence[int]
    decoder_layers: int = 2
    decoder_blocks: Sequence[int] = (1, 1, 1, 1)
    cls_map: str = "pointnet2"
    num_classes: int = 16  # shape categories
    act_args: Optional[dict] = None

    @property
    def out_channels(self) -> int:
        return self.encoder_channel_list[0]

    @nn.compact
    def __call__(self, p, f, cls_label, training: bool = False):
        ecl = list(self.encoder_channel_list)
        skip_channels = ecl[:-1]
        fp_channels = ecl[:-1]
        n = len(fp_channels)
        act_args = self.act_args or {"act": "relu"}
        B, N = p[0].shape[0], p[0].shape[1]
        f = list(f)

        one_hot = jax.nn.one_hot(jnp.reshape(cls_label, (B,)),
                                 self.num_classes, dtype=f[-1].dtype)
        if self.cls_map == "pointnet2":
            cls_feat = ConvBlock(64, norm_args=None, act_args=act_args,
                                 name="convc")(
                jnp.broadcast_to(one_hot[:, None, :], (B, N, self.num_classes)),
                training)
        elif self.cls_map == "curvenet":
            emb1 = ConvBlock(64, norm_args=None, act_args=act_args,
                             name="global_conv1")(f[-2], training)
            emb1 = jnp.max(emb1, axis=1)  # (B, 64)
            emb2 = ConvBlock(128, norm_args=None, act_args=act_args,
                             name="global_conv2")(f[-1], training)
            emb2 = jnp.max(emb2, axis=1)  # (B, 128)
            g = jnp.concatenate([emb1, emb2, one_hot], axis=-1)
            cls_feat = jnp.broadcast_to(g[:, None, :], (B, N, g.shape[-1]))
        else:
            raise ValueError(f"unsupported cls_map {self.cls_map}")
        cls_ch = cls_feat.shape[-1]

        # deep stages (no class conditioning), pointnext.py:655-657
        in_ch = ecl[-1]
        for idx, i in enumerate(range(-1, -n, -1)):
            mlp = [skip_channels[i] + in_ch] + [fp_channels[i]] * self.decoder_layers
            f[i - 1] = FeaturePropagation(mlp, name=f"fp{n + i}")(
                p[i - 1], f[i - 1], p[i], f[i], training)
            in_ch = fp_channels[i]
        # shallowest stage gets [cls_feat || stem feats], pointnext.py:660-663
        mlp = [skip_channels[0] + cls_ch + in_ch] + [fp_channels[0]] * self.decoder_layers
        f0 = jnp.concatenate([cls_feat, f[1]], axis=-1)
        out = FeaturePropagation(mlp, name="fp0")(p[1], f0, p[2], f[2], training)
        return out


@MODELS.register_module()
class PointNextDecoder(nn.Module):
    """FP decoder stack (parity: pointnext.py:459-496 PointNextDecoder)."""

    encoder_channel_list: Sequence[int]
    decoder_layers: int = 2
    decoder_stages: int = 4
    in_channels: int = 3  # channels of the raw-point feature at level 0

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        # p, f: lists from forward_seg_feat, index 0 = raw points level
        ecl = list(self.encoder_channel_list)
        skip_channels = ecl[:-1]
        if len(skip_channels) < self.decoder_stages:
            skip_channels.insert(0, self.in_channels)
        fp_channels = ecl[: self.decoder_stages]

        n = len(fp_channels)
        f = list(f)
        in_ch = ecl[-1]
        for i in range(-1, -n - 1, -1):
            mlp = [skip_channels[i] + in_ch] + [fp_channels[i]] * self.decoder_layers
            f[i - 1] = FeaturePropagation(mlp, name=f"fp{n + i}")(
                p[i - 1], f[i - 1], p[i], f[i], training)
            in_ch = fp_channels[i]
        return f[-n - 1]
