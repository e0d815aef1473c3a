"""Conv/norm/act building blocks (flax linen, channels-last).

TPU-native re-design of the reference block factories
(openpoints/models/layers/{conv,norm,activation}.py): the reference's 1x1
Conv1d/Conv2d over channels-first tensors become ``nn.Dense`` over the last
axis — identical math, and channels-last puts C on the TPU lane dimension so
pointwise MLPs run as large (B*N, C) @ (C, C') MXU matmuls.

``order='conv-norm-act'`` matches the reference default
(cfgs/scanobjectnn/pointnext-s.yaml conv_args). Weight init mirrors torch's
Conv/Linear default (kaiming-uniform with a=sqrt(5) == uniform(+-sqrt(1/fan_in))).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def compute_dtype():
    """Computation dtype policy for pointwise blocks (params stay f32).

    Resolved at trace time: a ``utils.precision.dtype_override`` context
    takes precedence (lets one jit program mix policies — bf16 controller +
    feedback classifier, f32 task training), else
    ``ADAPTPOINT_TPU_DTYPE=bfloat16`` runs the MLP/BN stack in bf16 (MXU
    native); default float32.
    """
    from ...utils.precision import resolve_compute_dtype
    return resolve_compute_dtype()

__all__ = [
    "create_act", "ConvBlock", "LinearBlock", "CHANNEL_MAP", "torch_linear_init",
    "torch_bias_init", "NormAct",
]

# torch nn.Linear/Conv default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in ** 0.5)
    import jax
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def create_act(act_args: Optional[dict]) -> Optional[Callable]:
    """Activation factory (parity: openpoints/models/layers/activation.py)."""
    if act_args is None:
        return None
    args = dict(act_args)
    name = args.pop("act", None)
    if name is None:
        return None
    name = name.lower()
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        slope = args.get("negative_slope", 0.01)
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == "gelu":
        return nn.gelu
    if name == "sigmoid":
        return nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "silu" or name == "swish":
        return nn.silu
    if name == "hardswish":
        return nn.hard_swish
    if name in ("elu",):
        return nn.elu
    if name in ("selu",):
        return nn.selu
    if name in ("rrelu",):  # eval-mode rrelu == leaky relu with mean slope
        return lambda x: nn.leaky_relu(x, negative_slope=(1 / 8 + 1 / 3) / 2)
    raise ValueError(f"unknown activation {name}")


# channel-size mapper per aggregation feature type
# (parity: openpoints/models/layers/local_aggregation.py:13-29 CHANNEL_MAP)
CHANNEL_MAP = {
    "fj": lambda c: c,
    "df": lambda c: c,
    "assa": lambda c: c * 3,
    "assa_dp": lambda c: c * 3 + 3,
    "dp_fj": lambda c: 3 + c,
    "pj": lambda c: c,
    "dp": lambda c: 3,
    "pi_dp": lambda c: c + 3,
    "dp_fj_df": lambda c: c * 2 + 3,
    "dp_fi_df": lambda c: c * 2 + 3,
    "pi_dp_fj_df": lambda c: c * 2 + 6,
    "dp_df": lambda c: c + 3,
}


class BNStatsHandle(nn.Module):
    """Stands in for flax ``nn.BatchNorm`` at the SAME variable paths when
    a fused kernel computed the normalization itself (ops/pallas/
    satrainbn.py): declares the identical params ('scale', 'bias') and
    batch_stats ('mean', 'var'), returns the params for the kernel, and —
    when given the kernel-computed batch statistics — performs the same
    running-average update flax's BatchNorm would have. Instantiated with
    name='BatchNorm_0' so checkpoints/param trees are byte-identical to
    the unfused trace."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_stats=None):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        if batch_stats is not None and not self.is_initializing():
            import jax
            mean, var = batch_stats
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum)
                             * jax.lax.stop_gradient(mean))
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum)
                            * jax.lax.stop_gradient(var))
        return scale, bias


class NormAct(nn.Module):
    """Norm (+ optional act) applied channels-last; norm reduces over all
    leading axes like torch BatchNorm1d/2d."""

    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None

    @nn.compact
    def __call__(self, x, training: bool = False, fused_sa=None):
        if fused_sa is not None:
            # fused train-BN SA handshake: declare/return the BatchNorm
            # params, record kernel-computed stats ('declare' reads only)
            handle = BNStatsHandle(x.shape[-1], momentum=0.9,
                                   name="BatchNorm_0")
            return handle(None if fused_sa == "declare" else fused_sa)
        if self.norm_args is not None and self.norm_args.get("norm"):
            norm = self.norm_args["norm"].lower()
            if norm.startswith("bn"):
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=compute_dtype())(x)
            elif norm.startswith("ln"):
                x = nn.LayerNorm(epsilon=1e-5)(x)
            elif norm.startswith("in"):
                x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5)(x)
            else:
                raise ValueError(f"unknown norm {norm}")
        act = create_act(self.act_args)
        if act is not None:
            x = act(x)
        return x


class ConvBlock(nn.Module):
    """Pointwise conv block: Dense + norm + act in configurable order.

    Covers the reference's create_convblock1d / create_convblock2d /
    create_linearblock (openpoints/models/layers/conv.py:24-106) — on TPU they
    are all the same channels-last Dense.
    """

    channels: int
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    order: str = "conv-norm-act"
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False, fused_sa=None):
        use_bias = self.bias and self.norm_args is None
        dense = nn.Dense(self.channels, use_bias=use_bias,
                         dtype=compute_dtype(),
                         kernel_init=torch_linear_init)
        norm_act = NormAct(self.norm_args, self.act_args)
        if fused_sa is not None:
            # fused train-BN SA handshake (ops/pallas/satrainbn.py):
            # 'declare' returns (kernel, bn_scale, bn_bias) on a dummy row;
            # (mean, var) re-enters to record the kernel's batch stats
            y = dense(x)
            scale, bn_bias = norm_act(y, training, fused_sa=fused_sa)
            return dense.variables["params"]["kernel"], scale, bn_bias
        if self.order == "conv-norm-act":
            return norm_act(dense(x), training)
        if self.order == "norm-act-conv":
            return dense(norm_act(x, training))
        if self.order == "conv-act-norm":
            act = create_act(self.act_args)
            y = dense(x)
            if act is not None:
                y = act(y)
            return NormAct(self.norm_args, None)(y, training)
        raise ValueError(f"unknown order {self.order}")


class LinearBlock(nn.Module):
    """Linear + norm + act (+ optional dropout), used by classification heads
    (parity: create_linearblock + nn.Dropout in ClsHead,
    openpoints/models/classification/cls_base.py:110-123)."""

    channels: int
    norm_args: Optional[dict] = None
    act_args: Optional[dict] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.channels, use_bias=True, dtype=compute_dtype(),
                     kernel_init=torch_linear_init)(x)
        x = NormAct(self.norm_args, self.act_args)(x, training)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x
