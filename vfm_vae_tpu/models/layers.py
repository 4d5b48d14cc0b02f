"""Shared building blocks (reference: networks/utils/shared.py,
gigagan_utils.py norms). Flax linen, NHWC, bf16-safe with fp32 norm islands.

Parameter layout conventions (converters in models/convert.py handle the
transpose from torch checkpoints):
  * linear kernels: (in, out)
  * conv kernels:   HWIO
  * mutable state (EMA trackers, legacy noise buffers): collection 'buffers'
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.bias_act import apply_activation
from ..ops.groupnorm import group_norm as _group_norm_fn


def trunc_normal_init(std: float = 0.02):
    """torch nn.init.trunc_normal_(std=s) truncates at +-2 absolute."""

    def init(key, shape, dtype=jnp.float32):
        return (
            std * jax.random.truncated_normal(key, -2.0 / std, 2.0 / std, shape, jnp.float32)
        ).astype(dtype)

    return init


def xavier_normal_init(gain: float):
    def init(key, shape, dtype=jnp.float32):
        # shape HWIO or (in, out)
        if len(shape) == 4:
            fan_in = shape[0] * shape[1] * shape[2]
            fan_out = shape[0] * shape[1] * shape[3]
        else:
            fan_in, fan_out = shape[0], shape[1]
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, jnp.float32).astype(dtype)

    return init


class FullyConnectedLayer(nn.Module):
    """StyleGAN FC layer with lr-multiplier scaling (shared.py:33-105).

    Stored weight is pre-divided by lr_multiplier; forward multiplies by
    lr_multiplier/sqrt(in) — identical numerics to the reference."""

    in_features: int
    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    weight_init: float = 1.0
    bias_init: Union[float, Sequence[float]] = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def w_init(key, shape, dtype=jnp.float32):
            return (self.weight_init / self.lr_multiplier) * jax.random.normal(key, shape, dtype)

        w = self.param("weight", w_init, (self.in_features, self.out_features))
        w = w.astype(x.dtype) * (self.lr_multiplier / math.sqrt(self.in_features))
        y = x @ w
        if self.use_bias:
            def b_init(key, shape, dtype=jnp.float32):
                b = np.broadcast_to(np.asarray(self.bias_init, np.float32), shape)
                return jnp.asarray(b / self.lr_multiplier, dtype)

            b = self.param("bias", b_init, (self.out_features,))
            y = y + b.astype(x.dtype) * self.lr_multiplier
        if self.activation != "linear":
            y = apply_activation(y, self.activation)
        return y


class MLP(nn.Module):
    """Stack of FullyConnectedLayers (shared.py:108-162)."""

    features_list: Sequence[int]
    activation: str = "linear"
    lr_multiplier: float = 1.0
    linear_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shift2batch = x.ndim == 3
        if shift2batch:
            B, K, C = x.shape
            x = x.reshape(B * K, C)
        n = len(self.features_list) - 1
        for idx in range(n):
            act = "linear" if (self.linear_out and idx == n - 1) else self.activation
            x = FullyConnectedLayer(
                self.features_list[idx],
                self.features_list[idx + 1],
                activation=act,
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )(x)
        if shift2batch:
            x = x.reshape(B, K, -1)
        return x


class StyleSplit(nn.Module):
    """3-way style projection m1*m2+m3 (shared.py:170-178)."""

    in_channels: int
    out_channels: int
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = FullyConnectedLayer(
            self.in_channels, 3 * self.out_channels, bias_init=self.bias_init, name="proj"
        )(x)
        m1, m2, m3 = jnp.split(y, 3, axis=-1)
        return m1 * m2 + m3


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 compute island (shared.py:165-167)."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, stats_only: bool = False):
        w = self.param("weight", nn.initializers.ones, (self.num_channels,))
        b = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        if stats_only:
            # Escape hatch for fused pallas callers: per-(sample, group)
            # (mean, rstd) + affine params; normalization applied in-kernel.
            from ..ops.groupnorm import group_stats

            mean, rstd = group_stats(x, self.num_groups, self.eps)
            return mean, rstd, w, b
        return _group_norm_fn(x, self.num_groups, w, b, self.eps)


class LayerNormFp32(nn.Module):
    """torch nn.LayerNorm (eps per caller), fp32 compute."""

    dim: int
    eps: float = 1e-5
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.groupnorm import layer_norm

        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,)) if self.use_bias else None
        return layer_norm(x, w, b, eps=self.eps)


class ChannelRMSNorm(nn.Module):
    """RMS norm over channel axis of NHWC maps (gigagan_utils.py:31-39)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        normed = l2_normalize(xf, axis=-1)
        return (normed * math.sqrt(self.dim) * gamma.astype(jnp.float32)).astype(x.dtype)


class RMSNorm(nn.Module):
    """RMS norm over the last axis (gigagan_utils.py:42-50)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        normed = l2_normalize(xf, axis=-1)
        return (normed * math.sqrt(self.dim) * gamma.astype(jnp.float32)).astype(x.dtype)


class Conv2d(nn.Module):
    """Plain conv wrapper: NHWC, HWIO kernel, torch-style default init
    (kaiming-uniform with a=sqrt(5), i.e. U(+-1/sqrt(fan_in))) unless an
    explicit initializer is given."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Union[int, str] = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Any] = None
    bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        k = self.kernel_size
        fan_in = (self.in_channels // self.groups) * k * k
        bound = 1.0 / math.sqrt(fan_in)

        def default_kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def default_bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "weight",
            self.kernel_init or default_kernel_init,
            (k, k, self.in_channels // self.groups, self.out_channels),
        )
        if return_params:
            # Escape hatch for fused pallas callers (ops/pallas/fused_mlp.py).
            b = (
                self.param("bias", self.bias_init or default_bias_init, (self.out_channels,))
                if self.use_bias else None
            )
            return kernel, b
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", self.bias_init or default_bias_init, (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


# Trace-time flag: inside an int8_linear_scope() the Linear layers below
# run as dynamic-W8A8 int8 matmuls (ops/quantized.py). Used by the frozen
# VFM towers at serving time (VFM_VAE_INT8_VFM=1); tracing is
# single-threaded per jit so a module global is safe.
_INT8_SCOPE = [False]


import contextlib


@contextlib.contextmanager
def int8_linear_scope(enabled: bool = True):
    prev = _INT8_SCOPE[0]
    _INT8_SCOPE[0] = enabled
    try:
        yield
    finally:
        _INT8_SCOPE[0] = prev


# Calibration pass for static activation scales: int8-mirrored Linears sow
# the absmax of their input into the 'act_stats' collection
# (ops/quantized.py:calibrate_int8_act_scales). Trace-time flag like above.
_INT8_CALIB = [False]


@contextlib.contextmanager
def int8_calibration_scope():
    prev_s, prev_c = _INT8_SCOPE[0], _INT8_CALIB[0]
    _INT8_SCOPE[0] = True
    _INT8_CALIB[0] = True
    try:
        yield
    finally:
        _INT8_SCOPE[0] = prev_s
        _INT8_CALIB[0] = prev_c


class Linear(nn.Module):
    """torch nn.Linear equivalent ((in,out) kernel, kaiming-uniform init)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    kernel_init: Optional[Any] = None
    bias_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        bound = 1.0 / math.sqrt(self.in_features)

        def default_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("weight", self.kernel_init or default_init, (self.in_features, self.out_features))
        if return_params:
            # Escape hatch for fused callers (e.g. the ViT encoder's packed
            # qkv matmul) — same pattern as Conv2d above.
            b = (
                self.param("bias", self.bias_init or default_init, (self.out_features,))
                if self.use_bias else None
            )
            return w, b
        if _INT8_SCOPE[0]:
            from ..ops.quantized import (
                int8_linear,
                int8_linear_prequant,
                int8_linear_prequant_static,
            )

            b = (
                self.param("bias", self.bias_init or default_init, (self.out_features,))
                if self.use_bias else None
            )
            if self.has_variable("int8", "wq"):
                # Pre-quantized frozen weight (ops/quantized.py:
                # add_int8_collection) — int8 weight reads, no per-call
                # weight re-quantization.
                wq = self.get_variable("int8", "wq")
                ws = self.get_variable("int8", "ws")
                if _INT8_CALIB[0]:
                    self.sow(
                        "act_stats", "amax",
                        jnp.max(jnp.abs(x)).astype(jnp.float32),
                    )
                elif self.has_variable("int8", "as"):
                    # Offline-calibrated static activation scale: the
                    # quantize fuses into the producer instead of paying a
                    # dynamic absmax reduce (ops/quantized.py numbers).
                    return int8_linear_prequant_static(
                        x, wq, ws, self.get_variable("int8", "as"), b
                    )
                return int8_linear_prequant(x, wq, ws, b)
            return int8_linear(x, w, b)
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", self.bias_init or default_init, (self.out_features,))
            y = y + b.astype(y.dtype)
        return y


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """(generator.py:42-43)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics (clamped norm). Gradient-safe at x == 0:
    the max() below routes the sqrt backward to a constant, where JAX's
    norm-at-zero gradient would be NaN (torch defines it as 0)."""
    n2 = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, eps * eps))
    return x / n
