"""Fused bias + activation + gain + clamp.

Equivalent of the reference CUDA plugin (torch_utils/ops/bias_act.py:52;
activation table at :21-31). On TPU this is a pure elementwise chain that XLA
fuses into the producing matmul/conv epilogue, so no hand-written kernel is
needed — the value of this module is the exact activation-table semantics
(default alpha/gain per function, clamp applied after gain).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import EasyDict

activation_funcs = {
    "linear": EasyDict(func=lambda x, alpha: x, def_alpha=0.0, def_gain=1.0),
    "relu": EasyDict(func=lambda x, alpha: jax.nn.relu(x), def_alpha=0.0, def_gain=math.sqrt(2)),
    "lrelu": EasyDict(
        func=lambda x, alpha: jax.nn.leaky_relu(x, negative_slope=alpha),
        def_alpha=0.2,
        def_gain=math.sqrt(2),
    ),
    "tanh": EasyDict(func=lambda x, alpha: jnp.tanh(x), def_alpha=0.0, def_gain=1.0),
    "sigmoid": EasyDict(func=lambda x, alpha: jax.nn.sigmoid(x), def_alpha=0.0, def_gain=1.0),
    "elu": EasyDict(func=lambda x, alpha: jax.nn.elu(x), def_alpha=0.0, def_gain=1.0),
    "selu": EasyDict(func=lambda x, alpha: jax.nn.selu(x), def_alpha=0.0, def_gain=1.0),
    "softplus": EasyDict(func=lambda x, alpha: jax.nn.softplus(x), def_alpha=0.0, def_gain=1.0),
    "swish": EasyDict(func=lambda x, alpha: jax.nn.sigmoid(x) * x, def_alpha=0.0, def_gain=math.sqrt(2)),
    # torch.nn.GELU default (erf form) and tanh approximation.
    "gelu": EasyDict(func=lambda x, alpha: jax.nn.gelu(x, approximate=False), def_alpha=0.0, def_gain=1.0),
    "gelu_tanh": EasyDict(func=lambda x, alpha: jax.nn.gelu(x, approximate=True), def_alpha=0.0, def_gain=1.0),
    "silu": EasyDict(func=lambda x, alpha: jax.nn.silu(x), def_alpha=0.0, def_gain=1.0),
    # HF CLIP's quick_gelu.
    "quick_gelu": EasyDict(
        func=lambda x, alpha: x * jax.nn.sigmoid(1.702 * x), def_alpha=0.0, def_gain=1.0
    ),
}


def apply_activation(x: jnp.ndarray, act: str, alpha: Optional[float] = None) -> jnp.ndarray:
    spec = activation_funcs[act]
    a = spec.def_alpha if alpha is None else alpha
    return spec.func(x, a)


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    axis: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """Add channel bias, apply activation, scale by gain, clamp to +-clamp.

    Reference semantics: torch_utils/ops/bias_act.py:52 (bias along `dim`,
    act with per-function default gain, clamp >= 0 applied last). Default
    axis is -1 because this framework is NHWC.
    """
    spec = activation_funcs[act]
    a = spec.def_alpha if alpha is None else alpha
    g = spec.def_gain if gain is None else gain

    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = b.shape[0]
        x = x + b.astype(x.dtype).reshape(shape)
    x = spec.func(x, a)
    if g != 1.0:
        x = x * jnp.asarray(g, x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
