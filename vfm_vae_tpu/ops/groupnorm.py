"""GroupNorm with torch semantics and an fp32 compute island.

The reference wraps every decoder norm in ``GroupNorm32`` (shared.py:165-167:
cast to fp32, normalize, cast back) to keep fp16 GAN training stable. We keep
the fp32 island even under bf16 — it is cheap and preserves checkpoint-level
numerics. Layout is NHWC; torch groups consecutive channels.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch F.group_norm on NHWC input (normalizes per (group, H, W))."""
    orig_dtype = x.dtype
    B, H, W, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    xf = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)


def layer_norm(x: jnp.ndarray, weight=None, bias=None, eps: float = 1e-6) -> jnp.ndarray:
    """torch LayerNorm over the last axis, fp32 compute."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mean).mean(axis=-1, keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)
