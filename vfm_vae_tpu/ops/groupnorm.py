"""GroupNorm with torch semantics and an fp32 compute island.

The reference wraps every decoder norm in ``GroupNorm32`` (shared.py:165-167:
cast to fp32, normalize, cast back) to keep fp16 GAN training stable. We keep
the fp32 island even under bf16 — it is cheap and preserves checkpoint-level
numerics. Layout is NHWC; torch groups consecutive channels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_stats(x: jnp.ndarray, num_groups: int, eps: float = 1e-5):
    """One-pass per-(sample, group) statistics: (mean, rsqrt(var+eps)),
    both (B, G) fp32. E[x^2]-E[x]^2 form — ONE read of x with both
    reductions in a single XLA fusion (the two-pass form reads x twice;
    on the decoder's 256^2 activations that is pure HBM waste).

    Reduce over (H, W) first, THEN fold channels into groups: reducing the
    strided 5-D (B,H,W,G,C/G) view directly runs at ~30 GB/s on v5e while
    this form hits ~350 GB/s (12x) — the spatial axes are contiguous lanes,
    the group fold is a tiny (B, C) -> (B, G) follow-up."""
    B, H, W, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    from .pallas.group_stats import channel_moments, moments_eligible

    if moments_eligible(x):
        # Opt-in only (VFM_VAE_PALLAS_STATS=1): measured SLOWER than XLA's
        # convert+reduce on v5e (see ops/pallas/group_stats.py).
        s1, s2 = channel_moments(x)
    else:
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(1, 2))              # (B, C)
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2))  # (B, C)
    s1 = s1.reshape(B, num_groups, C // num_groups).sum(-1)
    s2 = s2.reshape(B, num_groups, C // num_groups).sum(-1)
    n = H * W * (C // num_groups)
    m1 = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(m1), 0.0)
    return m1, jax.lax.rsqrt(var + eps)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch F.group_norm on NHWC input (normalizes per (group, H, W)).

    Statistics accumulate in fp32 (the GroupNorm32 island); the elementwise
    normalization stays in the input dtype — under bf16 this keeps the big
    spatial tensors out of fp32 HBM traffic (the reference's fp32 cast was
    an fp16-range workaround, unnecessary with bf16's fp32 exponent range).
    fp32 inputs take the bit-exact two-pass reference path; bf16 inputs use
    the one-pass moment form (difference is far below bf16 resolution)."""
    orig_dtype = x.dtype
    B, H, W, C = x.shape
    assert C % num_groups == 0, (C, num_groups)
    if orig_dtype == jnp.float32:
        xg = x.reshape(B, H, W, num_groups, C // num_groups)
        xf = xg.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.square(xf - mean).mean(axis=(1, 2, 4), keepdims=True)
        y = ((xf - mean) / jnp.sqrt(var + eps)).reshape(B, H, W, C)
    else:
        mean, inv = group_stats(x, num_groups, eps)
        reps = C // num_groups
        mean_c = jnp.repeat(mean, reps, axis=1).astype(orig_dtype)  # (B, C)
        inv_c = jnp.repeat(inv, reps, axis=1).astype(orig_dtype)
        # 4-D contiguous elementwise apply (strided 5-D broadcasts are slow).
        y = (x - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    if weight is not None:
        y = y * weight.astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(orig_dtype)


def layer_norm(x: jnp.ndarray, weight=None, bias=None, eps: float = 1e-6) -> jnp.ndarray:
    """torch LayerNorm over the last axis: fp32 statistics, elementwise in
    the input dtype (bit-exact reference path for fp32 inputs)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mean).mean(axis=-1, keepdims=True)
    if orig_dtype == jnp.float32:
        y = (xf - mean) / jnp.sqrt(var + eps)
    else:
        inv = jax.lax.rsqrt(var + eps)
        y = (x - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
    if weight is not None:
        y = y * weight.astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(orig_dtype)
