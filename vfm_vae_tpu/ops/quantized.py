"""Dynamic int8 (W8A8) matmul for frozen-tower serving.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak); measured on
this chip a ViT-MLP-shaped matmul goes 7.7 -> 4.6 ms (1.7x) INCLUDING the
inline quantization. Scheme: per-token (row) dynamic absmax activation
scales, per-output-channel weight scales, int8 x int8 -> int32 accumulation,
fp32 rescale. Measured per-matmul relative error ~1% mean / 3% p99 — the
same order as bf16 rounding.

Intended for the FROZEN VFM encoder at serving time (reference freezes the
tower: siglip2_utils.py:114-137), opt-in via VFM_VAE_INT8_VFM=1. Training
and parity paths stay bf16/fp32.

Status: EXPERIMENTAL. In-graph on the full SigLIP-L encoder the win is
currently only ~2% (616 vs 627 ms at B96) — the per-Linear absmax reduce +
quantize + int32->fp32 rescale passes are not fused into the dot by XLA the
way the isolated microbenchmark suggested. Next steps (round 2): quantize
once per block input, fold the rescale into the consumer, or a pallas
int8-dot kernel with in-VMEM quantization.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def int8_vfm_enabled() -> bool:
    return os.environ.get("VFM_VAE_INT8_VFM") == "1"


def int8_linear(
    x: jnp.ndarray,          # (..., K) float
    w: jnp.ndarray,          # (K, N) float param
    b: Optional[jnp.ndarray] = None,  # (N,)
) -> jnp.ndarray:
    """y = x @ w + b with dynamic W8A8 quantization (fp32 rescale)."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    xq = jnp.round(xf / s).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    wq = jnp.round(wf / ws[None, :]).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s * ws
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)
