"""Pallas TPU flash attention wrapper.

Wraps jax's fused Pallas TPU flash-attention kernel (tiled online-softmax
over VMEM blocks — the SURVEY.md section 7 kernel priority #1) behind the
framework's (B, T, N, H) SDPA layout. Eligibility is decided in
ops/attention.py; the ViT encoder's 1024-token, 64-head-dim shapes hit this
path on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _kernel():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    return flash_attention, BlockSizes


def flash_attention(q, k, v, scale: Optional[float] = None) -> jnp.ndarray:
    """q,k,v: (B, T, N, H) -> (B, T, N, H)."""
    kernel, BlockSizes = _kernel()
    d = q.shape[-1]
    sm_scale = scale if scale is not None else d**-0.5
    # Kernel layout: (B, heads, T, head_dim).
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = kernel(qt, kt, vt, sm_scale=sm_scale)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def flash_eligible(q, k, mask) -> bool:
    # Measured on v5e (B=64, T=1024, 16 heads, d=64): XLA's fused attention
    # beats this kernel (39ms vs 61ms), so the Pallas path is opt-in via
    # VFM_VAE_USE_PALLAS_FLASH=1 until a shape where it wins shows up.
    import os

    if os.environ.get("VFM_VAE_USE_PALLAS_FLASH") != "1":
        return False
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    Tq, Tk, d = q.shape[1], k.shape[1], q.shape[-1]
    if d not in (64, 128):
        return False
    # Tile-friendly sequence lengths only; others take the XLA path.
    return Tq >= 512 and Tk >= 512 and Tq % 128 == 0 and Tk % 128 == 0
