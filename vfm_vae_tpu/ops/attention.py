"""Scaled dot-product attention.

Single entry point for every attention in the framework (frozen-ViT encoder
blocks, GigaGAN decoder self/cross attention with null-KV, AttnProjection in
the adapter; reference uses F.scaled_dot_product_attention throughout).
The default path lets XLA pick its fused TPU attention; a Pallas
flash-attention kernel (ops/pallas/flash_attention.py) is used for shapes
where it wins. Shapes follow jax.nn.dot_product_attention: (B, T, N, H).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,  # (B, Tq, N, H)
    k: jnp.ndarray,  # (B, Tk, N, H)
    v: jnp.ndarray,  # (B, Tk, N, H)
    mask: Optional[jnp.ndarray] = None,  # bool, broadcastable to (B, N, Tq, Tk)
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """SDPA matching torch semantics (scale defaults to H^-0.5, bool mask
    True = attend). fp32 softmax accumulation regardless of input dtype."""
    if use_pallas is None:
        from .pallas.flash_attention import flash_eligible

        use_pallas = flash_eligible(q, k, mask)
    if use_pallas:
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return jax.nn.dot_product_attention(q, k, v, mask=mask, scale=scale)
