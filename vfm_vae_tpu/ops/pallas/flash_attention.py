"""Pallas TPU flash attention (stub — currently delegates to XLA fused SDPA).

The decoder's largest attention is 64x64=4096 tokens at 512 channels
(SURVEY.md section 5.7) and the frozen SigLIP2 ViT runs 1024 tokens; both fit
comfortably in VMEM per block, so the XLA path is already near roofline. A
dedicated kernel lands here when profiles justify it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention(q, k, v, scale: Optional[float] = None) -> jnp.ndarray:
    return jax.nn.dot_product_attention(q, k, v, scale=scale)
