"""Filtered leaky ReLU (StyleGAN3 alias-free op; reference:
torch_utils/ops/filtered_lrelu.py:56-114 + the 1.7k-line CUDA plugin).

Dead code in the reference's own models (SURVEY.md section 2.2) but part of
the op surface, so provided for parity: bias -> FIR upsample -> gain ->
leaky ReLU -> clamp -> FIR downsample, composed from the fused upfirdn2d
conv — XLA fuses the elementwise middle into the surrounding convolutions,
which is exactly what the hand-written CUDA kernel does.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .upfirdn import _parse_padding, _get_filter_size, upfirdn2d


def filtered_lrelu(
    x: jnp.ndarray,  # NHWC
    fu=None,
    fd=None,
    b: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jnp.ndarray:
    px0, px1, py0, py1 = _parse_padding(padding)

    # Exactly the reference ref-impl pipeline (filtered_lrelu.py:121-148):
    # bias -> upfirdn(up, user padding, gain=up^2) -> lrelu*gain (+clamp) ->
    # upfirdn(down, no extra padding).
    if b is not None:
        x = x + b.astype(x.dtype).reshape(1, 1, 1, -1)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1],
                  gain=up**2, flip_filter=flip_filter)
    x = jax.nn.leaky_relu(x, negative_slope=slope) * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
