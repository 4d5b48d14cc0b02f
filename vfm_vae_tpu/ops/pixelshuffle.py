"""Pixel shuffle / unshuffle with torch channel ordering, NHWC layout.

Used by the concat-z injectors (reference generator.py:726-784), the
LDM adapter's GeneralPixelUnshuffle (ldm_utils.py:169), and the
SeparableUpsampleWithFixedBlur upsampler (convnext_utils.py:222).
Torch convention: PixelUnshuffle output channel index = c*r^2 + i*r + j
for source subpixel (i, j); PixelShuffle is the exact inverse.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC (B, H*r, W*r, C) -> (B, H, W, C*r*r), torch channel order."""
    B, Hr, Wr, C = x.shape
    assert Hr % r == 0 and Wr % r == 0, (x.shape, r)
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B H W C ri rj
    return x.reshape(B, H, W, C * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC (B, H, W, C*r*r) -> (B, H*r, W*r, C), torch channel order."""
    B, H, W, Crr = x.shape
    assert Crr % (r * r) == 0, (x.shape, r)
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B H ri W rj C
    return x.reshape(B, H * r, W * r, C)
