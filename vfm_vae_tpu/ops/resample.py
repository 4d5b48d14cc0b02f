"""conv2d with fused up/downsampling (reference: torch_utils/ops/
conv2d_resample.py:46). Used by the legacy StyleGAN-T SynthesisLayer path.

We implement the reference's always-correct generic decomposition
(conv2d_resample.py:138-141): FIR-upsample -> conv -> FIR-downsample, with
the same padding arithmetic. XLA fuses the dilated upsample into the conv on
TPU, so the hand-tuned torch fast paths are unnecessary.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .upfirdn import _parse_padding, _get_filter_size, upfirdn2d


def conv2d_resample(
    x: jnp.ndarray,  # NHWC
    w: jnp.ndarray,  # HWIO
    f=None,
    up: int = 1,
    down: int = 1,
    padding=0,
    flip_weight: bool = True,
) -> jnp.ndarray:
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(x, f if up > 1 else None, up=up, padding=[px0, px1, py0, py1], gain=up**2)
    if not flip_weight:  # True convolution: flip the kernel spatially.
        w = w[::-1, ::-1]
    x = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if down > 1:
        x = upfirdn2d(x, f, down=down)
    return x
