"""SSIM (torchmetrics-compatible: gaussian kernel 11, sigma 1.5, reflect
padding so the SSIM map has input size; reference uses
StructuralSimilarityIndexMeasure(data_range=2.0), training/loss.py:152)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian filter, valid conv, NHWC.

    precision=HIGHEST is load-bearing ON TPU: the default conv precision
    rounds operands to bf16, and SSIM's windowed variance is the
    catastrophically-cancelling E[x^2] - E[x]^2 — with 7 mantissa bits the
    sigma estimates come out garbage and SSIM leaves [-1, 1] entirely
    (observed: 3.03 on-chip vs 0.856 for the same images on CPU; PSNR,
    which has no conv, matched exactly). An 11-tap depthwise gaussian at
    fp32 is VPU noise next to the model."""
    C = x.shape[-1]
    kh = jnp.asarray(k1d, x.dtype)[:, None, None, None]
    kw = jnp.asarray(k1d, x.dtype)[None, :, None, None]
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (1, 1, 1, C)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 2.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over the batch (scalar)."""
    pad = (kernel_size - 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    y = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    k = _gaussian_kernel1d(kernel_size, sigma)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter(x, k)
    mu_y = _filter(y, k)
    mu_xx = _filter(x * x, k)
    mu_yy = _filter(y * y, k)
    mu_xy = _filter(x * y, k)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)
