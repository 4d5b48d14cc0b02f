"""Paired reconstruction metrics: PSNR / SSIM / LPIPS over image pairs
(reference: tools/reconstruct/evaluate.py, torchmetrics-based)."""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..train.ssim import ssim as ssim_fn


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR (reference evaluates per image, evaluate.py:99-104)."""
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def evaluate_pairs(
    pairs: Iterable[Tuple[np.ndarray, np.ndarray]],
    lpips_module=None,
    lpips_params=None,
) -> dict:
    """pairs: iterable of (real, gen) NHWC float batches in [0, 1]."""
    psnr_vals, ssim_vals, lpips_vals = [], [], []
    psnr_j = jax.jit(psnr)
    ssim_j = jax.jit(lambda a, b: ssim_fn(a, b, data_range=1.0))
    lpips_j = None
    if lpips_module is not None:
        lpips_j = jax.jit(
            lambda a, b: lpips_module.apply({"params": lpips_params}, a * 2 - 1, b * 2 - 1)
        )
    n = 0
    for real, gen in pairs:
        real = jnp.asarray(real, jnp.float32)
        gen = jnp.asarray(gen, jnp.float32)
        psnr_vals.append(np.asarray(psnr_j(real, gen)))
        ssim_vals.append(float(ssim_j(real, gen)) * real.shape[0])
        if lpips_j is not None:
            lpips_vals.append(np.asarray(lpips_j(real, gen)))
        n += real.shape[0]
    out = {
        "psnr": float(np.concatenate(psnr_vals).mean()),
        "ssim": float(np.sum(ssim_vals) / n),
    }
    if lpips_vals:
        out["lpips"] = float(np.concatenate(lpips_vals).mean())
    return out
