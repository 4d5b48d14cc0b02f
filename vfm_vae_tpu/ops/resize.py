"""Resampling with exact torch/PIL conventions, expressed as matrix products.

The reference leans on ``F.interpolate`` in several numerically sensitive
places: SigLIP2 preprocessing (x2 bilinear upscale, siglip2_utils.py:94-110),
EQ-prior antialiased downscale (siglip2_utils.py:102), latent EQ scaling
(generator.py:1169, plain bilinear), ViT pos-embed interpolation (bilinear or
bicubic per backbone, vfm_utils.py:17-23), and the legacy ConvNeXt noise
resize (convnext_utils.py:132). Checkpoint parity requires bit-level
agreement with those conventions:

  * half-pixel sampling (align_corners=False)
  * non-antialias: fixed 2-tap (linear) / 4-tap (cubic, a=-0.75) kernels with
    edge clamping
  * antialias (= PIL): kernel support scaled by the downscale ratio, window
    clipped to bounds, weights renormalized; cubic uses a=-0.5 like PIL

Each 1-D resampling is a dense (out,in) matrix built host-side with numpy at
trace time; the 2-D resize is two einsums. On TPU these are MXU matmuls —
faster and far more fusion-friendly than gather-based sampling.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


@lru_cache(maxsize=256)
def resize_matrix(
    in_size: int,
    out_size: int,
    kind: str = "linear",
    antialias: bool = False,
    a: Optional[float] = None,
) -> np.ndarray:
    """(out_size, in_size) float32 resampling matrix, torch conventions."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)

    scale = in_size / out_size
    M = np.zeros((out_size, in_size), dtype=np.float64)

    if antialias:
        # PIL / torch-antialias convention (applies on upscale too: window
        # clipped to bounds + renormalized, cubic a=-0.5).
        if kind == "linear":
            support, kern = 1.0, _linear_kernel
        else:
            aa = -0.5 if a is None else a
            support, kern = 2.0, lambda x: _cubic_kernel(x, aa)
        kscale = max(scale, 1.0)
        ss = support * kscale
        for i in range(out_size):
            center = (i + 0.5) * scale
            xmin = max(0, int(center - ss + 0.5))
            xmax = min(in_size, int(center + ss + 0.5))
            idx = np.arange(xmin, xmax)
            w = kern((idx - center + 0.5) / kscale)
            s = w.sum()
            if s != 0:
                w = w / s
            M[i, xmin:xmax] = w
    else:
        # Fixed-support sampling with edge clamp.
        if kind == "linear":
            for i in range(out_size):
                src = (i + 0.5) * scale - 0.5
                i0 = int(np.floor(src))
                t = src - i0
                for tap, w in ((i0, 1 - t), (i0 + 1, t)):
                    M[i, min(max(tap, 0), in_size - 1)] += w
        else:
            aa = -0.75 if a is None else a
            for i in range(out_size):
                src = (i + 0.5) * scale - 0.5
                i0 = int(np.floor(src))
                t = src - i0
                offs = np.array([-1, 0, 1, 2])
                w = _cubic_kernel(offs - t, aa)
                for tap, wk in zip(i0 + offs, w):
                    M[i, min(max(int(tap), 0), in_size - 1)] += wk
    return M.astype(np.float32)


def _apply_hw(x: jnp.ndarray, Mh: np.ndarray, Mw: np.ndarray) -> jnp.ndarray:
    # x: NHWC. Two MXU matmuls over the spatial axes, fp32 accumulate.
    dt = x.dtype
    y = jnp.einsum("oh,bhwc->bowc", jnp.asarray(Mh, jnp.float32), x.astype(jnp.float32))
    y = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(Mw, jnp.float32), y)
    return y.astype(dt)


def _out_hw(shape, size, scale_factor) -> Tuple[int, int]:
    H, W = int(shape[1]), int(shape[2])
    if size is not None:
        if isinstance(size, int):
            return size, size
        return int(size[0]), int(size[1])
    assert scale_factor is not None
    if np.ndim(scale_factor) == 0:
        sf_h = sf_w = float(scale_factor)
    else:
        sf_h, sf_w = float(scale_factor[0]), float(scale_factor[1])
    # torch floors the scaled size.
    return int(H * sf_h), int(W * sf_w)


def resize_bilinear(x, size=None, scale_factor=None, antialias: bool = False):
    """torch F.interpolate(mode='bilinear', align_corners=False) on NHWC."""
    oh, ow = _out_hw(x.shape, size, scale_factor)
    Mh = resize_matrix(int(x.shape[1]), oh, "linear", antialias)
    Mw = resize_matrix(int(x.shape[2]), ow, "linear", antialias)
    return _apply_hw(x, Mh, Mw)


def rot90_traced(x, k, axes=(2, 1)):
    """jnp.rot90 accepting a static int OR a traced int32 scalar `k`.

    Static k keeps the zero-cost pre-fold behavior (identity when k%4==0);
    a traced k lowers to a 4-way lax.switch of shape-preserving rot90s
    (requires square spatial dims), which is what lets one compiled train
    step cover all four EQ angles (reference ldm_utils.py:491-517 samples
    k per step; pre-fold each k was its own compiled variant)."""
    if isinstance(k, (int, np.integer)):
        return jnp.rot90(x, k=int(k), axes=axes) if int(k) % 4 else x
    assert x.shape[axes[0]] == x.shape[axes[1]], (
        f"traced rot90 needs square spatial dims, got {x.shape}"
    )
    return jax.lax.switch(
        jnp.asarray(k, jnp.int32) % 4,
        [lambda v, i=i: jnp.rot90(v, k=i, axes=axes) for i in range(4)],
        x,
    )


def resize_bicubic(x, size=None, scale_factor=None, antialias: bool = False):
    """torch F.interpolate(mode='bicubic', align_corners=False) on NHWC."""
    oh, ow = _out_hw(x.shape, size, scale_factor)
    Mh = resize_matrix(int(x.shape[1]), oh, "cubic", antialias)
    Mw = resize_matrix(int(x.shape[2]), ow, "cubic", antialias)
    return _apply_hw(x, Mh, Mw)


@lru_cache(maxsize=64)
def _adaptive_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch adaptive_avg_pool1d bin matrix: bin i = [floor(i*I/O), ceil((i+1)*I/O))."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        M[i, lo:hi] = 1.0 / (hi - lo)
    return M


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch F.adaptive_avg_pool2d on NHWC."""
    if isinstance(output_size, int):
        oh = ow = output_size
    else:
        oh, ow = output_size
    Mh = _adaptive_matrix(int(x.shape[1]), int(oh))
    Mw = _adaptive_matrix(int(x.shape[2]), int(ow))
    return _apply_hw(x, Mh, Mw)
