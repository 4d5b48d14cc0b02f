"""upfirdn2d: pad -> zero-upsample -> FIR filter -> downsample, NHWC.

TPU-native equivalent of the reference CUDA plugin
(torch_utils/ops/upfirdn2d.{py,cu}; semantics documented at upfirdn2d.py:118).
One ``lax.conv_general_dilated`` expresses the whole fused pipeline:
``lhs_dilation`` performs the zero-insertion upsample, explicit (possibly
negative) padding handles pad/crop, ``window_strides`` the downsample, and
``feature_group_count=C`` makes the FIR a depthwise conv. XLA lowers this to
a single fused op on the TPU convolution unit, and its transpose (the
gradient) is again an upfirdn — exactly the trick the reference implements by
hand (upfirdn2d.py:231-269) but derived automatically by JAX autodiff.

All tensors are NHWC (TPU-preferred); the reference is NCHW.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Filter = Optional[Union[np.ndarray, jnp.ndarray, Sequence[float], float]]


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def setup_filter(
    f: Filter,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> np.ndarray:
    """Normalize an FIR filter (reference: torch_utils/ops/upfirdn2d.py:70).

    Returns a float32 numpy array: 1-D if separable, else 2-D. (Host-side,
    static — filters are tiny constants baked into the jitted graph.)
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[tuple(slice(None, None, -1) for _ in range(f.ndim))]
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def _get_filter_size(f) -> tuple:
    if f is None:
        return 1, 1
    f = np.asarray(f)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def upfirdn2d(
    x: jnp.ndarray,
    f: Filter,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Fused pad/upsample/FIR/downsample on an NHWC batch.

    Matches the reference op's semantics (upfirdn2d.py:118-155): upsample by
    zero insertion, pad (negative = crop) w.r.t. the upsampled image, convolve
    with ``f`` (flip_filter=False means true convolution), keep every
    ``down``-th pixel, scale by ``gain``.
    """
    assert x.ndim == 4, "expected NHWC"
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    separable = f.ndim == 1
    if separable:
        fh_arr, fw_arr = f[:, None], f[None, :]
    else:
        fh_arr = fw_arr = None

    # True convolution flips the kernel; lax convs are cross-correlations.
    if not flip_filter:
        f = f[tuple(slice(None, None, -1) for _ in range(f.ndim))]
        if separable:
            fh_arr, fw_arr = f[:, None], f[None, :]

    C = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def depthwise(x, kernel2d, pad_h, pad_w, lhs_dil, strides):
        kh, kw = kernel2d.shape
        k = jnp.asarray(kernel2d, x.dtype)[:, :, None, None]
        k = jnp.tile(k, (1, 1, 1, C))  # HWIO with I=1, O=C, groups=C
        return jax.lax.conv_general_dilated(
            x,
            k,
            window_strides=strides,
            padding=(pad_h, pad_w),
            lhs_dilation=lhs_dil,
            rhs_dilation=(1, 1),
            dimension_numbers=dn,
            feature_group_count=C,
        )

    x_dtype = x.dtype
    if x_dtype in (jnp.float16, jnp.bfloat16):
        xc = x  # keep low precision; filter cast handled in depthwise
    else:
        xc = x

    # lhs_dilation inserts zeros only *between* samples; the reference op
    # inserts up-1 zeros *after* every sample, so the upsampled image has
    # up-1 trailing zeros per dim — account for them in the high padding.
    pady1_eff = pady1 + (upy - 1)
    padx1_eff = padx1 + (upx - 1)

    if separable:
        # Vertical pass: upsample+pad+filter rows; horizontal pass: cols+down.
        y = depthwise(
            xc,
            np.asarray(fh_arr),
            (pady0, pady1_eff),
            (0, 0),
            (upy, 1),
            (downy, 1),
        )
        y = depthwise(
            y,
            np.asarray(fw_arr),
            (0, 0),
            (padx0, padx1_eff),
            (1, upx),
            (1, downx),
        )
    else:
        y = depthwise(
            xc,
            f,
            (pady0, pady1_eff),
            (padx0, padx1_eff),
            (upy, upx),
            (downy, downx),
        )
    if gain != 1.0:
        y = y * jnp.asarray(gain, y.dtype)
    return y.astype(x_dtype)


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Same-size FIR filtering (reference: upfirdn2d.py:277)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [padx0 + fw // 2, padx1 + (fw - 1) // 2, pady0 + fh // 2, pady1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """FIR upsample (reference: upfirdn2d.py:313)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """FIR downsample (reference: upfirdn2d.py:352)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
