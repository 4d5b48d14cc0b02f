"""Pallas TPU depthwise conv2d (stride 1, SAME padding, NHWC).

Status: correct (interpret-mode parity vs lax) but NOT enabled by default.
Measured head-to-head on v5e with per-call tunnel overhead subtracted, XLA's
depthwise lowering wins (~15ms vs ~45ms for 7x7/128ch/256^2) because this
kernel's prev/cur/next block mapping reads the input three times. Kept as
infrastructure for a future halo-DMA variant (single read + manual
make_async_copy halos), opt-in via depthwise_conv2d_same().

Design: grid over (batch, row-tiles). The same input is mapped THREE times
with shifted row-tile index maps (prev/cur/next) to assemble the vertical
halo in VMEM without overlapping-block DMA; horizontal halo is a VMEM pad.
The k^2 taps become k^2 shifted fused multiply-adds on the VPU with an fp32
accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(xp_ref, xc_ref, xn_ref, w_ref, b_ref, o_ref, *, k: int, th: int):
    halo = k // 2
    i = pl.program_id(1)
    n = pl.num_programs(1)

    top = xp_ref[0, th - halo :, :, :]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = xn_ref[0, :halo, :, :]
    bot = jnp.where(i == n - 1, jnp.zeros_like(bot), bot)
    x = jnp.concatenate([top, xc_ref[0], bot], axis=0)  # (th+2h, W, C)
    x = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))

    W = xc_ref.shape[2]
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = x[dy : dy + th, dx : dx + W, :].astype(jnp.float32)
            acc = acc + tap * w_ref[dy, dx, :].astype(jnp.float32)
    if b_ref is not None:
        acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k",))
def _dwconv_same(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray], k: int):
    B, H, W, C = x.shape
    # Row tile: 3 input blocks + 1 output, each double-buffered by the
    # pipeline -> 8 tile buffers must fit in ~14MB VMEM. Budget ~0.75MB/tile.
    bytes_per_row = W * C * x.dtype.itemsize
    target = max(8, min(H, (768 * 1024) // max(bytes_per_row, 1)))
    th = next((t for t in range(target, 7, -1) if H % t == 0), H)
    grid = (B, H // th)

    def idx(bi, ti):
        return (bi, ti, 0, 0)

    def idx_prev(bi, ti):
        return (bi, jnp.maximum(ti - 1, 0), 0, 0)

    def idx_next(bi, ti):
        return (bi, jnp.minimum(ti + 1, (H // th) - 1), 0, 0)

    block = (1, th, W, C)
    in_specs = [
        pl.BlockSpec(block, idx_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        pl.BlockSpec(block, idx_next, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, k, C), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, w]
    if b is not None:
        in_specs.append(pl.BlockSpec((C,), lambda bi, ti: (0,), memory_space=pltpu.VMEM))
        args.append(b)
        kern = functools.partial(_dw_kernel, k=k, th=th)
    else:
        kern = functools.partial(
            lambda xp, xc, xn, wr, o, *, k, th: _dw_kernel(xp, xc, xn, wr, None, o, k=k, th=th),
            k=k, th=th,
        )

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * k * k,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)


def depthwise_conv2d_same(
    x: jnp.ndarray,  # (B, H, W, C)
    w: jnp.ndarray,  # (k, k, 1, C) HWIO depthwise kernel
    b: Optional[jnp.ndarray] = None,
    interpret_ok: bool = False,
) -> jnp.ndarray:
    """Drop-in for lax depthwise conv with stride 1 + SAME (k//2) padding."""
    k = int(w.shape[0])
    return _dwconv_same(x, w[:, :, 0, :], b, k)


def pallas_dw_eligible(x, kernel_size: int, stride: int, padding, groups: int,
                       in_channels: int, out_channels: int) -> bool:
    import os

    if os.environ.get("VFM_VAE_DISABLE_PALLAS_DW") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if not (groups == in_channels == out_channels):
        return False
    if stride != 1 or kernel_size % 2 == 0:
        return False
    if padding != kernel_size // 2:
        return False
    C = x.shape[-1]
    return C % 128 == 0 and x.shape[1] >= 8
