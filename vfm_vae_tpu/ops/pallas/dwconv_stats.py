"""Fused depthwise-conv + bias + legacy-noise + GroupNorm statistics.

NEGATIVE RESULT — correct but NOT wired in (opt-in infrastructure only).
Measured on v5e at B64 (tools/bench_dwstats.py), us/img, vs the unfused
XLA dwconv + noise + group_stats chain:

    ( 64, 64,512,k7): xla 106.6   fused 281.9
    (128,128,256,k7): xla 172.5   fused 480.0
    (256,256,128,k7): xla 294.1   fused 940.8

Even with the halo fixed to h-row side blocks (the 3x-read flaw that sank
ops/pallas/dwconv.py), Mosaic lowers the k^2 shifted-tap accumulation
~3x slower than XLA's depthwise emitter — the stencil's sublane shifts
become real vector copies rather than XLA's in-register rotations. The
statistics savings (~0.57 ms/img across the decoder) cannot pay for a 3x
dwconv. The serving path keeps XLA's dwconv + the twosum statistics pass
(both individually at their measured rooflines).

Original motivation below, kept for the record.

In ConvNeXtSynthesisLayer (reference convnext_utils.py:78-142) the chain
dwconv -> (+noise) -> GroupNorm runs as three HBM passes over the
(B, H, W, C) activation on the serving path: the XLA dwconv's read+write,
then one more full read for the norm statistics (ops/groupnorm.py
group_stats, measured 0.57 ms/img at B96 across the decoder). The dwconv
itself is VPU-compute-bound (~5.3 TFLOP/s effective for k=7 at the top
resolution), so the statistics can ride in its shadow: this kernel emits
the conv output AND the per-(sample, channel) fp32 moment sums (s1, s2)
in one pass, removing the statistics read entirely.

Why this Pallas dwconv can win where ops/pallas/dwconv.py lost: that
kernel mapped the full input THREE times (prev/cur/next row tiles) to
assemble the vertical halo -> 3x HBM read traffic. Here the halo
neighbours are h-row blocks (h = k//2, row tile th a multiple of h), so
the read overhead is 2h/th (~25% at th=24) instead of 200%, and the freed
statistics pass more than pays for it.

Numerics match the unfused chain bit-for-bit on the conv output: fp32
accumulation rounded once to the activation dtype, then bias and noise
added in that dtype (the Conv2d + noise-add rounding order in
models/convnext.py); statistics are fp32 sums of the rounded values,
exactly like group_stats on the conv output.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xc_ref, xp_ref, xn_ref, w_ref, b_ref, nz_ref,
            o_ref, s1_ref, s2_ref, *, k: int, th: int, H: int, use_noise: bool):
    h = k // 2
    i = pl.program_id(1)
    W = xc_ref.shape[2]
    C = xc_ref.shape[3]

    # Assemble rows [i*th - h, i*th + th + h) with the h-row halo blocks.
    xa = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
    # Zero rows outside the image (dwconv zero-SAME; also keeps padded /
    # clamped halo garbage out of the accumulator and the statistics).
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2 * h, 1, 1), 0)
    gidx = row + i * th - h
    valid = jnp.logical_and(gidx >= 0, gidx < H)
    xa = jnp.where(valid, xa, jnp.zeros_like(xa))

    xpad = jnp.pad(xa, ((0, 0), (h, h), (0, 0)))
    acc = jnp.zeros((th, W, C), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = xpad[dy:dy + th, dx:dx + W, :].astype(jnp.float32)
            acc = acc + tap * w_ref[dy, dx, :].astype(jnp.float32)

    # Rounding order matches the unfused path: fp32 conv accum -> round to
    # activation dtype -> + bias -> + noise, each add in that dtype.
    t = acc.astype(o_ref.dtype)
    t = t + b_ref[0].astype(o_ref.dtype)[None, None, :]
    if use_noise:
        t = t + nz_ref[0].astype(o_ref.dtype)

    # Output rows beyond H are dropped by the store masking, but they must
    # not contaminate the statistics.
    orow = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) + i * th
    ovalid = orow < H
    o_ref[0] = t
    tf = jnp.where(ovalid, t.astype(jnp.float32), 0.0)
    p1 = jnp.sum(tf, axis=(0, 1))
    p2 = jnp.sum(tf * tf, axis=(0, 1))

    @pl.when(i == 0)
    def _init():
        s1_ref[0, 0] = p1
        s2_ref[0, 0] = p2

    @pl.when(i != 0)
    def _acc():
        s1_ref[0, 0] = s1_ref[0, 0] + p1
        s2_ref[0, 0] = s2_ref[0, 0] + p2


@functools.partial(jax.jit, static_argnames=("k", "use_noise"))
def _fused(x, w, b, nz, k: int, use_noise: bool):
    B, H, W, C = x.shape
    h = k // 2
    # Row tile: multiple of h (so the halo neighbours are whole h-row
    # blocks) within a VMEM budget; ragged tail handled by masking.
    budget = int(os.environ.get("VFM_VAE_DWSTATS_TILE_KB", "12288")) * 1024
    itemsize = x.dtype.itemsize
    # Honest scoped-VMEM model per tile row: in/out blocks double-buffered
    # (4 copies) + the xa/xpad assembly copies (~2.5x) + fp32 acc and tf
    # (8 bytes). 17.2M measured at th=24, W*C=32K -> ~29 B/element.
    per_row = W * C * (7 * itemsize + 15)
    t0 = max(h, min(H, budget // max(per_row, 1)))
    th = max(h, (t0 // h) * h)
    R = -(-H // th)
    nb = -(-H // h)  # h-row blocks available for halo indexing

    idx = lambda bb, i: (bb, i, 0, 0)
    r = th // h
    idxp = lambda bb, i: (bb, jnp.maximum(i * r - 1, 0), 0, 0)
    idxn = lambda bb, i: (bb, jnp.minimum((i + 1) * r, nb - 1), 0, 0)

    kern = functools.partial(_kernel, k=k, th=th, H=H, use_noise=use_noise)
    out, s1, s2 = pl.pallas_call(
        kern,
        grid=(B, R),
        in_specs=[
            pl.BlockSpec((1, th, W, C), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, W, C), idxp, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, W, C), idxn, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, C), lambda bb, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W, 1), lambda bb, i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, W, C), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * k * k,
            bytes_accessed=2 * B * H * W * C * itemsize,
            transcendentals=0,
        ),
    )(x, x, x, w, b.reshape(1, C), nz[..., None])
    return out, s1[:, 0], s2[:, 0]


def _forward_jnp(x, w, b, nz, k: int, use_noise: bool):
    """The unfused chain (parity reference + autodiff base)."""
    C = x.shape[-1]
    t = jax.lax.conv_general_dilated(
        x, w[:, :, None, :].astype(x.dtype), (1, 1),
        [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    t = t + b.astype(t.dtype)
    if use_noise:
        t = t + nz[:, :, :, None].astype(t.dtype)
    tf = t.astype(jnp.float32)
    s1 = jnp.sum(tf, axis=(1, 2))
    s2 = jnp.sum(jnp.square(tf), axis=(1, 2))
    return t, s1, s2


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_op(x, w, b, nz, k, use_noise, use_pallas):
    if use_pallas:
        return _fused(x, w, b, nz, k, use_noise)
    return _forward_jnp(x, w, b, nz, k, use_noise)


def _fused_fwd(x, w, b, nz, k, use_noise, use_pallas):
    out = _fused_op(x, w, b, nz, k, use_noise, use_pallas)
    return out, (x, w, b, nz)


def _fused_bwd(k, use_noise, use_pallas, res, g):
    x, w, b, nz = res
    _, vjp = jax.vjp(lambda *a: _forward_jnp(*a, k, use_noise), x, w, b, nz)
    return vjp(g)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def dwconv_noise_stats(
    x: jnp.ndarray,            # (B, H, W, C)
    w: jnp.ndarray,            # (k, k, C) depthwise kernel (squeezed HWIO)
    b: jnp.ndarray,            # (C,) bias
    noise: jnp.ndarray | None,  # (H, W) pre-scaled noise map (fp32) or None
    interpret: bool = False,
):
    """Returns (t, s1, s2): the dwconv+bias(+noise) output in x.dtype and
    per-(sample, channel) fp32 moment sums over (H, W). Fold s1/s2 into
    group statistics with ops.groupnorm.fold_group_stats."""
    k = int(w.shape[0])
    B, H, W, _ = x.shape
    use_noise = noise is not None
    if noise is None:
        nz = jnp.zeros((1, H, W), jnp.float32)
    else:
        nz = jnp.broadcast_to(noise[None], (1, H, W)).astype(jnp.float32)
    return _fused_op(x, w, b, nz, k, use_noise, not interpret)


def dwconv_stats_eligible(x: jnp.ndarray, k: int) -> bool:
    if os.environ.get("VFM_VAE_DISABLE_PALLAS_DWSTATS") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    C = x.shape[-1]
    return C % 128 == 0 and k in (5, 7) and x.shape[1] >= k // 2
