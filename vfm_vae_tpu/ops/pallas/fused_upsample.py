"""Fused SeparableUpsampleWithFixedBlur Pallas kernel.

Reference chain (convnext_utils.py:197-256, pre_normalize=True):
    GN -> dw3x3 (zero-SAME, no bias) -> pw 1x1 (C_in -> 4*C_out, no bias)
       -> PixelShuffle(2) -> edge-replicate pad -> separable Gaussian blur

As separate XLA ops this chain costs ~45 ms per site at the decoder's top
resolution on v5e (measured: pixel-shuffle 6-D transpose copies, conv layout
copies, and five full read+write passes). This kernel does everything up to
and including the HORIZONTAL blur leg in one pass: row-tiled over the input,
dwconv via a prev/cur/next halo assembly, the pointwise expansion on the
MXU, the shuffle as a VMEM reshape, and the horizontal taps on the VPU.
The VERTICAL blur leg then runs as one plain-XLA 1-D depthwise conv
(_vblur): separable replicate-pad blur commutes across axes, XLA's dwconv
emitter beats an in-kernel vertical pass (it needs no halo recompute), and
evicting the row-coupled leg shrank the kernel's fp32 intermediates enough
to lift the row tile from 4 to ~14 rows at the 128->256 site.

GN is pre-folded by the caller into a per-(sample, channel) affine
(xn = x * a + c), same trick as ops/pallas/fused_mlp.py.

Gradients: custom_vjp whose backward is jax.vjp of the numerically
identical plain-XLA chain (remat semantics, exactly like fused_mlp).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(xp_ref, xc_ref, xn_ref, a_ref, c_ref, dw_ref, pw_ref, t_ref,
            o_ref, *, th: int, kb: int):
    """One (batch, row-tile) program: GN-affine -> dw3x3 -> pw expand ->
    PixelShuffle -> HORIZONTAL blur. The vertical blur leg runs as a plain
    XLA depthwise conv after the kernel (see _vblur): separable blur with
    per-axis replicate padding commutes across axes, and keeping the
    row-coupled leg out of the kernel shrinks the halo from
    1 + ceil(hb/2) rows to the dwconv's single row and eliminates the
    (2th, 2W, Co) fp32 vertical-pass intermediates that capped th at 4
    (35.6M scoped VMEM at the 128->256 site).

    xp/xc/xn: (1, th, W, Ci) prev/cur/next input row tiles.
    a/c: (1, 1, Ci) folded GN affine. dw: (3, 3, Ci). pw: (4, Ci, Co)
    per-subpixel weight slices. t: (1, kb) blur taps. o: (1, 2th, 2W, Co).
    """
    i = pl.program_id(1)
    n = pl.num_programs(1)
    W = xc_ref.shape[2]
    Ci = xc_ref.shape[3]
    Co = pw_ref.shape[2]
    hb = kb // 2

    a = a_ref[0, 0].astype(jnp.float32)
    c = c_ref[0, 0].astype(jnp.float32)

    # Input rows needed: [r0 - 1, r0 + th + 1) (dwconv halo only).
    top = xp_ref[0, th - 1:, :, :]
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = xn_ref[0, :1, :, :]
    bot = jnp.where(i == n - 1, jnp.zeros_like(bot), bot)
    xa = jnp.concatenate([top, xc_ref[0], bot], axis=0)  # (th+2, W, Ci)
    xa = (xa.astype(jnp.float32) * a[None, None, :] + c[None, None, :]).astype(
        xc_ref.dtype
    )
    # Rows outside the image must be ZERO for the dwconv's SAME padding —
    # the affine above made them c, so zero them back out. (Only the first
    # and last tile have such rows.)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    gidx = row + i * th - 1
    H_in = n * th
    valid = jnp.logical_and(gidx >= 0, gidx < H_in)
    xa = jnp.where(valid, xa, jnp.zeros_like(xa))

    # dwconv 3x3, zero SAME; output rows exactly [r0, r0 + th).
    xpad = jnp.pad(xa, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((th, W, Ci), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = xpad[dy:dy + th, dx:dx + W, :].astype(jnp.float32)
            acc = acc + tap * dw_ref[dy, dx, :].astype(jnp.float32)

    # Pointwise expand on the MXU: (th*W, Ci) @ (Ci, 4Co) per subpixel.
    # Mosaic cannot split the lane (channel) dim, so the caller pre-slices
    # pw into the four subpixel weights (q = i*2 + j, torch channel order
    # c*4 + q) and the shuffle becomes sublane/row interleaves of four
    # (th, W, Co) matmul results.
    a2d = acc.reshape(th * W, Ci).astype(xc_ref.dtype)
    uq = [
        _dot(a2d, pw_ref[q]).reshape(th, W, Co).astype(xc_ref.dtype)
        for q in range(4)
    ]
    top = jnp.stack([uq[0], uq[1]], axis=2).reshape(th, 2 * W, Co)
    bot = jnp.stack([uq[2], uq[3]], axis=2).reshape(th, 2 * W, Co)
    s = jnp.stack([top, bot], axis=1).reshape(2 * th, 2 * W, Co)

    # Horizontal blur leg with in-tile edge-replicate padding (the full
    # image width lives in the tile, so the clamp is globally exact).
    hpad = jnp.concatenate(
        [jnp.repeat(s[:, :1], hb, axis=1), s,
         jnp.repeat(s[:, -1:], hb, axis=1)], axis=1
    )
    acch = jnp.zeros((2 * th, 2 * W, Co), jnp.float32)
    for dx in range(kb):
        acch = acch + hpad[:, dx:dx + 2 * W].astype(jnp.float32) * t_ref[0, dx]
    o_ref[0] = acch.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kb",))
def _fused(x, a, c, dw, pw, taps, kb: int):
    B, H, W, Ci = x.shape
    Co = pw.shape[1] // 4
    # Per-subpixel weight slices (4, Ci, Co): q-th slice = columns q::4
    # (torch pixel-shuffle channel order c*4 + q).
    pw4 = pw.reshape(Ci, Co, 4).transpose(2, 0, 1)
    # Row tile within a VMEM budget. Dominant live arrays per tile row:
    # 3 input blocks (dbuf'd) + dw acc fp32 ~ W*(16*Ci) bytes, and the
    # shuffled bf16 s/hpad + fp32 acch + out ~ W*(30*Co). Halo is one
    # dwconv row, so the recompute overhead is 2/th.
    budget = int(os.environ.get("VFM_VAE_UPSAMPLE_TILE_KB", "7168")) * 1024
    per_row = W * (16 * Ci + 30 * Co)
    t0 = max(1, min(H, budget // max(per_row, 1)))
    th = next((v for v in range(t0, 0, -1) if H % v == 0), H)
    grid = (B, H // th)

    idx = lambda b, i: (b, i, 0, 0)
    idxp = lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0)
    idxn = lambda b, i: (b, jnp.minimum(i + 1, (H // th) - 1), 0, 0)
    blk = (1, th, W, Ci)

    return pl.pallas_call(
        functools.partial(_kernel, th=th, kb=kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, idxp, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, idxn, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ci), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ci), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Ci), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Ci, Co), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * W, Co), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, Co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * W * Ci * Co + 2 * B * H * W * Ci * 9,
            bytes_accessed=(4 * B * H * W * Ci + 8 * B * H * W * Co) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, a.reshape(B, 1, Ci), c.reshape(B, 1, Ci), dw, pw4,
      taps.reshape(1, kb))


def _forward_jnp(x, a, c, dw, pw, taps, kb: int):
    """Numerically identical plain-XLA chain (parity reference + bwd base)."""
    from ..pixelshuffle import pixel_shuffle

    B, H, W, Ci = x.shape
    Co = pw.shape[1] // 4
    dt = x.dtype
    # All-fp32 conv (no preferred_element_type: its transpose rule rejects
    # mixed-dtype cotangents, which breaks jax.vjp in the bwd path). The
    # bf16 round-trip on xn keeps parity with the kernel's bf16 tile loads.
    xn = (x.astype(jnp.float32) * a[:, None, None, :].astype(jnp.float32)
          + c[:, None, None, :].astype(jnp.float32)).astype(dt)
    t = jax.lax.conv_general_dilated(
        xn.astype(jnp.float32), dw[:, :, None, :].astype(jnp.float32),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Ci,
    )
    # bf16 dot (TPU accumulates fp32 internally — same as the kernel's
    # explicit f32-accum dot rounded to bf16).
    u = jax.lax.dot_general(
        t.reshape(B, H * W, Ci).astype(dt), pw.astype(dt),
        (((2,), (0,)), ((), ())),
    ).astype(dt)
    u = u.reshape(B, H, W, 4 * Co)
    s = pixel_shuffle(u, 2)
    hb = kb // 2
    sp = jnp.pad(s, ((0, 0), (0, 0), (hb, hb), (0, 0)), mode="edge")
    sf = sp.astype(jnp.float32)
    acch = jnp.zeros((B, 2 * H, 2 * W, Co), jnp.float32)
    for dx in range(kb):
        acch = acch + sf[:, :, dx:dx + 2 * W] * taps[dx]
    return acch.astype(dt)


def _vblur_toeplitz(H2: int, taps, kb: int):
    """Banded (H2, H2) matrix equal to blur-with-edge-replicate-rows:
    T[h, k] = sum of taps j landing on clamped source row k. taps may be a
    traced array (legacy resample filters live in module state), so T is a
    taps-weighted sum of kb constant clamped-shift 0/1 matrices."""
    hb = kb // 2
    shifts = np.zeros((kb, H2, H2), np.float32)
    for j in range(kb):
        for h in range(H2):
            shifts[j, h, min(max(h + j - hb, 0), H2 - 1)] = 1.0
    T = jnp.tensordot(jnp.asarray(taps, jnp.float32),
                      jnp.asarray(shifts), axes=1)
    return T.T  # rhs-side layout (k, h)


def _vblur(s, taps, kb: int):
    """Vertical blur leg. Separable replicate-pad blur commutes across
    axes, so horizontal-in-kernel then vertical-here equals the
    reference's vertical-then-horizontal order (convnext_utils.py:229-241)
    exactly in exact arithmetic. Two formulations (tools/bench_vblur.py):

    - H2 <= 128: ONE banded Toeplitz matmul contracting H on the MXU; the
      replicate pad folds into the matrix bit-exactly (dyadic-rational
      taps), and the jnp.pad copy (0.19 ms/img at B128 in the serving
      trace) disappears. 14% faster than pad+dwconv at (128,128,512).
    - larger H2: edge-pad + plain-XLA 1-D depthwise conv — at the top
      resolution the matmul's H2^2 band is mostly zeros and the VPU
      dwconv ties it, so keep the cheaper-to-compile form.

    Same-dtype compute on purpose: preferred_element_type=f32 on the conv
    broke the bf16 TRAINING path (jax's conv transpose rule rejects the
    mixed f32-cotangent/bf16-kernel pair — caught by the flagship EQ
    compile sweep). The blur taps ([1,4,6,4,1]/16-family dyadic rationals)
    are exactly representable in bf16, so the only deviation from the
    kernel's fp32-accumulate-once policy is the bf16 rounding of the
    horizontal leg it consumes."""
    Co = s.shape[-1]
    hb = kb // 2
    H2 = s.shape[1]
    if H2 <= 128 and os.environ.get("VFM_VAE_NO_VBLUR_MM") != "1":
        T = jnp.asarray(_vblur_toeplitz(H2, taps, kb), s.dtype)
        # dot_general's transpose rule accepts preferred_element_type, so
        # fp32 accumulation is safe here (unlike the conv form above).
        return jnp.einsum(
            "bkwc,kh->bhwc", s, T, preferred_element_type=jnp.float32
        ).astype(s.dtype)
    sp = jnp.pad(s, ((0, 0), (hb, hb), (0, 0), (0, 0)), mode="edge")
    kv = jnp.tile(taps.astype(s.dtype)[:, None, None, None], (1, 1, 1, Co))
    return jax.lax.conv_general_dilated(
        sp, kv, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=Co,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_op(x, a, c, dw, pw, taps, kb, use_pallas):
    if use_pallas:
        return _fused(x, a, c, dw, pw.astype(x.dtype), taps, kb)
    return _forward_jnp(x, a, c, dw, pw, taps, kb)


def _fused_fwd(x, a, c, dw, pw, taps, kb, use_pallas):
    out = _fused_op(x, a, c, dw, pw, taps, kb, use_pallas)
    return out, (x, a, c, dw, pw, taps)


def _fused_bwd(kb, use_pallas, res, g):
    x, a, c, dw, pw, taps = res
    _, vjp = jax.vjp(lambda *args: _forward_jnp(*args, kb), x, a, c, dw, pw, taps)
    return vjp(g)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def fused_upsample_blur(
    x: jnp.ndarray,      # (B, H, W, Ci)
    a: jnp.ndarray,      # (B, Ci) folded GN scale (rstd * gn_w broadcast)
    c: jnp.ndarray,      # (B, Ci) folded GN offset
    dw: jnp.ndarray,     # (3, 3, Ci) depthwise kernel (squeezed HWIO)
    pw: jnp.ndarray,     # (Ci, 4*Co) pointwise kernel
    taps: Sequence[float] | jnp.ndarray,  # normalized 1-D blur taps, odd len
    interpret: bool = False,
) -> jnp.ndarray:
    taps = jnp.asarray(taps, jnp.float32)
    kb = int(taps.shape[0])
    # _fused_op = GN + dw + pw + shuffle + horizontal blur (pallas fwd,
    # custom_vjp); the vertical leg is ordinary XLA and autodiffs normally.
    return _vblur(_fused_op(x, a, c, dw, pw, taps, kb, not interpret), taps, kb)


def fused_upsample_eligible(x, upscale_factor: int, taps_len: int,
                            pre_normalize: bool, use_blur: bool,
                            pad_mode: str, Ci: int, Co: int) -> bool:
    if os.environ.get("VFM_VAE_DISABLE_PALLAS_UPSAMPLE") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if not (pre_normalize and use_blur and pad_mode == "edge"):
        return False
    if upscale_factor != 2 or taps_len % 2 == 0:
        return False
    # Co lanes per subpixel matmul: needs full 128-lane tiles. The kernel
    # halo is one dwconv row (the vertical blur leg runs outside it).
    return Ci % 128 == 0 and Co % 128 == 0 and x.shape[1] >= 1
