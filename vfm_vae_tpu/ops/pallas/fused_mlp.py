"""Fused ConvNeXt MLP Pallas kernel: modulated pw-expand -> exact GELU ->
pw-contract -> layer-scale -> residual, without materializing the 4x hidden.

Why: in ConvNeXtSynthesisLayer (reference convnext_utils.py:78-142) the
pointwise expansion produces a (B, H, W, 4C) tensor. At the decoder's top
resolution (256^2, C=128, B=128) that is an 8 GB HLO temp — it both OOMs
HBM at large batch and costs ~16 GB of write+read traffic per layer that
XLA cannot fuse away (two dot_generals with a transcendental between them).

This kernel tiles over (batch, row-tiles of the flattened H*W axis), keeps
the hidden tile in VMEM/registers, and chains both matmuls on the MXU with
fp32 accumulation:

    out = x_in + gamma * ( gelu((x * style_b) @ W1 * d1_b + b1) @ W2 + b2 )

Arithmetic intensity ~ 2*C flops/byte (C >= 128 -> MXU-bound); HBM traffic
drops from ~5 reads+writes of the wide hidden to exactly one read of x/x_in
and one write of out.

Parity: exact same math as models/modulated.py modulated_pointwise_conv2d +
gelu(approximate=False) + Conv2d 1x1 + layer scale + residual; verified in
interpret mode by tests/test_ops.py.

Tried and rejected — hidden-dim chunking (round 2): splitting 4C into
independent (dot1 -> VPU -> dot2) chunks, hoping Mosaic's VLIW scheduler
would issue chunk j+1's matmul under chunk j's elementwise work (the
per-tile serialization is why the kernel sits at ~48% MFU). Measured on
v5e at B64: 148.1 us/img (2 chunks) vs 148.9 (today) at (64^2, C=512) —
no overlap materializes — and the explicit whole-weight loads the chunk
slices require blew the 16 MB scoped-VMEM limit at C=256. The unchunked
form below is the measured optimum.

Tried and rejected — per-sample premodulated W1 (round 2): folding the
style (rows) and demod coefs (columns) into a bf16 (C, 4C) VMEM-scratch
copy of W1 once per sample (pl.when on the first row tile), eliminating
the per-tile style mul over (T, C) and the d-scale FMA over the wide
(T, 4C) hidden. Measured on v5e at B32: only ~2% faster (135.3 vs 138.6
us/img at 64^2 C=512; 159.5 vs 163.6 at 128^2 C=256; 223.7 vs 228.0 at
256^2 C=128) — the kernel is dot1->VPU->dot2 pipeline-bound, not
VPU-throughput-bound, so removing VPU work off the critical path barely
moves it. Numerics: rounding s*W1*d to bf16 AFTER combining all three
factors raises max rel error vs an fp32 ground truth from 3.9e-3 (1 out
ulp, today's form) to 2.7e-2 at C=512 — cancellation-prone rows amplify
the extra weight rounding. 2% is not worth 7x the tail error.

Tried and rejected — explicit software pipelining (round 2,
_fused_pipelined below): park the post-GELU activations in a VMEM
scratch and contract them on the NEXT grid step, making step k's dot2
(tile k-1) data-independent of step k's VPU chain. Bit-exact with the
per-tile form (tests/test_ops.py pipelined parity) but SLOWER at every
flagship decoder shape on v5e (tools/bench_mlp_pipeline.py, B96,
max|d|=0 vs per-tile): 64^2 C=512 118.0 -> 121.3 us/img (0.97x),
128^2 C=256 124.3 -> 132.0 (0.94x), 256^2 C=128 155.8 -> 187.1 (0.83x),
stable across 1-4 MB tile budgets. Mosaic already extracts the
cross-iteration overlap it can (the per-tile kernel measures 74% MFU
bare at C=512, 56% at the 256^2 C=128 shape where the VPU share is
largest); the manual pipeline adds a dead drain step, a second lagged
input stream, and a scratch write+read of the (T, 4C) hidden per step,
which costs more than the overlap recovers. Kept behind
VFM_VAE_MLP_PIPELINE=1 as a documented negative result.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476


def _dot(a, b):
    """MXU matmul (bf16-in ok) with fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# GELU via Phi(h) = (1 + tanh(q(h)))/2 with q an odd degree-9 polynomial
# (least-squares fit of atanh(2*Phi-1) on [0, 6], |h| clamped to 6 so the
# tail saturates; gelu tail error there is h*(1-Phi(6)) ~ 1e-8*h).
# Measured max |gelu - exact| = 7e-6 in fp32, ~3 decades below bf16 output
# resolution. Why tanh: the TPU VPU evaluates tanh in its hardware
# transcendental unit at ~matmul-hidden cost — an A/B on the bare kernel at
# the decoder's top-resolution shape (B96, 256^2, C=128) measured
# 0.206 ms/img for this form vs 0.376 for the erf polynomial with its
# divide (Abramowitz-Stegun) and 0.448 for a div-free Chebyshev evaluated
# by Clenshaw, against a 0.203 ms/img identity-GELU floor. The arithmetic
# polynomial paths are VPU-op-bound; this one rides the transcendental
# unit and is effectively free.
_GELU_TANH_ODD = (
    0.7978711584054661,
    0.03638788900114523,
    -8.481010892715382e-05,
    -3.7353061129101834e-05,
    1.4672760608990493e-06,
)


def _gelu_poly(h):
    """Exact-GELU approximation (|err| <= 7e-6) on the VPU transcendental
    unit: h * (1 + tanh(odd_poly(h))) / 2."""
    hc = jnp.clip(h, -6.0, 6.0)
    s = hc * hc
    acc = jnp.full_like(s, _GELU_TANH_ODD[-1])
    for c in _GELU_TANH_ODD[-2::-1]:
        acc = acc * s + c
    t = jnp.tanh(hc * acc)
    return h * 0.5 * (1.0 + t)


def _kernel_pipelined(x_ref, xin_ref, s_ref, d_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, g_ref, o_ref, a_scr):
    """Software-pipelined body: step k runs dot1 of tile k AND dot2 of tile
    k-1 (post-GELU activations parked in the `a_scr` VMEM scratch between
    steps). The two dots are data-independent inside one step, so the
    serialized VPU chain between them (demod FMA + GELU + casts over the
    (T, 4C) hidden) could in principle overlap the other tile's MXU work
    instead of gating it. MEASURED: loses at every flagship shape — see
    module docstring "Tried and rejected" entry. Tile k's output
    is written at step k+1 (out index map lags by one; the first step's
    write to block 0 is dead and overwritten before the block is flushed).
    The final grid step computes a dead dot1 on a re-fetched last tile —
    one tile of waste amortized over B*nt steps."""
    T = a_scr.shape[0]
    C = x_ref.shape[3]
    # Previous tile's activations FIRST (before this step overwrites them).
    a_prev = a_scr[...]
    s = s_ref[0, 0].astype(jnp.float32)
    xs = (x_ref[0].reshape(T, C).astype(jnp.float32) * s[None, :]).astype(
        x_ref.dtype
    )
    h = _dot(xs, w1_ref[...])  # MXU: tile k expand
    y = _dot(a_prev, w2_ref[...])  # MXU: tile k-1 contract (independent)
    y = y + b2_ref[0].astype(jnp.float32)[None, :]
    y = y * g_ref[0].astype(jnp.float32)[None, :]
    y = y + xin_ref[0].reshape(T, C).astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype).reshape(x_ref.shape[1], x_ref.shape[2], C)
    h = h * d_ref[0, 0].astype(jnp.float32)[None, :] + b1_ref[0, 0].astype(
        jnp.float32
    )[None, :]
    a_scr[...] = _gelu_poly(h).astype(a_scr.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pipelined(x, x_in, styles, dcoef, w1, b1, w2, b2, gamma,
                     interpret=False):
    B, Hh, W, C = x.shape
    H = w1.shape[1]
    budget = int(os.environ.get("VFM_VAE_MLP_TILE_KB", "2048")) * 1024
    tokens = max(W, budget // max(H * 4, 1))
    t = max(1, min(Hh, tokens // W))
    th = next((v for v in range(t, 0, -1) if Hh % v == 0), Hh)
    nt = Hh // th
    J = B * nt  # real tiles; grid has one extra drain step

    def cur(k):  # tile k, clamped at the drain step
        j = jnp.minimum(k, J - 1)
        return (j // nt, j % nt, 0, 0)

    def prev(k):  # tile k-1, clamped at the fill step
        j = jnp.maximum(k - 1, 0)
        return (j // nt, j % nt, 0, 0)

    def cur_b(k):
        return (jnp.minimum(k, J - 1) // nt, 0, 0)

    const = lambda k: (0, 0)
    const1 = lambda k: (0, 0)

    return pl.pallas_call(
        _kernel_pipelined,
        interpret=interpret,
        grid=(J + 1,),
        in_specs=[
            pl.BlockSpec((1, th, W, C), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W, C), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), cur_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, C), prev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hh, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((th * W, H), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hh * W * C * H,
            bytes_accessed=3 * B * Hh * W * C * x.dtype.itemsize
            + 2 * C * H * x.dtype.itemsize,
            transcendentals=B * Hh * W * H,
        ),
    )(x, x_in, styles.reshape(B, 1, C), dcoef.reshape(B, 1, H),
      w1, b1.reshape(B, 1, H), w2, b2.reshape(1, C), gamma.reshape(1, C))


def _kernel(x_ref, xin_ref, s_ref, d_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g_ref, o_ref):
    # x_ref: (1, th, W, C) input tile (4-D blocks: no HBM-level reshape of
    # the activation, which XLA would lower as a layout copy); flatten the
    # spatial axes on the VMEM tile where it is free.
    th, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    T = th * W
    s = s_ref[0, 0].astype(jnp.float32)  # (C,) per-sample style
    xt = x_ref[0].reshape(T, C)
    xs = (xt.astype(jnp.float32) * s[None, :]).astype(x_ref.dtype)
    h = _dot(xs, w1_ref[...])  # (T, 4C) fp32 accum
    h = h * d_ref[0, 0].astype(jnp.float32)[None, :] + b1_ref[0, 0].astype(jnp.float32)[None, :]
    # Exact GELU (erf form), matching jax.nn.gelu(approximate=False) to
    # within the tanh-form polynomial's ~7e-6.
    h = _gelu_poly(h)
    y = _dot(h.astype(x_ref.dtype), w2_ref[...])
    y = y + b2_ref[0].astype(jnp.float32)[None, :]
    y = y * g_ref[0].astype(jnp.float32)[None, :]
    y = y + xin_ref[0].reshape(T, C).astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype).reshape(th, W, C)


@functools.partial(jax.jit, static_argnames=())
def _fused(x, x_in, styles, dcoef, w1, b1, w2, b2, gamma):
    B, Hh, W, C = x.shape
    H = w1.shape[1]
    # Row tile (in image rows): keep x/xin/out tiles + the (th*W, 4C) fp32
    # hidden within a few MB of VMEM next to both weight blocks.
    itemsize = x.dtype.itemsize
    # Tile sizing (v5e sweeps): C=512 runs ~10% faster with 512-token tiles
    # (4MB hidden) than 256; C=128 measured best at the 4MB budget too
    # (0.232 vs 0.240 ms/img at 2MB, B96 256^2). C=256 is insensitive
    # (<1%) and a 4MB C=256 config once hit Mosaic's scoped-VMEM limit, so
    # it keeps the 2MB budget.
    default_kb = "4096" if (C >= 512 or C <= 128) else "2048"
    budget = int(os.environ.get("VFM_VAE_MLP_TILE_KB", default_kb)) * 1024
    tokens = max(W, budget // max(H * 4, 1))
    t = max(1, min(Hh, tokens // W))
    th = next((v for v in range(t, 0, -1) if Hh % v == 0), Hh)
    grid = (B, Hh // th)

    const = lambda b, i: (0, 0)
    per_b = lambda b, i: (b, 0, 0)  # (B, 1, C) layout: trailing dims full
    tile = lambda b, i: (b, i, 0, 0)

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, W, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W, C), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, C), tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hh, W, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hh * W * C * H,
            bytes_accessed=3 * B * Hh * W * C * itemsize + 2 * C * H * itemsize,
            transcendentals=B * Hh * W * H,  # one tanh per hidden element
        ),
    )(x, x_in, styles.reshape(B, 1, C), dcoef.reshape(B, 1, H),
      w1, b1.reshape(B, 1, H), w2, b2.reshape(1, C), gamma.reshape(1, C))


def _gelu_exact(h):
    return h * 0.5 * (1.0 + jax.lax.erf(h * _SQRT_HALF))


def _forward_jnp(x, xi, styles, dcoef, w1, b1, w2, b2, gamma, dtype):
    """Same math as the kernel (bf16 matmuls, fp32 accumulation) in plain
    XLA — the CPU reference for parity tests and the remat base for bwd."""
    xs = (x.astype(jnp.float32) * styles[:, None, :].astype(jnp.float32)).astype(dtype)
    h = jax.lax.dot_general(
        xs, w1.astype(dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h * dcoef[:, None, :].astype(jnp.float32) + b1[:, None, :].astype(jnp.float32)
    a = _gelu_exact(h)
    y = jax.lax.dot_general(
        a.astype(dtype), w2.astype(dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b2.astype(jnp.float32)) * gamma.astype(jnp.float32)
    return (y + xi.astype(jnp.float32)).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_op(x, xi, styles, dcoef, w1, b1, w2, b2, gamma, use_pallas):
    # x, xi: (B, H, W, C) -- 4-D at this boundary so the pallas path never
    # reshapes the activation in HBM.
    if use_pallas:
        impl = (
            _fused_pipelined
            if os.environ.get("VFM_VAE_MLP_PIPELINE") == "1"
            else _fused
        )
        return impl(x, xi, styles, dcoef, w1.astype(x.dtype), b1,
                    w2.astype(x.dtype), b2, gamma)
    B, Hh, W, C = x.shape
    out = _forward_jnp(x.reshape(B, Hh * W, C), xi.reshape(B, Hh * W, C),
                       styles, dcoef, w1, b1, w2, b2, gamma, x.dtype)
    return out.reshape(B, Hh, W, C)


def _fused_fwd(x, xi, styles, dcoef, w1, b1, w2, b2, gamma, use_pallas):
    out = _fused_op(x, xi, styles, dcoef, w1, b1, w2, b2, gamma, use_pallas)
    return out, (x, styles, dcoef, w1, b1, w2, b2, gamma)


def _fused_bwd(use_pallas, res, g):
    """Hand-written backward (plain XLA, rematerializes the hidden — the
    same memory profile jax.checkpoint would give the unfused chain).

    VFM_VAE_MLP_BWD_BF16=1 keeps the recomputed HIDDEN-width chain
    (h1 / gelu output / y_pre — each (B, N, 4C), the largest buffers in
    the whole training step's HLO traffic table, ~1 GB apiece at 256²)
    in bf16 instead of fp32. The GELU derivative itself stays fp32 (h is
    needed at full precision for the pdf term); what drops to bf16 is
    storage of the recomputed activations feeding the weight-gradient
    einsums — the same precision those einsums already cast to before
    multiplying. DEFAULT ON since the measured chip win (B8-dots
    449.1 -> 443.6 ms, loss identical to 4 decimals, grad parity within
    bf16-storage noise — tests/test_decoder_blocks.py); set
    VFM_VAE_MLP_BWD_BF16=0 to restore fp32 hidden storage."""
    x4, styles, dcoef, w1, b1, w2, b2, gamma = res
    Bb, Hh4, W4, C4 = x4.shape
    x = x4.reshape(Bb, Hh4 * W4, C4)
    g = g.reshape(Bb, Hh4 * W4, C4)
    f32 = jnp.float32
    dt = x.dtype
    bwd_bf16 = os.environ.get("VFM_VAE_MLP_BWD_BF16", "1") != "0" and dt != f32
    hdt = dt if bwd_bf16 else f32  # storage dtype of the hidden chain
    gf = g.astype(f32)
    # Recompute forward intermediates.
    xs = (x.astype(f32) * styles[:, None, :].astype(f32)).astype(dt)
    h1 = jax.lax.dot_general(xs, w1.astype(dt), (((2,), (0,)), ((), ())),
                             preferred_element_type=hdt)
    h = h1.astype(f32) * dcoef[:, None, :].astype(f32) + b1[:, None, :].astype(f32)
    a = _gelu_exact(h).astype(hdt)
    y_pre = jax.lax.dot_general(a.astype(dt), w2.astype(dt), (((2,), (0,)), ((), ())),
                                preferred_element_type=hdt)
    # out = (y_pre * gamma + xi); grad accumulations stay fp32.
    dxi = g  # reshaped back to 4-D at return
    dgamma = jnp.sum(gf * (y_pre.astype(f32) + b2.astype(f32)), axis=(0, 1))
    dy = gf * gamma.astype(f32)
    db2 = jnp.sum(dy, axis=(0, 1))
    da = jax.lax.dot_general(dy.astype(dt), w2.astype(dt), (((2,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dw2 = jnp.einsum("bnh,bnc->hc", a.astype(dt), dy.astype(dt),
                     preferred_element_type=f32)
    # d gelu (erf form): 0.5*(1+erf(h/sqrt2)) + h * pdf(h)
    pdf = jnp.exp(-0.5 * h * h) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    dh = da * (0.5 * (1.0 + jax.lax.erf(h * _SQRT_HALF)) + h * pdf)
    db1 = jnp.sum(dh, axis=1)  # (B, 4C): b1 is per-sample at this boundary
    ddcoef = jnp.sum(dh * h1.astype(f32), axis=1)
    dh1 = dh * dcoef[:, None, :].astype(f32)
    dxs = jax.lax.dot_general(dh1.astype(dt), w1.astype(dt), (((2,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dw1 = jnp.einsum("bnc,bnh->ch", xs, dh1.astype(dt), preferred_element_type=f32)
    dx = (dxs * styles[:, None, :].astype(f32)).astype(dt)
    dstyles = jnp.sum(dxs * x.astype(f32), axis=1)
    return (dx.reshape(x4.shape), dxi.reshape(x4.shape),
            dstyles.astype(styles.dtype), ddcoef.astype(dcoef.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype), dgamma.astype(gamma.dtype))


_fused_op.defvjp(_fused_fwd, _fused_bwd)


def fused_convnext_mlp(
    x: jnp.ndarray,      # (B, H, W, C) normed activations
    x_in: jnp.ndarray,   # (B, H, W, C) residual input
    styles: jnp.ndarray, # (B, C) modulation scales
    dcoef: jnp.ndarray,  # (B, 4C) demodulation coefs (pass ones if none)
    w1: jnp.ndarray,     # (C, 4C)
    b1: jnp.ndarray,     # (4C,) shared or (B, 4C) per-sample (GN-folded)
    w2: jnp.ndarray,     # (4C, C)
    b2: jnp.ndarray,     # (C,)
    gamma: jnp.ndarray,  # (C,) layer scale (pass ones if none)
    interpret: bool = False,
) -> jnp.ndarray:
    B = x.shape[0]
    if b1.ndim == 1:
        # Per-sample b1 at the custom_vjp boundary (the GN-folded path
        # passes an effective per-sample bias); broadcasting here lets
        # autodiff reduce db1 back to (4C,) for plain callers.
        b1 = jnp.broadcast_to(b1[None, :], (B, b1.shape[0]))
    return _fused_op(x, x_in, styles, dcoef, w1, b1, w2, b2, gamma,
                     not interpret)


def fused_mlp_eligible(x: jnp.ndarray) -> bool:
    """TPU backend, MXU-friendly channel count, flattenable spatial axis."""
    if os.environ.get("VFM_VAE_DISABLE_PALLAS_MLP") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    C = x.shape[-1]
    return C % 128 == 0 and x.shape[1] * x.shape[2] >= 8
