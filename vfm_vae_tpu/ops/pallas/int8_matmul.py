"""Fused dynamic-quantize -> int8 matmul Pallas kernel (W8A8 serving path).

Why: v5e's MXU runs int8 at 2x the bf16 rate, but the plain-XLA W8A8 path
(ops/quantized.py) measured 0.88x end-to-end on the SigLIP2-L encoder — the
per-token absmax + round before every matmul lowers as extra full passes
over the (B*T, K) activation in HBM and breaks the layernorm->matmul
fusion neighborhood. This kernel removes that traffic: the activation tile
is read ONCE, quantized in VMEM (absmax + round on the VPU), and the int8
tile is reused across all N-tiles of the weight; the int32 accumulator is
rescaled (row scale x per-channel weight scale) and bias-added in-register
before the single bf16 write.

    y[m, n] = (sum_k q(x)[m, k] * wq[k, n]) * s[m] * ws[n] + b[n]
    q(x)[m, :] = round(x[m, :] / s[m]),  s[m] = max|x[m, :]| / 127

Quantization math is bit-identical to ops/quantized.int8_linear_prequant
(the jnp reference used by the parity tests and the non-TPU fallback).
HBM traffic per call: read x once (bf16), wq once (int8, half of bf16
weights), write y once — the same bytes as a plain bf16 matmul, with the
MXU running at the doubled int8 rate.

Serving use: the FROZEN VFM tower only (reference keeps it frozen,
siglip2_utils.py:114-137); opt-in via VFM_VAE_INT8_VFM=1. No backward pass
(frozen weights) — calls under differentiation take the jnp path's grads.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref, xq_ref, s_ref):
    # Grid = (M/bm, N/bn), n innermost: quantize the x row-tile once per
    # m-tile (n == 0) into persistent scratch, reuse for every n-tile.
    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-8)
        s_ref[...] = s
        xq_ref[...] = jnp.round(xf / s).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_ref[...] * ws_ref[...]
    y = y + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def _int8_matmul_2d(x, wq, ws, b, bm: int, bn: int):
    M, K = x.shape
    N = wq.shape[1]
    grid = (M // bm, N // bn)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda m, n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, wq, ws.reshape(1, N), b.reshape(1, N))


def _pick_tile(dim: int, target: int) -> int:
    """Largest divisor of `dim` that is <= target and a multiple of 128
    (falls back to the largest 128-multiple divisor, else dim itself)."""
    best = None
    for t in range(target, 127, -128):
        if dim % t == 0:
            return t
    for t in range(128, dim + 1, 128):
        if dim % t == 0:
            best = t
    return best or dim


def int8_matmul_eligible(x: jnp.ndarray, wq: jnp.ndarray) -> bool:
    # Opt-in only since round 2's scope fix: XLA's own int8 dot emitter is
    # both faster (225.8 TOP/s static / 157.3 dynamic vs this kernel's 164
    # best-case — tools/bench_int8_xla_dot.py) and safe at every flagship
    # shape, where this kernel's tile-cap heuristic blows scoped VMEM at
    # fc2 (M=98304, K=4096, N=1024: 20.08M > 16M). Kept for the measured
    # negative result and as a Mosaic int8 testbed.
    if os.environ.get("VFM_VAE_PALLAS_INT8") != "1":
        return False
    if os.environ.get("VFM_VAE_NO_PALLAS_INT8") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    K, N = wq.shape
    M = 1
    for d in x.shape[:-1]:
        M *= d
    return (
        K % 128 == 0 and N % 128 == 0 and M % 128 == 0 and M >= 256
        and K * 1 <= 8 * 1024 * 1024  # full-K row tile must sit in VMEM
    )


def int8_matmul(
    x: jnp.ndarray,            # (..., K) float
    wq: jnp.ndarray,           # (K, N) int8
    ws: jnp.ndarray,           # (N,) fp32
    b: Optional[jnp.ndarray],  # (N,) or None
    bm: Optional[int] = None,
    bn: Optional[int] = None,
) -> jnp.ndarray:
    """Fused-quantize int8 matmul over the flattened leading dims."""
    K, N = wq.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    bias = jnp.zeros((N,), jnp.float32) if b is None else b.astype(jnp.float32)
    # Tile budget: the double-buffered x block (2*bm*K bf16) dominates the
    # 16MB scoped-VMEM window — at K=4096 a bm=1024 tile is 16MB of x alone
    # and Mosaic refuses (measured: "16.50M ... limit 16.00M"). Cap the x
    # double buffer at ~8MB and the wq double buffer at ~4MB, then take the
    # largest 128-multiple divisors. Swept on v5e at (32768,1024,4096):
    # 1024x1024 tiles 1.679 ms = 163.7 TOP/s = 1.37x bf16 XLA; 512x512
    # 1.73; 256x512 1.89.
    # Empirically (Mosaic scoped-vmem accounting is opaque): 2*bm*K*2B at
    # 8MB still trips the limit at K=4096, 4MB (K=1024, bm=1024) is fine —
    # cap both pipeline double-buffers at 6MB.
    itemsize = max(x.dtype.itemsize, 2)
    bm_cap = max(128, (6 * 1024 * 1024) // (2 * K * itemsize))
    bn_cap = max(128, (6 * 1024 * 1024) // (2 * K))
    bm = bm or _pick_tile(M, min(1024, bm_cap))
    bn = bn or _pick_tile(N, min(1024, bn_cap))
    y = _int8_matmul_2d(x2, wq, ws.astype(jnp.float32), bias, bm, bn)
    return y.reshape(*lead, N)
