#!/usr/bin/env python
"""Bare XLA int8 dot ceiling (the question bench_int8_kernel.py left open).

bench_int8_kernel.py's VFM_VAE_INT8_RAW probe measured the MXU int8 rate
*as lowered by Mosaic* (175-185 TOP/s, i.e. ~bf16 parity, far under the
394 TOP/s v5e spec). This tool measures the same bare contraction —
pre-quantized int8 x int8 -> int32, no quantize/rescale epilogue — through
XLA's own dot emitter instead, plus the mixed forms XLA can lower
(s8xs8->s32, s8xs8->bf16-convert, and bf16 baseline at the same shape).
If XLA also tops out ~185, the "int8 is not 2x on this toolchain" verdict
is toolchain-independent and final; if XLA reaches ~350+, the W8A8 serving
path deserves a re-attempt with XLA dots + Pallas-fused quantization.

  python tools/bench_int8_xla_dot.py [--m 32768] [--k 1024] [--n 4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32768)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--n", type=int, default=4096)
    args = ap.parse_args()

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    M, K, N = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    ops = 2 * M * K * N

    def dot(a, b, prefer):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=prefer
        )

    def chained(op, x):
        """ITERS dependent applications inside one jit; the scalar feedback
        term serializes them so XLA cannot CSE/hoist (axon rule: one RPC).
        Every element of y is consumed via a full sum — consuming only
        y[0,0] lets XLA's algebraic simplifier narrow the dot to a single
        dot-product and report fantasy rates (first version of this tool
        printed 271 'TOP/s' bf16 on a 197-peak chip that way). The sum
        itself costs one HBM read of y (~0.3 ms at M*N=128M int32); rates
        below are therefore mild *underestimates* of the bare dot."""

        @jax.jit
        def run(x):
            def body(c, _):
                y = op(c)
                s = jnp.sum(y, dtype=jnp.float32)
                f = s.astype(jnp.int32) % jnp.int32(2)
                if c.dtype == jnp.int8:
                    c2 = c.at[0, 0].add(f.astype(jnp.int8))
                else:
                    c2 = c.at[0, 0].add(1e-30 * f.astype(c.dtype))
                return c2, s

            _, outs = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(outs)

        float(run(x))  # compile + settle
        t0 = time.perf_counter()
        float(run(x))
        return (time.perf_counter() - t0) / ITERS

    cases = [
        ("bf16 x bf16 -> fp32 (baseline)", lambda c: dot(c, wb, jnp.float32), xb),
        ("s8 x s8 -> s32 (bare int8)", lambda c: dot(c, wq, jnp.int32), xq),
        ("s8 x s8 -> bf16 out", lambda c: dot(c, wq, jnp.int32).astype(jnp.bfloat16), xq),
    ]
    for name, op, x in cases:
        dt = chained(op, x)
        print(f"{name:34s} {dt * 1e3:7.3f} ms  {ops / dt / 1e12:6.1f} TOP/s",
              flush=True)

    # Serving-realistic head-to-head, immune to epilogue accounting: square
    # K=N chain where iteration i+1's dot consumes ALL of iteration i's
    # output (bf16: scale-down; int8: the W8A8 requantize — scale, round,
    # clip, cast — exactly the per-layer epilogue a quantized tower pays).
    # No reduction epilogue, no possible narrowing, weights stay resident.
    Ksq = args.n
    xb2 = jnp.asarray(rng.standard_normal((M, Ksq)), jnp.bfloat16)
    wb2 = jnp.asarray(rng.standard_normal((Ksq, Ksq)) / np.sqrt(Ksq), jnp.bfloat16)
    wq2 = jnp.asarray(rng.integers(-127, 128, (Ksq, Ksq)), jnp.int8)
    xq2 = jnp.asarray(rng.integers(-127, 128, (M, Ksq)), jnp.int8)
    ops_sq = 2 * M * Ksq * Ksq

    def chain_sq(step, x):
        @jax.jit
        def run(x):
            def body(c, _):
                c2 = step(c)
                return c2, ()

            out, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        return (time.perf_counter() - t0) / ITERS

    def bf16_step(c):
        y = dot(c, wb2, jnp.float32)
        return (y * (1.0 / np.sqrt(Ksq))).astype(jnp.bfloat16)

    def int8_step(c):
        y = dot(c, wq2, jnp.int32)
        # Fixed-scale requantize (dynamic per-row absmax would add one more
        # in-register reduce; fixed scale isolates the dot+cast cost).
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) * (1.0 / (127 * Ksq))
                                * 127.0), -127, 127)
        return yq.astype(jnp.int8)

    for name, step, x in [
        ("bf16 chain (K=N, full consume)", bf16_step, xb2),
        ("W8A8 chain (requantize epilogue)", int8_step, xq2),
    ]:
        dt = chain_sq(step, x)
        print(f"{name:34s} {dt * 1e3:7.3f} ms  {ops_sq / dt / 1e12:6.1f} TOP/s",
              flush=True)

    # Rectangular MLP-shaped chain (K -> N -> K, the ViT up/down pair) at
    # the CLI-given (m, k, n): isolates whether the square-chain int8 win
    # survives the encoder's actual K, and what dynamic per-row absmax
    # (the serving path's activation quantization) costs vs a fixed scale.
    wu_b = jnp.asarray(rng.standard_normal((K, N)) / np.sqrt(K), jnp.bfloat16)
    wd_b = jnp.asarray(rng.standard_normal((N, K)) / np.sqrt(N), jnp.bfloat16)
    wu_q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    wd_q = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
    ops_pair = 2 * M * K * N * 2

    def bf16_pair(c):
        h = dot(c, wu_b, jnp.float32).astype(jnp.bfloat16)
        return (dot(h, wd_b, jnp.float32) * (1.0 / np.sqrt(K))).astype(jnp.bfloat16)

    def w8a8_fixed_pair(c):
        h = dot(c, wu_q, jnp.int32)
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) / (127 * K)), -127, 127
                      ).astype(jnp.int8)
        y = dot(hq, wd_q, jnp.int32)
        return jnp.clip(jnp.round(y.astype(jnp.float32) / (127 * N)), -127, 127
                        ).astype(jnp.int8)

    def w8a8_dyn_pair(c):
        # c arrives bf16; quantize with per-row dynamic absmax before each
        # dot — the int8_linear_prequant serving formula.
        def qdot(a, wq):
            af = a.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(af), axis=-1, keepdims=True)
                            / 127.0, 1e-8)
            aq = jnp.round(af / s).astype(jnp.int8)
            return dot(aq, wq, jnp.int32).astype(jnp.float32) * s

        h = qdot(c, wu_q)
        return (qdot(h, wd_q) * (1.0 / (127 * K * 127 * N))).astype(jnp.bfloat16)

    for name, step, x in [
        ("bf16 MLP pair (K->N->K)", bf16_pair, xb),
        ("W8A8 MLP pair, fixed scales", w8a8_fixed_pair, xq),
        ("W8A8 MLP pair, dyn row absmax", w8a8_dyn_pair, xb),
    ]:
        dt = chain_sq(step, x)
        print(f"{name:34s} {dt * 1e3:7.3f} ms  {ops_pair / dt / 1e12:6.1f} TOP/s",
              flush=True)


if __name__ == "__main__":
    main()
