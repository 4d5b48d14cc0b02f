#!/usr/bin/env python
"""Standalone A/B of the fused Pallas int8 matmul vs bf16 XLA matmul vs the
plain-XLA W8A8 path, at ViT-L shapes. Fast signal before the full encoder
bench (tools/bench_int8.py).

Axon-tunnel rule: ~35 ms RPC overhead per host sync, and a single matmul at
these shapes is ~1 ms — so each timed call chains ITERS dependent matmuls
inside ONE jit (serialized via a tiny feedback term) and divides.

  python tools/bench_int8_kernel.py [--m 32768] [--k 1024] [--n 4096]
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

    from vfm_vae_tpu.ops.pallas.int8_matmul import int8_matmul

    M, K, N = args.m, args.k, args.n
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    wf = np.asarray(w, np.float32)
    ws_np = np.maximum(np.abs(wf).max(axis=0) / 127.0, 1e-12)
    wq = jnp.asarray(np.round(wf / ws_np[None, :]).astype(np.int8))
    ws = jnp.asarray(ws_np, jnp.float32)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)

    flops = 2 * M * K * N

    def chained(op):
        @jax.jit
        def run(x):
            def body(_, xc):
                y = op(xc)
                # Serialize iterations via a scalar feedback term (shape-
                # agnostic; epsilon keeps XLA from folding it away).
                return xc + (1e-6 * jnp.mean(y)).astype(xc.dtype)

            return jax.lax.fori_loop(0, ITERS, body, x)

        return run

    def timed(run, reps=3):
        float(jnp.sum(run(x0)))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            float(jnp.sum(run(x0)))
        return (time.perf_counter() - t0) / (reps * ITERS)

    bf16 = chained(lambda xc: xc @ w + b.astype(jnp.bfloat16))
    dt = timed(bf16)
    print(f"bf16 XLA      : {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TFLOP/s", flush=True)

    from vfm_vae_tpu.ops.quantized import int8_linear_prequant

    os.environ["VFM_VAE_NO_PALLAS_INT8"] = "1"
    xla8 = chained(lambda xc: int8_linear_prequant(xc, wq, ws, b))
    dt8x = timed(xla8)
    print(f"W8A8 XLA      : {dt8x * 1e3:7.3f} ms  {flops / dt8x / 1e12:6.1f} TOP/s", flush=True)
    del os.environ["VFM_VAE_NO_PALLAS_INT8"]

    pl8 = chained(lambda xc: int8_matmul(xc, wq, ws, b))
    dt8 = timed(pl8)
    print(f"W8A8 pallas   : {dt8 * 1e3:7.3f} ms  {flops / dt8 / 1e12:6.1f} TOP/s "
          f"({dt / dt8:.2f}x vs bf16)", flush=True)

    if os.environ.get("VFM_VAE_INT8_SWEEP") == "1":
        for bm, bn in ((256, 512), (512, 1024), (1024, 512), (512, 2048),
                       (1024, 1024), (2048, 512)):
            if M % bm or N % bn:
                continue
            f = chained(lambda xc, bm=bm, bn=bn: int8_matmul(xc, wq, ws, b, bm, bn))
            try:
                d = timed(f)
            except Exception as e:
                print(f"  bm={bm} bn={bn}: FAIL {type(e).__name__}", flush=True)
                continue
            print(f"  bm={bm} bn={bn}: {d * 1e3:7.3f} ms  "
                  f"{flops / d / 1e12:6.1f} TOP/s", flush=True)

    if os.environ.get("VFM_VAE_INT8_RAW") == "1":
        # Ceiling probe: bare int8 x int8 -> int32 Mosaic dot, pre-quantized
        # inputs, int8 narrowing write, NO quantize and NO fp epilogue. This
        # bounds what ANY software pipelining of the fused kernel could
        # reach. Measured on v5e (2026-08-17): 175-185 TOP/s across tile
        # shapes — ~1.07x the measured bf16 matmul rate (173 TFLOP/s), not
        # the 2x of the spec-sheet int8 peak (394 TOP/s). The MXU int8 path
        # as lowered by Mosaic does not deliver a doubled rate, so W8A8
        # serving cannot beat bf16 on this toolchain regardless of kernel
        # engineering. (The fused kernel's quantize+rescale epilogue costs
        # only the remaining ~10%: 164 vs 184 TOP/s.)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        xq8 = jnp.asarray(
            rng.integers(-127, 128, (M, K)).astype(np.int8)
        )

        def kern_raw(x_ref, w_ref, o_ref):
            acc = jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_ref[...] = (acc >> 8).astype(jnp.int8)

        @functools.partial(jax.jit, static_argnames=("bm", "bn"))
        def raw_int8(x, bm, bn):
            return pl.pallas_call(
                kern_raw,
                grid=(M // bm, N // bn),
                in_specs=[
                    pl.BlockSpec((bm, K), lambda m, n: (m, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, bn), lambda m, n: (0, n), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=flops, bytes_accessed=M * K + K * N + M * N,
                    transcendentals=0,
                ),
            )(x, wq)

        def timed_raw(bm, bn, reps=3):
            @jax.jit
            def chained_raw(x):
                def body(_, carry):
                    c, t = carry
                    # genuine feedback so XLA can't hoist the loop body
                    c = c.at[0, 0].add((t & 1).astype(jnp.int8))
                    y = raw_int8(c, bm, bn)
                    return c, jnp.sum(y[:1, :1].astype(jnp.int32))
                _, t = jax.lax.fori_loop(0, ITERS, body, (x, jnp.int32(0)))
                return t

            float(chained_raw(xq8))
            t0 = time.perf_counter()
            for _ in range(reps):
                float(chained_raw(xq8))
            return (time.perf_counter() - t0) / (reps * ITERS)

        for bm, bn in ((512, 1024), (1024, 1024), (1024, 2048), (2048, 1024)):
            if M % bm or N % bn:
                continue
            try:
                d = timed_raw(bm, bn)
            except Exception as e:
                print(f"raw int8 dot bm={bm} bn={bn}: FAIL {type(e).__name__}", flush=True)
                continue
            print(f"raw int8 dot bm={bm} bn={bn}: {d * 1e3:7.3f} ms  "
                  f"{flops / d / 1e12:6.1f} TOP/s (no quantize, no epilogue)",
                  flush=True)

    a = jax.jit(lambda xc: int8_matmul(xc, wq, ws, b))(x0)
    os.environ["VFM_VAE_NO_PALLAS_INT8"] = "1"
    r = jax.jit(lambda xc: int8_linear_prequant(xc, wq, ws, b))(x0)
    del os.environ["VFM_VAE_NO_PALLAS_INT8"]
    err = float(jnp.mean(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))) /
                (float(jnp.mean(jnp.abs(r.astype(jnp.float32)))) + 1e-12))
    print(f"pallas vs XLA-W8A8 rel-L1: {err:.2e}")


if __name__ == "__main__":
    main()
