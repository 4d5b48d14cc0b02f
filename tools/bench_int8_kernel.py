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

    a = jax.jit(lambda xc: int8_matmul(xc, wq, ws, b))(x0)
    os.environ["VFM_VAE_NO_PALLAS_INT8"] = "1"
    r = jax.jit(lambda xc: int8_linear_prequant(xc, wq, ws, b))(x0)
    del os.environ["VFM_VAE_NO_PALLAS_INT8"]
    err = float(jnp.mean(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))) /
                (float(jnp.mean(jnp.abs(r.astype(jnp.float32)))) + 1e-12))
    print(f"pallas vs XLA-W8A8 rel-L1: {err:.2e}")


if __name__ == "__main__":
    main()
