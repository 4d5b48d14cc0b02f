#!/usr/bin/env python
"""Per-stage inference timing on the real chip: encode-only, decode-only,
and the full encode+decode round trip, with XLA FLOP cost per stage.

Separates the frozen-ViT encoder (MXU-bound) from the synthesis decoder
(bandwidth-bound tail) so optimization targets the right stage. Also times
the opt-in dynamic-int8 encoder path (VFM_VAE_INT8_VFM=1 semantics) for
comparison without needing the env var.

  python tools/bench_stages.py [--batch 96] [--iters 5]

Axon-tunnel rules apply: every timed iteration forces a host read; per-call
RPC overhead (~35 ms) is amortized by the iteration count.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, iters: int) -> float:
    """Seconds per call, forcing a host read each call."""
    import jax.numpy as jnp

    float(jnp.sum(fn(*args)))  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


def stage_flops(jitfn, *args) -> float:
    """XLA cost-analysis FLOPs of an already-jitted fn (AOT lowering; fine
    for cost analysis, do NOT trust its HBM accounting — see verify skill)."""
    try:
        a = jitfn.lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--int8", action="store_true", help="also time the int8 encoder")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import flagship_generator

    G = flagship_generator()
    img = jnp.asarray(
        np.random.default_rng(0).random((args.batch, 256, 256, 3)), jnp.float32
    )
    variables = jax.jit(lambda r: G.init({"params": r}, img[:2], train=False))(
        jax.random.PRNGKey(0)
    )

    def encode(v, x):
        return G.apply(v, x, rng=None, method=G.encode)

    def decode(v, z):
        return G.apply(v, z, method=G.decode)

    def roundtrip(v, x):
        return decode(v, encode(v, x))

    enc = jax.jit(encode)
    dec = jax.jit(decode)
    rt = jax.jit(roundtrip)

    z = enc(variables, img)
    B = args.batch
    results = {}
    for name, fn, a in (
        ("encode", enc, (variables, img)),
        ("decode", dec, (variables, z)),
        ("roundtrip", rt, (variables, img)),
    ):
        dt = timed(fn, a, args.iters)
        fl = stage_flops(fn, *a)
        results[name] = (dt, fl)
        print(
            f"{name:10s}: {dt * 1e3 / B:7.3f} ms/img  {B / dt:8.1f} img/s  "
            f"{fl / dt / 1e12:6.1f} TFLOP/s  ({fl / B / 1e9:.1f} GFLOP/img)"
        )

    if args.int8:
        from vfm_vae_tpu.models.layers import int8_linear_scope
        from vfm_vae_tpu.ops.quantized import add_int8_collection

        def encode_int8(v, x):
            with int8_linear_scope(True):
                return G.apply(v, x, rng=None, method=G.encode)

        enc8 = jax.jit(encode_int8)
        dt = timed(enc8, (variables, img), args.iters)
        print(f"{'enc-i8dyn':10s}: {dt * 1e3 / B:7.3f} ms/img  {B / dt:8.1f} img/s")

        v8 = add_int8_collection(variables)  # weights quantized once, offline
        dt = timed(enc8, (v8, img), args.iters)
        print(f"{'enc-i8pre':10s}: {dt * 1e3 / B:7.3f} ms/img  {B / dt:8.1f} img/s")

    e, d, r = results["encode"][0], results["decode"][0], results["roundtrip"][0]
    print(f"sum(enc+dec) {1e3 * (e + d) / B:.3f} ms/img vs roundtrip "
          f"{1e3 * r / B:.3f} ms/img (fusion/RPC delta)")


if __name__ == "__main__":
    main()
