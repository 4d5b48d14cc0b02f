#!/usr/bin/env python
"""W8A16 (weight-only int8) A/B at the decoder ConvNeXt MLP shapes.

VERDICT r2 item 8: W8A8 on the decoder lost (activation quantize traffic
ate the MXU win — ops/quantized.py docstring); the remaining int8 angle is
weight-only: keep bf16 math (no accuracy risk, no quantize pass over the
activations) and read the weight from HBM as int8, dequantizing into the
matmul's operand ("in-register": XLA fuses convert+scale into the operand
producer; the Pallas form would stage the dequant through VMEM the same
way). Halves the WEIGHT bytes only, so the ceiling is set by the
weight:activation traffic ratio of each shape:

    pwconv1 at res r (B96 serving): M = 96*r^2, K = C(r), N = 4*C(r)
    weight bytes bf16 = K*N*2; activation bytes >= M*(K+N)*2

At res>=32 activations dominate 100:1 and the trade is invisible; the
only candidate shapes are the deep blocks (res 8/16, C=512), where the
weight is 2-8% of traffic. This tool measures the fused MLP pair
(expand -> GELU -> contract, the in-context form) at every pyramid level
and is the evidence for wiring (or declining) the path.

Measurement design (ADVICE r3 high+medium findings):
  * Weights are jit PARAMETERS, never closure constants — a closed-over
    weight lets XLA constant-fold convert(s8)*scale into a dense bf16
    weight at compile time, silently benchmarking plain bf16.
  * The scan iterates over a STACK of `iters` distinct weight copies, so
    the dequant is loop-VARIANT: neither CSE nor while-loop invariant
    code motion can hoist the int8 HBM read + convert out of the body.
    Each iteration therefore pays exactly the per-step weight traffic the
    serving decoder pays.
  * The pair's output has the carry's shape (M, K), so iterations chain
    directly (c -> mlp(c)) with NO artificial full-output reduction — the
    old jnp.sum(y) feedback re-read the whole (M, N) output every
    iteration, compressing the measurable ratio toward 1.0.
  * The compiled w8a16 HLO is asserted to still contain an s8 convert
    inside the while body (guards both failure modes above).

  python tools/bench_w8a16.py [--batch 96] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def decoder_mlp_shapes(batch: int):
    """(label, M, K, N) per flagship decoder pyramid level (pwconv1)."""
    from vfm_vae_tpu.models.synthesis import synthesis_channels

    res, ch = synthesis_channels(256, 6, 32768, 512)  # ch: {block_idx: C}
    return [(f"res{r}_C{ch[i]}", batch * r * r, ch[i], 4 * ch[i])
            for i, r in enumerate(res)]


def bench_chain(mlp, x, wstack, iters, expect_s8=False):
    """Time `iters` chained applications of `mlp(c, *w_i)` where `w_i` is
    the i-th slice of each stacked weight array (one jit, one RPC;
    host-side repeat-and-block timing is NOT valid on this tunnel —
    block_until_ready returns before device completion, measured 46
    PFLOP/s on a 128-deep matmul). Sequential dependence comes from the
    carry itself; per-iteration weight slices defeat CSE and loop-
    invariant code motion."""
    import jax
    import jax.numpy as jnp

    def body(c, w_i):
        return mlp(c, *w_i), None

    f = jax.jit(lambda v, ws: jax.lax.scan(body, v, ws)[0])
    if expect_s8:
        hlo = f.lower(x, wstack).compile().as_text()
        body_txt = hlo[hlo.find("while"):] if "while" in hlo else hlo
        assert "s8" in body_txt, (
            "w8a16 arm compiled away its int8 weights — the dequant was "
            "hoisted/constant-folded and the A/B is invalid")
    float(jnp.sum(f(x, wstack)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(f(x, wstack)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    print(f"{'shape':<16} {'M':>8} {'K':>4} {'N':>4}  w_frac%   "
          f"pair_bf16_ms  pair_w8a16_ms  speedup")
    rows = []
    for label, M, K, N in decoder_mlp_shapes(args.batch):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        # iters distinct weight copies (see module docstring). Scale 0.02
        # keeps the chained activations in gelu's linear-ish regime so the
        # carry neither explodes nor collapses to zero over 20 steps.
        w1 = rng.standard_normal((args.iters, K, N)).astype(np.float32) * 0.02
        w2 = rng.standard_normal((args.iters, N, K)).astype(np.float32) * 0.02

        def quant(w):  # per-output-channel symmetric int8 over axis -2
            s = np.maximum(np.abs(w).max(axis=-2, keepdims=True) / 127.0, 1e-12)
            return (jnp.asarray(np.round(w / s), jnp.int8),
                    jnp.asarray(s, jnp.bfloat16))

        w1q, w1s = quant(w1)
        w2q, w2s = quant(w2)
        w1b = jnp.asarray(w1, jnp.bfloat16)
        w2b = jnp.asarray(w2, jnp.bfloat16)

        def pair_bf16(c, a, b):
            return jax.nn.gelu(c @ a) @ b

        def pair_w8(c, aq, as_, bq, bs):
            return (jax.nn.gelu(c @ (aq.astype(jnp.bfloat16) * as_))
                    @ (bq.astype(jnp.bfloat16) * bs))

        t_pb = bench_chain(pair_bf16, x, (w1b, w2b), args.iters)
        t_pq = bench_chain(pair_w8, x, (w1q, w1s, w2q, w2s), args.iters,
                           expect_s8=True)

        # weight fraction of minimal pair traffic at bf16 (read x, w1, h,
        # w2, write h, y)
        w_bytes = 2 * (K * N + N * K)
        act_bytes = 2 * (M * K + 2 * M * N + M * K)
        w_frac = 100.0 * w_bytes / (w_bytes + act_bytes)
        rows.append((label, t_pb, t_pq))
        print(f"{label:<16} {M:>8} {K:>4} {N:>4}  {w_frac:6.2f}   "
              f"{t_pb*1e3:12.3f}  {t_pq*1e3:13.3f}  {t_pb/t_pq:7.3f}")

    total_b = sum(r[1] for r in rows)
    total_q = sum(r[2] for r in rows)
    print(f"\npyramid total: bf16 {total_b*1e3:.3f} ms  w8a16 {total_q*1e3:.3f} ms  "
          f"speedup {total_b/total_q:.3f}x")


if __name__ == "__main__":
    main()
