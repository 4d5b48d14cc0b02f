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
weight is 2-8% of traffic. This tool measures the isolated matmul AND the
fused MLP pair at every pyramid level, prints the measured win, and is the
evidence for wiring (or declining) the path.

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


def bench(fn, x, *ws, iters=20):
    """Time `fn(x, *ws)` with `iters` sequential in-graph applications via
    lax.scan (one RPC). Host-side repeat-and-block timing is NOT valid on
    this tunnel (block_until_ready returns before device completion —
    measured 46 PFLOP/s on a 128-deep matmul); the vanishing feedback term
    makes each iteration depend on the last so XLA cannot hoist or CSE."""
    import jax
    import jax.numpy as jnp

    def body(c, _):
        y = fn(c, *ws)
        c2 = c * (1 + 1e-30 * jnp.sum(y).astype(c.dtype))
        return c2, None

    f = jax.jit(lambda v: jax.lax.scan(body, v, None, length=iters)[0])
    float(jnp.sum(f(x)))  # compile
    t0 = time.perf_counter()
    float(jnp.sum(f(x)))
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

    print(f"{'shape':<16} {'M':>8} {'K':>4} {'N':>4}   bf16_ms  w8a16_ms  "
          f"ratio   pair_bf16  pair_w8a16  ratio")
    for label, M, K, N in decoder_mlp_shapes(args.batch):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.float32)

        def quant(w):
            ws = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-12)
            return jnp.round(w / ws).astype(jnp.int8), ws.astype(jnp.bfloat16)

        w1q, w1s = quant(w1)
        w2q, w2s = quant(w2)
        w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)

        # Isolated expand matmul.
        f_bf16 = jax.jit(lambda x, w: x @ w)
        f_w8 = jax.jit(lambda x, wq, ws: x @ (wq.astype(jnp.bfloat16) * ws))
        t_b = bench(f_bf16, x, w1b, iters=args.iters)
        t_q = bench(f_w8, x, w1q, w1s, iters=args.iters)

        # Fused MLP pair (expand -> GELU -> contract), the in-context form.
        p_bf16 = jax.jit(lambda x, a, b: jax.nn.gelu(x @ a) @ b)
        p_w8 = jax.jit(
            lambda x, aq, as_, bq, bs: jax.nn.gelu(
                x @ (aq.astype(jnp.bfloat16) * as_)
            ) @ (bq.astype(jnp.bfloat16) * bs))
        t_pb = bench(p_bf16, x, w1b, w2b, iters=args.iters)
        t_pq = bench(p_w8, x, w1q, w1s, w2q, w2s, iters=args.iters)

        print(f"{label:<16} {M:>8} {K:>4} {N:>4}   {t_b*1e3:7.3f}  {t_q*1e3:8.3f}  "
              f"{t_b/t_q:5.2f}   {t_pb*1e3:9.3f}  {t_pq*1e3:10.3f}  {t_pb/t_pq:5.2f}")


if __name__ == "__main__":
    main()
