#!/usr/bin/env python
"""Fused ConvNeXt-MLP kernel sweep at the flagship decoder shapes.

The fused kernel (ops/pallas/fused_mlp.py) is ~1.9 ms/img of the 5.6 ms/img
decode at B128 — the single largest decoder line. This sweeps its row-tile
VMEM budget (VFM_VAE_MLP_TILE_KB) per shape, and times the full ConvNeXt
layer (dwconv + GN stats + fused kernel) so the number matches the
profiler's in-context attribution.

  python tools/bench_mlp_sweep.py [--batch 128] [--tiles 2048,4096,8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_op(op, x, n=10):
    import jax
    import jax.numpy as jnp

    def body(c, _):
        y = op(c)
        c2 = c * (1 + 1e-30 * jnp.sum(y).astype(c.dtype))
        return c2, None

    f = jax.jit(lambda v: jax.lax.scan(body, v, None, length=n)[0])
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tiles", default="2048,4096,8192,12288")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from vfm_vae_tpu.models.convnext import ConvNeXtSynthesisLayer

    B = args.batch
    w_dim = 512
    w = jax.random.normal(jax.random.PRNGKey(9), (B, w_dim), jnp.float32)

    shapes = [(64, 512, 7), (128, 256, 7), (256, 128, 7)]
    for res, C, k in shapes:
        m = ConvNeXtSynthesisLayer(C, w_dim, k, block_index=0, legacy=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, C), jnp.bfloat16)
        v = jax.jit(lambda r: m.init({"params": r}, x, w))(jax.random.PRNGKey(0))
        fl = 16 * C * C * res * res * 2 / 1e9
        for kb in args.tiles.split(","):
            os.environ["VFM_VAE_MLP_TILE_KB"] = kb
            dt = time_op(lambda xx: m.apply(v, xx, w), x, args.iters) * 1e3 / B
            print(f"res{res:<4d} C{C:<4d} tile {kb:>6s} KB: {dt:7.4f} ms/img "
                  f"({fl / dt:6.1f} TFLOP/s pw)", flush=True)
        os.environ.pop("VFM_VAE_MLP_TILE_KB", None)


if __name__ == "__main__":
    main()
