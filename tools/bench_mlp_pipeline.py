#!/usr/bin/env python
"""Head-to-head: per-tile fused ConvNeXt MLP vs the software-pipelined form.

The per-tile kernel sits at ~48% MFU because each grid step serializes
dot1 -> (demod FMA + GELU + casts over the (T, 4C) hidden, all VPU) -> dot2.
The pipelined kernel (ops/pallas/fused_mlp.py::_fused_pipelined) parks the
post-GELU activations in a VMEM scratch and contracts them on the NEXT grid
step, so step k's dot2(tile k-1) is data-independent of step k's VPU chain
and Mosaic can keep the MXU busy across tiles.

Bare-kernel A/B at the flagship decoder shapes + tile-budget sweep.

MEASURED RESULT (v5e, B96, 2026-08-18): pipelined LOSES everywhere —
0.97x at 64^2 C=512, 0.94x at 128^2 C=256, 0.83x at 256^2 C=128, stable
across 1-4 MB tile budgets, bit-exact outputs. Mosaic's own scheduling
already overlaps what it can; see ops/pallas/fused_mlp.py docstring.

  python tools/bench_mlp_pipeline.py [--batch 96] [--tiles 1024,2048,4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_fn(f, args_, n=10):
    import jax
    import jax.numpy as jnp

    out = f(*args_)
    float(jnp.sum(out))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args_)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--tiles", default="1024,2048,4096")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import vfm_vae_tpu.ops.pallas.fused_mlp as fm

    B = args.batch
    shapes = [(64, 512), (128, 256), (256, 128)]
    for res, C in shapes:
        H = 4 * C
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(k1, (B, res, res, C), jnp.bfloat16)
        xin = jax.random.normal(k2, (B, res, res, C), jnp.bfloat16)
        styles = jax.random.normal(k3, (B, C), jnp.float32)
        dcoef = jnp.ones((B, H), jnp.float32)
        w1 = 0.02 * jax.random.normal(k1, (C, H), jnp.bfloat16)
        b1 = jnp.zeros((B, H), jnp.float32)
        w2 = 0.02 * jax.random.normal(k2, (H, C), jnp.bfloat16)
        b2 = jnp.zeros((C,), jnp.float32)
        gamma = jnp.full((C,), 1e-5, jnp.float32)
        a = (x, xin, styles, dcoef, w1, b1, w2, b2, gamma)

        # Parity first (one tile budget): pipelined == per-tile bitwise-ish.
        ref = fm._fused(*a)
        pip = fm._fused_pipelined(*a)
        err = float(
            jnp.max(jnp.abs(ref.astype(jnp.float32) - pip.astype(jnp.float32)))
        )
        fl = 4 * res * res * C * H / 1e9  # GFLOP/img (both dots: 2*2*T*C*H)
        for kb in args.tiles.split(","):
            os.environ["VFM_VAE_MLP_TILE_KB"] = kb
            # fresh jits so the env knob is re-read at trace time
            base = time_fn(jax.jit(lambda *z: fm._fused(*z)), a, args.iters)
            pipe = time_fn(
                jax.jit(lambda *z: fm._fused_pipelined(*z)), a, args.iters
            )
            bi, pi = base * 1e6 / B, pipe * 1e6 / B
            print(
                f"res{res:<4d} C{C:<4d} tile {kb:>5s}KB  "
                f"per-tile {bi:7.1f} us/img ({fl / bi * 1e3:5.1f} TF/s)  "
                f"pipelined {pi:7.1f} us/img ({fl / pi * 1e3:5.1f} TF/s)  "
                f"{bi / pi:4.2f}x  max|d|={err:.2e}",
                flush=True,
            )
        os.environ.pop("VFM_VAE_MLP_TILE_KB", None)


if __name__ == "__main__":
    main()
