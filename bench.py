#!/usr/bin/env python
"""Throughput benchmark: 256px encode+decode images/sec on one chip.

Target (BASELINE.md): >= 3000 img/s/chip on TPU v5e for the flagship
f16d32 SigLIP2-L tokenizer (encode 256px -> z 16x16x32 -> decode 256px).

Measures BOTH precisions in one invocation and prints one JSON line per
config: the opt-in W8A8-tower serving config first, the quality-faithful
bf16 default LAST (the driver records the final line; the artifact then
still carries the int8 capability number). Set VFM_VAE_BENCH_SKIP_INT8=1
to skip the int8 pass (e.g. quick local runs).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TARGET = 3000.0  # img/s/chip (BASELINE.json)


def measure(jfn, variables):
    """Best img/s over the largest batch that fits HBM."""
    import jax.numpy as jnp

    img_per_sec = 0.0
    for batch in (128, 96, 64, 32):
        img = jnp.asarray(
            np.random.default_rng(0).random((batch, 256, 256, 3)), jnp.float32
        )
        try:
            # Warm up / compile. Force a host read of a scalar derived from
            # the output — block_until_ready alone does not guarantee
            # execution through the axon tunnel and reports fantasy numbers.
            _ = float(jfn(variables, img))

            # Timed runs, depth-2 pipeline: dispatch iteration i+1 before
            # forcing iteration i's scalar to host, so the tunnel's RPC
            # latency overlaps device compute (a serving driver keeps the
            # device queue full the same way). Every iteration's output is
            # still read back inside the timed window.
            iters = 8
            outs = []
            t0 = time.perf_counter()
            for i in range(iters):
                outs.append(jfn(variables, img))
                if i >= 1:
                    _ = float(outs[i - 1])
            _ = float(outs[-1])
            dt = time.perf_counter() - t0
            img_per_sec = batch * iters / dt
            break
        except Exception:
            continue
    return img_per_sec


def emit(value, precision, metric="encode_decode_256px_throughput"):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(value / TARGET, 4),
                "precision": precision,
            }
        ),
        flush=True,
    )


def run_int8():
    """W8A8 serving config: static int8 FROZEN TOWER + bf16 decode —
    measured 101.0 vs 91.4 img/s at B96 with decode PSNR 46+ dB vs the
    bf16 path (tools/bench_int8.py). bf16 stays the recorded default
    because the reference's published quality numbers are full-precision."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import flagship_generator

    os.environ["VFM_VAE_INT8_VFM"] = "1"
    try:
        from vfm_vae_tpu.ops.quantized import (
            add_int8_collection,
            calibrate_int8_act_scales,
        )

        G = flagship_generator()
        img0 = jnp.zeros((2, 256, 256, 3), jnp.float32)
        variables = jax.jit(
            lambda r: G.init({"params": r}, img0, train=False)
        )(jax.random.PRNGKey(0))
        calib = jnp.asarray(
            np.random.default_rng(0).random((32, 256, 256, 3)), jnp.float32
        )
        variables = calibrate_int8_act_scales(
            jax.jit(lambda v, x: G.apply(
                v, x, rng=None, method=G.encode, mutable=["act_stats"])),
            add_int8_collection(variables), calib)

        def fwd(v, x):
            z = G.apply(v, x, rng=None, method=G.encode)
            return G.apply(v, z, method=G.decode)

        jfn = jax.jit(lambda v, x: jnp.sum(fwd(v, x)))
        emit(measure(jfn, variables), "w8a8-tower")
        # Encode-only: what the DiT-prefetch hot path pays (SURVEY §3.5;
        # reference preprocess_for_lightningdit/prefetch.py:233-241). The
        # int8 tower's encoder win shows ~fully here — the decode half it
        # cannot speed up is absent.
        jenc = jax.jit(lambda v, x: jnp.sum(
            G.apply(v, x, rng=None, method=G.encode).astype(jnp.float32)))
        emit(measure(jenc, variables), "w8a8-tower",
             metric="encode_only_256px_throughput")
    finally:
        os.environ.pop("VFM_VAE_INT8_VFM", None)


def run_bf16():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    from __graft_entry__ import flagship_generator

    fn, (variables, _) = entry()
    # Encode-only first (prefetch hot path), e2e LAST — the driver's
    # parser records the final line.
    G = flagship_generator()
    jenc = jax.jit(lambda v, x: jnp.sum(
        G.apply(v, x, rng=None, method=G.encode).astype(jnp.float32)))
    emit(measure(jenc, variables), "bf16",
         metric="encode_only_256px_throughput")
    # The forcing scalar is computed inside the jitted program (one dispatch
    # per iteration instead of model+sum as two RPCs through the tunnel).
    jfn = jax.jit(lambda v, x: jnp.sum(fn(v, x)))
    emit(measure(jfn, variables), "bf16")


def main():
    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if os.environ.get("VFM_VAE_BENCH_SKIP_INT8") != "1":
        try:
            run_int8()
        except Exception as e:
            print(f"# int8 pass failed: {type(e).__name__}: {e}", flush=True)
    # Quality-faithful default goes LAST so the driver's parser records it.
    run_bf16()


if __name__ == "__main__":
    main()
