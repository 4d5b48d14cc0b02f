#!/usr/bin/env python
"""Encoder-only A/B: bf16 vs pre-quantized W8A8 int8 serving path.

Times just the two encode jits (no decode / roundtrip / AOT cost analysis,
which make bench_stages.py a >10-min compile marathon through the tunnel).

  python tools/bench_int8.py [--batch 96] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, iters):
    """Depth-2 pipelined timing (same as bench.py): dispatch i+1 before
    forcing i's host read, so tunnel RPC + arg-transfer latency overlaps
    device compute. Unpipelined sync-per-iter timing punishes large
    variables pytrees (the int8 mirror adds ~150 leaves) with dispatch
    overhead a serving driver never pays."""
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)))  # sum in-graph: one dispatch
    float(jfn(*args))  # compile + settle
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(jfn(*args))
        if i >= 1:
            float(outs[i - 1])
    float(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import flagship_generator
    from vfm_vae_tpu.ops.quantized import add_int8_collection

    G = flagship_generator()
    B = args.batch
    img = jnp.asarray(
        np.random.default_rng(0).random((B, 256, 256, 3)), jnp.float32
    )
    variables = jax.jit(lambda r: G.init({"params": r}, img[:2], train=False))(
        jax.random.PRNGKey(0)
    )

    def encode(v, x):
        return G.apply(v, x, rng=None, method=G.encode)

    def roundtrip(v, x):
        z = G.apply(v, x, rng=None, method=G.encode)
        return G.apply(v, z, method=G.decode)

    enc = jax.jit(encode)
    dt = timed(enc, (variables, img), args.iters)
    print(f"enc-bf16 : {dt * 1e3 / B:7.3f} ms/img  {B / dt:8.1f} img/s", flush=True)
    z = enc(variables, img[:8])  # bf16 reference latent, traced before the
    # env flip below can route any jit variant through the int8 path.
    rt = jax.jit(roundtrip)
    dt_rt = timed(rt, (variables, img), args.iters)
    print(f"e2e-bf16 : {dt_rt * 1e3 / B:7.3f} ms/img  {B / dt_rt:8.1f} img/s",
          flush=True)
    y_ref = rt(variables, img[:8])

    # VFM_VAE_INT8_VFM targets the FROZEN TOWER only (read at trace time
    # inside VFMEncoder.encode_image); an outer int8_linear_scope would also
    # dynamically quantize the trained adapter Linears — which is exactly
    # what this tool accidentally measured before the vfm.py scope fix (the
    # tower itself stayed bf16).
    os.environ["VFM_VAE_INT8_VFM"] = "1"

    den = float(jnp.mean(jnp.abs(z))) + 1e-12

    v8 = add_int8_collection(variables)
    enc8 = jax.jit(encode)
    z8 = enc8(v8, img[:8])
    dt8 = timed(enc8, (v8, img), args.iters)
    print(f"enc-i8pre: {dt8 * 1e3 / B:7.3f} ms/img  {B / dt8:8.1f} img/s "
          f"({dt / dt8:.2f}x)  rel-L1 "
          f"{float(jnp.mean(jnp.abs(z - z8))) / den:.4f}", flush=True)
    del z8

    # Static activation scales: calibrate on one batch, then the quantize
    # is a fused elementwise op instead of a dynamic absmax reduce.
    from vfm_vae_tpu.ops.quantized import calibrate_int8_act_scales

    v8s = calibrate_int8_act_scales(
        jax.jit(
            lambda v, x: G.apply(
                v, x, rng=None, method=G.encode, mutable=["act_stats"]
            )
        ),
        v8,
        img[: min(B, 32)],
    )
    del v8  # mirrors are shared with v8s; drop the extra pytree refs
    enc8s = jax.jit(encode)
    z8s = enc8s(v8s, img[:8])
    dt8s = timed(enc8s, (v8s, img), args.iters)
    print(f"enc-i8stat: {dt8s * 1e3 / B:6.3f} ms/img  {B / dt8s:8.1f} img/s "
          f"({dt / dt8s:.2f}x)  rel-L1 "
          f"{float(jnp.mean(jnp.abs(z - z8s))) / den:.4f}", flush=True)
    del z8s

    # Roundtrip with int8 tower only (bf16 decode) — THE serving config
    # (the full-int8 leg below is a measured negative result, kept for the
    # record; models/convnext.py _int8_mlp docstring).
    import math

    rt8e = jax.jit(roundtrip)
    y8e = rt8e(v8s, img[:8])
    span = float(jnp.max(y_ref) - jnp.min(y_ref)) or 1.0
    mse_e = float(jnp.mean(jnp.square(y_ref.astype(jnp.float32)
                                      - y8e.astype(jnp.float32))))
    del y8e
    dt8e_rt = timed(rt8e, (v8s, img), args.iters)
    print(f"e2e-i8enc: {dt8e_rt * 1e3 / B:7.3f} ms/img  {B / dt8e_rt:8.1f} "
          f"img/s ({dt_rt / dt8e_rt:.2f}x)  decode-PSNR "
          f"{10 * math.log10(span * span / max(mse_e, 1e-12)):.1f} dB",
          flush=True)

    # Full serving roundtrip: int8 tower AND int8 decoder ConvNeXt MLPs
    # (static scales calibrated through one encode+decode pass).
    def rt_mut(v, x):
        z, m1 = G.apply(v, x, rng=None, method=G.encode, mutable=["act_stats"])
        y, m2 = G.apply(v, z, method=G.decode, mutable=["act_stats"])
        stats = dict(m1["act_stats"])
        stats.update(m2["act_stats"])  # encoder/synthesis paths are disjoint
        return y, {"act_stats": stats}

    v8f = calibrate_int8_act_scales(
        jax.jit(rt_mut),
        add_int8_collection(variables, decoder_mlp_keys=("synthesis",)),
        img[: min(B, 32)],
    )
    del v8s
    rt8 = jax.jit(roundtrip)
    y8 = rt8(v8f, img[:8])
    mse = float(jnp.mean(jnp.square(y_ref.astype(jnp.float32)
                                    - y8.astype(jnp.float32))))
    del y8
    dt8_rt = timed(rt8, (v8f, img), args.iters)
    print(f"e2e-i8   : {dt8_rt * 1e3 / B:7.3f} ms/img  {B / dt8_rt:8.1f} img/s "
          f"({dt_rt / dt8_rt:.2f}x)  decode-PSNR "
          f"{10 * math.log10(span * span / max(mse, 1e-12)):.1f} dB", flush=True)

    # Stability check: re-time the bf16 baseline at the end — tunnel-path
    # variance showed up as a one-off 60% swing in one section once.
    dt_again = timed(rt, (variables, img), args.iters)
    print(f"e2e-bf16 (re-time): {dt_again * 1e3 / B:7.3f} ms/img  "
          f"{B / dt_again:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
