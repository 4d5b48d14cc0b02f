#!/usr/bin/env python
"""Encoder-attention variant microbenchmark on the real chip.

The frozen SigLIP2-L tower is ~44% of serving device time; its attention
(24 layers at (B, 16h, T1024, d64)) runs on XLA's fused SDPA today
(ops/attention.py:45, measured 55 us/img/layer at B128). This tool times
full attention BLOCKS (qkv proj + attention + out proj) so layout and
fusion effects are included, exactly like the in-context numbers the
profiler reports.

Variants:
  sep      - 3 separate q/k/v Linears + jax.nn.dot_product_attention (today)
  fusedqkv - one (D, 3D) matmul, slice, same SDPA
  einsum   - fusedqkv + hand-written einsum attention (bnqk logits)
  flash    - fusedqkv + Pallas flash kernel, full-T blocks
  splash   - fusedqkv + jax's TPU splash kernel ((h, T, d) layout)

Measured (v5e, B96, us/img per BLOCK incl. qkv + out projections):
  sep 388.6   fusedqkv 156.9   einsum 156.5   flash 203.7
  splash 214.6 (best over block_q/kv in {256,512,1024}; 218.7 at the
  512/1024 default, 253.1 at 256/512) — round 2 retest, same verdict as
  flash: at d=64 both attention matmuls idle half the MXU (K=64 depth on
  QK^T, N=64 width on AV), so the ~44 us/img/layer matmul floor is only
  ~1.4x below XLA's fused SDPA and no Pallas kernel closes the gap from
  the wrong side of its own overheads.
Standalone blocks are slower than the in-context encoder (~111 us/layer:
60.8 SDPA from the trace + matmuls at 88% peak) because layout
amortization is missing here — only the RELATIVE comparison holds. XLA's
fused SDPA beats the Pallas flash kernel by ~30% at this (16h, T1024,
d64) shape (K=64 contractions idle half the MXU depth), so the encoder
keeps the default XLA path; the attention floor is practical, not FLOP:
the 4.3 GFLOP/img theoretical 22 us needs full-depth MXU contractions
this head dim cannot provide.

  python tools/bench_attention.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B_DEF, T, D, N = 128, 1024, 1024, 16
H = D // N


def time_fn(f, x, n):
    import jax
    import jax.numpy as jnp

    def body(c, _):
        y = f(c)
        c2 = c * (1 + 1e-30 * jnp.sum(y).astype(c.dtype))
        return c2, None

    g = jax.jit(lambda v: jax.lax.scan(body, v, None, length=n)[0])
    float(jnp.sum(g(x)))  # compile
    t0 = time.perf_counter()
    float(jnp.sum(g(x)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B_DEF)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    B = args.batch
    # On-device RNG (numpy's Gaussian is ~40 s per 67M elements here).
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(keys[0], (B, T, D), jnp.bfloat16) * 0.02
    wq, wk, wv, wo = (
        jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02 for k in keys[1:]
    )
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # (D, 3D)
    scale = H ** -0.5

    def sep(x):
        q = (x @ wq).reshape(x.shape[0], T, N, H)
        k = (x @ wk).reshape(x.shape[0], T, N, H)
        v = (x @ wv).reshape(x.shape[0], T, N, H)
        o = jax.nn.dot_product_attention(q, k, v, scale=scale)
        return o.reshape(x.shape[0], T, D) @ wo

    def fusedqkv(x):
        qkv = x @ wqkv
        q = qkv[..., :D].reshape(x.shape[0], T, N, H)
        k = qkv[..., D:2 * D].reshape(x.shape[0], T, N, H)
        v = qkv[..., 2 * D:].reshape(x.shape[0], T, N, H)
        o = jax.nn.dot_product_attention(q, k, v, scale=scale)
        return o.reshape(x.shape[0], T, D) @ wo

    def einsum(x):
        qkv = x @ wqkv
        q = qkv[..., :D].reshape(x.shape[0], T, N, H)
        k = qkv[..., D:2 * D].reshape(x.shape[0], T, N, H)
        v = qkv[..., 2 * D:].reshape(x.shape[0], T, N, H)
        s = jnp.einsum("bqnh,bknh->bnqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnqk,bknh->bqnh", p, v)
        return o.reshape(x.shape[0], T, D) @ wo

    def flash(x):
        from vfm_vae_tpu.ops.pallas.flash_attention import flash_attention

        qkv = x @ wqkv
        q = qkv[..., :D].reshape(x.shape[0], T, N, H)
        k = qkv[..., D:2 * D].reshape(x.shape[0], T, N, H)
        v = qkv[..., 2 * D:].reshape(x.shape[0], T, N, H)
        o = flash_attention(q, k, v, scale=scale)
        return o.reshape(x.shape[0], T, D) @ wo

    def _make_splash():
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            BlockSizes, FullMask, MultiHeadMask, make_splash_mha_single_device,
        )

        bq = int(os.environ.get("SPLASH_BQ", "512"))
        bkv = int(os.environ.get("SPLASH_BKV", "1024"))
        bs = BlockSizes(
            block_q=bq, block_kv=bkv, block_kv_compute=bkv,
            block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        )
        mask = MultiHeadMask([FullMask((T, T))] * N)
        return make_splash_mha_single_device(mask=mask, block_sizes=bs)

    def splash(x):
        # jax's TPU-native splash kernel ((heads, T, d) layout, vmap over
        # batch); the mask/block machinery is built once at trace time.
        kern = _make_splash()
        qkv = x @ wqkv
        q = qkv[..., :D].reshape(x.shape[0], T, N, H).transpose(0, 2, 1, 3)
        k = qkv[..., D:2 * D].reshape(x.shape[0], T, N, H).transpose(0, 2, 1, 3)
        v = qkv[..., 2 * D:].reshape(x.shape[0], T, N, H).transpose(0, 2, 1, 3)
        o = jax.vmap(kern)(q * scale, k, v)
        return o.transpose(0, 2, 1, 3).reshape(x.shape[0], T, D) @ wo

    variants = dict(sep=sep, fusedqkv=fusedqkv, einsum=einsum, flash=flash,
                    splash=splash)
    if args.only:
        variants = {k: v for k, v in variants.items() if k in args.only.split(",")}

    # Numerics check at a small batch (the full-batch einsum variant would
    # OOM on its (B, 16, 1024, 1024) fp32 logits).
    xs_small = x[:4]
    ref = np.asarray(sep(xs_small), np.float32)
    for name, f in variants.items():
        try:
            out = np.asarray(f(xs_small), np.float32)
            err = float(np.max(np.abs(out - ref))) / max(1e-9, float(np.max(np.abs(ref))))
        except Exception as e:
            print(f"{name:9s} FAILED (check): {type(e).__name__}: {str(e)[:160]}")
            continue
        try:
            dt = time_fn(f, x, args.iters)
            print(f"{name:9s} {dt * 1e6 / B:8.1f} us/img/layer   rel-err {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:9s} FAILED (time): {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
