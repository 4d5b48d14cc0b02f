#!/usr/bin/env python
"""Fused dwconv+noise+GN-stats kernel vs the unfused XLA chain.

Today's serving chain per ConvNeXt layer (models/convnext.py): XLA dwconv
(read+write) -> noise add -> group_stats twosum (one more full read,
0.57 ms/img total at B96). ops/pallas/dwconv_stats.py emits the conv
output and the fp32 moment sums in one pass; this times both at the
flagship decoder shapes.

NEGATIVE RESULT (v5e, B64, bf16; us/img):
  ( 64, 64,512,k7): xla 106.6   fused 281.9
  (128,128,256,k7): xla 172.5   fused 480.0
  (256,256,128,k7): xla 294.1   fused 940.8
Mosaic's k^2 shifted-tap stencil is ~3x off XLA's depthwise emitter even
after fixing the halo to h-row side blocks; see ops/pallas/dwconv_stats.py.

  python tools/bench_dwstats.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_fn(f, x, n=10):
    import jax
    import jax.numpy as jnp

    def body(c, _):
        t, s1, s2 = f(c)
        c2 = c * (1 + 1e-30 * (jnp.sum(t) + jnp.sum(s1) + jnp.sum(s2)).astype(c.dtype))
        return c2, None

    g = jax.jit(lambda v: jax.lax.scan(body, v, None, length=n)[0])
    float(jnp.sum(g(x)))
    t0 = time.perf_counter()
    float(jnp.sum(g(x)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache
    from vfm_vae_tpu.ops.pallas.dwconv_stats import _forward_jnp, dwconv_noise_stats

    enable_persistent_cache()
    B = args.batch

    for i, (H, W, C, k) in enumerate(((64, 64, 512, 7), (128, 128, 256, 7),
                                      (256, 256, 128, 7))):
        kx, kw, kn = jax.random.split(jax.random.PRNGKey(i), 3)
        x = jax.random.normal(kx, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(kw, (k, k, C), jnp.float32) * 0.05
        b = jnp.linspace(-0.1, 0.1, C, dtype=jnp.float32)
        nz = jax.random.normal(kn, (H, W), jnp.float32) * 0.05

        def xla(v):
            return _forward_jnp(v, w, b, nz[None], k, True)

        def fused(v):
            return dwconv_noise_stats(v, w, b, nz)

        rt, r1, r2 = (np.asarray(z, np.float32) for z in xla(x[:2]))
        gt, g1, g2 = (np.asarray(z, np.float32) for z in fused(x[:2]))
        err_t = float(np.max(np.abs(gt - rt))) / max(1e-9, float(np.max(np.abs(rt))))
        err_s = max(
            float(np.max(np.abs(g1 - r1))) / max(1.0, float(np.max(np.abs(r1)))),
            float(np.max(np.abs(g2 - r2))) / max(1.0, float(np.max(np.abs(r2)))),
        )
        t_xla = time_fn(xla, x) * 1e6 / B
        t_fus = time_fn(fused, x) * 1e6 / B
        print(f"({H},{W},{C},k{k}): xla {t_xla:7.1f} us/img   "
              f"fused {t_fus:7.1f} us/img   err_t {err_t:.1e} err_s {err_s:.1e}",
              flush=True)


if __name__ == "__main__":
    main()
