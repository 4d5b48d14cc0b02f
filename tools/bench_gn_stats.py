#!/usr/bin/env python
"""GroupNorm statistics variants on the real chip (ops/groupnorm.py).

The serving trace attributes ~0.72 ms/img to GroupNorm statistics
(groupnorm.py:37/91 at B96) against a ~0.19 ms/img single-read roofline —
every decoder ConvNeXt layer reads its dwconv output once for s1 and once
for s2 if XLA splits the two reductions into separate fusions.

Variants (all produce per-(B, C) fp32 s1 = sum x, s2 = sum x^2):
  twosum - jnp.sum(xf) + jnp.sum(xf*xf)              (today)
  vreduce - ONE variadic lax.reduce with a (s1, s2) carry (single pass
            guaranteed at the HLO level)
  gram   - append a ones column and take ONE MXU matmul
           x1^T x1 (k-contraction over H*W): s2 on the diagonal, s1 in the
           ones column. ~2*HW*C^2 FLOPs instead of a bandwidth pass.

NEGATIVE RESULT (v5e, B64, bf16; us/img):
  (256,256,128): twosum  95.7   vreduce 220.7   gram 196.8
  (128,128,256): twosum  65.8   vreduce 129.0   gram 123.1
  ( 64, 64,512): twosum  54.2   vreduce  83.9   gram  85.1
XLA already fuses the two jnp.sum reductions into one pass over x; both
"clever" forms are ~2x slower (lax.reduce's variadic lowering defeats the
vectorized row reducer; the Gram matmul pays HW*C^2 FLOPs plus a C+1
padding copy). ops/groupnorm.py keeps the twosum form — it IS the roofline.

  python tools/bench_gn_stats.py [--batch 64]
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
        s1, s2 = f(c)
        c2 = c * (1 + 1e-30 * (jnp.sum(s1) + jnp.sum(s2)).astype(c.dtype))
        return c2, None

    g = jax.jit(lambda v: jax.lax.scan(body, v, None, length=n)[0])
    float(jnp.sum(g(x)))
    t0 = time.perf_counter()
    float(jnp.sum(g(x)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    B = args.batch

    def twosum(x):
        xf = x.astype(jnp.float32)
        B_, H, W, C = x.shape
        s1 = jnp.sum(xf, axis=(1, 2))
        s2 = jnp.sum(jnp.square(xf), axis=(1, 2))
        return s1, s2

    def vreduce(x):
        B_, H, W, C = x.shape
        xf = x.reshape(B_, H * W, C).astype(jnp.float32)
        s1, s2 = jax.lax.reduce(
            (xf, jnp.square(xf)),
            (jnp.float32(0), jnp.float32(0)),
            lambda a, b: (a[0] + b[0], a[1] + b[1]),
            dimensions=(1,),
        )
        return s1, s2

    def gram(x):
        B_, H, W, C = x.shape
        xr = x.reshape(B_, H * W, C)
        ones = jnp.ones((B_, H * W, 1), x.dtype)
        x1 = jnp.concatenate([xr, ones], axis=-1)
        g = jnp.einsum("bki,bkj->bij", x1, x1,
                       preferred_element_type=jnp.float32)
        s1 = g[:, :C, C]
        s2 = jnp.diagonal(g[:, :C, :C], axis1=1, axis2=2)
        return s1, s2

    for i, (H, W, C) in enumerate(((256, 256, 128), (128, 128, 256), (64, 64, 512))):
        x = jax.random.normal(jax.random.PRNGKey(i), (B, H, W, C), jnp.bfloat16)
        r1, r2 = (np.asarray(v, np.float32) for v in twosum(x[:2]))
        line = f"({H},{W},{C}):"
        for name, f in (("twosum", twosum), ("vreduce", vreduce), ("gram", gram)):
            try:
                g1, g2 = (np.asarray(v, np.float32) for v in f(x[:2]))
                err = max(
                    float(np.max(np.abs(g1 - r1))) / max(1.0, float(np.max(np.abs(r1)))),
                    float(np.max(np.abs(g2 - r2))) / max(1.0, float(np.max(np.abs(r2)))),
                )
                t = time_fn(f, x) * 1e6 / B
                line += f"   {name} {t:6.1f} us/img (err {err:.1e})"
            except Exception as e:  # variant unsupported on this backend
                line += f"   {name} FAILED ({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: F401  (time_fn closure)

    main()
