#!/usr/bin/env python
"""Vertical-blur leg variants (ops/pallas/fused_upsample.py _vblur).

The current form materializes an edge-replicate jnp.pad of the full
(B, 2H, 2W, Co) upsampled tensor before the 1-D depthwise conv — the pad
alone showed 0.19 ms/img (fused_upsample.py:212) in the B128 serving trace,
on top of 0.29 ms/img for the conv (:221).

Variants (all numerically identical in exact arithmetic):
  pad      - jnp.pad(edge) + valid conv              (today)
  corr     - zero-SAME conv + boundary-row correction terms
             out[:, i] += (sum of clamped taps) * s[:, 0 or -1]
  slices   - conv on interior + separate small convs for the edge bands

  python tools/bench_vblur.py [--batch 128]
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
        y = f(c)
        c2 = c * (1 + 1e-30 * jnp.sum(y).astype(c.dtype))
        return c2, None

    g = jax.jit(lambda v: jax.lax.scan(body, v, None, length=n)[0])
    float(jnp.sum(g(x)))
    t0 = time.perf_counter()
    float(jnp.sum(g(x)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    B = args.batch
    taps_np = np.array([1, 4, 6, 4, 1], np.float32)
    taps_np /= taps_np.sum()
    kb = len(taps_np)
    hb = kb // 2
    taps = jnp.asarray(taps_np)

    def pad_form(s):
        Co = s.shape[-1]
        sp = jnp.pad(s, ((0, 0), (hb, hb), (0, 0), (0, 0)), mode="edge")
        kv = jnp.tile(taps.astype(s.dtype)[:, None, None, None], (1, 1, 1, Co))
        return jax.lax.conv_general_dilated(
            sp, kv, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Co,
        )

    def corr_form(s):
        Co = s.shape[-1]
        kv = jnp.tile(taps.astype(s.dtype)[:, None, None, None], (1, 1, 1, Co))
        out = jax.lax.conv_general_dilated(
            s, kv, (1, 1), [(hb, hb), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Co,
        )
        # Row i near the top misses taps j with i + j - hb < 0; edge
        # replicate gives them all to row 0. ctop[i] = sum_{j < hb - i} t[j].
        ctop = [float(taps_np[: hb - i].sum()) for i in range(hb)]
        cbot = [float(taps_np[kb - (hb - i):].sum()) for i in range(hb)]
        top = out[:, :hb] + jnp.stack(
            [c * s[:, 0] for c in ctop], axis=1).astype(out.dtype)
        bot = out[:, -hb:] + jnp.stack(
            [c * s[:, -1] for c in cbot], axis=1).astype(out.dtype)
        return jnp.concatenate([top, out[:, hb:-hb], bot], axis=1)

    for i, (H2, W2, Co) in enumerate(((128, 128, 512), (256, 256, 256), (512, 512, 128))):
        # On-device RNG: numpy's Gaussian takes ~40 s per 67M elements on
        # this host class; jax.random on the chip is instant.
        s = jax.random.normal(jax.random.PRNGKey(i), (B, H2, W2, Co), jnp.bfloat16)
        ref = np.asarray(pad_form(s[:2]), np.float32)
        got = np.asarray(corr_form(s[:2]), np.float32)
        err = float(np.max(np.abs(got - ref))) / max(1e-9, float(np.max(np.abs(ref))))
        t_pad = time_fn(pad_form, s)
        t_corr = time_fn(corr_form, s)
        print(f"({H2},{W2},{Co}): pad {t_pad * 1e6 / B:7.1f} us/img   "
              f"corr {t_corr * 1e6 / B:7.1f} us/img   rel-err {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
