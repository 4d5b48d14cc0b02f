#!/usr/bin/env python
"""Vertical-blur leg variants (ops/pallas/fused_upsample.py _vblur).

The current form materializes an edge-replicate jnp.pad of the full
(B, 2H, 2W, Co) upsampled tensor before the 1-D depthwise conv — the pad
alone showed 0.19 ms/img (fused_upsample.py:212) in the B128 serving trace,
on top of 0.29 ms/img for the conv (:221).

Variants (all numerically identical in exact arithmetic):
  pad      - jnp.pad(edge) + valid conv              (previous)
  corr     - zero-SAME conv + boundary-row correction terms
  mm/mm2   - ONE banded Toeplitz matmul contracting H on the MXU; the
             replicate pad folds into the matrix exactly (err 0.0)

Measured (v5e, B64, bf16; us/img):
  (128,128,512): pad 139.6   corr 184.0   mm 129.1   mm2 120.4
  (256,256,256): pad 216.8   corr 314.2   mm 219.9   mm2 215.6
mm2 (rhs-side matrix) wins ~14% at the deep shapes and ties at the top
resolution -> ops/pallas/fused_upsample.py uses it for H2 <= 128 and keeps
the XLA dwconv above. corr's boundary terms double-count under zero-SAME
padding (kept only as the measured dead end).

  python tools/bench_vblur.py [--batch 64]
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

    def build_toeplitz(H2):
        # T[h, k] = sum of taps j landing on source row k = clamp(h + j - hb)
        # — the edge-replicate padding folded into the matrix exactly.
        T = np.zeros((H2, H2), np.float32)
        for h in range(H2):
            for j in range(kb):
                k = min(max(h + j - hb, 0), H2 - 1)
                T[h, k] += taps_np[j]
        return T

    def matmul_form(s):
        # Vertical blur as ONE banded matmul contracting H on the MXU
        # (K = H2 is a full contraction dim vs the VPU-bound dwconv; the
        # replicate pad disappears into the matrix). ~36x more FLOPs than
        # the 5-tap conv but the MXU:VPU rate ratio is larger still.
        H2 = s.shape[1]
        T = jnp.asarray(build_toeplitz(H2), s.dtype)
        return jnp.einsum(
            "hk,bkwc->bhwc", T, s, preferred_element_type=jnp.float32
        ).astype(s.dtype)

    def matmul2_form(s):
        # Same contraction, rhs-side matrix (dot output (B,W,C,H) + transpose
        # left to XLA's layout assignment).
        H2 = s.shape[1]
        T = jnp.asarray(build_toeplitz(H2).T, s.dtype)
        return jnp.einsum(
            "bkwc,kh->bhwc", s, T, preferred_element_type=jnp.float32
        ).astype(s.dtype)

    for i, (H2, W2, Co) in enumerate(((128, 128, 512), (256, 256, 256), (512, 512, 128))):
        # On-device RNG: numpy's Gaussian takes ~40 s per 67M elements on
        # this host class; jax.random on the chip is instant.
        s = jax.random.normal(jax.random.PRNGKey(i), (B, H2, W2, Co), jnp.bfloat16)
        ref = np.asarray(pad_form(s[:2]), np.float32)
        scale = max(1e-9, float(np.max(np.abs(ref))))
        errs = {}
        times = {}
        for name, f in (("pad", pad_form), ("corr", corr_form),
                        ("mm", matmul_form), ("mm2", matmul2_form)):
            got = np.asarray(f(s[:2]), np.float32)
            errs[name] = float(np.max(np.abs(got - ref))) / scale
            times[name] = time_fn(f, s) * 1e6 / B
        print(f"({H2},{W2},{Co}): " + "   ".join(
            f"{n} {times[n]:7.1f} us/img (err {errs[n]:.1e})" for n in times),
            flush=True)


if __name__ == "__main__":
    main()
