#!/usr/bin/env python
"""Decoder time attribution on the real chip.

Two views:
  1. Ablations — decode time with one feature removed at a time
     (attention / gaussian blur / multiscale outputs / legacy noise).
     delta vs baseline = that feature's cost.
  2. Standalone ops — dwconv / fused ConvNeXt MLP / upsample / GroupNorm at
     the flagship per-block shapes, timed via an in-graph scan (one RPC for
     n iterations; the axon tunnel costs ~35 ms per call).

  python tools/bench_decoder_ops.py [--batch 96] [--iters 5] [--skip-ablations]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, iters):
    import jax.numpy as jnp

    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


def time_op(op, x, n=10):
    """Time `op(x)` with n sequential in-graph applications (one RPC).
    The carry keeps x's shape; a vanishing feedback term forces re-execution
    (op output feeds the next carry, so XLA cannot hoist or CSE it)."""
    import jax
    import jax.numpy as jnp

    def body(c, _):
        y = op(c)
        c2 = c * (1 + 1e-30 * jnp.sum(y).astype(c.dtype))
        return c2, None

    f = jax.jit(lambda v: jax.lax.scan(body, v, None, length=n)[0])
    float(jnp.sum(f(x)))  # compile
    t0 = time.perf_counter()
    float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-ablations", action="store_true")
    ap.add_argument("--skip-ops", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import flagship_generator

    B = args.batch
    rng = np.random.default_rng(0)

    # ---------------------------------------------------------- ablations
    if not args.skip_ablations:
        variants = [
            ("baseline", {}),
            ("no-attn", dict(use_self_attn=False, attn_block_indices=[], attn_depths=[])),
            ("no-blur", dict(synthesis_kwargs=dict(
                channel_base=32768, channel_max=512, num_res_blocks=2,
                architecture="skip", use_gaussian_blur=False))),
            ("no-multiscale", dict(use_multiscale_output=False)),
            ("no-legacy-noise", dict(legacy=False)),
        ]
        z = jax.random.normal(jax.random.PRNGKey(7), (B, 16, 16, 32), jnp.float32)
        base = None
        for name, ov in variants:
            G = flagship_generator(**ov)
            v = jax.jit(
                lambda r: G.init({"params": r}, jnp.zeros((2, 256, 256, 3)), train=False)
            )(jax.random.PRNGKey(0))
            dec = jax.jit(lambda vv, zz: G.apply(vv, zz, method=G.decode))
            dt = timed(dec, (v, z), args.iters) * 1e3 / B
            delta = "" if base is None else f"  (saves {base - dt:+.3f} ms/img)"
            if base is None:
                base = dt
            print(f"decode[{name:16s}]: {dt:7.3f} ms/img{delta}", flush=True)
            del v

    # ------------------------------------------------------ standalone ops
    if args.skip_ops:
        return
    from vfm_vae_tpu.models.convnext import (
        ConvNeXtSynthesisLayer,
        SeparableUpsampleWithFixedBlur,
    )
    from vfm_vae_tpu.models.gigagan import SelfAttentionBlock
    from vfm_vae_tpu.models.layers import Conv2d, GroupNorm32, trunc_normal_init

    w_dim = 512
    w = jax.random.normal(jax.random.PRNGKey(9), (B, w_dim), jnp.float32)

    # (resolution, channels, dw kernel) per flagship block
    shapes = [(8, 512, 5), (16, 512, 5), (32, 512, 7), (64, 512, 7),
              (128, 256, 7), (256, 128, 7)]

    print("\n-- ConvNeXt layer (dw + GN + mod-MLP + residual), bf16 --")
    for res, C, k in shapes:
        m = ConvNeXtSynthesisLayer(C, w_dim, k, block_index=0, legacy=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, C), jnp.bfloat16)
        v = jax.jit(lambda r: m.init({"params": r}, x, w))(jax.random.PRNGKey(0))
        dt = time_op(lambda xx: m.apply(v, xx, w), x) * 1e3 / B
        fl = 16 * C * C * res * res * 2 / 1e9  # pw expand+contract GFLOP/img
        print(f"  res{res:<4d} C{C:<4d} k{k}: {dt:7.4f} ms/img  "
              f"(pw {fl:.2f} GFLOP/img -> {fl / dt:6.1f} TFLOP/s)", flush=True)

    print("\n-- dwconv alone (VPU) --")
    for res, C, k in shapes:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, C), jnp.bfloat16)
        m = Conv2d(C, C, k, padding=k // 2, groups=C,
                   kernel_init=trunc_normal_init(0.02), name="dw")
        v = jax.jit(lambda r: m.init({"params": r}, x))(jax.random.PRNGKey(0))
        dt = time_op(lambda xx: m.apply(v, xx), x) * 1e3 / B
        print(f"  res{res:<4d} C{C:<4d} k{k}: {dt:7.4f} ms/img", flush=True)

    print("\n-- GroupNorm32 alone --")
    for res, C, _ in shapes:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, C), jnp.bfloat16)
        m = GroupNorm32(min(32, C // 4), C)
        v = jax.jit(lambda r: m.init({"params": r}, x))(jax.random.PRNGKey(0))
        dt = time_op(lambda xx: m.apply(v, xx), x) * 1e3 / B
        print(f"  res{res:<4d} C{C:<4d}   : {dt:7.4f} ms/img", flush=True)

    print("\n-- SeparableUpsampleWithFixedBlur (in -> 2x res) --")
    for cin, cout, res, blur in [(512, 512, 8, "3x3"), (512, 512, 16, "3x3"),
                                 (512, 512, 32, "5x5"), (512, 256, 64, "5x5"),
                                 (256, 128, 128, "5x5")]:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, cin), jnp.bfloat16)
        m = SeparableUpsampleWithFixedBlur(cin, cout, blur_kernel=blur)
        v = jax.jit(lambda r: m.init({"params": r}, x))(jax.random.PRNGKey(0))
        # time_op needs carry-shape stability: pad channels back to cin and
        # stride-slice the doubled resolution (both negligible next to the
        # op). Per-call timed() here would be ~35ms RPC overhead per call,
        # i.e. +0.4 ms/img of pure tunnel noise at B96.
        pad_c = cin - cout

        def roundtrip(xx, m=m, v=v, pad_c=pad_c):
            y = m.apply(v, xx)  # (B, 2r, 2r, cout)
            y = y[:, ::2, ::2, :]
            if pad_c:
                y = jnp.concatenate([y, y[..., :pad_c]], axis=-1)
            return y

        dt = time_op(roundtrip, x) * 1e3 / B
        print(f"  {res}->{res * 2} {cin}->{cout}: {dt:7.4f} ms/img", flush=True)

    print("\n-- SelfAttentionBlock --")
    for res, C in [(8, 512), (16, 512), (32, 512)]:
        x = jax.random.normal(jax.random.PRNGKey(1), (B, res, res, C), jnp.bfloat16)
        m = SelfAttentionBlock(C, dim_head=C // 8, heads=8, ff_mult=4)
        v = jax.jit(lambda r: m.init({"params": r}, x))(jax.random.PRNGKey(0))
        dt = time_op(lambda xx: m.apply(v, xx), x) * 1e3 / B
        print(f"  res{res:<4d} C{C:<4d}   : {dt:7.4f} ms/img", flush=True)


if __name__ == "__main__":
    main()
