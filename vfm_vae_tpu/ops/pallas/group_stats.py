"""Pallas TPU per-channel moment reduction for GroupNorm statistics.

The decoder computes GroupNorm32 statistics over every ConvNeXt layer's
dwconv output (stats_only path feeding the fused MLP kernel's folded
affine) — a pure read of big (B, 256^2, C) activations. Reference
semantics: shared.py:165-167 GroupNorm32 fp32 stats.

STATUS: correct (interpret + grad parity tests) but measured SLOWER than
XLA's convert+reduce fusion on v5e at every decoder shape — see
moments_eligible for the numbers. Opt-in via VFM_VAE_PALLAS_STATS=1; the
default path stays XLA, mirroring the ops/pallas/dwconv.py verdict that
XLA's reduction/dwconv emitters are already at or past what a simple
row-tiled Pallas loop can reach.

Forward only in Pallas; the backward is the trivial elementwise XLA
expression (d s1 = 1, d s2 = 2x), attached via custom_vjp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s1_ref, s2_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    xf = x_ref[0].astype(jnp.float32)  # (th, W, C)
    s1_ref[0, 0, :] += jnp.sum(xf, axis=(0, 1))
    s2_ref[0, 0, :] += jnp.sum(xf * xf, axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments(x, interpret: bool = False):
    B, H, W, C = x.shape
    # Row tile: one input block (double-buffered) + two (C,) accumulators.
    budget = 4 * 1024 * 1024
    t0 = max(1, min(H, budget // max(W * C * x.dtype.itemsize, 1)))
    th = next((v for v in range(t0, 0, -1) if H % v == 0), H)
    grid = (B, H // th)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, th, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        # (B, 1, C) so the trailing block dims (1, C) satisfy the TPU
        # (8, 128) tiling rule (block == full dim); squeezed on return.
        out_specs=[pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
                   pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * B * H * W * C,
            bytes_accessed=B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return out[0][:, 0, :], out[1][:, 0, :]


@jax.custom_vjp
def channel_moments(x):
    """(B, H, W, C) -> (sum, sum of squares), both (B, C) fp32."""
    return _moments(x)


def _fwd(x):
    return _moments(x), x


def _bwd(x, g):
    g1, g2 = g
    f32 = jnp.float32
    dx = (g1.astype(f32)[:, None, None, :]
          + 2.0 * x.astype(f32) * g2.astype(f32)[:, None, None, :])
    return (dx.astype(x.dtype),)


channel_moments.defvjp(_fwd, _bwd)


def moments_eligible(x) -> bool:
    # OPT-IN ONLY. Head-to-head on v5e (B96, bf16, scan-timed): this kernel
    # runs 0.114/0.066/0.045 ms/img at 256^2xC128 / 128^2xC256 / 64^2xC512
    # vs XLA's convert+reduce at 0.088/0.057/0.039 — and the in-context
    # numbers are better still (~40 us/img/layer at the top site: XLA
    # schedules the reduce alongside neighboring work). A row-tiled
    # sequential accumulation cannot beat XLA's reduction emitter here;
    # kept as infrastructure + parity tests, like ops/pallas/dwconv.py.
    if os.environ.get("VFM_VAE_PALLAS_STATS") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    B, H, W, C = x.shape
    # Small activations are not worth a kernel launch; lane-aligned C only.
    return C % 128 == 0 and H * W >= 32 * 32


def channel_moments_interpret(x):
    """Interpret-mode kernel run for CPU parity tests (no custom_vjp)."""
    return _moments(x, interpret=True)


def channel_moments_reference(x):
    """Plain-XLA twin of channel_moments (parity oracle + CPU path)."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(1, 2)), jnp.sum(jnp.square(xf), axis=(1, 2))
