"""Style-modulated convolutions, TPU-first formulation.

The reference executes modulation as per-sample grouped convs with B*O
materialized weights (generator.py:93-103, convnext_utils.py:36-57). On TPU
that defeats the MXU (tiny groups, huge weight traffic). We use the
mathematically identical factorization the reference itself documents as the
"non-fused" path (generator.py:81-91):

    y[b,o] = dcoef[b,o] * conv(x[b] * style[b,:], W)[o]
    dcoef[b,o] = rsqrt( sum_{i,kh,kw} (W[o,i,kh,kw] * style[b,i])^2 + 1e-8 )

i.e. scale input channels, run ONE shared conv (batched, MXU-tiled), scale
output channels. No per-sample weights ever exist; XLA fuses both scalings
into the conv epilogue.

The fp16-overflow pre-normalization (generator.py:66-68) is intentionally
absent: this framework computes in bf16, which has fp32 dynamic range, so the
guard is dead weight (fp32 eval parity is unaffected — the reference also
skips it outside fp16).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import StyleSplit, trunc_normal_init


def demod_coefs(weight_hwio: jnp.ndarray, styles: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """dcoef[b,o] for HWIO weight and (B, I) styles, fp32."""
    w = weight_hwio.astype(jnp.float32)
    s = styles.astype(jnp.float32)
    # sum over (h, w) -> (I, O); then weight each input channel by style^2.
    w2 = jnp.sum(jnp.square(w), axis=(0, 1))  # (I, O)
    d = jnp.einsum("bi,io->bo", jnp.square(s), w2)
    return jax.lax.rsqrt(d + eps)


def modulated_conv2d(
    x: jnp.ndarray,  # (B, H, W, I)
    weight: jnp.ndarray,  # (kh, kw, I, O)
    styles: jnp.ndarray,  # (B, I)
    padding: int = 0,
    demodulate: bool = True,
    input_gain: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scale -> shared conv -> demod-scale (exact reference semantics)."""
    B = x.shape[0]
    xs = x * styles.reshape(B, 1, 1, -1).astype(x.dtype)
    if input_gain is not None:
        xs = xs * input_gain.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xs,
        weight.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if demodulate:
        d = demod_coefs(weight, styles)
        y = y * d.reshape(B, 1, 1, -1).astype(y.dtype)
    return y


def modulated_pointwise_conv2d(
    x: jnp.ndarray,  # (B, H, W, I)
    weight: jnp.ndarray,  # (I, O)
    styles: jnp.ndarray,  # (B, I)
    bias: Optional[jnp.ndarray] = None,  # (O,)
    demodulate: bool = True,
) -> jnp.ndarray:
    """1x1 modulated conv as a single einsum (convnext_utils.py:36-57)."""
    B = x.shape[0]
    xs = x * styles.reshape(B, 1, 1, -1).astype(x.dtype)
    y = jnp.einsum("bhwi,io->bhwo", xs, weight.astype(x.dtype))
    if demodulate:
        d = jnp.einsum(
            "bi,io->bo",
            jnp.square(styles.astype(jnp.float32)),
            jnp.square(weight.astype(jnp.float32)),
        )
        d = jax.lax.rsqrt(d + 1e-8)
        y = y * d.reshape(B, 1, 1, -1).astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class ModulatedPointwiseConv2DLayer(nn.Module):
    """(convnext_utils.py:60-75): trunc-normal(0.02) weight, zero bias."""

    in_channels: int
    out_channels: int
    demodulate: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray, return_params: bool = False):
        w = self.param("weight", trunc_normal_init(0.02), (self.in_channels, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if return_params:
            # Escape hatch for fused pallas callers (ops/pallas/fused_mlp.py):
            # identical param tree, compute orchestrated by the parent.
            return w, b
        return modulated_pointwise_conv2d(x, w, style, b, self.demodulate)
