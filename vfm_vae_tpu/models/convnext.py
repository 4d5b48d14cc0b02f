"""ConvNeXt-style modulated decoder layers.

Reference: networks/utils/convnext_utils.py (ConvNeXtSynthesisLayer :78,
ConvNeXtToRGBLayer :145, SeparableUpsampleWithFixedBlur :197, blur table
:190). NHWC; modulated pointwise convs use the shared-weight factorization in
models/modulated.py.
"""

from __future__ import annotations

import math
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.pixelshuffle import pixel_shuffle
from ..ops.resize import resize_bilinear
from .layers import Conv2d, GroupNorm32, StyleSplit, trunc_normal_init
from .modulated import ModulatedPointwiseConv2DLayer

# Binomial low-pass kernels (convnext_utils.py:190-194).
GAUSSIAN_KERNELS = {
    "3x3": [1, 2, 1],
    "4x4": [1, 3, 3, 1],
    "5x5": [1, 4, 6, 4, 1],
}


class ConvNeXtSynthesisLayer(nn.Module):
    """dwconv -> (legacy noise) -> GN32 -> modulated pw expand -> GELU ->
    pw contract -> layer scale -> residual (convnext_utils.py:78-142)."""

    channels: int
    w_dim: int
    kernel_size: int
    layer_scale_init: float = 1e-5
    demodulate: bool = True
    block_index: int = 0
    legacy: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        C = self.channels
        x_in = x
        style = StyleSplit(self.w_dim, C, bias_init=1, name="affine_pw1")(w)

        x = Conv2d(
            C, C, self.kernel_size,
            padding=self.kernel_size // 2, groups=C,
            kernel_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros,
            name="dwconv",
        )(x)
        # Named checkpoint so a selective remat policy
        # (save_only_these_names) can keep this map and skip the
        # dwconv+GN-stats recompute in the backward: the fused-MLP
        # custom_vjp saves exactly this tensor as its residual.
        x = checkpoint_name(x, "dwconv_out")

        if self.legacy:
            # Static per-resolution noise map kept for checkpoint compat
            # (convnext_utils.py:105-133); bilinearly resized off-resolution.
            res = 8 * 2 ** self.block_index
            noise_const = self.variable(
                "buffers", "noise_const",
                lambda: jax.random.normal(self.make_rng("params"), (res, res), jnp.float32),
            ).value
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            H, W = x.shape[1], x.shape[2]
            noise = (noise_const * noise_strength)[None, :, :, None]
            if (H, W) != (res, res):
                noise = resize_bilinear(noise, size=(H, W))
            x = x + noise.astype(x.dtype)

        norm = GroupNorm32(min(32, C // 4), C, name="norm")
        pw1 = ModulatedPointwiseConv2DLayer(C, 4 * C, self.demodulate, name="pwconv1")
        pw2 = Conv2d(
            4 * C, C, 1,
            kernel_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros,
            name="pwconv2",
        )
        gamma = (
            self.param("gamma", nn.initializers.constant(self.layer_scale_init), (C,))
            if self.layer_scale_init > 0 else None
        )

        from ..ops.pallas.fused_mlp import fused_convnext_mlp, fused_mlp_eligible
        from .layers import _INT8_CALIB

        int8_mirror = self.has_variable("int8", "w1q")
        if fused_mlp_eligible(x) or int8_mirror:
            # Fused pallas path: GN-apply + modulate + expand -> GELU ->
            # contract without materializing the (B, H, W, 4C) hidden and
            # without a separate normalization pass over x. GN is affine in
            # x per channel: gn(x) = x*a + c with a = rstd*gn_w,
            # c = gn_b - mean*rstd*gn_w, so (gn(x)*style) @ W1 * d + b1
            # = (x * (a*style)) @ W1 * d + [((c*style) @ W1) * d + b1].
            mean, rstd, gnw, gnb = norm(x, stats_only=True)
            w1, b1 = pw1(None, None, return_params=True)
            w2k, b2 = pw2(None, return_params=True)
            if self.demodulate:
                from .modulated import demod_coefs

                d = demod_coefs(w1[None, None], style)
            else:
                d = jnp.ones((x.shape[0], 4 * C), jnp.float32)
            g = gamma if gamma is not None else jnp.ones((C,), jnp.float32)

            reps = C // mean.shape[1]
            sf = style.astype(jnp.float32)
            a = jnp.repeat(rstd, reps, axis=1) * gnw[None, :]  # (B, C)
            c = gnb[None, :] - jnp.repeat(mean * rstd, reps, axis=1) * gnw[None, :]
            A = a * sf
            b1_eff = ((c * sf) @ w1.astype(jnp.float32)) * d + b1[None, :]

            # Int8 only pays at the deep-pyramid shapes: at 128px+ the
            # (B,H,W,4C) hidden this unfused form materializes costs more
            # HBM traffic than the int8 MXU rate saves, and the zero-
            # materialization fused bf16 kernel wins (measured e2e 0.75x
            # with int8 everywhere vs 1.0x baseline; tools/bench_int8.py).
            int8_shape_ok = x.shape[1] * x.shape[2] <= 64 * 64
            if int8_mirror and int8_shape_ok and (
                _INT8_CALIB[0] or self.has_variable("int8", "as_u")
            ):
                return self._int8_mlp(
                    x, x_in, A, d, w1, b1_eff, w2k[0, 0], b2, g
                ).astype(dtype)
            if fused_mlp_eligible(x):
                return fused_convnext_mlp(
                    x, x_in, A, d, w1, b1_eff, w2k[0, 0], b2, g
                ).astype(dtype)

        x = norm(x)
        x = pw1(x, style)
        x = jax.nn.gelu(x, approximate=False)
        x = pw2(x)
        if gamma is not None:
            x = x * gamma.astype(x.dtype)
        return (x + x_in).astype(dtype)

    def _int8_mlp(self, x, x_in, A, d, w1, b1_eff, w2, b2, g):
        """Static-scale W8A8 MLP for serving decode (opt-in: only routes
        when the caller built decoder mirrors via add_int8_collection(...,
        decoder_mlp_keys=('synthesis',)) and calibrated; see
        ops/quantized.py). Same folded algebra as the fused pallas path —
        GN-apply + modulate fold into the per-image input scale A and bias
        b1_eff — with the dots on XLA's int8 MXU path.

        MEASURED NEGATIVE RESULT (v5e, B96 flagship, tools/bench_int8.py):
        int8 MLPs everywhere = 0.75x e2e (the materialized (B,H,W,4C)
        hidden at 128px+ costs more HBM traffic than the int8 rate saves);
        deep-pyramid-only (HW <= 64^2, this gate) = still net -0.7 ms/img
        vs the zero-materialization fused bf16 kernel — the extra
        elementwise passes (x*A materialize, quantize, e1 epilogue) exceed
        the dot saving at those shapes. Serving default is therefore int8
        TOWER + bf16 decode (101.0 vs 91.4 img/s; decode PSNR of the full
        int8 variant was fine at 46.2 dB — speed, not accuracy, is why).
        During calibration (int8_calibration_scope) it runs the fp32 math
        and sows the two activation absmaxes instead."""
        from ..ops.quantized import _INT8_EPS
        from .layers import _INT8_CALIB

        B, H, W, C = x.shape
        u = x.astype(jnp.float32) * A[:, None, None, :]
        dT = d[:, None, None, :]
        bT = b1_eff[:, None, None, :]

        if _INT8_CALIB[0]:
            self.sow("act_stats", "amax_u", jnp.max(jnp.abs(u)))
            h = jax.nn.gelu(
                (u @ w1.astype(jnp.float32)) * dT + bT, approximate=False
            )
            self.sow("act_stats", "amax_h", jnp.max(jnp.abs(h)))
            y = h @ w2.astype(jnp.float32) + b2[None, None, None, :]
            return x_in.astype(jnp.float32) + y * g[None, None, None, :]

        w1q = self.get_variable("int8", "w1q")
        ws1 = self.get_variable("int8", "ws1")
        s_u = jnp.maximum(self.get_variable("int8", "as_u"), _INT8_EPS)
        w2q = self.get_variable("int8", "w2q")
        ws2 = self.get_variable("int8", "ws2")
        s_h = jnp.maximum(self.get_variable("int8", "as_h"), _INT8_EPS)

        uq = jnp.clip(jnp.round(u * (1.0 / s_u)), -127.0, 127.0).astype(jnp.int8)
        acc1 = jax.lax.dot_general(
            uq, w1q, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        e1 = (s_u * ws1)[None, :] * d  # (B, 4C): rescale + demod in one
        # Hidden lives as bf16 between the fusions (the fp32 form doubles
        # the largest HBM tensor in the decode for no accuracy we keep —
        # the very next op rounds to int8 anyway).
        h = jax.nn.gelu(
            acc1.astype(jnp.float32) * e1[:, None, None, :] + bT,
            approximate=False,
        ).astype(jnp.bfloat16)
        hq = jnp.clip(
            jnp.round(h.astype(jnp.float32) * (1.0 / s_h)), -127.0, 127.0
        ).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2q, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc2.astype(jnp.float32) * (s_h * ws2)[None, None, None, :]
        y = (y + b2[None, None, None, :]) * g[None, None, None, :]
        return x_in.astype(jnp.float32) + y


class ConvNeXtToRGBLayer(nn.Module):
    """Modulated 1x1 to-RGB without demodulation (convnext_utils.py:145-187)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        I, O, k = self.in_channels, self.out_channels, self.kernel_size

        def w_init(key, shape, dtype=jnp.float32):
            return 0.1 * jax.random.normal(key, shape, dtype)

        weight = self.param("weight", w_init, (k, k, I, O))
        bias = self.param("bias", nn.initializers.zeros, (O,))
        weight_gain = 1 / math.sqrt(I * k * k)
        style = StyleSplit(self.w_dim, I, bias_init=1, name="affine")(w) * weight_gain

        B = x.shape[0]
        xs = x * style.reshape(B, 1, 1, -1).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xs, weight.astype(x.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


class SeparableUpsampleWithFixedBlur(nn.Module):
    """GN -> dw3x3 -> pw1x1 -> PixelShuffle -> fixed Gaussian blur with
    replicate padding (convnext_utils.py:197-256). `pre_normalize=False`
    (first block) norms after the shuffle instead."""

    in_channels: int
    out_channels: int
    upscale_factor: int = 2
    blur_kernel: Union[str, Sequence[int]] = "3x3"
    blur_normalize: bool = True
    pad_mode: str = "edge"  # torch 'replicate'
    pre_normalize: bool = True
    use_gaussian_blur: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout, r = self.in_channels, self.out_channels, self.upscale_factor
        norm_ch = cin if self.pre_normalize else cout
        norm = GroupNorm32(min(32, norm_ch // 4), norm_ch, name="norm")
        depthwise = Conv2d(cin, cin, 3, padding=1, groups=cin, use_bias=False, name="depthwise")
        pointwise = Conv2d(cin, cout * r * r, 1, use_bias=False, name="pointwise")

        taps_arr = self.blur_kernel
        if isinstance(taps_arr, str):
            taps_arr = GAUSSIAN_KERNELS[taps_arr]
        taps_np = np.asarray(taps_arr, np.float32)
        if self.blur_normalize:
            taps_np = taps_np / taps_np.sum()

        from ..ops.pallas.fused_upsample import (
            fused_upsample_blur,
            fused_upsample_eligible,
        )

        if fused_upsample_eligible(
            x, r, len(taps_np), self.pre_normalize, self.use_gaussian_blur,
            self.pad_mode, cin, cout,
        ):
            # One pallas pass: GN (folded affine) -> dw3x3 -> pw expand ->
            # PixelShuffle -> separable edge-pad blur.
            mean, rstd, gnw, gnb = norm(x, stats_only=True)
            dwk, _ = depthwise(None, return_params=True)   # (3, 3, 1, cin)
            pwk, _ = pointwise(None, return_params=True)   # (1, 1, cin, cout*4)
            reps = cin // mean.shape[1]
            a = jnp.repeat(rstd, reps, axis=1) * gnw[None, :]
            c = gnb[None, :] - jnp.repeat(mean * rstd, reps, axis=1) * gnw[None, :]
            return fused_upsample_blur(x, a, c, dwk[:, :, 0, :], pwk[0, 0], taps_np)

        if self.pre_normalize:
            x = norm(x)
            x = depthwise(x)
            x = pointwise(x)
            x = pixel_shuffle(x, r)
        else:
            x = depthwise(x)
            x = pointwise(x)
            x = pixel_shuffle(x, r)
            x = norm(x)

        if self.use_gaussian_blur:
            taps = self.blur_kernel
            if isinstance(taps, str):
                taps = GAUSSIAN_KERNELS[taps]
            k1 = np.asarray(taps, np.float32)
            if self.blur_normalize:
                k1 = k1 / k1.sum()  # separable: outer-product norm = per-axis norm
            k = k1.shape[0]
            pad = (k - 1) // 2
            extra = int(k % 2 == 0)
            x = jnp.pad(
                x,
                ((0, 0), (pad, pad + extra), (pad, pad + extra), (0, 0)),
                mode=self.pad_mode,
            )
            # Two 1-D depthwise passes (the binomial kernel is separable):
            # 2k taps instead of k^2 on the VPU at full decoder resolution.
            dn = ("NHWC", "HWIO", "NHWC")
            kv = jnp.tile(jnp.asarray(k1, x.dtype)[:, None, None, None], (1, 1, 1, cout))
            kh = jnp.tile(jnp.asarray(k1, x.dtype)[None, :, None, None], (1, 1, 1, cout))
            x = jax.lax.conv_general_dilated(
                x, kv, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
                feature_group_count=cout,
            )
            x = jax.lax.conv_general_dilated(
                x, kh, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
                feature_group_count=cout,
            )
        return x
