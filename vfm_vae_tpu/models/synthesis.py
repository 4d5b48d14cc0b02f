"""Style-modulated synthesis decoder.

Reference: networks/generator.py — SynthesisInput :106, SynthesisLayer :190,
ToRGBLayer :284 (legacy StyleGAN-T path), SynthesisBlock :322, MappingNetwork
:582, SynthesisNetwork :655. NHWC, modulated convs via the shared-weight
factorization (models/modulated.py), mixed precision via a per-network
compute dtype with fp32 ToRGB outputs (the reference's per-block fp16
islands, generator.py:499-575, collapse to bf16-everywhere on TPU).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.bias_act import activation_funcs, apply_activation, bias_act
from ..ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from ..ops.resample import conv2d_resample
from ..ops.upfirdn import setup_filter, upsample2d
from .convnext import (
    ConvNeXtSynthesisLayer,
    ConvNeXtToRGBLayer,
    SeparableUpsampleWithFixedBlur,
)
from .gigagan import CrossAttentionBlock, SelfAttentionBlock
from .layers import (
    Conv2d,
    FullyConnectedLayer,
    GroupNorm32,
    MLP,
    StyleSplit,
    l2_normalize,
    normalize_2nd_moment,
)
from .modulated import demod_coefs, modulated_conv2d


def remat_layer(layer_cls, remat):
    """Map the remat knob onto a (possibly policy-carrying) lifted checkpoint.

    `remat` accepts:
      False / "none"  — no rematerialization (backward stores every residual).
      True  / "full"  — blanket per-layer `nn.remat` (recompute everything).
      "dots"          — `jax.checkpoint_policies.dots_saveable`: keep matmul
                        outputs, recompute only elementwise chains.
      "names"         — `save_only_these_names("dwconv_out")`: keep exactly
                        the dwconv output that the fused-MLP custom_vjp needs
                        as its residual (models/convnext.py marks it), so the
                        backward skips the dwconv+GroupNorm recompute while
                        still dropping the wide MLP hidden.
    """
    if not remat or remat == "none":
        return layer_cls
    if remat is True or remat == "full":
        return nn.remat(layer_cls)
    if remat == "dots":
        return nn.remat(layer_cls, policy=jax.checkpoint_policies.dots_saveable)
    if remat == "names":
        return nn.remat(
            layer_cls,
            policy=jax.checkpoint_policies.save_only_these_names("dwconv_out"),
        )
    raise ValueError(f"unknown remat policy: {remat!r}")


class SynthesisInput(nn.Module):
    """Fourier-feature input grid (generator.py:106-187)."""

    w_dim: int
    channels: int
    size: int
    sampling_rate: int
    bandwidth: float

    @nn.compact
    def __call__(self, w: jnp.ndarray) -> jnp.ndarray:
        B = w.shape[0]
        C = self.channels

        def freq_init(key):
            k1, k2 = jax.random.split(key)
            freqs = jax.random.normal(k1, (C, 2))
            radii = jnp.sqrt(jnp.sum(freqs**2, axis=1, keepdims=True))
            freqs = freqs / (radii * jnp.exp(radii**2) ** 0.25)
            return freqs * self.bandwidth

        freqs = self.variable("buffers", "freqs", lambda: freq_init(self.make_rng("params"))).value
        phases = self.variable(
            "buffers", "phases",
            lambda: jax.random.uniform(self.make_rng("params"), (C,)) - 0.5,
        ).value
        transform = self.variable("buffers", "transform", lambda: jnp.eye(3)).value

        weight = self.param("weight", nn.initializers.normal(1.0), (C, C))
        t = FullyConnectedLayer(
            self.w_dim, 4, weight_init=0.0, bias_init=[1, 0, 0, 0], name="affine"
        )(w)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

        m_r = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
        m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
        m_t = jnp.tile(jnp.eye(3)[None], (B, 1, 1))
        m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
        transforms = m_r @ m_t @ transform[None]

        ph = phases[None] + jnp.einsum("cd,bde->bce", freqs, transforms[:, :2, 2:])[..., 0]
        fr = jnp.einsum("cd,bde->bce", freqs, transforms[:, :2, :2])

        amplitudes = jnp.clip(
            1
            - (jnp.linalg.norm(fr, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth),
            0,
            1,
        )

        # F.affine_grid(align_corners=False) sampling positions.
        S = int(self.size)
        coords = (2 * np.arange(S) + 1) / S - 1
        gx = coords[None, :] * (0.5 * S / self.sampling_rate)
        gy = coords[:, None] * (0.5 * S / self.sampling_rate)
        grid = np.stack(np.broadcast_arrays(gx, gy), axis=-1).astype(np.float32)  # (S,S,2)

        x = jnp.einsum("hwd,bcd->bhwc", jnp.asarray(grid), fr) + ph[:, None, None, :]
        x = jnp.sin(x * (2 * math.pi)) * amplitudes[:, None, None, :]
        x = x @ (weight.T / math.sqrt(C)).astype(x.dtype)
        return x  # NHWC


class SynthesisLayer(nn.Module):
    """Legacy StyleGAN-T modulated conv layer (generator.py:190-281)."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    layer_scale_init: float = 1e-5
    residual: bool = False
    gn_groups: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, w: jnp.ndarray, noise_mode: str = "const", gain: float = 1.0
    ) -> jnp.ndarray:
        dtype = x.dtype
        B = x.shape[0]
        k = self.kernel_size
        f = setup_filter(self.resample_filter)

        styles = StyleSplit(self.w_dim, self.in_channels, bias_init=1, name="affine")(w)
        if self.residual:
            x = GroupNorm32(self.gn_groups, self.out_channels, name="norm")(x)

        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, self.in_channels, self.out_channels)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        xs = x * styles.reshape(B, 1, 1, -1).astype(x.dtype)
        y = conv2d_resample(
            xs, weight.astype(x.dtype), f=f, up=self.up, padding=k // 2,
            flip_weight=(self.up == 1),
        )
        d = demod_coefs(weight, styles)
        y = y * d.reshape(B, 1, 1, -1).astype(y.dtype)

        if self.use_noise:
            noise_const = self.variable(
                "buffers", "noise_const",
                lambda: jax.random.normal(
                    self.make_rng("params"), (self.resolution, self.resolution)
                ),
            ).value
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            if noise_mode == "const":
                y = y + (noise_const * noise_strength)[None, :, :, None].astype(y.dtype)
            elif noise_mode == "random":
                noise = jax.random.normal(
                    self.make_rng("noise"), (B, self.resolution, self.resolution, 1)
                )
                y = y + (noise * noise_strength).astype(y.dtype)

        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        y = bias_act(y.astype(dtype), bias, act=self.activation, gain=act_gain, clamp=act_clamp)

        if self.residual:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init), (self.out_channels,)
            )
            y = (gamma.astype(dtype) * y + x) * math.sqrt(2)
        return y


class ToRGBLayer(nn.Module):
    """Legacy to-RGB (generator.py:284-313)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size

        def w_init(key, shape, dtype=jnp.float32):
            return 0.1 * jax.random.normal(key, shape, dtype)

        weight = self.param("weight", w_init, (k, k, self.in_channels, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        weight_gain = 1 / math.sqrt(self.in_channels * k * k)
        styles = StyleSplit(self.w_dim, self.in_channels, bias_init=1, name="affine")(w) * weight_gain
        y = modulated_conv2d(x, weight, styles, padding=0, demodulate=False)
        return bias_act(y, bias, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution stage (generator.py:322-579)."""

    block_index: int
    in_channels: int
    out_channels: int
    last_out_channels: Optional[int]
    c_dim: int
    w_dim: int
    resolution: int
    img_channels: int
    is_first: bool
    is_last: bool
    num_res_blocks: int = 1
    use_multiscale_output: bool = False
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    attn_block_indices: Sequence[int] = ()
    attn_depths: Sequence[int] = ()
    use_self_attn: bool = False
    use_cross_attn: bool = False
    attn_heads: int = 8
    attn_ff_mult: int = 4
    use_convnext: bool = False
    use_gaussian_blur: bool = True
    add_additional_convnext: bool = False
    legacy: bool = False
    compute_dtype: Any = jnp.float32
    remat: Any = False  # False/True/"full"/"dots"/"names" (see remat_layer)

    @property
    def num_conv(self) -> int:
        n = 1  # input layer or conv0
        if self.use_convnext:
            per_res = 3 if (self.block_index <= 3 and self.add_additional_convnext) else 2
            n += self.num_res_blocks * per_res
        else:
            n += self.num_res_blocks * 2
        return n

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        x_sum: Optional[jnp.ndarray],
        img: Optional[jnp.ndarray],
        ws: jnp.ndarray,  # (B, num_conv+num_torgb, w_dim)
        text: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        force_fp32: bool = False,
    ):
        dtype = jnp.float32 if force_fp32 else self.compute_dtype
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        kernel_size = 5 if self.block_index <= 1 else 7
        blur_kernel = "3x3" if self.block_index <= 2 else "5x5"

        if self.in_channels == 0:
            x = SynthesisInput(
                w_dim=self.w_dim, channels=self.out_channels, size=self.resolution,
                sampling_rate=self.resolution, bandwidth=2, name="input",
            )(next_w())
        x = x.astype(dtype)

        ConvNeXtLayer = remat_layer(ConvNeXtSynthesisLayer, self.remat)
        if self.use_convnext:
            if self.in_channels != 0:
                x = SeparableUpsampleWithFixedBlur(
                    self.in_channels, self.out_channels, upscale_factor=2,
                    pre_normalize=not self.is_first,
                    use_gaussian_blur=self.use_gaussian_blur,
                    blur_kernel=blur_kernel, name="seperate_upsample_conv",
                )(x)
                x = ConvNeXtLayer(
                    self.out_channels, self.w_dim, kernel_size,
                    block_index=self.block_index, legacy=self.legacy, name="conv0",
                )(x, next_w())
            n_layers = (
                3 if (self.block_index <= 3 and self.add_additional_convnext) else 2
            ) * self.num_res_blocks
            for i in range(n_layers):
                x = ConvNeXtLayer(
                    self.out_channels, self.w_dim, kernel_size,
                    block_index=self.block_index, legacy=self.legacy, name=f"convs1_{i}",
                )(x, next_w())
        else:
            if self.in_channels == 0:
                for i in range(self.num_res_blocks * 2):
                    x = SynthesisLayer(
                        self.out_channels, self.out_channels, self.w_dim, self.resolution,
                        resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
                        residual=(i % 2 == 1), name=f"convs1_{i}",
                    )(x, next_w(), gain=math.sqrt(0.5))
            else:
                x = SynthesisLayer(
                    self.in_channels, self.out_channels, self.w_dim, self.resolution,
                    up=2, resample_filter=self.resample_filter,
                    conv_clamp=self.conv_clamp, name="conv0",
                )(x, next_w())
                for i in range(self.num_res_blocks * 2):
                    x = SynthesisLayer(
                        self.out_channels, self.out_channels, self.w_dim, self.resolution,
                        resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
                        residual=(i % 2 == 1), name=f"convs1_{i}",
                    )(x, next_w(), gain=math.sqrt(0.5))

        # Attention (recommended fp32 in reference; bf16 is safe on TPU).
        if self.block_index in list(self.attn_block_indices):
            depth = list(self.attn_depths)[list(self.attn_block_indices).index(self.block_index)]
        else:
            depth = 0
        if self.use_self_attn and depth > 0:
            for i in range(depth):
                x = SelfAttentionBlock(
                    self.out_channels,
                    dim_head=self.out_channels // self.attn_heads,
                    heads=self.attn_heads,
                    ff_mult=self.attn_ff_mult,
                    name=f"self_attns_{i}",
                )(x)
        if self.use_cross_attn and depth > 0:
            assert text is not None
            for i in range(depth):
                x = CrossAttentionBlock(
                    self.out_channels,
                    dim_context=self.c_dim,
                    dim_head=self.out_channels // self.attn_heads,
                    heads=self.attn_heads,
                    ff_mult=self.attn_ff_mult,
                    name=f"cross_attns_{i}",
                )(x, text, text_mask)

        x = x.astype(dtype)

        if self.use_multiscale_output:
            if self.last_out_channels is not None:
                x_sum = SeparableUpsampleWithFixedBlur(
                    self.last_out_channels, self.out_channels, upscale_factor=2,
                    use_gaussian_blur=self.use_gaussian_blur,
                    blur_kernel=blur_kernel, name="last_upsample_conv",
                )(x_sum) + x
            else:
                x_sum = x
            if self.use_convnext:
                img = ConvNeXtToRGBLayer(
                    self.out_channels, self.img_channels, self.w_dim, name="torgb"
                )(x_sum, next_w())
            else:
                img = ToRGBLayer(
                    self.out_channels, self.img_channels, self.w_dim,
                    conv_clamp=self.conv_clamp, name="torgb",
                )(x_sum, next_w())
            img = img.astype(jnp.float32)
        else:
            if img is not None:
                img = upsample2d(img, setup_filter(self.resample_filter))
            if self.is_last or self.architecture == "skip":
                if self.use_convnext:
                    y = ConvNeXtToRGBLayer(
                        self.out_channels, self.img_channels, self.w_dim, name="torgb"
                    )(x, next_w())
                else:
                    y = ToRGBLayer(
                        self.out_channels, self.img_channels, self.w_dim,
                        conv_clamp=self.conv_clamp, name="torgb",
                    )(x, next_w())
                y = y.astype(jnp.float32)
                img = img + y if img is not None else y

        return x, x_sum, img


class ZConv(nn.Module):
    """Concat-z injector for one block (generator.py:726-784, 839-868)."""

    z_dim: int
    out_dim: int
    block_resolution: int
    z_resolution: int
    how: str = "unshuffle"  # 'unshuffle' | 'pooling'
    activation: str = "gelu"

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        res, zres = self.block_resolution, self.z_resolution

        def conv3x3(x, cin, cout, use_act, name):
            x = Conv2d(cin, cin, 3, padding=1, groups=cin, use_bias=False, name=name + "_dw")(x)
            x = Conv2d(cin, cout, 1, use_bias=False, name=name + "_pw")(x)
            x = GroupNorm32(min(32, cout), cout, name=name + "_gn")(x)
            if use_act:
                x = apply_activation(x.astype(jnp.float32), self.activation).astype(x.dtype)
            return x

        def conv1x1(x, cin, cout, use_act, name):
            x = Conv2d(cin, cout, 1, use_bias=False, name=name + "_pw")(x)
            x = GroupNorm32(min(32, cout), cout, name=name + "_gn")(x)
            if use_act:
                x = apply_activation(x.astype(jnp.float32), self.activation).astype(x.dtype)
            return x

        if res < zres * 2:
            r = int(zres / res * 2)
            if self.how == "unshuffle":
                z = pixel_unshuffle(z, r)
                cin = self.z_dim * r * r
            else:
                from ..ops.resize import adaptive_avg_pool2d

                z = adaptive_avg_pool2d(z, (max(1, int(z.shape[1] / r)), max(1, int(z.shape[2] / r))))
                cin = self.z_dim
            z = conv3x3(z, cin, self.out_dim, True, "conv0")
            z = conv1x1(z, self.out_dim, self.out_dim, False, "conv1")
        elif res == zres * 2:
            z = conv3x3(z, self.z_dim, self.out_dim, True, "conv0")
            z = conv1x1(z, self.out_dim, self.out_dim, False, "conv1")
        else:
            r = int(res / zres / 2)
            z = conv3x3(z, self.z_dim, self.out_dim * r * r, True, "conv0")
            z = pixel_shuffle(z, r)
            z = conv1x1(z, self.out_dim, self.out_dim, False, "conv1")
        return z


class MappingNetwork(nn.Module):
    """Pooled-z -> w mapping with truncation EMA (generator.py:582-652)."""

    z_dim_input: int
    z_dim_output: int
    c_dim: int
    w_dim: int
    label_type: str
    num_ws: Optional[int] = None
    num_layers: int = 2
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    x_avg_beta: float = 0.995

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        truncation_psi: float = 1.0,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.label_type in ("text", "cls2text"):
            mlp = MLP(
                [self.z_dim_input] * self.num_layers + [self.z_dim_output],
                activation=self.activation, lr_multiplier=self.lr_multiplier,
                linear_out=True, name="mlp",
            )
            x_avg = self.variable("buffers", "x_avg", jnp.zeros, (self.z_dim_output,))
            x = mlp(normalize_2nd_moment(z))
            if train and self.x_avg_beta is not None and not self.is_initializing():
                x_avg.value = jax.lax.stop_gradient(
                    jnp.mean(x, axis=0) * (1 - self.x_avg_beta) + x_avg.value * self.x_avg_beta
                )
            if truncation_psi != 1:
                x = x_avg.value[None] + truncation_psi * (x - x_avg.value[None])
            w = jnp.concatenate([x, l2_normalize(c, axis=1)], axis=1) if self.c_dim > 0 else x
        elif self.label_type == "cls2id":
            c_embed_dim = 1024
            x_avg = self.variable("buffers", "x_avg", jnp.zeros, (self.w_dim,))
            if self.c_dim > 0:
                embed = FullyConnectedLayer(self.c_dim, c_embed_dim, name="embed")
                zin = jnp.concatenate(
                    [normalize_2nd_moment(z), normalize_2nd_moment(embed(c))], axis=1
                )
                mlp_dims = [self.z_dim_input + c_embed_dim] * self.num_layers + [self.w_dim]
            else:
                zin = normalize_2nd_moment(z)
                mlp_dims = [self.z_dim_input] * self.num_layers + [self.w_dim]
            x = MLP(
                mlp_dims, activation=self.activation,
                lr_multiplier=self.lr_multiplier, linear_out=True, name="mlp",
            )(zin)
            if train and self.x_avg_beta is not None and not self.is_initializing():
                x_avg.value = jax.lax.stop_gradient(
                    jnp.mean(x, axis=0) * (1 - self.x_avg_beta) + x_avg.value * self.x_avg_beta
                )
            if truncation_psi != 1:
                x = x_avg.value[None] + truncation_psi * (x - x_avg.value[None])
            w = x
        else:
            raise ValueError(self.label_type)

        if self.num_ws is not None:
            w = jnp.tile(w[:, None, :], (1, self.num_ws, 1))
        return w


def synthesis_channels(img_resolution: int, num_blocks: int, channel_base: int, channel_max: int):
    """(generator.py:694-700)."""
    res_start = img_resolution // (2 ** (num_blocks - 1))
    block_resolutions = [res_start * (2**i) for i in range(num_blocks)]
    scale = img_resolution / 256
    channels = {
        idx: min(channel_base // int(res / scale), channel_max)
        for idx, res in enumerate(block_resolutions)
    }
    return block_resolutions, channels


class SynthesisNetwork(nn.Module):
    """Stack of synthesis blocks with concat-z injection
    (generator.py:655-912)."""

    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 3
    conv_clamp: Optional[float] = None
    num_blocks: int = 6
    num_res_blocks: int = 3
    z_resolution: int = 16
    z_dim: int = 8
    concat_z_block_indices: Sequence[int] = ()
    concat_z_mapped_dims: Sequence[int] = ()
    how_to_process_concat_z: str = "unshuffle"
    activation_for_concat_z: str = "gelu"
    use_multiscale_output: bool = False
    attn_block_indices: Sequence[int] = ()
    attn_depths: Sequence[int] = ()
    use_self_attn: bool = False
    use_cross_attn: bool = False
    use_convnext: bool = False
    use_gaussian_blur: bool = True
    add_additional_convnext: bool = False
    legacy: bool = False
    architecture: str = "skip"
    compute_dtype: Any = jnp.float32
    remat: Any = False  # jax.checkpoint each ConvNeXt layer (policy: remat_layer)

    @property
    def block_resolutions(self) -> List[int]:
        return synthesis_channels(
            self.img_resolution, self.num_blocks, self.channel_base, self.channel_max
        )[0]

    def _block_cfgs(self):
        block_res, channels = synthesis_channels(
            self.img_resolution, self.num_blocks, self.channel_base, self.channel_max
        )
        adjust = {
            idx: (
                list(self.concat_z_mapped_dims)[idx]
                if len(self.concat_z_mapped_dims) > 0
                else None
            )
            for idx in self.concat_z_block_indices
        }
        fp16_idx = self.num_blocks - self.num_fp16_res
        cfgs = []
        for idx in range(self.num_blocks):
            in_ch = channels[idx - 1] if idx > 0 else 0
            last_out = channels[idx - 1] if idx > 0 else None
            zc = None
            if idx in self.concat_z_block_indices:
                zc = adjust[idx]
                if zc is None:
                    # unshuffle default dims (generator.py:736-737,754,763)
                    res = block_res[idx]
                    if res < self.z_resolution * 2:
                        zc = int(self.z_dim * (self.z_resolution / res * 2) ** 2)
                    else:
                        zc = self.z_dim
                in_ch += zc
            cfgs.append(
                dict(
                    block_index=idx,
                    in_channels=in_ch,
                    out_channels=channels[idx],
                    last_out_channels=last_out,
                    resolution=block_res[idx],
                    use_fp16=(idx >= fp16_idx),
                    is_first=(idx == 0),
                    is_last=(idx == self.num_blocks - 1),
                    concat_dim=zc,
                )
            )
        return cfgs

    def _block_ws_count(self, cfg) -> int:
        """num_conv + num_torgb without constructing the module."""
        if self.use_convnext:
            per_res = 3 if (cfg["block_index"] <= 3 and self.add_additional_convnext) else 2
        else:
            per_res = 2
        num_conv = 1 + self.num_res_blocks * per_res
        num_torgb = 1 if (cfg["is_last"] or self.architecture == "skip") else 0
        return num_conv + num_torgb

    @property
    def num_ws(self) -> int:
        return sum(self._block_ws_count(cfg) for cfg in self._block_cfgs())

    def _make_block(self, cfg) -> SynthesisBlock:
        return SynthesisBlock(
            block_index=cfg["block_index"],
            in_channels=cfg["in_channels"],
            out_channels=cfg["out_channels"],
            last_out_channels=cfg["last_out_channels"],
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            resolution=cfg["resolution"],
            img_channels=self.img_channels,
            is_first=cfg["is_first"],
            is_last=cfg["is_last"],
            num_res_blocks=self.num_res_blocks,
            use_multiscale_output=self.use_multiscale_output,
            architecture=self.architecture,
            conv_clamp=self.conv_clamp,
            use_fp16=cfg["use_fp16"],
            attn_block_indices=self.attn_block_indices,
            attn_depths=self.attn_depths,
            use_self_attn=self.use_self_attn,
            use_cross_attn=self.use_cross_attn,
            use_convnext=self.use_convnext,
            use_gaussian_blur=self.use_gaussian_blur,
            add_additional_convnext=self.add_additional_convnext,
            legacy=self.legacy,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            name=f"b{cfg['block_index']}",
        )

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,  # (B, z_res, z_res, z_dim) NHWC
        ws: jnp.ndarray,  # (B, num_ws, w_dim)
        text: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        force_fp32: bool = False,
    ):
        ws = ws.astype(jnp.float32)
        cfgs = self._block_cfgs()

        x = x_sum = img = None
        multiscale_imgs = []
        w_idx = 0
        for cfg in cfgs:
            idx = cfg["block_index"]
            block = self._make_block(cfg)
            if idx in self.concat_z_block_indices:
                zc = ZConv(
                    z_dim=self.z_dim,
                    out_dim=cfg["concat_dim"],
                    block_resolution=cfg["resolution"],
                    z_resolution=self.z_resolution,
                    how=self.how_to_process_concat_z,
                    activation=self.activation_for_concat_z,
                    name=f"z_convs_{idx}",
                )(z)
                x = jnp.concatenate([x, zc.astype(x.dtype)], axis=-1) if x is not None else zc
            n_ws = self._block_ws_count(cfg)
            x, x_sum, img = block(
                x, x_sum, img, ws[:, w_idx : w_idx + n_ws], text, text_mask,
                force_fp32=force_fp32,
            )
            w_idx += n_ws
            if not cfg["is_last"]:
                multiscale_imgs.append(img)

        return img, multiscale_imgs[::-1]
