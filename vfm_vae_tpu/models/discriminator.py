"""Dual-branch projected discriminator.

Reference: networks/discriminator.py — frozen DINO ViT-S/16 feature branch
with spectral-norm conv1d DiscHeads (:116-168, :271-356) + pix2pixHD
MultiscaleDiscriminator PatchGAN branch (:180-268). vit_utils.py provides the
DPT-style hook/readout convention we reproduce functionally (no hooks —
hidden states are collected in the forward pass).

TPU notes: DINO runs frozen in the compute dtype under stop_gradient; the
token-axis 1D convs are NLC-layout convs; spectral-norm power iteration
carries its u vector in the 'buffers' collection (torch keeps weight_u the
same way).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_bicubic
from ..train.diffaug import diff_augment
from .dataclasses import DiscriminatorForwardOutput
from .layers import FullyConnectedLayer, LayerNormFp32, Linear, l2_normalize
from .vit import ViTBlock, interpolate_pos_embed

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DINOBackbone(nn.Module):
    """timm vit_small_patch16_224_dino equivalent with DPT-style taps
    (discriminator.py:145-168, vit_utils.py:90-112): patch conv + CLS +
    bilinear pos-embed resize; activations tapped after pos-add ('patch')
    and after blocks `hooks`; AddReadout folds CLS into tokens."""

    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    patch_size: int = 16
    image_size: int = 224
    hooks: Sequence[int] = (2, 5, 8, 11)
    hook_patch: bool = True

    @property
    def n_hooks(self) -> int:
        return len(self.hooks) + int(self.hook_patch)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: NHWC, ImageNet-normalized. Returns n_hooks maps (B, D, N)."""
        B, H, W, _ = x.shape
        D, p = self.hidden_size, self.patch_size
        grid = self.image_size // p

        patch_w = self.param(
            "patch_weight", nn.initializers.lecun_normal(), (p, p, x.shape[-1], D)
        )
        patch_b = self.param("patch_bias", nn.initializers.zeros, (D,))
        t = jax.lax.conv_general_dilated(
            x, patch_w.astype(x.dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + patch_b.astype(x.dtype)
        gh, gw = t.shape[1], t.shape[2]
        t = t.reshape(B, gh * gw, D)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1 + grid * grid, D)
        )
        if (gh, gw) != (grid, grid):
            # Reference resizes with *bilinear* here (vit_utils.py:82).
            grid_pos = interpolate_pos_embed(pos[1:], grid, gh, gw, mode="bilinear")
            pos_use = jnp.concatenate([pos[:1], grid_pos], axis=0)
        else:
            pos_use = pos
        t = jnp.concatenate([jnp.broadcast_to(cls_token.astype(t.dtype), (B, 1, D)), t], axis=1)
        t = t + pos_use.astype(t.dtype)[None]

        taps: List[jnp.ndarray] = []
        if self.hook_patch:
            taps.append(t)
        for i in range(self.num_layers):
            t = ViTBlock(
                D, self.num_heads, self.mlp_dim, eps=1e-6, act="gelu", name=f"blocks_{i}"
            )(t)
            if i in list(self.hooks):
                taps.append(t)

        # AddReadout(start_index=1) + transpose -> (B, D, N) (vit_utils.py:43-64).
        outs = []
        for a in taps:
            readout = a[:, :1]
            outs.append(jnp.transpose(a[:, 1:] + readout, (0, 2, 1)))
        return outs


class SpectralConv1d(nn.Module):
    """Conv1d with spectral normalization (discriminator.py:39-42; torch
    SpectralNorm with one power iteration per training step, dim=0)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    padding_mode: str = "zeros"  # 'circular' for the k=9 block

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """x: (B, N, C_in) token-major; returns (B, N, C_out)."""
        k, I, O = self.kernel_size, self.in_channels, self.out_channels
        fan_in = I * k
        bound = 1.0 / math.sqrt(fan_in)

        def u_init(key, shape, dtype=jnp.float32):
            u = jax.random.normal(key, shape, dtype)
            return u / jnp.linalg.norm(u)

        weight = self.param(
            "weight",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(key, shape, dtype, -bound, bound),
            (O, I, k),  # torch layout: power iteration flattens dims 1+
        )
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(key, shape, dtype, -bound, bound),
            (O,),
        )
        u_var = self.variable("buffers", "u", u_init, self.make_rng("params") if self.is_initializing() else None, (O,))
        v_var = self.variable("buffers", "v", u_init, self.make_rng("params") if self.is_initializing() else None, (I * k,))

        # torch SpectralNorm semantics: one power iteration per training
        # forward (updates u, v buffers); eval reuses stored u, v.
        w_mat = weight.reshape(O, I * k).astype(jnp.float32)
        u, v = u_var.value, v_var.value
        if train and not self.is_initializing():
            v = l2_normalize(w_mat.T @ u, axis=0, eps=1e-12)
            u = l2_normalize(w_mat @ v, axis=0, eps=1e-12)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            u_var.value = u
            v_var.value = v
        sigma = jnp.dot(u, w_mat @ v)
        w_norm = (weight / sigma).astype(x.dtype)

        if self.padding_mode == "circular" and k > 1:
            pad = k // 2
            x = jnp.concatenate([x[:, -pad:], x, x[:, :pad]], axis=1)
            padding = "VALID"
        elif k > 1:
            padding = [(k // 2, k // 2)]
        else:
            padding = "VALID"
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(w_norm, (2, 1, 0)), (1,),
            padding if padding != "VALID" else [(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(y.dtype)


class BatchNormLocal(nn.Module):
    """Virtual-batch norm over (group, token) per channel
    (discriminator.py:45-71). Token-major (B, N, C)."""

    num_features: int
    affine: bool = True
    virtual_bs: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        G = -(-B // self.virtual_bs)
        xf = x.astype(jnp.float32).reshape(G, -1, N, C)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = jnp.square(xf - mean).mean(axis=(1, 2), keepdims=True)
        xf = (xf - mean) / jnp.sqrt(var + self.eps)
        xf = xf.reshape(B, N, C)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (C,))
            b = self.param("bias", nn.initializers.zeros, (C,))
            xf = xf * w + b
        return xf.astype(x.dtype)


class DiscBlock(nn.Module):
    channels: int
    kernel_size: int
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = SpectralConv1d(
            self.channels, self.channels, self.kernel_size,
            padding_mode="circular" if self.kernel_size > 1 else "zeros",
            name="conv",
        )(x, train=train)
        x = BatchNormLocal(self.channels, name="bn")(x)
        return jax.nn.leaky_relu(x, 0.2)


class DiscHead(nn.Module):
    """Spectral conv1d head over the token axis (discriminator.py:116-142)."""

    channels: int
    c_dim: int
    cmap_dim: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        """x: (B, D, N) reference layout -> internally token-major."""
        x = jnp.transpose(x, (0, 2, 1))  # (B, N, C)
        h = DiscBlock(self.channels, 1, name="main0")(x, train=train)
        r = DiscBlock(self.channels, 9, name="main1")(h, train=train)
        h = (r + h) / math.sqrt(2)

        if self.c_dim > 0:
            out = SpectralConv1d(self.channels, self.cmap_dim, 1, name="cls")(h, train=train)
            cmap = FullyConnectedLayer(self.c_dim, self.cmap_dim, name="cmapper")(c)
            out = jnp.sum(out * cmap[:, None, :], axis=-1, keepdims=True) / math.sqrt(self.cmap_dim)
        else:
            out = SpectralConv1d(self.channels, 1, 1, name="cls")(h, train=train)
        return jnp.transpose(out, (0, 2, 1))  # (B, 1, N)


class BatchNormLocal2d(nn.Module):
    """(discriminator.py:75-99); NHWC: stats over (group-batch, H, W)...
    NOTE the reference normalizes over dims [1,3,4] of (G, B/G, C, H, W) —
    i.e. over (group batch, H, W) *per channel*? No: dims [3,4] are H,W and
    dim 1 is the virtual batch, so stats are per (G, C): batch+spatial."""

    num_features: int
    affine: bool = True
    virtual_bs: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        G = -(-B // self.virtual_bs)
        xf = x.astype(jnp.float32).reshape(G, -1, H, W, C)
        mean = xf.mean(axis=(1, 2, 3), keepdims=True)
        var = jnp.square(xf - mean).mean(axis=(1, 2, 3), keepdims=True)
        xf = ((xf - mean) / jnp.sqrt(var + self.eps)).reshape(B, H, W, C)
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (C,))
            b = self.param("bias", nn.initializers.zeros, (C,))
            xf = xf * w + b
        return xf.astype(x.dtype)


def _patchgan_conv_init(key, shape, dtype=jnp.float32):
    # pix2pixHD weights_init: normal(0, 0.02) (discriminator.py:171-177).
    return 0.02 * jax.random.normal(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    """pix2pixHD N-layer conv discriminator (discriminator.py:180-228)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        from .layers import Conv2d

        feats = []
        kw, padw = 4, 2  # ceil((4-1)/2) = 2

        def conv(x, cin, cout, stride, name):
            return Conv2d(
                cin, cout, kw, stride=stride, padding=padw,
                kernel_init=_patchgan_conv_init, name=name,
            )(x)

        x = conv(x, self.input_nc, self.ndf, 2, "conv0")
        x = jax.nn.leaky_relu(x, 0.2)
        feats.append(x)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            x = conv(x, nf_prev, nf, 2, f"conv{n}")
            x = BatchNormLocal2d(nf, name=f"bn{n}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            feats.append(x)

        nf_prev, nf = nf, min(nf * 2, 512)
        x = conv(x, nf_prev, nf, 1, f"conv{self.n_layers}")
        x = BatchNormLocal2d(nf, name=f"bn{self.n_layers}")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        feats.append(x)

        x = conv(x, nf, 1, 1, f"conv{self.n_layers + 1}")
        feats.append(x)
        return feats if self.get_interm_feat else [feats[-1]]


def _avg_pool_no_pad_count(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False), NHWC."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return sum_ / cnt


class MultiscaleDiscriminator(nn.Module):
    """3-scale PatchGAN (discriminator.py:231-268)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    num_D: int = 3
    get_interm_feat: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        results = []
        inp = x
        for i in range(self.num_D):
            d_idx = self.num_D - 1 - i
            results.append(
                NLayerDiscriminator(
                    self.input_nc, self.ndf, self.n_layers,
                    get_interm_feat=self.get_interm_feat, name=f"scale{d_idx}",
                )(inp)
            )
            if i != self.num_D - 1:
                inp = _avg_pool_no_pad_count(inp)
        return results


class ProjectedDiscriminator(nn.Module):
    """DiffAug -> crop/resize -> frozen DINO -> DiscHeads, plus optional
    PatchGAN branch (discriminator.py:271-366)."""

    c_dim: int = 0
    vfm_name: str = "siglip2"
    use_stylegan_t_discriminator: bool = True
    diffaug: bool = True
    p_crop: float = 0.5
    use_patchgan_discriminator: bool = False
    get_interm_feat: bool = False
    compute_dtype: Any = jnp.float32
    # DINO geometry (override for tests).
    dino_kwargs: Dict[str, Any] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, 3) in [-1, 1]
        c: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        train: bool = True,
    ) -> DiscriminatorForwardOutput:
        st_logits = None
        pg_out = None

        if self.use_stylegan_t_discriminator:
            dino = DINOBackbone(name="dino", **(self.dino_kwargs or {}))
            res = dino.image_size
            h = x
            if self.diffaug and rng is not None:
                rng, sub = jax.random.split(rng)
                h = diff_augment(sub, h)
            h = (h + 1.0) / 2.0

            H = h.shape[1]
            if H > res:
                # RandomCrop with prob p_crop else antialiased resize
                # (discriminator.py:336-345); same crop for the whole batch,
                # matching torchvision RandomCrop on a batched tensor.
                interp = "bicubic" if any(
                    k in self.vfm_name.lower() for k in ("qwen", "dino", "eva")
                ) else "bilinear"
                resize = (
                    resize_bicubic if interp == "bicubic" else resize_bilinear
                )
                if rng is not None and train:
                    rng, r1, r2, r3 = jax.random.split(rng, 4)
                    do_crop = jax.random.uniform(r1) < self.p_crop
                    oy = jax.random.randint(r2, (), 0, H - res + 1)
                    ox = jax.random.randint(r3, (), 0, H - res + 1)
                    cropped = jax.lax.dynamic_slice(
                        h, (0, oy, ox, 0), (h.shape[0], res, res, h.shape[3])
                    )
                    resized = resize(h, size=(res, res), antialias=True)
                    h = jnp.where(do_crop, cropped, resized)
                else:
                    h = resize(h, size=(res, res), antialias=True)
            elif H < res:
                interp = "bicubic" if any(
                    k in self.vfm_name.lower() for k in ("qwen", "dino", "eva")
                ) else "bilinear"
                resize = resize_bicubic if interp == "bicubic" else resize_bilinear
                h = resize(h, size=(res, res), antialias=False)

            h = (h - IMAGENET_MEAN) / IMAGENET_STD
            # DINO params are frozen via the optimizer mask, but gradients
            # MUST flow through the backbone to the generated image (the
            # G-phase adversarial signal) — no stop_gradient here.
            feats = dino(h.astype(self.compute_dtype))
            feats = [f.astype(jnp.float32) for f in feats]

            logits = []
            for i, f in enumerate(feats):
                out = DiscHead(dino.hidden_size, self.c_dim, name=f"heads_{i}")(
                    f, c, train=train
                )
                logits.append(out.reshape(out.shape[0], -1))
            st_logits = jnp.concatenate(logits, axis=1)

        if self.use_patchgan_discriminator:
            pg_out = MultiscaleDiscriminator(
                get_interm_feat=self.get_interm_feat, name="patchgan"
            )(x)

        return DiscriminatorForwardOutput(
            stylegan_t_logits=st_logits,
            patchgan_logits=[r[-1] for r in pg_out] if pg_out is not None else None,
            patchgan_features=pg_out if (pg_out is not None and self.get_interm_feat) else None,
        )
