"""InceptionV3 FID feature extractor (pool3, 2048-d), flax/NHWC.

The reference computes FID against the NVIDIA Inception pickle / external
torch-fidelity (metrics/frechet_inception_distance.py:20-39, README
protocol). This is the standard pytorch-fid architecture ("FIDInception"
variants of torchvision inception_v3: avg-pool branches with
count_include_pad=False, max-pool branch in the last Mixed_7c block) so the
pt_inception-2015-12-05 weights convert 1:1 via `load_inception_params`.

Inputs: (B, H, W, 3) in [0, 1]; resized to 299 bilinear and scaled to
[-1, 1] like pytorch-fid.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear


class BasicConv(nn.Module):
    in_ch: int
    out_ch: int
    kernel: Any  # int or (kh, kw)
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        k = self.kernel if isinstance(self.kernel, (tuple, list)) else (self.kernel, self.kernel)
        pad = self.padding if isinstance(self.padding, (tuple, list)) else (self.padding, self.padding)
        w = self.param("conv", nn.initializers.lecun_normal(), (k[0], k[1], self.in_ch, self.out_ch))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # BatchNorm in inference form (eps 1e-3).
        scale = self.param("bn_weight", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.variable("buffers", "bn_mean", jnp.zeros, (self.out_ch,)).value
        var = self.variable("buffers", "bn_var", jnp.ones, (self.out_ch,)).value
        y = (y - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(y)


def _max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _avg_pool_nocount(x, k=3, s=1, pad=1):
    """count_include_pad=False average pool (the FID-variant branches)."""
    ones = jnp.ones_like(x[..., :1])
    window = (1, k, k, 1)
    strides = (1, s, s, 1)
    pads = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pads)
    return sum_ / cnt


class InceptionA(nn.Module):
    in_ch: int
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(self.in_ch, 64, 1, name="branch1x1")(x)
        b5 = BasicConv(self.in_ch, 48, 1, name="branch5x5_1")(x)
        b5 = BasicConv(48, 64, 5, padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(self.in_ch, 64, 1, name="branch3x3dbl_1")(x)
        b3 = BasicConv(64, 96, 3, padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, 96, 3, padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocount(x)
        bp = BasicConv(self.in_ch, self.pool_features, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    in_ch: int

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(self.in_ch, 384, 3, stride=2, name="branch3x3")(x)
        bd = BasicConv(self.in_ch, 64, 1, name="branch3x3dbl_1")(x)
        bd = BasicConv(64, 96, 3, padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, 96, 3, stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    in_ch: int
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(self.in_ch, 192, 1, name="branch1x1")(x)
        b7 = BasicConv(self.in_ch, c7, 1, name="branch7x7_1")(x)
        b7 = BasicConv(c7, c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(c7, 192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(self.in_ch, c7, 1, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(c7, 192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocount(x)
        bp = BasicConv(self.in_ch, 192, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    in_ch: int

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(self.in_ch, 192, 1, name="branch3x3_1")(x)
        b3 = BasicConv(192, 320, 3, stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(self.in_ch, 192, 1, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, 192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, 192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, 192, 3, stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    in_ch: int
    use_max_pool: bool = False  # FIDInceptionE_2 (Mixed_7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(self.in_ch, 320, 1, name="branch1x1")(x)
        b3 = BasicConv(self.in_ch, 384, 1, name="branch3x3_1")(x)
        b3a = BasicConv(384, 384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, 384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(self.in_ch, 448, 1, name="branch3x3dbl_1")(x)
        bd = BasicConv(448, 384, 3, padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, 384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, 384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = _max_pool(x, k=3, s=1, pad=1)
        else:
            bp = _avg_pool_nocount(x)
        bp = BasicConv(self.in_ch, 192, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Images in [0,1] -> 2048-d pool3 features (and optionally the 1008-way
    logits head for Inception Score)."""

    resize_input: bool = True
    normalize_input: bool = True
    return_logits: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = resize_bilinear(x, size=(299, 299))
        if self.normalize_input:
            x = x * 2.0 - 1.0
        x = BasicConv(3, 32, 3, stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, 32, 3, name="Conv2d_2a_3x3")(x)
        x = BasicConv(32, 64, 3, padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv(64, 80, 1, name="Conv2d_3b_1x1")(x)
        x = BasicConv(80, 192, 3, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(192, 32, name="Mixed_5b")(x)
        x = InceptionA(256, 64, name="Mixed_5c")(x)
        x = InceptionA(288, 64, name="Mixed_5d")(x)
        x = InceptionB(288, name="Mixed_6a")(x)
        x = InceptionC(768, 128, name="Mixed_6b")(x)
        x = InceptionC(768, 160, name="Mixed_6c")(x)
        x = InceptionC(768, 160, name="Mixed_6d")(x)
        # sFID spatial tap (ADM evaluator, guided-diffusion
        # evaluations/evaluator.py): TF-graph node 'mixed_6/conv:0', first 7
        # channels, flattened to 17*17*7 = 2023 dims. The torch-port mapping
        # (mseitzer pt_inception): TF mixed_6 = Mixed_6d, and its 'conv'
        # (branch1x1, post-ReLU) output is the first 192 channels of the
        # block's concat. Collected only under mutable=['intermediates'].
        self.sow("intermediates", "sfid_spatial", x[..., :7])
        x = InceptionC(768, 192, name="Mixed_6e")(x)
        x = InceptionD(768, name="Mixed_7a")(x)
        x = InceptionE(1280, name="Mixed_7b")(x)
        x = InceptionE(2048, use_max_pool=True, name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # global avg pool -> (B, 2048)
        if not self.return_logits:
            return feats
        w = self.param("fc_weight", nn.initializers.lecun_normal(), (2048, 1008))
        b = self.param("fc_bias", nn.initializers.zeros, (1008,))
        return feats, feats @ w.astype(feats.dtype) + b.astype(feats.dtype)


def load_inception_params(path: str):
    """Convert the pytorch-fid pt_inception-2015-12-05 state dict ->
    (params, buffers). Torch naming: <Block>.<branch>.conv.weight and
    .bn.{weight,bias,running_mean,running_var}."""
    import torch

    sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    seen = set()
    for key in sd:
        if not key.endswith(".conv.weight"):
            continue
        mod = key[: -len(".conv.weight")]  # e.g. Mixed_5b.branch1x1
        parts = mod.split(".")
        pnode, bnode = params, buffers
        for p in parts[:-1]:
            pnode = pnode.setdefault(p, {})
            bnode = bnode.setdefault(p, {})
        leaf = parts[-1]
        pnode[leaf] = {
            "conv": np.ascontiguousarray(sd[mod + ".conv.weight"].transpose(2, 3, 1, 0)),
            "bn_weight": sd[mod + ".bn.weight"].copy(),
            "bn_bias": sd[mod + ".bn.bias"].copy(),
        }
        bnode[leaf] = {
            "bn_mean": sd[mod + ".bn.running_mean"].copy(),
            "bn_var": sd[mod + ".bn.running_var"].copy(),
        }
        seen.add(mod)
    if "fc.weight" in sd:
        params["fc_weight"] = np.ascontiguousarray(sd["fc.weight"].T)
        params["fc_bias"] = sd["fc.bias"].copy()
    return params, buffers


def make_inception_detector(weights_path: Optional[str] = None, batch_jit: bool = True):
    """Returns detector_fn(images NHWC [0,1] or uint8) -> (B, 2048) numpy."""
    model = InceptionV3Features()
    if weights_path:
        params, buffers = load_inception_params(weights_path)
        variables = {"params": params, "buffers": buffers}
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))

    fn = jax.jit(lambda x: model.apply(variables, x)) if batch_jit else (
        lambda x: model.apply(variables, x)
    )

    def detector(images) -> np.ndarray:
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        return np.asarray(fn(x))

    return detector
