"""LPIPS perceptual loss (taming-transformers lineage; reference:
training/lpips.py:61-171). VGG16 feature slices (relu1_2..relu5_3), channel
unit-normalization, frozen 1x1 linear heads, spatial mean, layer sum.

Weights come from the same checkpoint the reference auto-downloads
(`vgg.pth`, heibox URL + md5 check, training/lpips.py:19-29,50-59) via
`get_lpips_ckpt()` (explicit path > cache > download) +
`load_lpips_params(path)`. Random-init params are fine for smoke tests
but must be requested explicitly (`allow_random_lpips`).
NHWC, inputs in [-1, 1].
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .lpips_util import VGG16_CFG  # layer channel plan

LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)
LPIPS_CHNS = [64, 128, 256, 512, 512]

# Reference checkpoint contract (training/lpips.py:19-29).
LPIPS_URL = "https://heibox.uni-heidelberg.de/f/607503859c864bc1b30b/?dl=1"
LPIPS_MD5 = "d507d7349b931f0638a25a48a722f98a"


def get_lpips_ckpt(path: Optional[str] = None) -> str:
    """Resolve the taming `vgg.pth`: explicit path > local cache > download
    with md5 verification (reference training/lpips.py:50-59). Raises
    IOError when neither a file nor the network is available."""
    if path:
        if os.path.isfile(path):
            return path
        raise IOError(f"lpips_ckpt path does not exist: {path}")
    from ..core.urlcache import open_url

    return open_url(LPIPS_URL, expected_md5=LPIPS_MD5)


class VGG16Features(nn.Module):
    """torchvision vgg16 `.features` through relu5_3, tapping the 5 LPIPS
    slices (conv indices per training/lpips.py:133-147)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        from .lpips_util import VGG16_LAYERS

        taps = []
        conv_idx = 0
        for kind, arg in VGG16_LAYERS:
            if kind == "conv":
                cin, cout = arg
                w = self.param(
                    f"conv{conv_idx}_weight", nn.initializers.lecun_normal(), (3, 3, cin, cout)
                )
                b = self.param(f"conv{conv_idx}_bias", nn.initializers.zeros, (cout,))
                x = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b.astype(x.dtype)
                x = jax.nn.relu(x)
                conv_idx += 1
            elif kind == "pool":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            elif kind == "tap":
                taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Frozen perceptual distance; __call__(x, y) -> (B,) distances."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(LPIPS_SHIFT)
        scale = jnp.asarray(LPIPS_SCALE)
        net = VGG16Features(name="net")

        def prep(t):
            return (t - shift) / scale

        f0 = net(prep(x))
        f1 = net(prep(y))
        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            # max() keeps the sqrt backward finite for dead-ReLU (all-zero)
            # channel vectors, which torch hits less often but also NaNs on.
            a = a / (jnp.sqrt(jnp.maximum(jnp.sum(a**2, axis=-1, keepdims=True), 1e-20)) + 1e-10)
            b = b / (jnp.sqrt(jnp.maximum(jnp.sum(b**2, axis=-1, keepdims=True), 1e-20)) + 1e-10)
            diff = (a - b) ** 2
            lin = self.param(
                f"lin{k}_weight",
                nn.initializers.lecun_normal(),
                (LPIPS_CHNS[k], 1),
            )
            val = jnp.einsum("bhwc,co->bhwo", diff, lin.astype(diff.dtype))
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return total


def load_lpips_params(lin_path: str, vgg_path: str = None) -> Dict[str, Any]:
    """Build LPIPS params from torch checkpoints, offline.

    lin_path: the taming `vgg.pth` (lin heads; also contains net.slice* keys
    when saved from a full LPIPS module). vgg_path: optional torchvision
    vgg16 state dict (features.N.*) for the backbone if lin_path lacks it.
    """
    import torch

    from .lpips_util import TORCH_SLICE_CONV_KEYS, TORCHVISION_CONV_IDX

    sd = {k: v.numpy() for k, v in torch.load(lin_path, map_location="cpu").items()}
    p: Dict[str, Any] = {"net": {}}

    def put_conv(conv_idx, w, b):
        p["net"][f"conv{conv_idx}_weight"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        p["net"][f"conv{conv_idx}_bias"] = np.array(b, copy=True)

    if "net.slice1.0.weight" in sd:
        for conv_idx, torch_key in enumerate(TORCH_SLICE_CONV_KEYS):
            put_conv(conv_idx, sd[f"net.{torch_key}.weight"], sd[f"net.{torch_key}.bias"])
    else:
        assert vgg_path is not None, "lin ckpt has no VGG weights; pass vgg_path"
        vgg_sd = {k: v.numpy() for k, v in torch.load(vgg_path, map_location="cpu").items()}
        for conv_idx, feat_idx in enumerate(TORCHVISION_CONV_IDX):
            put_conv(
                conv_idx,
                vgg_sd[f"features.{feat_idx}.weight"],
                vgg_sd[f"features.{feat_idx}.bias"],
            )
    for k in range(5):
        w = sd[f"lin{k}.model.1.weight"]  # (1, C, 1, 1)
        p[f"lin{k}_weight"] = np.ascontiguousarray(w[:, :, 0, 0].T)
    return p
