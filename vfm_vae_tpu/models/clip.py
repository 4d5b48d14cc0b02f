"""CLIP image/text encoder for the CLIP loss and the clip-score metric
(reference: networks/utils/vfms/clip_utils.py — open_clip ViT-L/14
'openai'; identical weights ship as HF openai/clip-vit-large-patch14, which
`convert_clip` imports).

Vision: CLS + patch conv (no bias) + learned positions, pre-LN, quick-gelu
MLPs, pre/post layernorms, linear projection. Text: causal transformer,
features at the end-of-text token, linear projection. The wrapper matches
the reference preprocessing: bicubic resize to the tower resolution,
OPENAI_CLIP normalization, L2-normalized output features.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bicubic
from .layers import LayerNormFp32, Linear
from .vit import ViTBlock

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionTower(nn.Module):
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 768
    eps: float = 1e-5

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        B = pixels.shape[0]
        D, p = self.hidden_size, self.patch_size
        w = self.param(
            "patch_embedding_weight", nn.initializers.lecun_normal(),
            (p, p, pixels.shape[-1], D),
        )
        x = jax.lax.conv_general_dilated(
            pixels, w.astype(pixels.dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, D)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (D,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (1 + (self.image_size // p) ** 2, D),
        )
        x = x + pos.astype(x.dtype)[None]
        x = LayerNormFp32(D, eps=self.eps, name="pre_layrnorm")(x)
        for i in range(self.num_layers):
            x = ViTBlock(
                D, self.num_heads, self.mlp_dim, eps=self.eps, act="quick_gelu",
                name=f"layers_{i}",
            )(x)
        pooled = LayerNormFp32(D, eps=self.eps, name="post_layernorm")(x[:, 0])
        proj = self.param(
            "visual_projection", nn.initializers.normal(0.02), (D, self.projection_dim)
        )
        return pooled @ proj.astype(pooled.dtype)


class CLIPTextTower(nn.Module):
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_length: int = 77
    projection_dim: int = 768
    eps: float = 1e-5

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        B, L = input_ids.shape
        D = self.hidden_size
        tok = self.param("token_embedding", nn.initializers.normal(0.02), (self.vocab_size, D))
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (self.max_length, D))
        x = tok[input_ids] + pos[None, :L]
        for i in range(self.num_layers):
            x = ViTBlock(
                D, self.num_heads, self.mlp_dim, eps=self.eps, act="quick_gelu",
                causal=True, name=f"layers_{i}",
            )(x)
        x = LayerNormFp32(D, eps=self.eps, name="final_layer_norm")(x)
        # Features at the EOT token = argmax of ids (HF CLIP convention).
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02), (D, self.projection_dim)
        )
        return pooled @ proj.astype(pooled.dtype)


class CLIP(nn.Module):
    """Joint wrapper matching clip_utils.py: L2-normalized features after
    bicubic resize + OPENAI normalization."""

    vision_kwargs: Dict[str, Any] = None
    text_kwargs: Dict[str, Any] = None

    def setup(self):
        self.visual = CLIPVisionTower(**(self.vision_kwargs or {}), name="visual")
        self.text = CLIPTextTower(**(self.text_kwargs or {}), name="text")

    @property
    def img_resolution(self) -> int:
        return (self.vision_kwargs or {}).get("image_size", 224)

    def encode_image(self, images: jnp.ndarray, div255: bool = False) -> jnp.ndarray:
        """images: NHWC in [0,1] (or uint8 with div255)."""
        from .layers import l2_normalize

        if div255:
            images = images.astype(jnp.float32) / 255.0
        res = self.img_resolution
        if images.shape[1] != res:
            images = resize_bicubic(images, size=(res, res))
        images = (images - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
        return l2_normalize(self.visual(images), axis=-1)

    def encode_text(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        from .layers import l2_normalize

        return l2_normalize(self.text(input_ids), axis=-1)

    def __call__(self, images, input_ids, div255: bool = False):
        return jnp.concatenate(
            [self.encode_image(images, div255), self.encode_text(input_ids)], axis=1
        )


def convert_clip(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPModel state_dict -> CLIP params."""
    from .convert import _arr, _conv, _t, convert_layernorm, convert_linear

    def block(prefix, i):
        lp = f"{prefix}.encoder.layers.{i}."
        return {
            "norm1": convert_layernorm(sd, lp + "layer_norm1."),
            "norm2": convert_layernorm(sd, lp + "layer_norm2."),
            "attn": {
                proj: convert_linear(sd, lp + f"self_attn.{proj}.")
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "mlp": {
                "fc1": convert_linear(sd, lp + "mlp.fc1."),
                "fc2": convert_linear(sd, lp + "mlp.fc2."),
            },
        }

    v: Dict[str, Any] = {
        "patch_embedding_weight": _conv(sd["vision_model.embeddings.patch_embedding.weight"]),
        "class_embedding": _arr(sd["vision_model.embeddings.class_embedding"]),
        "position_embedding": _arr(sd["vision_model.embeddings.position_embedding.weight"]),
        "pre_layrnorm": convert_layernorm(sd, "vision_model.pre_layrnorm."),
        "post_layernorm": convert_layernorm(sd, "vision_model.post_layernorm."),
        "visual_projection": _t(sd["visual_projection.weight"]),
    }
    i = 0
    while f"vision_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        v[f"layers_{i}"] = block("vision_model", i)
        i += 1

    t: Dict[str, Any] = {
        "token_embedding": _arr(sd["text_model.embeddings.token_embedding.weight"]),
        "position_embedding": _arr(sd["text_model.embeddings.position_embedding.weight"]),
        "final_layer_norm": convert_layernorm(sd, "text_model.final_layer_norm."),
        "text_projection": _t(sd["text_projection.weight"]),
    }
    i = 0
    while f"text_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        t[f"layers_{i}"] = block("text_model", i)
        i += 1
    return {"visual": v, "text": t}
