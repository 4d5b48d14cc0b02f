"""EVA-02 vision tower (reference wrapper: networks/utils/vfms/eva_utils.py
— timm `eva02_*` models with dynamic_img_size=True, manual block loop with
rope, caching wanted block outputs).

Architecture per the EVA-02 paper (arXiv 2303.11331) and the timm `eva.py`
module the reference drives: patch embed + CLS + learned abs pos-embed,
2D axial rotary embeddings applied to q/k of every block (CLS excluded),
separate q/k/v projections (k without bias), sub-LN (an extra LayerNorm
inside the attention output and the SwiGLU FFN), final LayerNorm.

NOTE: timm is not installed in this environment, so unlike the other towers
this one has no bit-level oracle test; the converter targets timm eva02
state-dict naming and weight-level validation happens when timm checkpoints
are available. Structure is smoke-tested.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..parallel.tp import shard_heads, shard_hidden, shard_replicated_features
from .layers import LayerNormFp32, Linear
from .vit import interpolate_pos_embed


def eva_rope_table(
    grid_h: int,
    grid_w: int,
    head_dim: int,
    temperature: float = 10000.0,
    ref_grid: Optional[int] = None,
):
    """2D axial rotary tables, (N, head_dim) sin and cos.

    Follows the EVA-02 rope recipe (arXiv 2303.11331 §2.2 /
    VisionRotaryEmbeddingFast; timm RotaryEmbeddingCat equivalent):
    frequency bands 1/T^(i/b) with b = head_dim//4 bands per spatial axis,
    angles laid out [h-bands | w-bands] then **pair-interleaved**
    (repeat_interleave(2)), rotating adjacent pairs (x0,x1), (x2,x3), ...
    — NOT the half-split GPT-NeoX layout. Dynamic resolution scales the
    positions to the pretrain grid (ft->pt extrapolation: t = arange(g)/g
    * ref_grid), the same trick eva_utils.py relies on via
    dynamic_img_size=True."""
    quarter = head_dim // 4
    bands = 1.0 / (temperature ** (np.arange(quarter) / quarter))
    rg_h = ref_grid or grid_h
    rg_w = ref_grid or grid_w
    ph = np.arange(grid_h) / grid_h * rg_h
    pw = np.arange(grid_w) / grid_w * rg_w
    ang_h = np.outer(ph, bands)  # (H, quarter)
    ang_w = np.outer(pw, bands)
    hh = np.repeat(ang_h[:, None, :], grid_w, 1).reshape(-1, quarter)
    ww = np.repeat(ang_w[None, :, :], grid_h, 0).reshape(-1, quarter)
    ang = np.concatenate([hh, ww], axis=-1)  # (N, head_dim/2)
    ang = np.repeat(ang, 2, axis=-1)  # pair-interleave -> (N, head_dim)
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def _rot_pairs(x):
    """(-x1, x0, -x3, x2, ...): the pair-interleaved rope rotation matching
    the repeat_interleave'd tables above."""
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    return jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)


class EvaAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, rope_sin, rope_cos):
        B, N, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        # TP: heads column-parallel over `model`; out-proj row-parallel
        # (no-op without an active model axis, parallel/tp.py).
        q = shard_heads(Linear(self.dim, self.dim, name="q_proj")(x).reshape(B, N, h, d))
        k = shard_heads(Linear(self.dim, self.dim, use_bias=False, name="k_proj")(x).reshape(B, N, h, d))
        v = shard_heads(Linear(self.dim, self.dim, name="v_proj")(x).reshape(B, N, h, d))

        # Rope on patch tokens only (CLS at index 0 passes through).
        sin = rope_sin[None, :, None, :].astype(q.dtype)
        cos = rope_cos[None, :, None, :].astype(q.dtype)

        def rot(t):
            head, rest = t[:, :1], t[:, 1:]
            rest = rest * cos + _rot_pairs(rest) * sin
            return jnp.concatenate([head, rest], axis=1)

        q, k = rot(q), rot(k)
        out = dot_product_attention(q, k, v).reshape(B, N, self.dim)
        out = LayerNormFp32(self.dim, eps=1e-6, name="norm")(out)  # sub-LN
        return shard_replicated_features(Linear(self.dim, self.dim, name="proj")(out))


class EvaSwiGLU(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        # TP: w1/w2 column-parallel, w3 row-parallel (parallel/tp.py).
        a = shard_hidden(Linear(self.dim, self.hidden, name="w1")(x))
        b = shard_hidden(Linear(self.dim, self.hidden, name="w2")(x))
        h = jax.nn.silu(a) * b
        h = LayerNormFp32(self.hidden, eps=1e-6, name="norm")(h)  # sub-LN
        return shard_replicated_features(Linear(self.hidden, self.dim, name="w3")(h))


class EvaBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, rope_sin, rope_cos):
        x = x + EvaAttention(self.dim, self.num_heads, name="attn")(
            LayerNormFp32(self.dim, eps=1e-6, name="norm1")(x), rope_sin, rope_cos
        )
        x = x + EvaSwiGLU(self.dim, self.mlp_dim, name="mlp")(
            LayerNormFp32(self.dim, eps=1e-6, name="norm2")(x)
        )
        return x


class EVATower(nn.Module):
    """hidden-state convention: 0 = embeddings output, i = block i output;
    tokens include the CLS prefix (the reference strips it)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 2730
    patch_size: int = 14
    image_size: int = 448
    eps: float = 1e-6
    # Rope constants — paper-derived, certifiable only against live timm
    # (see PARITY.md §2.3). Promoted to config so a future check or a
    # divergent checkpoint is a one-line fix:
    #  * rope_temperature: frequency base T in 1/T^(i/b); EVA-02 paper
    #    (arXiv 2303.11331 §2.2) and timm RotaryEmbeddingCat default 10000.
    #  * rope_ref_grid: pretrain grid the ft->pt extrapolation scales
    #    positions to (timm `ref_feat_shape`); None = the native grid
    #    image_size//patch_size (timm eva02 builder behavior).
    rope_temperature: float = 10000.0
    rope_ref_grid: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,
        collect: Optional[Sequence[int]] = None,
        interpolate_pos_encoding: bool = True,
        need_pooled: bool = True,
    ):
        B, H, W, _ = pixels.shape
        D, p = self.hidden_size, self.patch_size
        grid = self.image_size // p

        w = self.param("patch_embedding_weight", nn.initializers.lecun_normal(),
                       (p, p, pixels.shape[-1], D))
        b = self.param("patch_embedding_bias", nn.initializers.zeros, (D,))
        x = jax.lax.conv_general_dilated(
            pixels, w.astype(pixels.dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(pixels.dtype)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, D)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1 + grid * grid, D))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, D)), x], axis=1)
        if (gh, gw) != (grid, grid):
            assert interpolate_pos_encoding
            grid_pos = interpolate_pos_embed(pos[1:], grid, gh, gw, mode="bicubic")
            pos_use = jnp.concatenate([pos[:1], grid_pos], axis=0)
        else:
            pos_use = pos
        x = x + pos_use.astype(x.dtype)[None]

        head_dim = D // self.num_heads
        rope_sin, rope_cos = eva_rope_table(
            gh, gw, head_dim,
            temperature=self.rope_temperature,
            ref_grid=self.rope_ref_grid or grid,
        )
        rope_sin = jnp.asarray(rope_sin)
        rope_cos = jnp.asarray(rope_cos)

        collect_set = set(collect) if collect is not None else set(range(self.num_layers + 1))
        hidden: Dict[int, jnp.ndarray] = {}
        if 0 in collect_set:
            hidden[0] = x
        for i in range(self.num_layers):
            x = EvaBlock(D, self.num_heads, self.mlp_dim, name=f"blocks_{i}")(
                x, rope_sin, rope_cos
            )
            if (i + 1) in collect_set:
                hidden[i + 1] = x

        # Reference contract (eva_utils.py:113-128): layer -1 and the pooled
        # CLS come from the RAW last-block output — the wrapper never calls
        # timm's final norm, so those weights are dead and the converter
        # drops them.
        last = x
        pooled = last[:, 0] if need_pooled else None
        return hidden, last, pooled


def convert_eva_timm(sd, prefix: str = "") -> dict:
    """timm eva02 state_dict -> EVATower params (naming per timm eva.py)."""
    from .convert import _arr, _conv, _t, convert_layernorm, convert_linear

    # NOTE: timm's final `norm.*` keys are intentionally dropped — the
    # reference wrapper stops at the last block (eva_utils.py:113-121), so
    # the final LayerNorm is dead weight in its inference contract.
    p = {
        "patch_embedding_weight": _conv(sd[prefix + "patch_embed.proj.weight"]),
        "patch_embedding_bias": _arr(sd[prefix + "patch_embed.proj.bias"]),
        "cls_token": _arr(sd[prefix + "cls_token"]),
        "pos_embed": np.asarray(sd[prefix + "pos_embed"])[0],
    }
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in sd:
        bp = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": convert_layernorm(sd, prefix + bp + "norm1."),
            "norm2": convert_layernorm(sd, prefix + bp + "norm2."),
            "attn": {
                "q_proj": convert_linear(sd, prefix + bp + "attn.q_proj."),
                "k_proj": convert_linear(sd, prefix + bp + "attn.k_proj."),
                "v_proj": convert_linear(sd, prefix + bp + "attn.v_proj."),
                "proj": convert_linear(sd, prefix + bp + "attn.proj."),
                "norm": convert_layernorm(sd, prefix + bp + "attn.norm."),
            },
            "mlp": {
                "w1": convert_linear(sd, prefix + bp + "mlp.w1."),
                "w2": convert_linear(sd, prefix + bp + "mlp.w2."),
                "w3": convert_linear(sd, prefix + bp + "mlp.w3."),
                "norm": convert_layernorm(sd, prefix + bp + "mlp.ffn_ln."),
            },
        }
        i += 1
    return p
