"""Vision transformer towers (frozen VFM encoders + discriminator backbone).

Pure-JAX re-implementations of the HF towers the reference wraps
(networks/utils/vfms/siglip2_utils.py, dinov2_utils.py, mae_utils.py;
discriminator DINO ViT-S/16 via networks/utils/vit_utils.py). Weights are
converted once from torch checkpoints (models/convert.py).

Design notes (TPU):
  * towers run frozen in bf16 under stop_gradient; only the needed
    hidden-state indices are collected (no x(N_layers) activation blowup);
  * dynamic resolution = static shape buckets: pos-embed interpolation is a
    host-built resize matrix per (grid_in, grid_out), so each EQ scale bucket
    compiles once (SURVEY.md section 5.7);
  * attention uses ops.attention (fused SDPA / Pallas flash attention).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.resize import resize_matrix
from ..parallel.tp import shard_heads, shard_hidden, shard_replicated_features
from .layers import LayerNormFp32, Linear


def interpolate_pos_embed(
    pos: jnp.ndarray,  # (N, D) flattened square grid
    grid_in: int,
    grid_out_h: int,
    grid_out_w: int,
    mode: str = "bicubic",
    antialias: bool = False,
) -> jnp.ndarray:
    """HF-style pos-embed resize (bicubic align_corners=False by default).
    Implemented as two static resize matrices -> MXU matmuls."""
    D = pos.shape[-1]
    kind = "cubic" if mode == "bicubic" else "linear"
    Mh = jnp.asarray(resize_matrix(grid_in, grid_out_h, kind, antialias))
    Mw = jnp.asarray(resize_matrix(grid_in, grid_out_w, kind, antialias))
    p = pos.astype(jnp.float32).reshape(grid_in, grid_in, D)
    p = jnp.einsum("oh,hwd->owd", Mh, p)
    p = jnp.einsum("ow,hwd->hod", Mw, p)
    return p.reshape(grid_out_h * grid_out_w, D).astype(pos.dtype)


class MultiHeadSelfAttention(nn.Module):
    """Standard q/k/v/out attention with biases (HF SiglipAttention-style)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        # Separate q/k/v matmuls on purpose: a packed (D, 3D) matmul + slices
        # wins on the ISOLATED block (405 -> 167 us/img/layer,
        # tools/bench_attention.py) but LOSES in context (87.0 -> 80.8
        # img/s/chip end-to-end) — the slices knock XLA off its fused
        # attention pattern, which already merges the three projections here.
        q = Linear(self.dim, self.dim, use_bias=self.qkv_bias, name="q_proj")(x)
        k = Linear(self.dim, self.dim, use_bias=self.qkv_bias, name="k_proj")(x)
        v = Linear(self.dim, self.dim, use_bias=self.qkv_bias, name="v_proj")(x)
        # TP (Megatron): heads column-parallel over the mesh `model` axis;
        # out_proj is the row-parallel contraction (one psum). No-op on a
        # model=1 mesh (parallel/tp.py).
        q = shard_heads(q.reshape(B, N, h, d))
        k = shard_heads(k.reshape(B, N, h, d))
        v = shard_heads(v.reshape(B, N, h, d))
        mask = jnp.tril(jnp.ones((N, N), bool))[None, None] if self.causal else None
        out = dot_product_attention(q, k, v, mask=mask).reshape(B, N, self.dim)
        return shard_replicated_features(
            Linear(self.dim, self.dim, name="out_proj")(out)
        )


class ViTMLP(nn.Module):
    dim: int
    hidden_dim: int
    act: str = "gelu_tanh"  # HF gelu_pytorch_tanh

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.bias_act import apply_activation

        # TP: fc1 column-parallel / fc2 row-parallel over `model` (no-op on
        # a model=1 mesh, parallel/tp.py).
        x = shard_hidden(Linear(self.dim, self.hidden_dim, name="fc1")(x))
        x = apply_activation(x, self.act)
        return shard_replicated_features(Linear(self.hidden_dim, self.dim, name="fc2")(x))


class ViTBlock(nn.Module):
    """Pre-LN transformer block; optional DINOv2-style LayerScale."""

    dim: int
    num_heads: int
    mlp_dim: int
    eps: float = 1e-6
    act: str = "gelu_tanh"
    layer_scale: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = MultiHeadSelfAttention(self.dim, self.num_heads, causal=self.causal, name="attn")(
            LayerNormFp32(self.dim, eps=self.eps, name="norm1")(x)
        )
        if self.layer_scale:
            g1 = self.param("ls1", nn.initializers.ones, (self.dim,))
            h = h * g1.astype(h.dtype)
        x = x + h
        h = ViTMLP(self.dim, self.mlp_dim, self.act, name="mlp")(
            LayerNormFp32(self.dim, eps=self.eps, name="norm2")(x)
        )
        if self.layer_scale:
            g2 = self.param("ls2", nn.initializers.ones, (self.dim,))
            h = h * g2.astype(h.dtype)
        return x + h


class SigLIPTextTower(nn.Module):
    """HF SiglipTextModel equivalent (reference text branch,
    siglip2_utils.py:70-79, 139-164): learned token + position embeddings,
    pre-LN blocks, final LN; pooled = linear head over the LAST token.
    Takes pre-tokenized ids (host-side tokenizer, data layer)."""

    vocab_size: int = 256000
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    max_length: int = 64
    eps: float = 1e-6

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        B, L = input_ids.shape
        D = self.hidden_size
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (self.vocab_size, D)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (self.max_length, D)
        )
        x = tok[input_ids] + pos[None, :L]
        for i in range(self.num_layers):
            x = ViTBlock(
                D, self.num_heads, self.mlp_dim, eps=self.eps, act="gelu_tanh",
                name=f"layers_{i}",
            )(x)
        x = LayerNormFp32(D, eps=self.eps, name="final_layer_norm")(x)
        pooled = Linear(D, D, name="head")(x[:, -1])
        return x, pooled


class MAPHead(nn.Module):
    """SigLIP multihead-attention-pooling head (probe token cross-attn,
    torch nn.MultiheadAttention packed-qkv layout)."""

    dim: int
    num_heads: int
    mlp_dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        probe = self.param(
            "probe", lambda k, s: jax.random.normal(k, s, jnp.float32), (1, 1, self.dim)
        )
        # torch MultiheadAttention: packed in_proj (3E, E) + in_proj_bias.
        in_proj_w = self.param(
            "in_proj_weight",
            nn.initializers.xavier_uniform(),
            (3 * self.dim, self.dim),
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.dim,))
        wq, wk, wv = jnp.split(in_proj_w, 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_b, 3, axis=0)

        pr = jnp.broadcast_to(probe.astype(x.dtype), (B, 1, self.dim))
        q = pr @ wq.T.astype(x.dtype) + bq.astype(x.dtype)
        k = x @ wk.T.astype(x.dtype) + bk.astype(x.dtype)
        v = x @ wv.T.astype(x.dtype) + bv.astype(x.dtype)
        q = q.reshape(B, 1, h, d)
        k = k.reshape(B, N, h, d)
        v = v.reshape(B, N, h, d)
        out = dot_product_attention(q, k, v).reshape(B, 1, self.dim)
        out = Linear(self.dim, self.dim, name="out_proj")(out)

        residual = out
        out = LayerNormFp32(self.dim, eps=self.eps, name="layernorm")(out)
        out = residual + ViTMLP(self.dim, self.mlp_dim, "gelu_tanh", name="mlp")(out)
        return out[:, 0]


class Dinov2Tower(nn.Module):
    """HF Dinov2Model equivalent (wrapped by networks/utils/vfms/
    dinov2_utils.py in the reference): CLS token + grid pos-embed with
    bicubic interpolation (fp32, no antialias), pre-LN blocks with
    LayerScale, final LN; pooled output = CLS of the normalized sequence.

    hidden_states convention matches HF (index 0 = embeddings output, i =
    block i output); tokens INCLUDE the CLS prefix — the VFM facade strips
    it (dinov2_utils.py:119-126).
    """

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 14
    image_size: int = 518
    eps: float = 1e-6

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,  # NHWC normalized
        collect: Optional[Sequence[int]] = None,
        interpolate_pos_encoding: bool = True,
        need_pooled: bool = True,
    ):
        B, H, W, _ = pixels.shape
        D = self.hidden_size
        p = self.patch_size
        grid = self.image_size // p

        patch_w = self.param(
            "patch_embedding_weight", nn.initializers.lecun_normal(),
            (p, p, pixels.shape[-1], D),
        )
        patch_b = self.param("patch_embedding_bias", nn.initializers.zeros, (D,))
        x = jax.lax.conv_general_dilated(
            pixels, patch_w.astype(pixels.dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + patch_b.astype(pixels.dtype)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, D)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02), (1 + grid * grid, D)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, D)), x], axis=1
        )
        if (gh, gw) != (grid, grid):
            assert interpolate_pos_encoding
            grid_pos = interpolate_pos_embed(pos[1:], grid, gh, gw, mode="bicubic")
            pos_use = jnp.concatenate([pos[:1], grid_pos], axis=0)
        else:
            pos_use = pos
        x = x + pos_use.astype(x.dtype)[None]

        collect_set = set(collect) if collect is not None else set(range(self.num_layers + 1))
        hidden_states: Dict[int, jnp.ndarray] = {}
        if 0 in collect_set:
            hidden_states[0] = x
        for i in range(self.num_layers):
            x = ViTBlock(
                D, self.num_heads, self.mlp_dim, eps=self.eps, act="gelu",
                layer_scale=True, name=f"layers_{i}",
            )(x)
            if (i + 1) in collect_set:
                hidden_states[i + 1] = x

        last = LayerNormFp32(D, eps=self.eps, name="layernorm")(x)
        pooled = last[:, 0] if need_pooled else None
        return hidden_states, last, pooled


class MAETower(nn.Module):
    """HF ViTMAEModel encoder equivalent (wrapped by networks/utils/vfms/
    mae_utils.py): CLS + fixed sin-cos pos embeds, pre-LN blocks
    (eps 1e-12), final LN. No dynamic resolution (reference README warns the
    same). `mask_ratio=0` by default — the reference runs HF's 75% random
    masking even at eval (mae_utils.py uses ViTMAEModel verbatim), which is
    an upstream artifact, not a feature; set mask_ratio>0 to reproduce it.

    hidden-state convention: 0 = embeddings output, i = block i output;
    tokens include the CLS prefix (facade strips it, mae_utils.py:130-137).
    """

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 16
    image_size: int = 224
    eps: float = 1e-12
    mask_ratio: float = 0.0

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,
        collect: Optional[Sequence[int]] = None,
        interpolate_pos_encoding: bool = True,
        need_pooled: bool = True,
        mask_rng: Optional[jax.Array] = None,
    ):
        B, H, W, _ = pixels.shape
        D, p = self.hidden_size, self.patch_size
        grid = self.image_size // p
        assert (H, W) == (self.image_size, self.image_size), (
            "MAE has no dynamic-resolution support (reference README.md:202-204)"
        )

        patch_w = self.param(
            "patch_embedding_weight", nn.initializers.lecun_normal(), (p, p, pixels.shape[-1], D)
        )
        patch_b = self.param("patch_embedding_bias", nn.initializers.zeros, (D,))
        x = jax.lax.conv_general_dilated(
            pixels, patch_w.astype(pixels.dtype), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + patch_b.astype(pixels.dtype)
        x = x.reshape(B, grid * grid, D)

        pos = self.variable(
            "buffers", "position_embeddings",
            lambda: jnp.asarray(_sincos_pos_embed_2d(D, grid), jnp.float32),
        ).value  # (1+N, D) incl. CLS row of zeros
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        x = x + pos[1:].astype(x.dtype)[None]

        if self.mask_ratio > 0 and mask_rng is not None:
            n_keep = int(x.shape[1] * (1 - self.mask_ratio))
            noise = jax.random.uniform(mask_rng, (B, x.shape[1]))
            keep = jnp.argsort(noise, axis=1)[:, :n_keep]
            x = jnp.take_along_axis(x, keep[:, :, None], axis=1)

        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, D)) + pos[:1].astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        collect_set = set(collect) if collect is not None else set(range(self.num_layers + 1))
        hidden_states: Dict[int, jnp.ndarray] = {}
        if 0 in collect_set:
            hidden_states[0] = x
        for i in range(self.num_layers):
            x = ViTBlock(
                D, self.num_heads, self.mlp_dim, eps=self.eps, act="gelu",
                name=f"layers_{i}",
            )(x)
            if (i + 1) in collect_set:
                hidden_states[i + 1] = x

        last = LayerNormFp32(D, eps=self.eps, name="layernorm")(x)
        # Pooled = mean over patch tokens (mae_utils.py:138).
        pooled = jnp.mean(last[:, 1:], axis=1) if need_pooled else None
        return hidden_states, last, pooled


def _sincos_pos_embed_2d(dim: int, grid: int) -> "np.ndarray":
    """MAE's fixed 2D sin-cos position embedding with a zero CLS row."""
    import numpy as np

    def get_1d(d, positions):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", positions.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    coords_h = np.arange(grid, dtype=np.float64)
    coords_w = np.arange(grid, dtype=np.float64)
    gw, gh = np.meshgrid(coords_w, coords_h)
    emb_h = get_1d(dim // 2, gh)
    emb_w = get_1d(dim // 2, gw)
    pos = np.concatenate([emb_h, emb_w], axis=1)
    return np.concatenate([np.zeros((1, dim)), pos], axis=0).astype(np.float32)


class SigLIPVisionTower(nn.Module):
    """HF SiglipVisionTransformer equivalent (see siglip2_utils.py wrapper).

    Returns (hidden_states, last_hidden_state, pooled) with the HF
    hidden-state convention: index 0 = embeddings output, i = block i output
    — the layer-index contract of VFMEncoder (vfm_utils.py:31-38).
    """

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 16
    image_size: int = 512
    eps: float = 1e-6
    use_head: bool = True
    remat: bool = False  # jax.checkpoint each block (memory <-> FLOPs)

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,  # NHWC in model input range
        collect: Optional[Sequence[int]] = None,  # hidden-state indices to keep
        interpolate_pos_encoding: bool = True,
        need_pooled: bool = True,
    ):
        B, H, W, _ = pixels.shape
        D = self.hidden_size
        p = self.patch_size
        grid = self.image_size // p

        patch_w = self.param(
            "patch_embedding_weight",
            nn.initializers.lecun_normal(),
            (p, p, pixels.shape[-1], D),
        )
        patch_b = self.param("patch_embedding_bias", nn.initializers.zeros, (D,))
        x = jax.lax.conv_general_dilated(
            pixels,
            patch_w.astype(pixels.dtype),
            (p, p),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = x + patch_b.astype(x.dtype)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, D)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(1.0 / math.sqrt(D)),
            (grid * grid, D),
        )
        if (gh, gw) != (grid, grid):
            assert interpolate_pos_encoding, (gh, gw, grid)
            pos_use = interpolate_pos_embed(pos, grid, gh, gw, mode="bicubic")
        else:
            pos_use = pos
        x = x + pos_use.astype(x.dtype)[None]

        collect_set = set(collect) if collect is not None else set(range(self.num_layers + 1))
        Block = nn.remat(ViTBlock) if self.remat else ViTBlock
        hidden_states: Dict[int, jnp.ndarray] = {}
        if 0 in collect_set:
            hidden_states[0] = x
        for i in range(self.num_layers):
            x = Block(
                D, self.num_heads, self.mlp_dim, eps=self.eps, act="gelu_tanh",
                name=f"layers_{i}",
            )(x)
            if (i + 1) in collect_set:
                hidden_states[i + 1] = x

        last = LayerNormFp32(D, eps=self.eps, name="post_layernorm")(x)
        pooled = None
        if self.use_head and need_pooled:
            pooled = MAPHead(D, self.num_heads, self.mlp_dim, eps=self.eps, name="head")(last)
        return hidden_states, last, pooled
