"""Latent diffusion transformer (LightningDiT / SiT family).

The reference ships these as torch forks under tools/ (SURVEY.md section
2.7: LightningDiT-XL/1 trainer+sampler, REG SiT-XL/1 with qk-norm); this is
the TPU-native implementation both tool pipelines share. Features follow
train_lightningdit_xl_1_stage_0.yaml:22-56: patch-size-1 on the f16d32
latent (16x16x32), adaLN-zero conditioning, optional qk-norm / SwiGLU /
RoPE / RMSNorm, class conditioning with CFG label dropout.

Token count is 256 (16x16 latent at patch 1) — attention and MLP are pure
MXU work in bf16.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import Linear, trunc_normal_init


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (DiT convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def rope_frequencies(head_dim: int, grid: int, theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """2D axial RoPE over a grid x grid token layout."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(quarter) / quarter))
    pos = np.arange(grid)
    ang = np.outer(pos, freqs)  # (grid, quarter)
    ys = np.repeat(ang[:, None, :], grid, axis=1).reshape(grid * grid, quarter)
    xs = np.repeat(ang[None, :, :], grid, axis=0).reshape(grid * grid, quarter)
    full = np.concatenate([ys, xs], axis=-1)  # (N, head_dim/2)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, H, D); rotate pairs (even, odd)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape)


class RMSNormLast(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (n * w).astype(x.dtype)


class DiTAttention(nn.Module):
    dim: int
    num_heads: int
    use_qknorm: bool = True
    rope: Optional[Tuple[np.ndarray, np.ndarray]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        h = self.num_heads
        d = self.dim // h
        qkv = Linear(self.dim, 3 * self.dim, name="qkv")(x).reshape(B, N, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.use_qknorm:
            q = RMSNormLast(d, name="q_norm")(q)
            k = RMSNormLast(d, name="k_norm")(k)
        if self.rope is not None:
            cos, sin = self.rope
            q = apply_rope(q, jnp.asarray(cos), jnp.asarray(sin))
            k = apply_rope(k, jnp.asarray(cos), jnp.asarray(sin))
        out = dot_product_attention(q, k, v).reshape(B, N, self.dim)
        return Linear(self.dim, self.dim, name="proj")(out)


class SwiGLU(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        a = Linear(self.dim, self.hidden, use_bias=False, name="w1")(x)
        b = Linear(self.dim, self.hidden, use_bias=False, name="w2")(x)
        return Linear(self.hidden, self.dim, use_bias=False, name="w3")(jax.nn.silu(a) * b)


class GELUMLP(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = Linear(self.dim, self.hidden, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=True)
        return Linear(self.hidden, self.dim, name="fc2")(x)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


class DiTBlock(nn.Module):
    """adaLN-zero transformer block."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_qknorm: bool = True
    use_swiglu: bool = True
    use_rmsnorm: bool = True
    rope: Optional[Tuple[np.ndarray, np.ndarray]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        Norm = (lambda name: RMSNormLast(self.dim, name=name)) if self.use_rmsnorm else (
            lambda name: nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, name=name)
        )
        ada = Linear(
            self.dim, 6 * self.dim,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="adaLN",
        )(jax.nn.silu(c.astype(jnp.float32)).astype(c.dtype))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(ada, 6, axis=-1)

        h = Norm("norm1")(x)
        h = modulate(h, sh1, sc1)
        h = DiTAttention(self.dim, self.num_heads, self.use_qknorm, self.rope, name="attn")(h)
        x = x + g1[:, None] * h

        h = Norm("norm2")(x)
        h = modulate(h, sh2, sc2)
        if self.use_swiglu:
            hidden = int(self.dim * self.mlp_ratio * 2 / 3 / 64) * 64  # swiglu sizing
            h = SwiGLU(self.dim, hidden, name="mlp")(h)
        else:
            h = GELUMLP(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(h)
        return x + g2[:, None] * h


class LightningDiT(nn.Module):
    """DiT/SiT backbone over latent maps (velocity prediction)."""

    input_size: int = 16
    patch_size: int = 1
    in_channels: int = 32
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    use_qknorm: bool = True
    use_swiglu: bool = True
    use_rope: bool = True
    use_rmsnorm: bool = True
    learn_sigma: bool = False
    # REPA-style alignment tap: also return the token features after this
    # block index (reference: tools/preprocess_for_reg — SiT + projector).
    return_features_at: Optional[int] = None

    @property
    def grid(self) -> int:
        return self.input_size // self.patch_size

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, C) latent NHWC
        t: jnp.ndarray,  # (B,) in [0, 1]
        y: Optional[jnp.ndarray] = None,  # (B,) int labels
        train: bool = False,
        rng: Optional[jax.Array] = None,
        force_drop_ids: Optional[jnp.ndarray] = None,
        collect_block_features: bool = False,
    ) -> jnp.ndarray:
        B = x.shape[0]
        D = self.hidden_size
        p = self.patch_size
        grid = self.grid
        N = grid * grid

        # Patchify (patch 1 = pure channel projection).
        from ..ops.pixelshuffle import pixel_unshuffle

        if p > 1:
            x = pixel_unshuffle(x, p)
        tokens = x.reshape(B, N, -1)
        tokens = Linear(self.in_channels * p * p, D, name="x_embedder")(tokens)
        if not self.use_rope:
            pos = self.param("pos_embed", trunc_normal_init(0.02), (N, D))
            tokens = tokens + pos[None].astype(tokens.dtype)

        # Timestep + label conditioning.
        t_emb = timestep_embedding(t * 1000.0, 256)
        t_emb = Linear(256, D, name="t_embedder_fc1")(t_emb)
        t_emb = jax.nn.silu(t_emb)
        t_emb = Linear(D, D, name="t_embedder_fc2")(t_emb)

        # Class embedding table with a null row for CFG.
        table = self.param(
            "y_embedding", nn.initializers.normal(0.02), (self.num_classes + 1, D)
        )
        if y is None:
            y = jnp.full((B,), self.num_classes, jnp.int32)
        if train and self.class_dropout_prob > 0 and rng is not None:
            drop = jax.random.bernoulli(rng, self.class_dropout_prob, (B,))
            y = jnp.where(drop, self.num_classes, y)
        if force_drop_ids is not None:
            y = jnp.where(force_drop_ids, self.num_classes, y)
        c = t_emb + table[y].astype(t_emb.dtype)

        rope = rope_frequencies(D // self.num_heads, grid) if self.use_rope else None
        tap = None
        # Per-depth token-mean features for the SE-CKNNA alignment analysis
        # (reference: tools/evaluate_alignment/diffusions/
        # get_block_features_from_lightningdit.py:199-214 — embedder,
        # every block, and the final layer, each mean-pooled over tokens).
        block_feats = {}
        if collect_block_features:
            block_feats["embedder"] = jnp.mean(tokens, axis=1)
        for i in range(self.depth):
            tokens = DiTBlock(
                D, self.num_heads, self.mlp_ratio,
                self.use_qknorm, self.use_swiglu, self.use_rmsnorm, rope,
                name=f"blocks_{i}",
            )(tokens, c)
            if self.return_features_at is not None and i == self.return_features_at:
                tap = tokens
            if collect_block_features:
                block_feats[f"block_{i}"] = jnp.mean(tokens, axis=1)

        # Final adaLN + linear (zero-init), unpatchify.
        ada = Linear(
            D, 2 * D, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_adaLN",
        )(jax.nn.silu(c.astype(jnp.float32)).astype(c.dtype))
        shift, scale = jnp.split(ada, 2, axis=-1)
        h = RMSNormLast(D, name="final_norm")(tokens) if self.use_rmsnorm else nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, name="final_norm"
        )(tokens)
        h = modulate(h, shift, scale)
        out_ch = self.in_channels * p * p * (2 if self.learn_sigma else 1)
        h = Linear(
            D, out_ch, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_linear",
        )(h)
        if collect_block_features:
            block_feats["final_layer"] = jnp.mean(h, axis=1)
        h = h.reshape(B, grid, grid, out_ch)
        if p > 1:
            from ..ops.pixelshuffle import pixel_shuffle

            h = pixel_shuffle(h, p)
        if collect_block_features:
            # Raw (un-pooled) tokens at the REPA tap so callers can run the
            # trained projector and pool its output (the reference's REG
            # extractor emits per-projector features: diffusions/
            # get_block_features_from_reg.py:243-247).
            if tap is not None:
                block_feats["repa_tokens"] = tap
            return h, block_feats
        if self.return_features_at is not None:
            return h, tap
        return h


def dit_xl_1(**kw) -> LightningDiT:
    return LightningDiT(hidden_size=1152, depth=28, num_heads=16, patch_size=1, **kw)


def dit_b_1(**kw) -> LightningDiT:
    return LightningDiT(hidden_size=768, depth=12, num_heads=12, patch_size=1, **kw)
