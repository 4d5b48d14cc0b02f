"""Feature-map self/cross attention blocks with null key/value.

Reference: networks/utils/gigagan_utils.py (SelfAttention :53, CrossAttention
:94, FeedForward :149, blocks :170/:188). NHWC maps; attention runs through
ops.attention (XLA fused SDPA / Pallas).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import ChannelRMSNorm, Conv2d, Linear, RMSNorm


def _randn_init(std: float):
    import jax

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class SelfAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, fmap: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = fmap.shape
        h, d = self.heads, self.dim_head
        inner = h * d

        fmap = ChannelRMSNorm(self.dim, name="norm")(fmap)
        q = Conv2d(self.dim, inner, 1, use_bias=False, name="to_q")(fmap)
        k = Conv2d(self.dim, inner, 1, use_bias=False, name="to_k")(fmap)
        v = Conv2d(self.dim, inner, 1, use_bias=False, name="to_v")(fmap)

        # (B, T, N, H) token layout for SDPA.
        def tok(t):
            return t.reshape(B, H * W, h, d)

        q, k, v = tok(q), tok(k), tok(v)
        null_kv = self.param("null_kv", _randn_init(0.02), (2, h, d))
        nk = jnp.broadcast_to(null_kv[0][None, None], (B, 1, h, d)).astype(k.dtype)
        nv = jnp.broadcast_to(null_kv[1][None, None], (B, 1, h, d)).astype(v.dtype)
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        out = dot_product_attention(q, k, v)
        out = out.reshape(B, H, W, inner)
        return Conv2d(
            inner, self.dim, 1, use_bias=False,
            kernel_init=nn.initializers.zeros, name="to_out",
        )(out)


class CrossAttention(nn.Module):
    dim: int
    dim_context: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, fmap: jnp.ndarray, context: jnp.ndarray, mask=None) -> jnp.ndarray:
        B, H, W, _ = fmap.shape
        h, d = self.heads, self.dim_head
        inner = h * d

        fmap = ChannelRMSNorm(self.dim, name="norm")(fmap)
        context = RMSNorm(self.dim_context, name="norm_context")(context)

        q = Conv2d(self.dim, inner, 1, use_bias=False, name="to_q")(fmap)
        q = q.reshape(B, H * W, h, d)
        kv = Linear(self.dim_context, inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        L = k.shape[1]
        k = k.reshape(B, L, h, d)
        v = v.reshape(B, L, h, d)

        null_kv = self.param("null_kv", _randn_init(0.02), (2, h, d))
        nk = jnp.broadcast_to(null_kv[0][None, None], (B, 1, h, d)).astype(k.dtype)
        nv = jnp.broadcast_to(null_kv[1][None, None], (B, 1, h, d)).astype(v.dtype)
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        attn_mask = None
        if mask is not None:
            # Reference prepends False for the null token (gigagan_utils.py:138-141).
            pad = jnp.zeros((B, 1), dtype=bool)
            m = jnp.concatenate([pad, mask.astype(bool)], axis=1)  # (B, 1+L)
            attn_mask = m[:, None, None, :]  # (B, 1, 1, 1+L) -> broadcast (B,N,Tq,Tk)

        out = dot_product_attention(q, k, v, mask=attn_mask)
        out = out.reshape(B, H, W, inner)
        return Conv2d(
            inner, self.dim, 1, use_bias=False,
            kernel_init=nn.initializers.zeros, name="to_out",
        )(out)


class FeedForwardChannelFirst(nn.Module):
    """ChannelRMSNorm -> 1x1 expand -> GELU -> zero-init 1x1 contract."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        hidden = int(self.dim * self.mult)
        x = ChannelRMSNorm(self.dim, name="norm")(x)
        x = Conv2d(self.dim, hidden, 1, name="proj1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = Conv2d(hidden, self.dim, 1, kernel_init=nn.initializers.zeros, name="proj2")(x)
        return x


class SelfAttentionBlock(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SelfAttention(self.dim, self.dim_head, self.heads, name="attn")(x) + x
        x = FeedForwardChannelFirst(self.dim, self.ff_mult, name="ff")(x) + x
        return x


class CrossAttentionBlock(nn.Module):
    dim: int
    dim_context: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray, mask=None) -> jnp.ndarray:
        x = CrossAttention(self.dim, self.dim_context, self.dim_head, self.heads, name="attn")(
            x, context, mask
        ) + x
        x = FeedForwardChannelFirst(self.dim, self.ff_mult, name="ff")(x) + x
        return x
