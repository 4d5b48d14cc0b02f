"""Feature-map self/cross attention blocks with null key/value.

Reference: networks/utils/gigagan_utils.py (SelfAttention :53, CrossAttention
:94, FeedForward :149, blocks :170/:188). NHWC maps; attention runs through
ops.attention (XLA fused SDPA / Pallas).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention, dot_product_attention_nullkv
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
        # The reference's three 1x1 convs are one (C -> 3*inner) matmul on
        # flattened tokens here: a single MXU pass over the feature map
        # instead of three NHWC conv dispatches (parameters stay the
        # reference's separate to_q/to_k/to_v 1x1 kernels).
        qw, _ = Conv2d(self.dim, inner, 1, use_bias=False, name="to_q")(
            None, return_params=True)
        kw, _ = Conv2d(self.dim, inner, 1, use_bias=False, name="to_k")(
            None, return_params=True)
        vw, _ = Conv2d(self.dim, inner, 1, use_bias=False, name="to_v")(
            None, return_params=True)
        wqkv = jnp.concatenate(
            [qw[0, 0], kw[0, 0], vw[0, 0]], axis=1).astype(fmap.dtype)
        tokens = fmap.reshape(B, H * W, self.dim)
        qkv = tokens @ wqkv  # (B, T, 3*inner)
        q, k, v = (t.reshape(B, H * W, h, d) for t in jnp.split(qkv, 3, axis=-1))

        null_kv = self.param("null_kv", _randn_init(0.02), (2, h, d))
        nk = jnp.broadcast_to(null_kv[0][None, None], (B, 1, h, d)).astype(k.dtype)
        nv = jnp.broadcast_to(null_kv[1][None, None], (B, 1, h, d)).astype(v.dtype)

        out = dot_product_attention_nullkv(q, k, v, nk, nv)
        out = out.reshape(B, H * W, inner)
        ow, _ = Conv2d(
            inner, self.dim, 1, use_bias=False,
            kernel_init=nn.initializers.zeros, name="to_out",
        )(None, return_params=True)
        return (out @ ow[0, 0].astype(out.dtype)).reshape(B, H, W, self.dim)


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
        B, H, W, _ = x.shape
        x = ChannelRMSNorm(self.dim, name="norm")(x)
        # 1x1 convs as token matmuls (one layout, two MXU passes).
        w1, b1 = Conv2d(self.dim, hidden, 1, name="proj1")(None, return_params=True)
        w2, b2 = Conv2d(
            hidden, self.dim, 1, kernel_init=nn.initializers.zeros, name="proj2",
        )(None, return_params=True)
        t = x.reshape(B, H * W, self.dim)
        t = t @ w1[0, 0].astype(t.dtype) + b1.astype(t.dtype)
        t = jax.nn.gelu(t, approximate=False)
        t = t @ w2[0, 0].astype(t.dtype) + b2.astype(t.dtype)
        return t.reshape(B, H, W, self.dim)


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
