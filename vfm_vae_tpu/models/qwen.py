"""Qwen2.5-VL vision tower (reference wrapper: networks/utils/vfms/
qwen_utils.py — manual patchify into flatten_patches + grid_thw, per-block
hook features, merger output as layer -1, mean-pooled global token).

TPU-first formulation of the HF Qwen2_5_VisionTransformerPretrainedModel:
the variable-length concat-sequence + cu_seqlens design collapses to STATIC
shapes because every image in a batch shares one grid — the window
permutation, RoPE tables and the block-diagonal window mask are host-
precomputed numpy constants per (grid_h, grid_w) bucket, and attention is a
plain masked SDPA over (B, N) tokens. Window blocks use the mask;
`fullatt_block_indexes` blocks attend globally.

Feature convention (matching the reference hooks): block outputs are in
WINDOW-PERMUTED order (the reference feeds the raw hook outputs to the
adapter); the merger output (-1) is restored to spatial order.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import Linear


def qwen_window_layout(
    grid_h: int, grid_w: int, patch_size: int, spatial_merge_size: int, window_size: int
):
    """Host-side (numpy) window permutation + per-window sizes for one image
    (HF get_window_index, single grid, t=1). Returns (window_index over
    merge-units, window sizes in merge-units)."""
    m = spatial_merge_size
    llm_h, llm_w = grid_h // m, grid_w // m
    vw = window_size // m // patch_size
    index = np.arange(llm_h * llm_w).reshape(llm_h, llm_w)
    pad_h = (-llm_h) % vw
    pad_w = (-llm_w) % vw
    padded = np.full((llm_h + pad_h, llm_w + pad_w), -100, np.int64)
    padded[:llm_h, :llm_w] = index
    nh, nw = (llm_h + pad_h) // vw, (llm_w + pad_w) // vw
    padded = padded.reshape(nh, vw, nw, vw).transpose(0, 2, 1, 3).reshape(nh * nw, vw * vw)
    seqlens = (padded != -100).sum(axis=1)
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]
    return window_index, seqlens[seqlens > 0]


def qwen_rope_table(grid_h: int, grid_w: int, spatial_merge_size: int, head_dim: int,
                    theta: float = 10000.0):
    """(N, head_dim/2) rope angles in merge-unit token order (HF rot_pos_emb)."""
    m = spatial_merge_size
    h_ids = np.arange(grid_h)[:, None].repeat(grid_w, 1)
    h_ids = h_ids.reshape(grid_h // m, m, grid_w // m, m).transpose(0, 2, 1, 3).reshape(-1)
    w_ids = np.arange(grid_w)[None, :].repeat(grid_h, 0)
    w_ids = w_ids.reshape(grid_h // m, m, grid_w // m, m).transpose(0, 2, 1, 3).reshape(-1)
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs_h = np.outer(h_ids, inv_freq)
    freqs_w = np.outer(w_ids, inv_freq)
    return np.concatenate([freqs_h, freqs_w], axis=-1).astype(np.float32)  # (N, head_dim/2)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class QwenRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (n * w).astype(x.dtype)


class QwenVisionBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        B, N, _ = x.shape
        h = self.num_heads
        d = self.dim // h

        # TP (parallel/tp.py): heads/MLP-hidden column-parallel over the mesh
        # `model` axis; proj/down_proj are the row-parallel psum sites. All
        # no-ops on a model=1 mesh.
        from ..parallel.tp import shard_heads, shard_hidden, shard_replicated_features

        y = QwenRMSNorm(self.dim, name="norm1")(x)
        qkv = Linear(self.dim, 3 * self.dim, name="qkv")(y).reshape(B, N, 3, h, d)
        q, k, v = (shard_heads(qkv[:, :, i]) for i in range(3))
        c = cos[None, :, None, :].astype(q.dtype)
        s = sin[None, :, None, :].astype(q.dtype)
        q = q * c + _rotate_half(q) * s
        k = k * c + _rotate_half(k) * s
        attn = dot_product_attention(q, k, v, mask=mask)
        x = x + shard_replicated_features(
            Linear(self.dim, self.dim, name="proj")(attn.reshape(B, N, self.dim))
        )

        y = QwenRMSNorm(self.dim, name="norm2")(x)
        gate = shard_hidden(Linear(self.dim, self.mlp_dim, name="gate_proj")(y))
        up = shard_hidden(Linear(self.dim, self.mlp_dim, name="up_proj")(y))
        y = shard_replicated_features(
            Linear(self.mlp_dim, self.dim, name="down_proj")(jax.nn.silu(gate) * up)
        )
        return x + y


class QwenVisionTower(nn.Module):
    """__call__(flatten_patches (B, N, C*tp*p*p), grid) -> (hidden_states
    dict, merged (B, N/m^2, out_hidden), pooled (B, out_hidden))."""

    hidden_size: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_dim: int = 3420
    out_hidden_size: int = 3584
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Sequence[int] = (7, 15, 23, 31)

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,  # (B, N, C*tp*p*p) in HF processor order
        grid_hw: Tuple[int, int],
        collect: Optional[Sequence[int]] = None,
    ):
        B, N, Dp = patches.shape
        D = self.hidden_size
        m = self.spatial_merge_size
        gh, gw = grid_hw
        assert N == gh * gw, (N, grid_hw)
        head_dim = D // self.num_heads

        # Patch embed: Conv3d(kernel=stride=patch volume) == Linear.
        w = self.param("patch_embed", nn.initializers.lecun_normal(), (Dp, D))
        x = patches @ w.astype(patches.dtype)

        # Static window layout + rope for this grid bucket.
        win_idx, win_sizes = qwen_window_layout(
            gh, gw, self.patch_size, m, self.window_size
        )
        rope = qwen_rope_table(gh, gw, m, head_dim)
        unit = m * m
        # Permute merge-units into window order (tokens within a unit stay).
        perm = (win_idx[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
        inv_perm = np.argsort(perm)
        x = x[:, jnp.asarray(perm)]
        rope = rope[perm]
        emb = np.concatenate([rope, rope], axis=-1)
        cos = jnp.asarray(np.cos(emb))
        sin = jnp.asarray(np.sin(emb))

        # Block-diagonal window mask (True = attend), (1, 1, N, N).
        seg = np.repeat(np.arange(len(win_sizes)), win_sizes * unit)
        win_mask = jnp.asarray((seg[:, None] == seg[None, :]))[None, None]

        collect_set = set(collect) if collect is not None else set(range(self.depth + 1))
        hidden: Dict[int, jnp.ndarray] = {}
        if 0 in collect_set:
            hidden[0] = x
        for i in range(self.depth):
            mask = None if i in list(self.fullatt_block_indexes) else win_mask
            x = QwenVisionBlock(D, self.num_heads, self.mlp_dim, name=f"blocks_{i}")(
                x, cos, sin, mask
            )
            if (i + 1) in collect_set:
                hidden[i + 1] = x

        # Patch merger (ln_q -> flatten m^2 units -> MLP), then restore
        # spatial order (HF reverse_indices).
        y = QwenRMSNorm(D, name="merger_ln_q")(x)
        y = y.reshape(B, N // unit, unit * D)
        y = Linear(unit * D, unit * D, name="merger_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = Linear(unit * D, self.out_hidden_size, name="merger_fc2")(y)
        y = y[:, jnp.asarray(np.argsort(win_idx))]
        pooled = jnp.mean(y, axis=1)
        return hidden, y, pooled


def qwen_patchify(img: jnp.ndarray, patch_size: int, temporal_patch_size: int,
                  spatial_merge_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """NHWC image -> (B, N, C*tp*p*p) flatten patches in the HF processor
    order (reference qwen_utils.py:154-199: merge-unit-major layout)."""
    B, H, W, C = img.shape
    p, m, tp = patch_size, spatial_merge_size, temporal_patch_size
    gh, gw = H // p, W // p
    x = img.reshape(B, gh // m, m, p, gw // m, m, p, C)
    # -> (B, ghg, gwg, mh, mw, C, ph, pw); temporal dim = repeated frame.
    x = x.transpose(0, 1, 4, 2, 5, 7, 3, 6)
    x = x.reshape(B, gh * gw, C, 1, p, p)
    x = jnp.tile(x, (1, 1, 1, tp, 1, 1))  # repeat frame to fill temporal patch
    return x.reshape(B, gh * gw, C * tp * p * p), (gh, gw)
