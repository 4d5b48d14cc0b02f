"""Pallas TPU flash attention wrapper.

Wraps jax's fused Pallas TPU flash-attention kernel (tiled online-softmax
over VMEM blocks — the SURVEY.md section 7 kernel priority #1) behind the
framework's (B, T, N, H) SDPA layout. Eligibility is decided in
ops/attention.py; the ViT encoder's 1024-token, 64-head-dim shapes hit this
path on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _kernel():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    return flash_attention, BlockSizes


def _block_sizes(BlockSizes, Tq: int, Tk: int):
    """Full-sequence blocks (capped at 1024). Measured on v5e at the
    decoder's (B96, 8h, T1024, d64) shape: full-T blocks run 0.065 ms/img
    vs 0.31 ms/img with the kernel's 128-row defaults — the default tiles
    leave the MXU idle between tiny grid steps. Both T's here are <= 1024
    so whole q/k/v row-panels sit comfortably in VMEM."""
    def pick(T):
        if T <= 1536:  # whole panel in VMEM (e.g. 1152 = null+1024+pad)
            return T
        b = 1024
        while T % b:
            b //= 2
        return b

    bq = pick(Tq)
    bkv = pick(Tk)
    return BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv,
        block_q_dkv=bq, block_k_dkv=bkv,
        block_q_dq=bq, block_k_dq=bkv, block_k_major_dq=bkv,
    )


def flash_attention(q, k, v, scale: Optional[float] = None) -> jnp.ndarray:
    """q,k,v: (B, T, N, H) -> (B, T, N, H)."""
    kernel, BlockSizes = _kernel()
    d = q.shape[-1]
    sm_scale = scale if scale is not None else d**-0.5
    # Kernel layout: (B, heads, T, head_dim).
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = kernel(
        qt, kt, vt, sm_scale=sm_scale,
        block_sizes=_block_sizes(BlockSizes, qt.shape[2], kt.shape[2]),
    )
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def nullkv_flash_eligible(q, k, mask) -> bool:
    """Flash path for [null; keys] attention (GigaGAN decoder blocks).

    Unlike the generic opt-in above, this is ON by default on TPU: the
    concat to Tk = T+1 knocks XLA off its fused-attention pattern (the
    (B, N, Tq, 1+Tk) logits materialize in HBM), measured 0.209 ms/img vs
    0.075 ms/img for this padded-flash path at the decoder's res-32 block
    (B96). Padding overhead is <= 127 masked key slots."""
    import os

    if os.environ.get("VFM_VAE_NO_PALLAS_NULLKV") == "1":
        return False
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    Tq, Tk, d = q.shape[1], k.shape[1], q.shape[-1]
    if d not in (64, 128):
        return False
    return Tq >= 256 and Tq == Tk and Tq % 128 == 0


def flash_attention_nullkv(q, k, v, null_k, null_v,
                           scale: Optional[float] = None) -> jnp.ndarray:
    """Attention over [null_kv; k/v] without the unaligned concat.

    q/k/v: (B, T, N, H); null_k/null_v: (B, 1, N, H). The null token plus
    the real keys are padded up to the next multiple of 128 and the pad
    slots are masked out via segment ids (pad keys get segment 1, every
    query segment 0), which the flash kernel resolves in-VMEM — exact
    softmax semantics of jnp.concatenate([null, k], 1) at aligned tile
    shapes. Reference semantics: networks/utils/gigagan_utils.py:74-78
    (null key/value prepend)."""
    kernel, BlockSizes = _kernel()
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    B, T, N, H = q.shape
    d = q.shape[-1]
    sm_scale = scale if scale is not None else d**-0.5
    Tk_real = 1 + T
    Tk = ((Tk_real + 127) // 128) * 128
    pad = Tk - Tk_real

    kf = jnp.concatenate(
        [null_k, k, jnp.zeros((B, pad, N, H), k.dtype)], axis=1)
    vf = jnp.concatenate(
        [null_v, v, jnp.zeros((B, pad, N, H), v.dtype)], axis=1)
    seg_q = jnp.zeros((B, T), jnp.int32)
    seg_kv = jnp.concatenate(
        [jnp.zeros((B, Tk_real), jnp.int32), jnp.ones((B, pad), jnp.int32)],
        axis=1,
    )
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(kf, 1, 2)
    vt = jnp.swapaxes(vf, 1, 2)
    out = kernel(
        qt, kt, vt, segment_ids=SegmentIds(seg_q, seg_kv), sm_scale=sm_scale,
        block_sizes=_block_sizes(BlockSizes, T, Tk),
    )
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def flash_eligible(q, k, mask, prefer: bool = False) -> bool:
    # Not globally on: at the ViT encoder's in-context shapes XLA's own
    # attention fusion is slightly faster (90 vs 112 us/img/layer measured
    # at B96/16h/T1024/d64 on v5e), so the default path stays XLA. Call
    # sites whose layouts knock XLA off that fusion (packed-qkv slices in
    # the adapter: 0.41 -> 0.22 ms/img measured) pass prefer=True; a global
    # override remains via VFM_VAE_USE_PALLAS_FLASH=1.
    import os

    if os.environ.get("VFM_VAE_NO_PALLAS_FLASH") == "1":
        return False  # kill switch for triage (mirrors VFM_VAE_NO_PALLAS_NULLKV)
    if not prefer and os.environ.get("VFM_VAE_USE_PALLAS_FLASH") != "1":
        return False
    if mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    Tq, Tk, d = q.shape[1], k.shape[1], q.shape[-1]
    if d not in (64, 128):
        return False
    # Tile-friendly sequence lengths only; others take the XLA path.
    return Tq >= 256 and Tk >= 256 and Tq % 128 == 0 and Tk % 128 == 0
