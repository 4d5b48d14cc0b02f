"""DiffAugment (data-efficient-GANs lineage; reference: training/diffaug.py).

NHWC, fully traced: randomness comes from an explicit jax PRNG key, the
integer translation / cutout are expressed as gathers with static shapes, so
the whole augmentation fuses into the discriminator's input pipeline on
device. Semantics mirror the reference exactly (same ranges, same clamp-pad
trick for translation, same even/odd cutout offset handling).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def rand_brightness(rng, x):
    b = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(rng, x):
    x_mean = x.mean(axis=-1, keepdims=True)
    s = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) * 2
    return (x - x_mean) * s + x_mean


def rand_contrast(rng, x):
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - x_mean) * c + x_mean


def rand_translation(rng, x, ratio: float = 0.125):
    B, H, W, C = x.shape
    shift_h = int(H * ratio + 0.5)
    shift_w = int(W * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    th = jax.random.randint(r1, (B, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(r2, (B, 1, 1), -shift_w, shift_w + 1)
    gh = jnp.clip(jnp.arange(H)[None, :, None] + th + 1, 0, H + 1)  # (B, H, 1)
    gw = jnp.clip(jnp.arange(W)[None, None, :] + tw + 1, 0, W + 1)  # (B, 1, W)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Gather rows then columns per sample.
    gathered = jax.vmap(lambda img, hh, ww: img[hh[:, 0]][:, ww[0]])(x_pad, gh, gw)
    return gathered


def rand_cutout(rng, x, ratio: float = 0.2):
    B, H, W, C = x.shape
    ch = int(H * ratio + 0.5)
    cw = int(W * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    oh = jax.random.randint(r1, (B, 1, 1), 0, H + (1 - ch % 2))
    ow = jax.random.randint(r2, (B, 1, 1), 0, W + (1 - cw % 2))
    gh = jnp.clip(jnp.arange(ch)[None, :, None] + oh - ch // 2, 0, H - 1)  # (B, ch, 1)
    gw = jnp.clip(jnp.arange(cw)[None, None, :] + ow - cw // 2, 0, W - 1)  # (B, 1, cw)
    hh = jnp.broadcast_to(gh, (B, ch, cw))
    ww = jnp.broadcast_to(gw, (B, ch, cw))
    mask = jnp.ones((B, H, W), x.dtype)
    bb = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, ch, cw))
    mask = mask.at[bb, hh, ww].set(0.0)
    return x * mask[..., None]


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
}


def diff_augment(rng, x: jnp.ndarray, policy: str = "color,translation,cutout") -> jnp.ndarray:
    """x: NHWC in [-1, 1]."""
    if not policy:
        return x
    for p in policy.split(","):
        for fn in AUGMENT_FNS[p]:
            rng, sub = jax.random.split(rng)
            x = fn(sub, x)
    return x
