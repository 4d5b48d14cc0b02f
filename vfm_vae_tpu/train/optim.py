"""Optimizers (reference: torch.optim.Adam with betas (0, 0.99), eps 1e-8,
configs/*.yaml:147-157) + trainable-subset masking (the functional
equivalent of requires_grad_/partial_freeze, training_loop.py:446-459)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def Adam(lr: float = 1e-4, betas=(0.0, 0.99), eps: float = 1e-8, mask=None):
    """torch-Adam-equivalent (optax.adam shares the bias-corrected update
    rule); `mask` is a bool pytree — False leaves are frozen.

    NB: optax.masked alone is NOT freezing — masked-out leaves keep their
    incoming update (the raw gradient), which apply_updates would then ADD
    to the frozen params. The second masked(set_to_zero) stage zeroes them.
    """
    tx = optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    if mask is not None:
        inv_mask = jax.tree_util.tree_map(lambda m: not m, mask)
        tx = optax.chain(
            optax.masked(tx, mask),
            optax.masked(optax.set_to_zero(), inv_mask),
        )
    return tx


def clean_grads(grads, clamp: float = 1e5):
    """Gradient hygiene matching the reference's nan_to_num(grads, +-1e5)
    inside sync_grads (training_loop.py:286)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=clamp, neginf=-clamp), grads
    )


def ema_update(ema_params, new_params, beta, mask=None):
    """p_ema <- beta * p_ema + (1 - beta) * p (training_loop.py:734-742).
    Frozen leaves (mask False) stay aliased to the live params — no EMA copy
    of the 300M-param frozen VFM tower."""
    if mask is None:
        return jax.tree_util.tree_map(
            lambda e, p: e * beta + p * (1.0 - beta), ema_params, new_params
        )
    return jax.tree_util.tree_map(
        lambda e, p, m: e * beta + p * (1.0 - beta) if m else p,
        ema_params, new_params, mask,
    )


def ema_beta(batch_size: int, cur_nimg: int, ema_kimg: float, ema_rampup: Optional[float]) -> float:
    """(training_loop.py:735-738): optional ramp-up of the EMA horizon."""
    ema_nimg = ema_kimg * 1000
    if ema_rampup is not None:
        ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / max(ema_nimg, 1e-8))
