"""Fused multiply-add a*b + c (reference: torch_utils/ops/fma.py:15 — a
custom-grad op there; XLA fuses this natively so it is a plain expression,
kept as an API for parity)."""

from __future__ import annotations

import jax.numpy as jnp


def fma(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    return a * b + c
