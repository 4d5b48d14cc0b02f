"""Diagonal Gaussian latent distribution (reference: networks/utils/
kl_utils.py:30-68, LDM lineage). Channel-last: parameters are (B, H, W, 2C)
with mean = [..., :C], logvar = [..., C:] (torch chunk(2, dim=1) equivalent).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


class DiagonalGaussianDistribution:
    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = self.var = jnp.zeros_like(self.mean)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(())
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=(1, 2, 3)
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=(1, 2, 3),
        )

    def nll(self, sample: jnp.ndarray, dims=(1, 2, 3)) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(())
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var, axis=dims
        )

    def mode(self) -> jnp.ndarray:
        return self.mean


def mean_logvar_to_mean_std(moments: jnp.ndarray) -> jnp.ndarray:
    """(mean || logvar) -> (mean || std), the REG prefetch storage format
    (reference: tools/preprocess_for_reg/prefetch.py:40-44)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return jnp.concatenate([mean, std], axis=-1)
