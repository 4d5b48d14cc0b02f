"""Kynkäänniemi improved precision & recall (reference:
metrics/precision_recall.py). kNN-manifold membership with batched pairwise
distances; runs as jitted matmul blocks on device."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a2 = jnp.sum(jnp.square(a), axis=1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=1)[None, :]
    return jnp.maximum(a2 + b2 - 2.0 * a @ b.T, 0.0)


def kth_nn_distance(features: np.ndarray, k: int, batch: int = 4096) -> np.ndarray:
    """Distance to the k-th nearest neighbor within `features` (self excl.)."""
    f = jnp.asarray(features, jnp.float32)
    out = []

    @jax.jit
    def block(rows):
        d = _pairwise_sq_dists(rows, f)
        # self-distance is 0 -> take (k+1)-th smallest.
        return jnp.sort(d, axis=1)[:, k]

    for i in range(0, f.shape[0], batch):
        out.append(np.asarray(block(f[i : i + batch])))
    return np.concatenate(out)


def manifold_membership(
    probes: np.ndarray, manifold: np.ndarray, radii: np.ndarray, batch: int = 4096
) -> np.ndarray:
    """probe in manifold iff dist(probe, x_i) <= radius_i for some i."""
    m = jnp.asarray(manifold, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)

    @jax.jit
    def block(rows):
        d = _pairwise_sq_dists(rows, m)
        return jnp.any(d <= r[None, :], axis=1)

    out = []
    p = jnp.asarray(probes, jnp.float32)
    for i in range(0, p.shape[0], batch):
        out.append(np.asarray(block(p[i : i + batch])))
    return np.concatenate(out)


def compute_pr(real_features: np.ndarray, gen_features: np.ndarray, nhood_size: int = 3):
    """Returns (precision, recall)."""
    real_radii = kth_nn_distance(real_features, nhood_size)
    gen_radii = kth_nn_distance(gen_features, nhood_size)
    precision = manifold_membership(gen_features, real_features, real_radii).mean()
    recall = manifold_membership(real_features, gen_features, gen_radii).mean()
    return float(precision), float(recall)
