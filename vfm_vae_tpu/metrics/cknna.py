"""SE-CKNNA representation-alignment metric (the paper's diagnostic;
reference: tools/evaluate_alignment/metrics.py:191-266): top-k mutual-NN
masked unbiased HSIC/CKA between two feature sets. Pure jnp — the Gram
matrices and HSIC sums are MXU matmuls."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hsic_unbiased(K: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Song et al. unbiased HSIC (metrics.py:241-259)."""
    m = K.shape[0]
    K_t = K - jnp.diag(jnp.diag(K))
    L_t = L - jnp.diag(jnp.diag(L))
    return (
        jnp.sum(K_t * L_t.T)
        + jnp.sum(K_t) * jnp.sum(L_t) / ((m - 1) * (m - 2))
        - 2 * jnp.sum(K_t @ L_t) / (m - 2)
    ) / (m * (m - 3))


def hsic_biased(K: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    m = K.shape[0]
    H = jnp.eye(m) - 1.0 / m
    return jnp.trace(K @ H @ L @ H)


def _topk_mask(G: jnp.ndarray, topk: int, exclude_diag: bool) -> jnp.ndarray:
    n = G.shape[0]
    G_hat = jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, G) if exclude_diag else G
    idx = jax.lax.top_k(G_hat, topk)[1]
    mask = jnp.zeros((n, n)).at[jnp.arange(n)[:, None], idx].set(1.0)
    return mask


def cknna(
    feats_a: np.ndarray,
    feats_b: np.ndarray,
    topk: int = 10,
    distance_agnostic: bool = False,
    unbiased: bool = True,
) -> float:
    """Mutual-kNN-masked CKA similarity in [≈0, 1]."""
    assert topk >= 2, "CKNNA requires topk >= 2"
    A = jnp.asarray(feats_a, jnp.float32)
    B = jnp.asarray(feats_b, jnp.float32)
    K = A @ A.T
    L = B @ B.T

    def similarity(K, L):
        mask = _topk_mask(K, topk, unbiased) * _topk_mask(L, topk, unbiased)
        if distance_agnostic:
            return jnp.sum(mask)
        fn = hsic_unbiased if unbiased else hsic_biased
        return fn(mask * K, mask * L)

    sim_kl = similarity(K, L)
    sim_kk = similarity(K, K)
    sim_ll = similarity(L, L)
    return float(sim_kl / (jnp.sqrt(sim_kk * sim_ll) + 1e-6))
