"""Multi-codebook vector quantization (UniTok lineage).

Reference: networks/utils/quant_utils.py (VectorQuantizer :58,
VectorQuantizerM :136, entropy loss :17, normalized codebook :33).

TPU notes:
  * the nearest-code argmax is one (N, vocab) matmul on the MXU;
  * the cross-rank usage all-reduce (quant_utils.py:105) disappears — the
    batch axis is sharded over the mesh, so `bincount` under jit already
    yields the global histogram via an XLA psum;
  * usage EMA buffers live in the 'buffers' collection (mutable in the
    train step), mirroring the reference's register_buffer + counter.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import l2_normalize


def entropy_loss_fn(latent: jnp.ndarray, codebook: jnp.ndarray, inv_tau: float) -> jnp.ndarray:
    """Per-sample minus codebook entropy (quant_utils.py:17-30)."""
    e_dist = (
        jnp.sum(jnp.square(latent), axis=1, keepdims=True)
        + jnp.sum(jnp.square(codebook), axis=1)[None, :]
        - 2.0 * latent @ codebook.T
    )
    logits = -e_dist.astype(jnp.float32) * inv_tau
    prob = jax.nn.softmax(logits, axis=-1)
    log_prob = jax.nn.log_softmax(logits, axis=-1)
    per_sample_entropy = jnp.mean(jnp.sum(-prob * log_prob, axis=-1))
    avg_prob = jnp.mean(prob, axis=0)
    codebook_entropy = jnp.sum(-avg_prob * jnp.log(avg_prob + 1e-7))
    return per_sample_entropy - codebook_entropy


class VectorQuantizer(nn.Module):
    """Single L2-normalized codebook with commitment loss, STE, and EMA'd
    vocab-usage telemetry (quant_utils.py:58-133)."""

    vocab_size: int
    vocab_width: int
    beta: float = 0.25
    use_entropy_loss: bool = False
    entropy_temp: float = 0.01
    eini: float = -1.0

    def _codebook_init(self, key, shape, dtype=jnp.float32):
        eini = self.eini
        if eini > 0:
            return eini * jax.random.truncated_normal(key, -2.0 / eini, 2.0 / eini, shape, dtype)
        base = self.vocab_width**-0.5 / 36
        return jax.random.uniform(key, shape, dtype, -abs(eini) * base, abs(eini) * base)

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = True):
        B, L, C = features.shape
        f = features.reshape(-1, C)
        f = l2_normalize(f, axis=-1).astype(jnp.float32)

        weight = self.param("codebook", self._codebook_init, (self.vocab_size, self.vocab_width))
        codebook = l2_normalize(weight.astype(jnp.float32), axis=-1)

        logits = jax.lax.stop_gradient(f) @ codebook.T
        indices = jnp.argmax(logits, axis=1)
        entropy_loss = (
            entropy_loss_fn(f, codebook, 1.0 / self.entropy_temp)
            if self.use_entropy_loss
            else jnp.zeros(())
        )
        f_hat = codebook[indices]

        vq_loss = self.beta * jnp.mean(
            jnp.square(jax.lax.stop_gradient(f_hat) - f)
        ) + jnp.mean(jnp.square(f_hat - jax.lax.stop_gradient(f)))
        # Straight-through estimator.
        f_hat = f + jax.lax.stop_gradient(f_hat - f)

        # Usage telemetry (EMA ramp 0 -> 0.1 -> 0.01, quant_utils.py:117-123).
        counts = jnp.bincount(indices, length=self.vocab_size).astype(jnp.float32)
        prob = counts / jnp.clip(counts.sum(), 1.0)
        usage_pct = jnp.mean((prob > 0.01 / self.vocab_size).astype(jnp.float32)) * 100.0

        vocab_usage = self.variable("buffers", "vocab_usage", jnp.zeros, (self.vocab_size,))
        times = self.variable("buffers", "usage_record_times", lambda: jnp.zeros((), jnp.int32))
        if train and not self.is_initializing():
            t = times.value
            alpha = jnp.where(t == 0, 1.0, jnp.where(t < 100, 0.1, 0.01))
            vocab_usage.value = vocab_usage.value * (1.0 - alpha) + prob * alpha
            times.value = t + 1

        return f_hat.reshape(B, L, C).astype(features.dtype), vq_loss, entropy_loss, usage_pct

    def f_to_idx(self, features: jnp.ndarray) -> jnp.ndarray:
        B, L, C = features.shape
        f = l2_normalize(features.reshape(-1, C), axis=-1).astype(jnp.float32)
        weight = self.get_variable("params", "codebook")
        codebook = l2_normalize(weight.astype(jnp.float32), axis=-1)
        return jnp.argmax(f @ codebook.T, axis=1).reshape(B, L)


class VectorQuantizerM(nn.Module):
    """Channel-split multi-codebook quantizer (quant_utils.py:136-199)."""

    vocab_size: int
    vocab_width: int
    beta: float = 0.25
    use_entropy_loss: bool = False
    entropy_temp: float = 0.01
    num_codebooks: int = 16

    def setup(self):
        self.codebooks = [
            VectorQuantizer(
                vocab_size=self.vocab_size // self.num_codebooks,
                vocab_width=self.vocab_width // self.num_codebooks,
                beta=self.beta,
                use_entropy_loss=self.use_entropy_loss,
                entropy_temp=self.entropy_temp,
                name=f"codebook_{i}",
            )
            for i in range(self.num_codebooks)
        ]

    def __call__(self, features: jnp.ndarray, train: bool = True):
        chunks = jnp.split(features, self.num_codebooks, axis=-1)
        outs, vq, ent, usage = [], 0.0, 0.0, 0.0
        for cb, chunk in zip(self.codebooks, chunks):
            f_hat, vq_i, ent_i, usage_i = cb(chunk, train=train)
            outs.append(f_hat)
            vq = vq + vq_i
            ent = ent + ent_i
            usage = usage + usage_i
        n = self.num_codebooks
        return jnp.concatenate(outs, axis=-1), vq / n, ent / n, usage / n

    def f_to_idx(self, features: jnp.ndarray) -> jnp.ndarray:
        chunks = jnp.split(features, self.num_codebooks, axis=-1)
        return jnp.stack([cb.f_to_idx(c) for cb, c in zip(self.codebooks, chunks)], axis=1)

    def idx_to_f(self, indices: jnp.ndarray) -> jnp.ndarray:
        """(B, num_codebooks, L) int -> (B, L, vocab_width) embeddings."""
        feats = []
        for i, cb in enumerate(self.codebooks):
            weight = cb.get_variable("params", "codebook")
            codebook = l2_normalize(weight.astype(jnp.float32), axis=-1)
            feats.append(codebook[indices[:, i]])
        return jnp.concatenate(feats, axis=-1)
