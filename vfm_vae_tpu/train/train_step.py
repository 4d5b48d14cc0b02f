"""Jitted G/D train steps.

The reference runs two phases per batch ([D, G], training_loop.py:622-628),
each: forward -> backward -> manual grad all-reduce -> Adam -> (G) EMA. Here
each phase is ONE jitted function over the mesh: batch sharded on the data
axis, params replicated, gradient mean implicit (XLA inserts the psum), EMA
fused into the same step. The adaptive VF weight reuses the single vjp of
the G term vector (see train/loss.py docstring).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import flax.traverse_util as tu
import jax
import jax.numpy as jnp

from .loss import G_TERMS, G_TRACKED, LossState, TotalLoss, init_loss_state
from .optim import clean_grads, ema_update


@flax.struct.dataclass
class TrainState:
    g_params: Any
    d_params: Any
    g_bufs: Any
    d_bufs: Any
    ema_params: Any
    g_opt: Any
    d_opt: Any
    loss_state: LossState
    cur_nimg: jnp.ndarray  # scalar int64-ish float32 is fine


def _get_leaf(tree, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


class Trainer:
    """Binds loss config + optimizers into jittable step closures."""

    def __init__(
        self,
        loss: TotalLoss,
        g_tx,
        d_tx,
        lpips_params=None,
        g_trainable_mask=None,
        vf_anchor_path: Optional[Tuple[str, ...]] = None,
        batch_size: int = 512,
        ema_kimg: float = 160.0,
        ema_rampup: Optional[float] = 0.05,
    ):
        self.loss = loss
        self.g_tx = g_tx
        self.d_tx = d_tx
        self.lpips_params = lpips_params
        self.g_trainable_mask = g_trainable_mask
        self.vf_anchor_path = vf_anchor_path
        self.batch_size = batch_size
        self.ema_kimg = ema_kimg
        self.ema_rampup = ema_rampup

    # -------------------------------------------------------------- D step

    def d_step(self, state: TrainState, real_img, real_c, rng, eq, blur_sigma: float = 0.0):
        rngs = dict(
            zip(
                ["sample", "d_gen", "d_real", "shuffle", "d_gen_s", "d_real_s"],
                jax.random.split(rng, 6),
            )
        )

        def f(d_params):
            return self.loss.d_loss(
                d_params, state.g_params, state.g_bufs, state.d_bufs,
                real_img, real_c, rngs, eq, state.cur_nimg, blur_sigma,
            )

        (d_total, aux), grads = jax.value_and_grad(f, has_aux=True)(state.d_params)
        grads = clean_grads(grads)
        skip = aux["skip"]
        grads = jax.tree_util.tree_map(lambda g: g * (1.0 - skip.astype(g.dtype)), grads)
        updates, new_opt = self.d_tx.update(grads, state.d_opt, state.d_params)
        import optax

        new_d_params = optax.apply_updates(state.d_params, updates)
        new_state = state.replace(
            d_params=new_d_params, d_opt=new_opt, d_bufs=aux["d_bufs"]
        )
        return new_state, aux["stats"], d_total

    # -------------------------------------------------------------- G step

    def g_step(self, state: TrainState, real_img, real_c, rng, eq, blur_sigma: float = 0.0):
        import optax

        rngs = dict(zip(["sample", "d_gen", "d_real"], jax.random.split(rng, 3)))

        def f(g_params):
            return self.loss.g_terms(
                g_params, state.d_params, state.g_bufs, state.d_bufs,
                self.lpips_params, real_img, real_c, rngs, eq,
                state.cur_nimg, blur_sigma,
            )

        (terms, vjp_fn, aux) = jax.vjp(f, state.g_params, has_aux=True)
        skip, safe_marks, new_loss_state = self.loss.g_safe(
            terms, state.loss_state, state.cur_nimg
        )

        # Adaptive VF weight: ||grad_anchor(rec)|| / ||grad_anchor(vf)||
        # via two extra cotangent pulls of the same vjp (loss.py:262-271).
        if self.loss.use_adaptive_vf_loss and self.loss.vf_loss_weight > 0:
            assert self.vf_anchor_path is not None
            rec_cot = tuple(self.loss.rec_weights())
            vf_cot = tuple(self.loss.vf_cotangent())
            g_rec = vjp_fn(rec_cot)[0]
            g_vf = vjp_fn(vf_cot)[0]
            anchor_rec = _get_leaf(g_rec, self.vf_anchor_path)
            anchor_vf = _get_leaf(g_vf, self.vf_anchor_path)
            cur_vf_w = jnp.linalg.norm(anchor_rec) / (jnp.linalg.norm(anchor_vf) + 1e-4)
            cur_vf_w = jax.lax.stop_gradient(
                jnp.clip(cur_vf_w, 0.0, 1e8) * self.loss.vf_loss_weight
            )
        else:
            cur_vf_w = jnp.asarray(self.loss.vf_loss_weight, jnp.float32)

        weights = self.loss.g_weights(cur_vf_w)
        gate = 1.0 - skip.astype(jnp.float32)
        cot = tuple(weights[i] * gate for i in range(len(G_TERMS)))
        grads = vjp_fn(cot)[0]
        grads = clean_grads(grads)

        updates, new_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, updates)

        from .optim import ema_beta

        # cur_nimg is traced; use the host-side schedule via a traced beta.
        ema_nimg = self.ema_kimg * 1000.0
        if self.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, state.cur_nimg * self.ema_rampup)
        beta = 0.5 ** (self.batch_size / jnp.maximum(ema_nimg, 1e-8))
        if self.g_trainable_mask is not None:
            mask = self.g_trainable_mask
            new_ema = jax.tree_util.tree_map(
                lambda e, p, m: e * beta + p * (1.0 - beta) if m else p,
                state.ema_params, new_g_params, mask,
            )
        else:
            new_ema = ema_update(state.ema_params, new_g_params, beta)

        stats = dict(aux["stats"])
        from ..core import stats as tstats

        tstats.report(stats, "Loss/G/skipped", skip.astype(jnp.float32))
        for i, name in enumerate(G_TRACKED):
            tstats.report(stats, f"Loss/G/is_safe/{name}", safe_marks[i].astype(jnp.float32))
        name_to_stat = {
            "l1_pixel_loss": "Loss/G/l1_pixel_loss",
            "l2_pixel_loss": "Loss/G/l2_pixel_loss",
            "perceptual_loss": "Loss/G/perceptual_loss",
            "ssim_loss": "Loss/G/ssim_loss",
            "multiscale_pixel_loss": "Loss/G/multiscale_pixel_loss",
            "stylegan_t_gen_loss": "Loss/G/stylegan_t/loss",
            "patchgan_gen_loss": "Loss/G/patchgan/loss",
            "feature_matching_loss": "Loss/G/patchgan/feature_matching_loss",
            "clip_loss": "Loss/G/clip_loss",
            "vf_loss": "Loss/G/vf_loss",
            "kl_loss": "Loss/G/kl_loss",
            "vq_loss": "Loss/G/vq_loss",
            "entropy_loss": "Loss/G/entropy_loss",
        }
        for i, name in enumerate(G_TERMS):
            tstats.report(stats, name_to_stat[name], terms[i])
        tstats.report(stats, "Loss/G/cur_vf_loss_weight", cur_vf_w)

        total = jnp.sum(weights * jnp.stack(terms))
        new_state = state.replace(
            g_params=new_g_params,
            g_opt=new_opt,
            g_bufs=aux["g_bufs"],
            d_bufs=aux["d_bufs"],
            ema_params=new_ema,
            loss_state=new_loss_state,
            cur_nimg=state.cur_nimg + real_img.shape[0],
        )
        return new_state, stats, total
