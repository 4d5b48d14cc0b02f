"""Jitted G/D train steps.

The reference runs two phases per batch ([D, G], training_loop.py:622-628),
each: per-microbatch forward/backward accumulation -> manual grad all-reduce
-> Adam -> (G) EMA. Here each phase is ONE jitted function over the mesh:
batch sharded on the data axis, params replicated, gradient mean implicit
(XLA inserts the psum), EMA fused into the same step. Gradient accumulation
unrolls the microbatch loop inside the jit (grads summed, matching
accumulate_gradients' backward-accumulation semantics, training_loop.py:719-726).
The adaptive VF weight reuses the single vjp of the G term vector (see
train/loss.py docstring).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import optax

from ..core import stats as tstats
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
    cur_nimg: jnp.ndarray  # scalar


def _get_leaf(tree, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _as_unit_float(real_img):
    """Accept raw uint8 [0,255] batches: the training loop transfers the
    loader's uint8 bytes and normalizes HERE, on device — 4x fewer
    host->device bytes than shipping fp32 (measured on the remote-tunnel
    dev host: the fp32 batch transfer alone serialized ~300 ms/step at B8;
    the reference converts on host before .to(device),
    training_loop.py:310-323). float inputs (tests, tools) are assumed
    already in [0,1] and pass through."""
    if real_img is not None and real_img.dtype == jnp.uint8:
        return real_img.astype(jnp.float32) / 255.0
    return real_img


def _microbatches(x, n):
    """Split the leading (batch) dim into n chunks; pytree-aware (text
    conditioning carries a dict of token arrays)."""
    if x is None:
        return [None] * n
    B = jax.tree_util.tree_leaves(x)[0].shape[0]
    assert B % n == 0, (B, n)
    m = B // n
    return [
        jax.tree_util.tree_map(lambda l: l[i * m : (i + 1) * m], x)
        for i in range(n)
    ]


def jit_train_step(fn, out_shardings=None, donate: bool = True):
    """jit a Trainer step with EQ **angle folding**: the rot90 angle becomes
    a traced int32 (ops/resize.rot90_traced lowers it to a 4-way lax.switch),
    so one compiled program covers all four angles of a (scale, prior)
    bucket, and the shape-identical (1.0, 0, prior=True) bucket is
    canonicalized onto (1.0, 0, False). Cuts EQ compile variants from up to
    20 to 7 (4 scales x {latent, prior} minus merges). The returned callable
    keeps the plain step signature: (state, real, real_c, rng,
    eq=(scale, angle, prior), blur_sigma).

    Exposes `.jitted` (the inner jax.jit object) for cache introspection
    (tests / tools/bench_eq_compile.py)."""
    kw: Dict[str, Any] = dict(static_argnames=("eq_static", "blur_sigma"))
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    if donate:
        kw["donate_argnames"] = ("state",)

    @functools.partial(jax.jit, **kw)
    def step(state, real_img, real_c, rng, eq_angle, eq_static, blur_sigma):
        scale, prior = eq_static
        return fn(state, real_img, real_c, rng, (scale, eq_angle, prior), blur_sigma)

    def call(state, real_img, real_c, rng, eq, blur_sigma: float = 0.0):
        scale, angle, prior = eq
        if prior and float(scale) == 1.0:
            # Identical program: prior with no downscale == latent EQ with
            # identity transform (vfm.py preprocess gates on scale < 1.0;
            # generator latent path is identity at scale 1, angle 0).
            prior, angle = False, 0
        return step(state, real_img, real_c, rng,
                    jnp.asarray(angle, jnp.int32), (float(scale), bool(prior)),
                    blur_sigma)

    call.jitted = step
    return call


G_STAT_NAMES = {
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
        num_accumulation: int = 1,
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
        self.num_accumulation = num_accumulation

    # -------------------------------------------------------------- D step

    def d_step(self, state: TrainState, real_img, real_c, rng, eq, blur_sigma: float = 0.0):
        real_img = _as_unit_float(real_img)
        n_acc = self.num_accumulation
        imgs = _microbatches(real_img, n_acc)
        cs = _microbatches(real_c, n_acc)
        sub_rngs = jax.random.split(rng, n_acc)

        grads_sum = None
        d_bufs = state.d_bufs
        stats_all: Dict[str, jnp.ndarray] = {}
        total = 0.0
        for mb in range(n_acc):
            rngs = dict(
                zip(
                    ["sample", "d_gen", "d_real", "shuffle", "d_gen_s", "d_real_s"],
                    jax.random.split(sub_rngs[mb], 6),
                )
            )

            def f(d_params, img=imgs[mb], c=cs[mb], rngs=rngs, d_bufs=d_bufs):
                return self.loss.d_loss(
                    d_params, state.g_params, state.g_bufs, d_bufs,
                    img, c, rngs, eq, state.cur_nimg, blur_sigma,
                )

            (d_total, aux), grads = jax.value_and_grad(f, has_aux=True)(state.d_params)
            skip = aux["skip"]
            grads = jax.tree_util.tree_map(
                lambda g: g * (1.0 - skip.astype(g.dtype)), grads
            )
            grads_sum = grads if grads_sum is None else _tree_add(grads_sum, grads)
            d_bufs = aux["d_bufs"]
            stats_all = tstats.merge(stats_all, aux["stats"])
            total = total + d_total

        grads_sum = clean_grads(grads_sum)
        updates, new_opt = self.d_tx.update(grads_sum, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, updates)
        new_state = state.replace(d_params=new_d_params, d_opt=new_opt, d_bufs=d_bufs)
        return new_state, stats_all, total / n_acc

    # -------------------------------------------------------------- G step

    def _g_microbatch(self, g_params, state, real_img, real_c, rng, eq, blur_sigma,
                      g_bufs, d_bufs, loss_state):
        rngs = dict(
            zip(["sample", "d_gen", "d_real", "clip_crop"], jax.random.split(rng, 4))
        )

        def f(gp):
            return self.loss.g_terms(
                gp, state.d_params, g_bufs, d_bufs,
                self.lpips_params, real_img, real_c, rngs, eq,
                state.cur_nimg, blur_sigma,
            )

        (terms, vjp_fn, aux) = jax.vjp(f, g_params, has_aux=True)
        skip, safe_marks, new_loss_state = self.loss.g_safe(
            terms, loss_state, state.cur_nimg
        )

        # Adaptive VF weight: ||grad_anchor(rec)|| / ||grad_anchor(vf)||
        # via two extra cotangent pulls of the same vjp (loss.py:262-271).
        if self.loss.use_adaptive_vf_loss and self.loss.vf_loss_weight > 0:
            assert self.vf_anchor_path is not None
            g_rec = vjp_fn(tuple(self.loss.rec_weights()))[0]
            g_vf = vjp_fn(tuple(self.loss.vf_cotangent()))[0]
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

        stats = dict(aux["stats"])
        tstats.report(stats, "Loss/G/skipped", skip.astype(jnp.float32))
        for i, name in enumerate(G_TRACKED):
            tstats.report(stats, f"Loss/G/is_safe/{name}", safe_marks[i].astype(jnp.float32))
        for i, name in enumerate(G_TERMS):
            tstats.report(stats, G_STAT_NAMES[name], terms[i])
        tstats.report(stats, "Loss/G/cur_vf_loss_weight", cur_vf_w)

        total = jnp.sum(weights * jnp.stack(terms))
        return (grads, aux["g_bufs"], aux["d_bufs"], new_loss_state, stats, total,
                aux["gen_img"], aux.get("c_d"))

    def g_step(self, state: TrainState, real_img, real_c, rng, eq, blur_sigma: float = 0.0):
        real_img = _as_unit_float(real_img)
        n_acc = self.num_accumulation
        imgs = _microbatches(real_img, n_acc)
        cs = _microbatches(real_c, n_acc)
        sub_rngs = jax.random.split(rng, n_acc)

        grads_sum = None
        g_bufs, d_bufs, loss_state = state.g_bufs, state.d_bufs, state.loss_state
        stats_all: Dict[str, jnp.ndarray] = {}
        total = 0.0
        for mb in range(n_acc):
            grads, g_bufs, d_bufs, loss_state, stats, t, _, _ = self._g_microbatch(
                state.g_params, state, imgs[mb], cs[mb], sub_rngs[mb], eq,
                blur_sigma, g_bufs, d_bufs, loss_state,
            )
            grads_sum = grads if grads_sum is None else _tree_add(grads_sum, grads)
            stats_all = tstats.merge(stats_all, stats)
            total = total + t

        grads_sum = clean_grads(grads_sum)
        updates, new_opt = self.g_tx.update(grads_sum, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, updates)

        # EMA (training_loop.py:734-742) with optional ramp-up.
        ema_nimg = self.ema_kimg * 1000.0
        if self.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, state.cur_nimg * self.ema_rampup)
        beta = 0.5 ** (self.batch_size / jnp.maximum(ema_nimg, 1e-8))
        if self.g_trainable_mask is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p, m: e * beta + p * (1.0 - beta) if m else p,
                state.ema_params, new_g_params, self.g_trainable_mask,
            )
        else:
            new_ema = ema_update(state.ema_params, new_g_params, beta)

        new_state = state.replace(
            g_params=new_g_params,
            g_opt=new_opt,
            g_bufs=g_bufs,
            d_bufs=d_bufs,
            ema_params=new_ema,
            loss_state=loss_state,
            cur_nimg=state.cur_nimg + real_img.shape[0],
        )
        return new_state, stats_all, total / n_acc

    # ------------------------------------------------------- fused D+G step

    def fused_step(self, state: TrainState, real_img, real_c, rng, eq, blur_sigma: float = 0.0):
        """Simultaneous D+G update sharing ONE generator forward per
        microbatch (SURVEY §7: the D phase re-runs G under stop_gradient —
        on TPU the two phases fuse into one jit and the second frozen-ViT +
        decoder forward disappears).

        Semantic deltas vs the sequential [D, G] recipe
        (training_loop.py:622-628), both standard simultaneous-GAN-update
        behavior: (1) the G adversarial terms see the pre-update D; (2) both
        branches critique the same generated sample; (3) spectral-norm power
        iterations advance once (D branch) instead of twice. Opt-in via
        `fused_phases: true`.
        """
        real_img = _as_unit_float(real_img)
        n_acc = self.num_accumulation
        imgs = _microbatches(real_img, n_acc)
        cs = _microbatches(real_c, n_acc)
        sub_rngs = jax.random.split(rng, n_acc)

        g_grads_sum = None
        d_grads_sum = None
        g_bufs, loss_state = state.g_bufs, state.loss_state
        d_bufs0 = state.d_bufs
        d_bufs = d_bufs0
        stats_all: Dict[str, jnp.ndarray] = {}
        g_total = 0.0
        d_total_sum = 0.0
        for mb in range(n_acc):
            rg, rd = jax.random.split(sub_rngs[mb])

            # G branch: one vjp'd forward; also yields the generated image
            # and the encoded D condition (text embedding under text cond).
            g_grads, g_bufs, _, loss_state, g_stats, gt, gen_img, c_d = self._g_microbatch(
                state.g_params, state, imgs[mb], cs[mb], rg, eq,
                blur_sigma, g_bufs, d_bufs0, loss_state,
            )
            g_grads_sum = g_grads if g_grads_sum is None else _tree_add(g_grads_sum, g_grads)
            stats_all = tstats.merge(stats_all, g_stats)
            g_total = g_total + gt

            # D branch: reuses gen_img instead of a second G forward.
            d_rngs = dict(
                zip(
                    ["d_gen", "d_real", "shuffle", "d_gen_s", "d_real_s"],
                    jax.random.split(rd, 5),
                )
            )

            def fd(d_params, img=imgs[mb], c=c_d, rngs=d_rngs, gen=gen_img,
                   bufs=d_bufs):
                return self.loss.d_loss_from_gen(
                    d_params, bufs, gen, img, c, rngs, eq,
                    state.cur_nimg, blur_sigma,
                )

            (d_total, d_aux), d_grads = jax.value_and_grad(fd, has_aux=True)(state.d_params)
            skip = d_aux["skip"]
            d_grads = jax.tree_util.tree_map(
                lambda g: g * (1.0 - skip.astype(g.dtype)), d_grads
            )
            d_grads_sum = d_grads if d_grads_sum is None else _tree_add(d_grads_sum, d_grads)
            d_bufs = d_aux["d_bufs"]
            stats_all = tstats.merge(stats_all, d_aux["stats"])
            d_total_sum = d_total_sum + d_total

        d_grads_sum = clean_grads(d_grads_sum)
        d_updates, new_d_opt = self.d_tx.update(d_grads_sum, state.d_opt, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        g_grads_sum = clean_grads(g_grads_sum)
        g_updates, new_g_opt = self.g_tx.update(g_grads_sum, state.g_opt, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        ema_nimg = self.ema_kimg * 1000.0
        if self.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, state.cur_nimg * self.ema_rampup)
        beta = 0.5 ** (self.batch_size / jnp.maximum(ema_nimg, 1e-8))
        if self.g_trainable_mask is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p, m: e * beta + p * (1.0 - beta) if m else p,
                state.ema_params, new_g_params, self.g_trainable_mask,
            )
        else:
            new_ema = ema_update(state.ema_params, new_g_params, beta)

        new_state = state.replace(
            g_params=new_g_params,
            d_params=new_d_params,
            g_opt=new_g_opt,
            d_opt=new_d_opt,
            g_bufs=g_bufs,
            d_bufs=d_bufs,
            ema_params=new_ema,
            loss_state=loss_state,
            cur_nimg=state.cur_nimg + real_img.shape[0],
        )
        return new_state, stats_all, (d_total_sum + g_total) / n_acc
