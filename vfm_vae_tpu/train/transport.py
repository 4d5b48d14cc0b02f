"""Flow-matching transport: linear path, velocity prediction, lognorm time
sampling, cosine loss option (reference LightningDiT transport config,
train_lightningdit_xl_1_stage_0.yaml:57-64) + ODE/SDE samplers with
(dual-)CFG (reference sample.py files in both tool forks)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def sample_t(rng: jax.Array, batch: int, use_lognorm: bool = True) -> jnp.ndarray:
    """t in (0, 1); lognorm(0,1) concentrates mid-path (LightningDiT stage 0)."""
    if use_lognorm:
        n = jax.random.normal(rng, (batch,))
        return jax.nn.sigmoid(n)
    return jax.random.uniform(rng, (batch,))


def linear_interpolate(x0: jnp.ndarray, x1: jnp.ndarray, t: jnp.ndarray):
    """x_t = (1-t) x0 + t x1 with velocity x1 - x0 (noise -> data as t: 0->1)."""
    tb = t.reshape(-1, *([1] * (x1.ndim - 1)))
    xt = (1 - tb) * x0 + tb * x1
    vel = x1 - x0
    return xt, vel


def flow_matching_loss(
    model_fn: Callable,
    params,
    latents: jnp.ndarray,  # (B, H, W, C) data
    labels: Optional[jnp.ndarray],
    rng: jax.Array,
    use_lognorm: bool = True,
    use_cosine_loss: bool = True,
    repa_targets: Optional[jnp.ndarray] = None,  # (B, T, D_vfm)
    repa_weight: float = 0.0,
):
    """Velocity-matching MSE (+ optional cosine term) on the linear path.
    With `repa_targets`, model_fn must return (pred, projected) where
    projected is (B, T, D_vfm); the REPA token-cosine alignment term is
    added (REG recipe: reference tools/preprocess_for_reg — SiT + REPA)."""
    r_t, r_noise, r_drop = jax.random.split(rng, 3)
    B = latents.shape[0]
    t = sample_t(r_t, B, use_lognorm)
    x0 = jax.random.normal(r_noise, latents.shape, latents.dtype)
    xt, vel = linear_interpolate(x0, latents, t)
    out = model_fn(params, xt, t, labels, r_drop)
    if repa_targets is not None:
        pred, projected = out
    else:
        pred = out
    mse = jnp.mean(jnp.square(pred - vel))
    loss = mse
    if repa_targets is not None and repa_weight > 0:
        p = projected
        tgt = repa_targets.astype(jnp.float32)
        pn = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1), 1e-12))
        tn = jnp.sqrt(jnp.maximum(jnp.sum(tgt * tgt, axis=-1), 1e-12))
        cos_tok = jnp.sum(p * tgt, axis=-1) / (pn * tn + 1e-8)
        loss = loss + repa_weight * jnp.mean(1.0 - cos_tok)
    if use_cosine_loss:
        p = pred.reshape(B, -1)
        v = vel.reshape(B, -1)
        # max() keeps the sqrt backward finite at the zero-init model output.
        pn = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1), 1e-12))
        vn = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-12))
        cos = jnp.sum(p * v, axis=-1) / (pn * vn + 1e-8)
        loss = loss + jnp.mean(1.0 - cos)
    return loss, {"mse": mse}


# ------------------------------------------------------------------ samplers


def ode_euler_sample(
    model_fn: Callable,
    params,
    rng: jax.Array,
    shape,
    labels: Optional[jnp.ndarray] = None,
    num_steps: int = 50,
    cfg_scale: float = 1.0,
    cfg_interval: Optional[tuple] = None,
):
    """Euler ODE integration of the velocity field t: 0 -> 1 with optional
    classifier-free guidance (LightningDiT sampler)."""
    x = jax.random.normal(rng, shape)
    dt = 1.0 / num_steps

    def guided_vel(x, t_scalar):
        t = jnp.full((shape[0],), t_scalar)
        v_cond = model_fn(params, x, t, labels, None)
        if cfg_scale == 1.0 or labels is None:
            return v_cond
        v_unc = model_fn(params, x, t, None, None)
        scale = cfg_scale
        if cfg_interval is not None:
            lo, hi = cfg_interval
            on = jnp.logical_and(t_scalar >= lo, t_scalar <= hi)
            scale = jnp.where(on, cfg_scale, 1.0)
        return v_unc + scale * (v_cond - v_unc)

    def body(i, x):
        t = i * dt
        return x + dt * guided_vel(x, t)

    return jax.lax.fori_loop(0, num_steps, body, x)


def sde_sample(
    model_fn: Callable,
    params,
    rng: jax.Array,
    shape,
    labels: Optional[jnp.ndarray] = None,
    num_steps: int = 250,
    cfg_scale: float = 1.0,
    diffusion_coef: float = 1.0,
    last_step_frac: float = 0.04,
):
    """Euler-Maruyama SDE sampler (REG protocol): stochastic integration with
    a deterministic final segment."""
    r_init, r_noise = jax.random.split(rng)
    x = jax.random.normal(r_init, shape)
    t_end = 1.0 - last_step_frac
    dt = t_end / num_steps

    def guided_vel(x, t):
        tb = jnp.full((shape[0],), t)
        v_cond = model_fn(params, x, tb, labels, None)
        if cfg_scale == 1.0 or labels is None:
            return v_cond
        v_unc = model_fn(params, x, tb, None, None)
        return v_unc + cfg_scale * (v_cond - v_unc)

    def score_from_velocity(v, x, t):
        # Linear path x_t = (1-t) eps + t x1: score = -((1-t) v + ... )
        # For the linear interpolant: sigma_t = 1 - t, and
        # score = ((t) * v - x) / (1 - t) (standard SiT conversion).
        t = jnp.clip(t, 1e-4, 1 - 1e-4)
        return (t * v - x) / (1.0 - t)

    def body(i, carry):
        x, rng = carry
        t = i * dt
        v = guided_vel(x, t)
        s = score_from_velocity(v, x, t)
        w = diffusion_coef * (1.0 - t)
        drift = v + 0.5 * w * s
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, shape)
        x = x + drift * dt + jnp.sqrt(w * dt) * noise
        return x, rng

    x, rng = jax.lax.fori_loop(0, num_steps, body, (x, r_noise))
    # Deterministic last segment.
    v = guided_vel(x, t_end)
    return x + (1.0 - t_end) * v
