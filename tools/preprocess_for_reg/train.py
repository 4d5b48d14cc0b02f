#!/usr/bin/env python
"""REG (SiT-XL/1) trainer over prefetched posterior moments (reference:
tools/preprocess_for_reg/train.py — SiT + REPA-style projector fork).

Differences from the LightningDiT trainer:
  * latents are stored as (mean || std) moments; each step samples the
    posterior z = mean + std * eps (reference train.py:79-81
    `sample_posterior`).
  * optional REPA alignment: a projector from mid-block DiT features to the
    VFM token representation (token cosine loss), enabled by
    model.repa_weight > 0 in the config; targets come from the
    `vfm_features` key written by prefetch.py --store-vfm-features.

  python tools/preprocess_for_reg/train.py --config <yaml>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def moment_batches(data_dir: str, batch_size: int, rng: np.random.Generator):
    from safetensors.numpy import load_file

    files = sorted(glob(os.path.join(data_dir, "*.safetensors")))
    files = [f for f in files if "stats" not in os.path.basename(f)]
    assert files, f"no moment shards in {data_dir}"
    while True:
        rng.shuffle(files)
        for f in files:
            d = load_file(f)
            mom = d["latents"]  # (N, 2C, H, W): mean || std
            flip = d.get("latents_flip")
            labels = d["labels"]
            feats = d.get("vfm_features")  # (N, T, D) fp16 REPA targets
            idx = rng.permutation(mom.shape[0])
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                sel = idx[i : i + batch_size]
                x = mom[sel]
                if flip is not None:
                    take = rng.random(len(sel)) < 0.5
                    x = np.where(take[:, None, None, None], flip[sel], x)
                yield (
                    x.transpose(0, 2, 3, 1), labels[sel],
                    feats[sel].astype(np.float32) if feats is not None else None,
                )


def build_reg(cfg: dict, with_projector: bool = None):
    """SiT-style LightningDiT + optional REPA projector from a REG YAML.

    Returns (model, projector, input_size, in_chans, repa_weight). The model
    taps `repa_block` (return_features_at) whenever a projector is built.
    Shared between the trainer and the SE-CKNNA diffusion-feature extractor
    (tools/evaluate_alignment), which needs the identical construction to
    restore trainer snapshots.
    """
    import jax
    from flax import linen as _nn

    from vfm_vae_tpu.models.dit import LightningDiT
    from vfm_vae_tpu.models.layers import Linear as _Linear

    mcfg = cfg.get("model", {})
    dcfg = cfg.get("data", {})
    in_chans = mcfg.get("in_chans", 32)
    input_size = mcfg.get("latent_size", 16)
    repa_weight = float(mcfg.get("repa_weight", 0.0))
    repa_block = int(mcfg.get("repa_block", 8))
    repa_dim = int(mcfg.get("repa_target_dim", 1024))
    if with_projector is None:
        with_projector = repa_weight > 0
    model = LightningDiT(
        input_size=input_size, patch_size=1, in_channels=in_chans,
        hidden_size=mcfg.get("hidden_size", 1152), depth=mcfg.get("depth", 28),
        num_heads=mcfg.get("num_heads", 16),
        num_classes=dcfg.get("num_classes", 1000),
        use_qknorm=mcfg.get("use_qknorm", True),
        use_swiglu=mcfg.get("use_swiglu", False),
        use_rope=mcfg.get("use_rope", False),
        use_rmsnorm=mcfg.get("use_rmsnorm", False),
        return_features_at=repa_block if with_projector else None,
    )

    class _Projector(_nn.Module):
        """REPA projector: DiT tokens -> VFM feature dim (MLP, silu)."""

        out_dim: int

        @_nn.compact
        def __call__(self, x):
            h = _Linear(x.shape[-1], 2 * self.out_dim, name="fc1")(x)
            h = jax.nn.silu(h)
            return _Linear(2 * self.out_dim, self.out_dim, name="fc2")(h)

    projector = _Projector(repa_dim) if with_projector else None
    return model, projector, input_size, in_chans, repa_weight


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import yaml

    from vfm_vae_tpu.parallel import local_mesh, shard_batch
    from vfm_vae_tpu.train.transport import flow_matching_loss
    from vfm_vae_tpu.train.checkpoint import save_snapshot

    cfg = yaml.safe_load(open(args.config))
    mcfg = cfg.get("model", {})
    tcfg = cfg.get("train", {})
    dcfg = cfg.get("data", {})

    model, projector, input_size, in_chans, repa_weight = build_reg(cfg)

    batch_size = tcfg.get("global_batch_size", 256)
    rng_np = np.random.default_rng(tcfg.get("global_seed", 0))
    it = moment_batches(dcfg["data_path"], batch_size, rng_np)

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, input_size, input_size, in_chans)),
        jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
    )["params"]
    if repa_weight > 0:
        hdim = mcfg.get("hidden_size", 1152)
        proj_params = projector.init(
            jax.random.PRNGKey(1), jnp.zeros((1, input_size * input_size, hdim))
        )["params"]
        params = {"dit": params, "proj": proj_params}
    tx = optax.adamw(cfg.get("optimizer", {}).get("lr", 1e-4), b1=0.9, b2=0.999)
    opt = tx.init(params)
    ema = params

    def model_fn(p, x, t, y, rng):
        if repa_weight > 0:
            out, tap = model.apply(
                {"params": p["dit"]}, x, t, y, train=rng is not None, rng=rng
            )
            proj = projector.apply({"params": p["proj"]}, tap)
            return out, proj
        return model.apply({"params": p}, x, t, y, train=rng is not None, rng=rng)

    @jax.jit
    def step(params, opt, ema, moments, y, rng, repa_targets=None):
        r_post, r_fm = jax.random.split(rng)
        mean, std = jnp.split(moments, 2, axis=-1)
        z = mean + std * jax.random.normal(r_post, mean.shape)  # sample_posterior

        def lf(p):
            return flow_matching_loss(
                model_fn, p, z, y, r_fm, use_lognorm=False,
                repa_targets=repa_targets, repa_weight=repa_weight,
            )

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(lambda e, p: e * 0.9999 + p * 0.0001, ema, params)
        return params, opt, ema, loss

    out_dir = os.path.join(tcfg.get("output_dir", "runs/reg"), tcfg.get("exp_name", "exp"))
    os.makedirs(out_dir, exist_ok=True)
    mesh = local_mesh()
    rng = jax.random.PRNGKey(tcfg.get("global_seed", 0))
    max_steps = args.max_steps or tcfg.get("max_steps", 400000)
    t0 = time.time()
    with jax.sharding.set_mesh(mesh):
        for step_idx in range(max_steps):
            x, y, feats = next(it)
            if repa_weight > 0:
                assert feats is not None, "repa_weight>0 needs shards with vfm_features"
            xb = shard_batch(mesh, jnp.asarray(x, jnp.float32))
            yb = shard_batch(mesh, jnp.asarray(y, jnp.int32))
            fb = shard_batch(mesh, jnp.asarray(feats)) if (repa_weight > 0) else None
            rng, sub = jax.random.split(rng)
            params, opt, ema, loss = step(params, opt, ema, xb, yb, sub, fb)
            if step_idx % tcfg.get("log_every", 100) == 0:
                print(json.dumps({"step": step_idx, "loss": float(loss),
                                  "sec": time.time() - t0}), flush=True)
            if step_idx > 0 and step_idx % tcfg.get("ckpt_every", 10000) == 0:
                import flax.serialization as ser

                save_snapshot(out_dir, step_idx, {
                    "params": ser.to_state_dict(params), "ema": ser.to_state_dict(ema),
                })
    print("training done")


if __name__ == "__main__":
    main()
