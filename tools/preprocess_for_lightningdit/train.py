#!/usr/bin/env python
"""LightningDiT trainer over prefetched latents (reference:
tools/preprocess_for_lightningdit/train.py, accelerate-based fork).

Reads the safetensors latent shards written by prefetch.py, normalizes with
latents_stats, trains LightningDiT-XL/1 (flow matching, lognorm + cosine
loss per stage-0 yaml) with EMA, data-parallel over the local mesh.

  python tools/preprocess_for_lightningdit/train.py --config <yaml>
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


def latent_batches(data_dir: str, batch_size: int, rng: np.random.Generator,
                   use_flip: bool = True):
    """Infinite stream over latent shards ({latents, latents_flip, labels})."""
    from safetensors.numpy import load_file

    files = sorted(glob(os.path.join(data_dir, "*.safetensors")))
    files = [f for f in files if "stats" not in os.path.basename(f)]
    assert files, f"no latent shards in {data_dir}"
    while True:
        rng.shuffle(files)
        for f in files:
            d = load_file(f)
            lat = d["latents"]
            flip = d.get("latents_flip")
            labels = d["labels"]
            idx = rng.permutation(lat.shape[0])
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                sel = idx[i : i + batch_size]
                x = lat[sel]
                if use_flip and flip is not None:
                    take_flip = rng.random(len(sel)) < 0.5
                    x = np.where(take_flip[:, None, None, None], flip[sel], x)
                yield x.transpose(0, 2, 3, 1), labels[sel]  # NHWC


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import yaml

    from vfm_vae_tpu.models.dit import LightningDiT
    from vfm_vae_tpu.parallel import local_mesh, shard_batch
    from vfm_vae_tpu.train.transport import flow_matching_loss
    from vfm_vae_tpu.train.checkpoint import save_snapshot

    cfg = yaml.safe_load(open(args.config))
    mcfg = cfg.get("model", {})
    tcfg = cfg.get("train", {})
    ocfg = cfg.get("optimizer", {})
    pcfg = cfg.get("transport", {})
    dcfg = cfg.get("data", {})

    size_map = {"XL": (1152, 28, 16), "L": (1024, 24, 16), "B": (768, 12, 12)}
    mt = mcfg.get("model_type", "LightningDiT-XL/1")
    size_key = mt.split("-")[1].split("/")[0]
    hidden, depth, heads = size_map[size_key]
    patch = int(mt.split("/")[1])
    downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
    input_size = dcfg.get("image_size", 256) // downsample

    model = LightningDiT(
        input_size=input_size,
        patch_size=patch,
        in_channels=mcfg.get("in_chans", 32),
        hidden_size=hidden,
        depth=depth,
        num_heads=heads,
        num_classes=dcfg.get("num_classes", 1000),
        use_qknorm=mcfg.get("use_qknorm", True),
        use_swiglu=mcfg.get("use_swiglu", True),
        use_rope=mcfg.get("use_rope", True),
        use_rmsnorm=mcfg.get("use_rmsnorm", True),
    )

    data_dir = dcfg["data_path"]
    stats_path = os.path.join(data_dir, "latents_stats.npz")
    if os.path.isfile(stats_path) and dcfg.get("latent_norm", True):
        st = np.load(stats_path)
        lat_mean = st["mean"].astype(np.float32)
        lat_std = st["std"].astype(np.float32)
    else:
        lat_mean = np.zeros((1, mcfg.get("in_chans", 32), 1, 1), np.float32)
        lat_std = np.ones_like(lat_mean)
    mult = float(dcfg.get("latent_multiplier", 1.0))

    batch_size = tcfg.get("global_batch_size", 1024)
    rng_np = np.random.default_rng(tcfg.get("global_seed", 0))
    it = latent_batches(data_dir, batch_size, rng_np)

    x0, y0 = next(it)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2,) + x0.shape[1:]), jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
    )["params"]
    tx = optax.adamw(ocfg.get("lr", 2e-4), b1=0.9, b2=ocfg.get("beta2", 0.95), weight_decay=0.0)
    opt = tx.init(params)
    ema = params

    mesh = local_mesh()
    mean_j = jnp.asarray(lat_mean.transpose(0, 2, 3, 1))
    std_j = jnp.asarray(lat_std.transpose(0, 2, 3, 1))

    def model_fn(p, x, t, y, rng):
        return model.apply({"params": p}, x, t, y, train=rng is not None, rng=rng)

    @jax.jit
    def step(params, opt, ema, x, y, rng):
        x = (x - mean_j) / std_j * mult

        def lf(p):
            return flow_matching_loss(
                model_fn, p, x, y, rng,
                use_lognorm=pcfg.get("use_lognorm", True),
                use_cosine_loss=pcfg.get("use_cosine_loss", True),
            )

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(lambda e, p: e * 0.9999 + p * 0.0001, ema, params)
        return params, opt, ema, loss

    out_dir = os.path.join(tcfg.get("output_dir", "runs/dit"), tcfg.get("exp_name", "exp"))
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(tcfg.get("global_seed", 0))
    max_steps = args.max_steps or tcfg.get("max_steps", 600000)
    log_every = tcfg.get("log_every", 100)
    ckpt_every = tcfg.get("ckpt_every", 10000)

    t0 = time.time()
    with jax.sharding.set_mesh(mesh):
        for step_idx in range(max_steps):
            x, y = (x0, y0) if step_idx == 0 else next(it)
            xb = shard_batch(mesh, jnp.asarray(x, jnp.float32))
            yb = shard_batch(mesh, jnp.asarray(y, jnp.int32))
            rng, sub = jax.random.split(rng)
            params, opt, ema, loss = step(params, opt, ema, xb, yb, sub)
            if step_idx % log_every == 0:
                print(
                    json.dumps(
                        {"step": step_idx, "loss": float(loss), "sec": time.time() - t0}
                    ),
                    flush=True,
                )
            if step_idx > 0 and step_idx % ckpt_every == 0:
                import flax.serialization as ser

                save_snapshot(out_dir, step_idx, {
                    "params": ser.to_state_dict(params),
                    "ema": ser.to_state_dict(ema),
                })
    print("training done")


if __name__ == "__main__":
    main()
