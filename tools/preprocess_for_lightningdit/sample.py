#!/usr/bin/env python
"""Sample a trained LightningDiT + decode through the VFM-VAE tokenizer
(reference: tools/preprocess_for_lightningdit/sample.py, ODE-euler).

  python tools/preprocess_for_lightningdit/sample.py --config <dit yaml> \
      --dit-snapshot <dir> --vae-config <vae yaml> --vae-snapshot <dir> \
      --out samples/ --num 50000 [--cfg 1.0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build_dit(cfg: dict):
    """LightningDiT from a tool YAML (model_type 'LightningDiT-<size>/<p>').
    Returns (model, input_size, in_chans, num_classes). Shared with the
    SE-CKNNA diffusion-feature extractor (evaluate_alignment)."""
    from vfm_vae_tpu.models.dit import LightningDiT

    mcfg = cfg.get("model", {})
    dcfg = cfg.get("data", {})
    # "T" is a dev/test size with no reference counterpart.
    size_map = {"XL": (1152, 28, 16), "L": (1024, 24, 16), "B": (768, 12, 12),
                "T": (64, 2, 4)}
    mt = mcfg.get("model_type", "LightningDiT-XL/1")
    hidden, depth, heads = size_map[mt.split("-")[1].split("/")[0]]
    downsample = cfg.get("vae", {}).get("downsample_ratio", 16)
    input_size = dcfg.get("image_size", 256) // downsample
    in_chans = mcfg.get("in_chans", 32)
    num_classes = dcfg.get("num_classes", 1000)
    model = LightningDiT(
        input_size=input_size, patch_size=int(mt.split("/")[1]), in_channels=in_chans,
        hidden_size=hidden, depth=depth, num_heads=heads, num_classes=num_classes,
        use_qknorm=mcfg.get("use_qknorm", True), use_swiglu=mcfg.get("use_swiglu", True),
        use_rope=mcfg.get("use_rope", True), use_rmsnorm=mcfg.get("use_rmsnorm", True),
    )
    return model, input_size, in_chans, num_classes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dit-snapshot", required=True)
    ap.add_argument("--vae-config", required=True)
    ap.add_argument("--vae-snapshot", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=50000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg", type=float, default=1.0)
    ap.add_argument("--mode", choices=["ode", "sde"], default="ode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image
    import yaml

    from vfm_vae_tpu.train.checkpoint import load_snapshot
    from vfm_vae_tpu.train.transport import ode_euler_sample, sde_sample

    sys.path.insert(0, os.path.dirname(__file__))
    from prefetch import build_generator

    cfg = yaml.safe_load(open(args.config))
    dcfg = cfg.get("data", {})
    model, input_size, in_chans, num_classes = build_dit(cfg)
    snap = load_snapshot(os.path.abspath(args.dit_snapshot))
    dit_params = snap.get("ema") or snap.get("params")
    # Snapshots restore as host numpy; as a jit closure constant a numpy
    # class-embedding table cannot be indexed by a traced label array.
    dit_params = jax.tree_util.tree_map(jnp.asarray, dit_params)

    G, vae_vars, _ = build_generator(args.vae_config, args.vae_snapshot)

    stats_path = os.path.join(dcfg.get("data_path", "."), "latents_stats.npz")
    if os.path.isfile(stats_path):
        st = np.load(stats_path)
        mean = jnp.asarray(st["mean"].transpose(0, 2, 3, 1))
        std = jnp.asarray(st["std"].transpose(0, 2, 3, 1))
    else:
        mean, std = 0.0, 1.0

    def model_fn(p, x, t, y, rng):
        return model.apply({"params": p}, x, t, y)

    sampler = ode_euler_sample if args.mode == "ode" else sde_sample

    def gen_batch(rng, labels):
        z = sampler(
            model_fn, dit_params, rng,
            (labels.shape[0], input_size, input_size, in_chans),
            labels=labels, num_steps=args.steps, cfg_scale=args.cfg,
        )
        z = z * std + mean  # de-normalize to the tokenizer latent space
        img = G.apply(vae_vars, z, method=G.decode)
        return jnp.clip(img, -1, 1)

    # Sample/decode batches shard over this host's chips (the reference's
    # torchrun-per-GPU sampler collapses into one process; cross-host runs
    # split `--num` by invocation).
    from vfm_vae_tpu.parallel import ShardedFn, serving_mesh

    gen_sharded = ShardedFn(gen_batch, args.batch, mesh=serving_mesh(),
                            batch_argnums=(1,))

    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    idx = 0
    per_class = max(1, args.num // num_classes)
    while idx < args.num:
        rng, r1, r2 = jax.random.split(rng, 3)
        labels = np.asarray(
            jax.random.randint(r1, (args.batch,), 0, num_classes))
        imgs = ((gen_sharded(r2, labels) + 1) * 127.5).astype(np.uint8)
        for j in range(imgs.shape[0]):
            if idx >= args.num:
                break
            PIL.Image.fromarray(imgs[j]).save(os.path.join(args.out, f"{idx:06d}.png"))
            idx += 1
        print(f"{idx}/{args.num}", flush=True)
    print(f"wrote {idx} samples to {args.out}")


if __name__ == "__main__":
    main()
