#!/usr/bin/env python
"""Feature extraction for SE-CKNNA (consolidates the reference's per-model
scripts under tools/evaluate_alignment/{vfms,vaes}/): mean-pooled spatial
features per image saved as an .npz {names, features}.

  # VFM features (frozen tower, random or converted weights):
  python tools/evaluate_alignment/extract_features.py vfm --model <name or dir> \
      --images <dir> --out feats_vfm.npz [--layer -1]

  # VFM-VAE latent features (vae.encode -> mean over H,W; reference
  # vaes/extract_features_by_vfm_vae.py:196-250):
  python tools/evaluate_alignment/extract_features.py vae --config <yaml> \
      --snapshot <dir> --images <dir> --out feats_vae.npz

  # Diffusion block features at a noise level (reference diffusions/
  # get_block_features_from_lightningdit.py: noise the stored latents to
  # x_t = (1-t)*z + t*eps, forward the DiT, token-mean after the embedder,
  # every block, and the final layer; one feature file per tap):
  python tools/evaluate_alignment/extract_features.py dit --config <dit yaml> \
      --snapshot <dit snapshot> --latents <shard dir> --out feats_dit \
      [--timestep 0.5] [--num 1000]

  # Same for a REG/SiT snapshot over posterior-moment shards (reference
  # diffusions/get_block_features_from_reg.py; emits projector_0 when the
  # snapshot carries REPA projector params):
  python tools/evaluate_alignment/extract_features.py reg --config <reg yaml> \
      --snapshot <reg snapshot> --latents <moment shard dir> --out feats_reg
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def iter_batches(image_dir: str, resolution: int, batch: int):
    import PIL.Image

    files = sorted(glob(os.path.join(image_dir, "*.png"))) + sorted(
        glob(os.path.join(image_dir, "*.jpg"))
    )
    for i in range(0, len(files), batch):
        chunk = files[i : i + batch]
        imgs = []
        for f in chunk:
            img = PIL.Image.open(f).convert("RGB")
            if img.size != (resolution, resolution):
                img = img.resize((resolution, resolution), PIL.Image.LANCZOS)
            imgs.append(np.array(img, np.uint8))
        yield [os.path.basename(f) for f in chunk], np.stack(imgs)


def extract_dit_features(args):
    """Block features from a trained LightningDiT or REG/SiT at one noise level.

    Mirrors the reference extractor family's semantics (diffusions/
    get_block_features_from_{lightningdit,reg}.py): stored latents are
    noised to x_t = alpha(t)*z + sigma(t)*eps (linear or cosine path,
    get_block_features_from_reg.py:256-271), forwarded once, and every
    tap's token-mean is saved to its own feature file named
    <out>_<tap>_t<timestep>.npz in the same {names, features} format
    metrics.py consumes.

    Mode differences, matching each family's trainer input convention:
      dit: latents are stats-normalized (latents_stats.npz) like the
           LightningDiT trainer's loader.
      reg: shards hold posterior moments (mean || std, 2C channels); the
           deterministic posterior mean is used (or a posterior sample with
           --sample-posterior), un-normalized — exactly what the REG trainer
           feeds the model. When the snapshot carries REPA projector params
           ({"dit","proj"} split), the projector output at the tapped block
           is emitted as projector_0 (get_block_features_from_reg.py:243-247).
    """
    from glob import glob as _glob

    import jax
    import jax.numpy as jnp
    import yaml
    from safetensors.numpy import load_file

    from vfm_vae_tpu.train.checkpoint import load_snapshot

    cfg = yaml.safe_load(open(args.config))
    dcfg = cfg.get("data", {})
    snap = load_snapshot(os.path.abspath(args.snapshot))
    params = snap.get("ema") or snap.get("params")
    params = jax.tree_util.tree_map(jnp.asarray, params)  # host numpy -> device

    projector = proj_params = None
    if args.mode == "reg":
        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "preprocess_for_reg")
        )
        from train import build_reg

        has_proj = isinstance(params, dict) and set(params) == {"dit", "proj"}
        model, projector, _, in_chans, _ = build_reg(cfg, with_projector=has_proj)
        if has_proj:
            proj_params, params = params["proj"], params["dit"]
    else:
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(__file__), "..", "preprocess_for_lightningdit"),
        )
        from sample import build_dit

        model, _, in_chans, _ = build_dit(cfg)

    # Deterministic pass over the shards in sorted order, first --num.
    files = sorted(_glob(os.path.join(args.latents, "*.safetensors")))
    files = [f for f in files if "stats" not in os.path.basename(f)]
    assert files, f"no latent shards in {args.latents}"

    stats_path = os.path.join(args.latents, "latents_stats.npz")
    if args.mode == "dit" and os.path.isfile(stats_path) and dcfg.get("latent_norm", True):
        st = np.load(stats_path)
        lat_mean = st["mean"].astype(np.float32).transpose(0, 2, 3, 1)
        lat_std = st["std"].astype(np.float32).transpose(0, 2, 3, 1)
    else:
        lat_mean = np.zeros((1, 1, 1, 1), np.float32)
        lat_std = np.ones_like(lat_mean)
    mult = float(dcfg.get("latent_multiplier", 1.0)) if args.mode == "dit" else 1.0

    if args.path_type == "linear":
        alpha_t, sigma_t = 1.0 - args.timestep, args.timestep
    else:  # cosine
        alpha_t = float(np.cos(args.timestep * np.pi / 2))
        sigma_t = float(np.sin(args.timestep * np.pi / 2))

    def step(z, y, rng):
        t = jnp.full((z.shape[0],), args.timestep, jnp.float32)
        if args.mode == "reg":
            mean, std = jnp.split(z, 2, axis=-1)
            if args.sample_posterior:
                rng, r_post = jax.random.split(rng)
                z = mean + std * jax.random.normal(r_post, mean.shape, mean.dtype)
            else:
                z = mean
        eps = jax.random.normal(rng, z.shape, z.dtype)
        x_t = alpha_t * z + sigma_t * eps
        _, feats = model.apply(
            {"params": params}, x_t, t, y, collect_block_features=True
        )
        tap = feats.pop("repa_tokens", None)
        if tap is not None and projector is not None:
            proj = projector.apply({"params": proj_params}, tap)
            feats["projector_0"] = jnp.mean(proj, axis=1)
        return feats

    # Batches shard over this host's chips (local data-axis mesh) — the
    # reference's per-GPU extractor processes collapse into one program.
    from vfm_vae_tpu.parallel import ShardedFn, serving_mesh

    step_sharded = ShardedFn(step, args.batch, mesh=serving_mesh(),
                             batch_argnums=(0, 1))

    rng = jax.random.PRNGKey(args.seed)
    names_all, feats_all = [], {}
    done = 0
    for f in files:
        if done >= args.num:
            break
        d = load_file(f)
        lat = d["latents"].transpose(0, 2, 3, 1)  # stored NCHW -> NHWC
        labels = d.get("labels", np.zeros((lat.shape[0],), np.int32))
        take = min(args.num - done, lat.shape[0])
        for i in range(0, take, args.batch):
            z = lat[i : i + args.batch].astype(np.float32)
            z = (z - lat_mean) / lat_std * mult
            y = np.asarray(labels[i : i + args.batch], np.int32)
            rng, sub = jax.random.split(rng)
            feats = step_sharded(z, y, sub)
            for k, v in feats.items():
                feats_all.setdefault(k, []).append(np.asarray(v, np.float32))
            names_all.extend(
                f"image_{done + i + j:06d}" for j in range(z.shape[0])
            )
        done += take
        print(f"{done}/{args.num} latents", flush=True)

    names = np.array(names_all)
    for k, chunks in feats_all.items():
        arr = np.concatenate(chunks)
        out_path = f"{args.out}_{k}_t{args.timestep:.3f}.npz"
        np.savez(out_path, names=names, features=arr,
                 feature_name=k, timestep=args.timestep)
    print(f"wrote {len(feats_all)} feature files "
          f"({args.out}_<tap>_t{args.timestep:.3f}.npz), {len(names)} images each")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["vfm", "vae", "dit", "reg"])
    ap.add_argument("--model", default="siglip2-large-patch16-512")
    ap.add_argument("--config")
    ap.add_argument("--snapshot")
    ap.add_argument("--images")
    ap.add_argument("--latents", help="latent shard dir (dit mode)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--layer", type=int, default=-1)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--timestep", type=float, default=0.5)
    ap.add_argument("--path-type", choices=["linear", "cosine"], default="linear")
    ap.add_argument("--sample-posterior", action="store_true",
                    help="reg mode: sample z from the stored moments instead "
                         "of using the posterior mean")
    ap.add_argument("--num", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.mode in ("dit", "reg"):
        extract_dit_features(args)
        return
    assert args.images, "--images is required for vfm/vae modes"

    names_all, feats_all = [], []

    if args.mode == "vfm":
        from vfm_vae_tpu.models.vfm import VFMEncoder

        enc = VFMEncoder(
            model_name=args.model, scale_factor=1.0, patch_from_layers=[args.layer]
        )
        init_img = jnp.zeros((1, args.resolution, args.resolution, 3))
        variables = jax.jit(
            lambda r: enc.init({"params": r}, init_img, method=enc.encode_image)
        )(jax.random.PRNGKey(0))

        def extract(v, x):
            feats, _ = enc.apply(v, x, method=enc.encode_image)
            return jnp.mean(feats[0], axis=1)  # mean over tokens

    else:
        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "preprocess_for_lightningdit")
        )
        from prefetch import build_generator

        G, variables, _ = build_generator(args.config, args.snapshot)

        def extract(v, x):
            z = G.apply(v, x, rng=None, method=G.encode)
            return jnp.mean(z, axis=(1, 2))  # mean over H, W

    # Shard batches over this host's chips (local data-axis mesh).
    from vfm_vae_tpu.parallel import ShardedFn, replicate, serving_mesh

    mesh = serving_mesh()
    variables = replicate(mesh, variables)
    extract_sharded = ShardedFn(extract, args.batch, mesh=mesh, batch_argnums=(1,))

    for names, imgs in iter_batches(args.images, args.resolution, args.batch):
        x = imgs.astype(np.float32) / 255.0
        feats_all.append(np.asarray(extract_sharded(variables, x), np.float32))
        names_all.extend(names)
        print(f"{len(names_all)} done", flush=True)

    np.savez(args.out, names=np.array(names_all), features=np.concatenate(feats_all))
    print(f"wrote {args.out}: {np.concatenate(feats_all).shape}")


if __name__ == "__main__":
    main()
