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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["vfm", "vae"])
    ap.add_argument("--model", default="siglip2-large-patch16-512")
    ap.add_argument("--config")
    ap.add_argument("--snapshot")
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--layer", type=int, default=-1)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

        @jax.jit
        def extract(x):
            feats, _ = enc.apply(variables, x, method=enc.encode_image)
            return jnp.mean(feats[0], axis=1)  # mean over tokens

    else:
        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "preprocess_for_lightningdit")
        )
        from prefetch import build_generator

        G, variables, _ = build_generator(args.config, args.snapshot)

        @jax.jit
        def extract(x):
            z = G.apply(variables, x, rng=None, method=G.encode)
            return jnp.mean(z, axis=(1, 2))  # mean over H, W

    for names, imgs in iter_batches(args.images, args.resolution, args.batch):
        x = jnp.asarray(imgs, jnp.float32) / 255.0
        feats_all.append(np.asarray(extract(x), np.float32))
        names_all.extend(names)
        print(f"{len(names_all)} done", flush=True)

    np.savez(args.out, names=np.array(names_all), features=np.concatenate(feats_all))
    print(f"wrote {args.out}: {np.concatenate(feats_all).shape}")


if __name__ == "__main__":
    main()
