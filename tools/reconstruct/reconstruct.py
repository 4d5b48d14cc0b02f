#!/usr/bin/env python
"""Reconstruction dump for rFID (reference: tools/reconstruct/reconstruct.py).

Folder of images -> resize/center-crop -> G_ema encode+decode (validation,
fp32) -> paired inputs/ and outputs/ PNGs, ready for FID tooling.

  python tools/reconstruct/reconstruct.py --config <yaml> \
      --snapshot <orbax dir> --data <image folder> --out <out dir>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def iter_image_files(root):
    exts = (".png", ".jpg", ".jpeg")
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(exts):
                yield os.path.join(dirpath, f)


def load_and_crop(path: str, resolution: int) -> np.ndarray:
    import PIL.Image

    img = PIL.Image.open(path).convert("RGB")
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), PIL.Image.LANCZOS)
    w, h = img.size
    left, top = (w - resolution) // 2, (h - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    return np.array(img, np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--sample-posterior", action="store_true",
                    help="sample z (reference always samples)")
    ap.add_argument("--int8", action="store_true",
                    help="serve the frozen tower in static-scale int8 "
                         "(1.11x e2e on v5e, decode PSNR 46 dB vs bf16; "
                         "README 'W8A8 int8 serving')")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from vfm_vae_tpu.core.config import derive_config, load_config
    from vfm_vae_tpu.core.registry import get_class_by_name
    from vfm_vae_tpu.train.checkpoint import load_snapshot

    c = derive_config(load_config(args.config))
    gk = {k: v for k, v in c["G_kwargs"].items() if k != "class_name"}
    # Eval overrides (reference reconstruct.py:106-113): fp32, no aux losses.
    gk.update(use_kl_loss=False, use_vf_loss=False, use_adaptive_vf_loss=False,
              use_equivariance_regularization=False)
    G = get_class_by_name("networks.generator.Generator")(**gk)

    res = G.img_resolution
    init_img = jnp.zeros((1, res, res, 3))
    variables = jax.jit(lambda r: G.init({"params": r}, init_img, train=False))(jax.random.PRNGKey(0))
    snap = load_snapshot(os.path.abspath(args.snapshot))
    params = snap.get("ema_params") or snap.get("g_params")
    assert params is not None, "snapshot has no generator params"
    import flax.traverse_util as tu

    want = tu.flatten_dict(variables["params"], sep="/")
    got = tu.flatten_dict(params, sep="/")
    merged = {k: got.get(k, v) for k, v in want.items()}
    variables = {
        "params": tu.unflatten_dict(merged, sep="/"),
        "buffers": snap.get("g_bufs", variables.get("buffers", {})),
    }

    def recon(v, img, rng):
        z = G.apply(v, img, rng=rng, method=G.encode)
        return G.apply(v, z, method=G.decode)

    os.makedirs(os.path.join(args.out, "inputs"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "outputs"), exist_ok=True)

    files = list(iter_image_files(args.data))
    if args.max_images:
        files = files[: args.max_images]
    # Rank split of the file list across hosts (the reference's
    # DistributedSampler, tools/reconstruct/reconstruct.py:64-66,116-122),
    # then a local data-axis mesh shards each batch over THIS host's chips
    # — the reference's torchrun-per-GPU collapses into one process.
    from vfm_vae_tpu.parallel import ShardedFn, process_shard, replicate, serving_mesh

    rank = jax.process_index()
    files = process_shard(files)
    mesh = serving_mesh()

    if args.int8:
        from vfm_vae_tpu.ops.quantized import enable_int8_tower

        calib = np.stack(
            [load_and_crop(f, res) for f in files[: min(32, len(files))]]
        )
        variables = enable_int8_tower(
            G, variables, jnp.asarray(calib, jnp.float32) / 255.0
        )
    variables = replicate(mesh, variables)
    recon_sharded = ShardedFn(recon, args.batch, mesh=mesh, batch_argnums=(1,))

    print(f"Reconstructing {len(files)} images at {res}px "
          f"on {mesh.devices.size} device(s) ...")
    rng = jax.random.PRNGKey(rank)
    for i in range(0, len(files), args.batch):
        chunk = files[i : i + args.batch]
        imgs = np.stack([load_and_crop(f, res) for f in chunk])
        x = imgs.astype(np.float32) / 255.0
        rng, sub = jax.random.split(rng)
        out = recon_sharded(variables, x, sub if args.sample_posterior else sub)
        out_np = ((np.clip(out, -1, 1) + 1) * 127.5).astype(np.uint8)
        for j, f in enumerate(chunk):
            # Single-host keeps the historical flat names; multi-host
            # prefixes rank so shards of the split can't collide.
            name = (f"{i + j:08d}.png" if jax.process_count() == 1
                    else f"{rank:02d}_{i + j:08d}.png")
            PIL.Image.fromarray(imgs[j]).save(os.path.join(args.out, "inputs", name))
            PIL.Image.fromarray(out_np[j]).save(os.path.join(args.out, "outputs", name))
    print(f"Wrote pairs to {args.out}/inputs and {args.out}/outputs")


if __name__ == "__main__":
    main()
