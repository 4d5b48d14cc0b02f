#!/usr/bin/env python
"""Latent prefetch for LightningDiT training (reference:
tools/preprocess_for_lightningdit/prefetch.py).

WDS shards -> ADM center-crop -> G.encode (sampled z) + hflipped copy ->
safetensors shards of 10k samples with the bit-compatible key contract
{latents, latents_flip, labels}; finally channel mean/std over a 10k sample
-> latents_stats.pt-equivalent (saved as latents_stats.safetensors + .npz).

  python tools/preprocess_for_lightningdit/prefetch.py --config <yaml> \
      --snapshot <orbax dir> --data <wds dir> --out <dir>
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def adm_center_crop(img, resolution: int) -> np.ndarray:
    """ADM-style center crop (reference prefetch.py:113-147): repeated BOX
    downsample by 2 while min side >= 2*res, then bicubic to scale, then
    center crop."""
    import PIL.Image

    while min(*img.size) >= 2 * resolution:
        img = img.resize(tuple(x // 2 for x in img.size), resample=PIL.Image.BOX)
    scale = resolution / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size), resample=PIL.Image.BICUBIC)
    arr = np.array(img.convert("RGB"))
    crop_y = (arr.shape[0] - resolution) // 2
    crop_x = (arr.shape[1] - resolution) // 2
    return arr[crop_y : crop_y + resolution, crop_x : crop_x + resolution]


def build_generator(config_path: str, snapshot: str):
    import jax
    import jax.numpy as jnp
    import flax.traverse_util as tu

    from vfm_vae_tpu.core.config import derive_config, load_config
    from vfm_vae_tpu.core.registry import get_class_by_name
    from vfm_vae_tpu.train.checkpoint import load_snapshot

    c = derive_config(load_config(config_path))
    gk = {k: v for k, v in c["G_kwargs"].items() if k != "class_name"}
    gk.update(use_kl_loss=False, use_vf_loss=False, use_adaptive_vf_loss=False,
              use_equivariance_regularization=False)
    G = get_class_by_name("networks.generator.Generator")(**gk)
    res = G.img_resolution
    variables = jax.jit(
        lambda r: G.init({"params": r}, jnp.zeros((1, res, res, 3)), train=False)
    )(jax.random.PRNGKey(0))
    snap = load_snapshot(os.path.abspath(snapshot))
    params = snap.get("ema_params") or snap.get("g_params")
    want = tu.flatten_dict(variables["params"], sep="/")
    got = tu.flatten_dict(params, sep="/")
    variables = {
        "params": tu.unflatten_dict({k: got.get(k, v) for k, v in want.items()}, sep="/"),
        "buffers": snap.get("g_bufs", variables.get("buffers", {})),
    }
    return G, variables, c


def main(return_moments: bool = False):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--data", required=True, help="dir with .tar shards")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--shard-size", type=int, default=10000)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--store-vfm-features", action="store_true",
                    help="also store the VFM last-layer tokens pooled to the "
                         "latent grid (fp16) as REPA alignment targets")
    ap.add_argument("--store-images", action="store_true",
                    help="also dump the ADM-cropped inputs as PNGs under "
                         "<out>/images/<class>/<key>.png with a per-rank "
                         "dataset json (reference preprocess_for_reg/"
                         "prefetch.py:264-270)")
    ap.add_argument("--int8", action="store_true",
                    help="serve the frozen tower in static-scale int8 "
                         "(calibrated on the first batch; 1.22x encode "
                         "on v5e, latent rel-L1 2.4%% — README W8A8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image
    import io
    from glob import glob
    from safetensors.numpy import save_file

    from vfm_vae_tpu.data.wds import iter_tar_samples

    G, variables, _ = build_generator(args.config, args.snapshot)

    def encode(v, img, rng):
        r1, r2 = jax.random.split(rng)
        if return_moments:
            m = G.apply(v, img, rng=None, return_z_before_quantize=True, method=G.encode)
            mf = G.apply(v, img[:, :, ::-1], rng=None, return_z_before_quantize=True, method=G.encode)
            from vfm_vae_tpu.models.distributions import mean_logvar_to_mean_std

            return mean_logvar_to_mean_std(m), mean_logvar_to_mean_std(mf)
        z = G.apply(v, img, rng=r1, method=G.encode)
        zf = G.apply(v, img[:, :, ::-1], rng=r2, method=G.encode)
        return z, zf

    def vfm_tokens(v, img):
        """Last-layer VFM tokens adaptively pooled to the latent grid
        (REPA targets; token count matches the DiT sequence)."""
        from vfm_vae_tpu.models.adapter import map_to_tokens, tokens_to_map
        from vfm_vae_tpu.ops.resize import adaptive_avg_pool2d

        feats, _ = G.apply(
            v, img, method=lambda m, i: m.vfm_encoder.encode_image(i)
        )
        f = tokens_to_map(feats[-1])
        zres = G.z_resolution
        if f.shape[1] != zres:
            f = adaptive_avg_pool2d(f, (zres, zres))
        return map_to_tokens(f)

    # Tars split by rank across hosts (reference prefetch.py:148-175
    # split_by_node); batches shard over this host's chips via the local
    # data-axis mesh. Prefetch is the encoder-throughput hot path
    # (SURVEY §3.5) — this is where the extra chips pay.
    from vfm_vae_tpu.parallel import ShardedFn, replicate, serving_mesh

    mesh = serving_mesh()
    variables = replicate(mesh, variables)
    encode_sharded = ShardedFn(encode, args.batch, mesh=mesh, batch_argnums=(1,))
    tokens_sharded = ShardedFn(vfm_tokens, args.batch, mesh=mesh, batch_argnums=(1,))

    os.makedirs(args.out, exist_ok=True)
    tars = sorted(glob(os.path.join(args.data, "**", "*.tar"), recursive=True))
    rank = jax.process_index()
    tars = tars[rank :: max(jax.process_count(), 1)]

    lat_buf, flip_buf, label_buf, feat_buf = [], [], [], []
    shard_idx = 0
    rng = jax.random.PRNGKey(rank)

    def flush():
        nonlocal shard_idx, lat_buf, flip_buf, label_buf, feat_buf
        if not lat_buf:
            return
        # NCHW storage to stay byte-compatible with the torch consumers.
        latents = np.concatenate(lat_buf).transpose(0, 3, 1, 2)
        latents_flip = np.concatenate(flip_buf).transpose(0, 3, 1, 2)
        labels = np.asarray(label_buf, np.int64)
        payload = {"latents": latents, "latents_flip": latents_flip, "labels": labels}
        if feat_buf:
            payload["vfm_features"] = np.concatenate(feat_buf).astype(np.float16)
        path = os.path.join(args.out, f"latents_rank{rank:02d}_shard{shard_idx:03d}.safetensors")
        save_file(payload, path)
        print(f"wrote {path} ({latents.shape[0]} samples)")
        shard_idx += 1
        lat_buf, flip_buf, label_buf, feat_buf = [], [], [], []

    images_dir = os.path.join(args.out, "images")
    image_records = []

    def store_image(arr: np.ndarray, key: str, label: int):
        """ADM ImageFolder layout: images/<class>/<key>.png + a record in
        the dataset-json labels format [["<class>/<key>.png", label], ...]."""
        sub = os.path.join(images_dir, f"{label:04d}")
        os.makedirs(sub, exist_ok=True)
        PIL.Image.fromarray(arr).save(os.path.join(sub, f"{key}.png"))
        image_records.append([f"{label:04d}/{key}.png", int(label)])

    imgs, labels = [], []
    for tar in tars:
        for raw in iter_tar_samples(tar):
            img_bytes = next((raw[e] for e in ("jpg", "jpeg", "png") if e in raw), None)
            if img_bytes is None:
                continue
            img = PIL.Image.open(io.BytesIO(img_bytes))
            crop = adm_center_crop(img, args.resolution)
            label = int(raw.get("cls", b"0").decode() or 0)
            if args.store_images:
                key = raw.get("__key__", b"").decode() or f"img{len(image_records):08d}"
                store_image(crop, key, label)
            imgs.append(crop)
            labels.append(label)
            if len(imgs) == args.batch:
                x = np.stack(imgs).astype(np.float32) / 255.0
                if args.int8:
                    from vfm_vae_tpu.ops.quantized import enable_int8_tower

                    variables = replicate(
                        mesh, enable_int8_tower(G, variables, jnp.asarray(x))
                    )
                    args.int8 = False  # calibrate once, on real data
                rng, sub = jax.random.split(rng)
                z, zf = encode_sharded(variables, x, sub)
                lat_buf.append(np.asarray(z, np.float32))
                flip_buf.append(np.asarray(zf, np.float32))
                label_buf.extend(labels)
                if args.store_vfm_features:
                    feat_buf.append(np.asarray(tokens_sharded(variables, x)))
                imgs, labels = [], []
                if sum(a.shape[0] for a in lat_buf) >= args.shard_size:
                    flush()
    flush()

    if args.store_images and image_records:
        import json

        with open(os.path.join(images_dir, f"dataset_rank{rank}.json"), "w") as f:
            json.dump({"labels": image_records}, f, indent=1)
        print(f"wrote {len(image_records)} images + dataset_rank{rank}.json")

    # Channel stats over the first shard sample (reference prefetch.py:58-83).
    if rank == 0 and shard_idx > 0:
        from safetensors.numpy import load_file

        first = load_file(
            os.path.join(args.out, "latents_rank00_shard000.safetensors")
        )["latents"][:10000]
        mean = first.mean(axis=(0, 2, 3), keepdims=True)
        std = first.std(axis=(0, 2, 3), keepdims=True)
        np.savez(os.path.join(args.out, "latents_stats.npz"), mean=mean, std=std)
        save_file(
            {"mean": mean.astype(np.float32), "std": std.astype(np.float32)},
            os.path.join(args.out, "latents_stats.safetensors"),
        )
        print("wrote latents_stats")


if __name__ == "__main__":
    main(return_moments=False)
