#!/usr/bin/env python
"""Decode stored latents to PNGs (reference: tools/decode/
decode_latents_to_images.py): shard .safetensors files across processes,
`vae.decode(latents, labels)` in fp32, save PNGs.

  python tools/decode/decode_latents_to_images.py --config <yaml> \
      --snapshot <orbax dir> --latents <dir with .safetensors> --out <dir>
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--latents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--key", default="latents")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image
    from safetensors.numpy import load_file

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "preprocess_for_lightningdit"))
    from prefetch import build_generator

    G, variables, _ = build_generator(args.config, args.snapshot)

    def decode(v, z):
        return G.apply(v, z, method=G.decode)

    # Files shard by rank across hosts (reference decode_latents_to_images
    # .py:49); each batch then shards over THIS host's chips via the local
    # data-axis mesh — one process drives all local devices.
    from vfm_vae_tpu.parallel import ShardedFn, replicate, serving_mesh

    mesh = serving_mesh()
    variables = replicate(mesh, variables)
    decode_sharded = ShardedFn(decode, args.batch, mesh=mesh, batch_argnums=(1,))

    os.makedirs(args.out, exist_ok=True)
    files = sorted(glob(os.path.join(args.latents, "*.safetensors")))
    rank, world = jax.process_index(), max(jax.process_count(), 1)
    files = files[rank::world]
    idx = 0
    for f in files:
        data = load_file(f)
        latents = data[args.key]  # NCHW storage
        z = np.transpose(latents, (0, 2, 3, 1))
        for i in range(0, z.shape[0], args.batch):
            out = decode_sharded(variables, z[i : i + args.batch].astype(np.float32))
            out_np = ((np.clip(out, -1, 1) + 1) * 127.5).astype(np.uint8)
            for j in range(out_np.shape[0]):
                PIL.Image.fromarray(out_np[j]).save(
                    os.path.join(args.out, f"{rank:02d}_{idx:08d}.png")
                )
                idx += 1
    print(f"decoded {idx} images to {args.out}")


if __name__ == "__main__":
    main()
