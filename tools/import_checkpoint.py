#!/usr/bin/env python
"""Import a reference VFM-VAE torch snapshot (.pth) into this framework.

Usage:
  python tools/import_checkpoint.py --pth network-snapshot-XXXX.pth \
      --config configs/vfm_vae_f16d32_siglip2_stage_0_strong_alignment.yaml \
      --out runs/imported

Loads {G, D, G_ema} state dicts (reference format, training_loop.py:781-801),
converts layouts (models/convert.py) and writes an orbax snapshot our
training loop / tools can resume from. Needed to reproduce the published
rFID 0.52 without retraining (SURVEY.md M1/M2).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--kimg", type=int, default=0)
    args = ap.parse_args()

    import torch

    from vfm_vae_tpu.core.config import derive_config, load_config
    from vfm_vae_tpu.models.convert import convert_generator, convert_projected_discriminator
    from vfm_vae_tpu.models.synthesis import synthesis_channels
    from vfm_vae_tpu.train.checkpoint import save_snapshot, snapshot_name

    c = derive_config(load_config(args.config))
    G_kwargs = {k: v for k, v in c["G_kwargs"].items() if k != "class_name"}

    print(f"Loading {args.pth} ...")
    snap = torch.load(args.pth, map_location="cpu", weights_only=False)

    def to_np(sd):
        return {k: np.array(v.detach().cpu().numpy(), copy=True) for k, v in sd.items()}

    sk = G_kwargs.get("synthesis_kwargs", {})
    block_res = synthesis_channels(
        G_kwargs.get("img_resolution", 256),
        G_kwargs.get("num_blocks", 6),
        sk.get("channel_base", 32768),
        sk.get("channel_max", 512),
    )[0]
    conv_args = dict(
        how_to_compress=G_kwargs.get("how_to_compress", "attnproj"),
        how_to_decompress=G_kwargs.get("how_to_decompress", "attnproj"),
        compression_mode=G_kwargs.get("compression_mode", "continuous"),
        use_vf_loss=bool(G_kwargs.get("use_vf_loss", True)),
        legacy=bool(G_kwargs.get("legacy", False)),
        z_resolution=G_kwargs.get("img_resolution", 256)
        // G_kwargs.get("resolution_compression_factor", 16),
        concat_z_block_indices=G_kwargs.get("concat_z_block_indices", []),
        block_resolutions=block_res,
    )

    out = {}
    for key in ("G", "G_ema"):
        if key in snap:
            sd = to_np(snap[key] if isinstance(snap[key], dict) else snap[key].state_dict())
            params, buffers = convert_generator(sd, **conv_args)
            out[f"{'g' if key == 'G' else 'ema'}_params"] = params
            if key == "G":
                out["g_bufs"] = buffers
    if "D" in snap:
        sd = to_np(snap["D"] if isinstance(snap["D"], dict) else snap["D"].state_dict())
        D_kwargs = c.get("D_kwargs", {})
        try:
            d_params, d_bufs = convert_projected_discriminator(
                sd,
                c_dim=0,
                use_stylegan_t=D_kwargs.get("use_stylegan_t_discriminator", True),
                use_patchgan=D_kwargs.get("use_patchgan_discriminator", False),
                get_interm_feat=D_kwargs.get("get_interm_feat", False),
            )
            out["d_params"] = d_params
            out["d_bufs"] = d_bufs
        except KeyError as e:
            print(f"[warn] discriminator conversion incomplete ({e}); skipping D")

    os.makedirs(args.out, exist_ok=True)
    path = save_snapshot(args.out, args.kimg, out)
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
