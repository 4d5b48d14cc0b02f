#!/usr/bin/env python
"""Paired-folder LPIPS / PSNR / SSIM (reference: tools/reconstruct/evaluate.py).

  python tools/reconstruct/evaluate.py --inputs <dir> --outputs <dir> \
      [--lpips-ckpt vgg.pth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", required=True)
    ap.add_argument("--outputs", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lpips-ckpt", default=None)
    args = ap.parse_args()

    import PIL.Image

    from vfm_vae_tpu.metrics.recon import evaluate_pairs

    names = sorted(os.listdir(args.inputs))
    assert names, "empty inputs folder"

    def pairs():
        for i in range(0, len(names), args.batch):
            chunk = names[i : i + args.batch]
            real = np.stack(
                [np.array(PIL.Image.open(os.path.join(args.inputs, n)).convert("RGB")) for n in chunk]
            ).astype(np.float32) / 255.0
            gen = np.stack(
                [np.array(PIL.Image.open(os.path.join(args.outputs, n)).convert("RGB")) for n in chunk]
            ).astype(np.float32) / 255.0
            yield real, gen

    lpips_module = lpips_params = None
    if args.lpips_ckpt:
        from vfm_vae_tpu.train.lpips import LPIPS, load_lpips_params

        lpips_module = LPIPS()
        lpips_params = load_lpips_params(args.lpips_ckpt)

    results = evaluate_pairs(pairs(), lpips_module, lpips_params)
    for k, v in results.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
