#!/usr/bin/env python
"""SE-CKNNA preprocessing (reference: tools/evaluate_alignment/
preprocess.py): deterministic per-image equivariance transform records
(seed+idx keyed) and Gaussian-noise image sets.

  python tools/evaluate_alignment/preprocess.py equivariance --input-dir X --output-dir Y
  python tools/evaluate_alignment/preprocess.py noise --input-dir X --output-dir Y \
      --noise-levels 0.05 0.1
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def apply_noise(image: np.ndarray, noise_level: float, idx: int, seed: int) -> np.ndarray:
    """Deterministic Gaussian noise keyed by (seed + idx)."""
    rng = np.random.RandomState(seed + idx)
    noise = rng.normal(0, noise_level, image.shape).astype(np.float32)
    return np.clip(image + noise * 255.0, 0, 255).astype(np.uint8)


def get_transformation_params(idx: int, seed: int) -> dict:
    rng = np.random.RandomState(seed + idx)
    rotation = int(rng.choice([0, 90, 180, 270]))
    scale = float(rng.choice([1.0, 0.75, 0.5, 0.25]))
    return {"rotation": rotation, "scale": scale}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["equivariance", "noise"])
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--noise-levels", type=float, nargs="+", default=[0.05, 0.1, 0.2])
    args = ap.parse_args()

    import PIL.Image

    paths = sorted(Path(args.input_dir).glob("*.png"), key=lambda p: p.stem)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    if args.mode == "equivariance":
        records = {
            p.stem: get_transformation_params(i, args.seed) for i, p in enumerate(paths)
        }
        with open(out / "equivariance_transforms.json", "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {len(records)} records to {out / 'equivariance_transforms.json'}")
    else:
        for level in args.noise_levels:
            d = out / f"noise_{level:.3f}"
            d.mkdir(exist_ok=True)
            for i, p in enumerate(paths):
                img = PIL.Image.open(p).convert("RGB")
                if img.size != (args.resolution, args.resolution):
                    img = img.resize((args.resolution, args.resolution), PIL.Image.LANCZOS)
                arr = apply_noise(np.array(img, np.uint8), level, i, args.seed)
                PIL.Image.fromarray(arr).save(d / p.name)
            print(f"wrote noise level {level} to {d}")


if __name__ == "__main__":
    main()
