#!/usr/bin/env python
"""Emit the label json matching decode_latents_to_images' file split
(reference: tools/decode/decode_latents_to_labels.py): maps each decoded
PNG name to its class label, for the ADM evaluator.

  python tools/decode/decode_latents_to_labels.py --latents <dir> --out labels.json
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world", type=int, default=1)
    args = ap.parse_args()

    from safetensors.numpy import load_file

    files = sorted(glob(os.path.join(args.latents, "*.safetensors")))
    files = [f for f in files if "stats" not in os.path.basename(f)]
    files = files[args.rank :: args.world]
    mapping = {}
    idx = 0
    for f in files:
        labels = load_file(f)["labels"]
        for l in labels:
            mapping[f"{args.rank:02d}_{idx:08d}.png"] = int(l)
            idx += 1
    with open(args.out, "w") as f:
        json.dump(mapping, f)
    print(f"wrote {len(mapping)} labels to {args.out}")


if __name__ == "__main__":
    main()
