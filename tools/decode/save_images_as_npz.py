#!/usr/bin/env python
"""Pack a folder of PNGs into an ADM-evaluator style .npz
(reference: tools/decode/save_images_as_npz.py).

  python tools/decode/save_images_as_npz.py --images <dir> --out samples.npz
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max", type=int, default=50000)
    args = ap.parse_args()

    import PIL.Image

    files = sorted(glob(os.path.join(args.images, "*.png")))[: args.max]
    arr = np.stack([np.array(PIL.Image.open(f).convert("RGB")) for f in files])
    np.savez(args.out, arr_0=arr)
    print(f"wrote {args.out}: {arr.shape}")


if __name__ == "__main__":
    main()
