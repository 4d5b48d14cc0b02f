#!/usr/bin/env python
"""Untar WDS validation shards into a flat image folder
(reference: tools/reconstruct/extract.py).

  python tools/reconstruct/extract.py --tars <dir with .tar> --out <dir>
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
from glob import glob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tars", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    tars = sorted(glob(os.path.join(args.tars, "**", "*.tar"), recursive=True))
    count = 0
    for t in tars:
        with tarfile.open(t) as tf:
            for m in tf:
                if m.isfile() and m.name.lower().endswith((".png", ".jpg", ".jpeg")):
                    data = tf.extractfile(m).read()
                    name = os.path.basename(m.name)
                    with open(os.path.join(args.out, name), "wb") as f:
                        f.write(data)
                    count += 1
    print(f"Extracted {count} images from {len(tars)} shards to {args.out}")


if __name__ == "__main__":
    main()
