#!/usr/bin/env python
"""CKNNA between two feature files (reference: tools/evaluate_alignment/
metrics.py:191-238 — top-k mutual-NN masked unbiased HSIC/CKA).

  python tools/evaluate_alignment/metrics.py --a feats_vfm.npz --b feats_vae.npz \
      [--topk 10] [--normalize]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--normalize", action="store_true", help="L2-normalize features")
    ap.add_argument("--biased", action="store_true")
    args = ap.parse_args()

    from vfm_vae_tpu.metrics.cknna import cknna

    da, db = np.load(args.a), np.load(args.b)
    names_a = list(da["names"]) if "names" in da else None
    names_b = list(db["names"]) if "names" in db else None
    fa, fb = da["features"], db["features"]
    if names_a and names_b:
        common = sorted(set(names_a) & set(names_b))
        ia = {n: i for i, n in enumerate(names_a)}
        ib = {n: i for i, n in enumerate(names_b)}
        fa = fa[[ia[n] for n in common]]
        fb = fb[[ib[n] for n in common]]
        print(f"matched {len(common)} images")
    if args.normalize:
        fa = fa / np.clip(np.linalg.norm(fa, axis=1, keepdims=True), 1e-8, None)
        fb = fb / np.clip(np.linalg.norm(fb, axis=1, keepdims=True), 1e-8, None)
    value = cknna(fa, fb, topk=args.topk, unbiased=not args.biased)
    print(f"CKNNA(topk={args.topk}): {value:.4f}")


if __name__ == "__main__":
    main()
