#!/usr/bin/env python
"""Folder-level FID / Inception Score (the role of the external
`torch-fidelity` CLI in the reference's reconstruction-eval recipe,
/root/reference/README.md:341-357 — `fidelity --fid --isc --input1
outputs --input2 inputs`). Streams both folders through the
InceptionV3 detector (`vfm_vae_tpu/metrics/inception.py`; pt_inception
weights via --inception-weights, random-init fallback prints a warning)
and prints one JSON line of results.

  python tools/reconstruct/fidelity.py --input1 <gen dir> --input2 <real dir> \
      --fid --isc [--inception-weights pt_inception.pkl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def folder_batches(d: str, batch: int, max_items: int):
    import PIL.Image

    files = sorted(
        glob(os.path.join(d, "*.png")) + glob(os.path.join(d, "*.jpg"))
    )[:max_items]
    assert files, f"no images in {d}"
    for i in range(0, len(files), batch):
        yield np.stack(
            [np.array(PIL.Image.open(f).convert("RGB"), np.uint8)
             for f in files[i : i + batch]]
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input1", required=True, help="generated/reconstructed images")
    ap.add_argument("--input2", help="real/reference images (required for --fid)")
    ap.add_argument("--fid", action="store_true")
    ap.add_argument("--isc", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max", type=int, default=50000)
    ap.add_argument("--inception-weights", default=None,
                    help="pt_inception pickle (metrics/inception.py converter); "
                         "random init otherwise (relative comparisons only)")
    args = ap.parse_args()
    assert args.fid or args.isc, "nothing to do: pass --fid and/or --isc"
    assert not (args.fid and not args.input2), "--fid needs --input2"

    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.metrics.inception import (
        InceptionV3Features, load_inception_params,
    )
    from vfm_vae_tpu.metrics import metric_main

    if not args.inception_weights:
        print("[warn] no --inception-weights: random-init InceptionV3 — "
              "values are NOT comparable to published numbers", file=sys.stderr)

    model = InceptionV3Features(return_logits=True)
    if args.inception_weights:
        params, buffers = load_inception_params(args.inception_weights)
        variables = {"params": params, "buffers": buffers}
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    fn = jax.jit(lambda x: model.apply(variables, x))

    # IS is over input1 only; during FID both folders stream through the
    # detector, so batches are tagged and probs collected only for input1.
    probs_acc = []
    state = {"collect": False}

    def tagged(batches, collect: bool):
        for b in batches:
            state["collect"] = collect
            yield b

    def detector(images) -> np.ndarray:
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        feats, logits = fn(x)
        if args.isc and state["collect"]:
            probs_acc.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        return np.asarray(feats)

    results = {}
    if args.fid:
        res = metric_main.calc_metric(
            "rfid", detector_fn=detector,
            real_batches=tagged(folder_batches(args.input2, args.batch, args.max), False),
            gen_batches=tagged(folder_batches(args.input1, args.batch, args.max), True),
            max_items=args.max,
        )
        results.update(res["results"])
    if args.isc:
        if not probs_acc:
            for b in tagged(folder_batches(args.input1, args.batch, args.max), True):
                detector(b)
        probs = np.concatenate(probs_acc)
        res = metric_main.calc_metric("inception_score", probs=probs)
        results.update(res["results"])

    print(json.dumps({k: float(v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
