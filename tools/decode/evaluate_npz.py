#!/usr/bin/env python
"""ADM-evaluator-role generation metrics from .npz batches.

The reference's generation protocol packs 50k decoded samples into an
ADM-style npz (tools/decode/save_images_as_npz.py) and runs OpenAI's
external `guided-diffusion/evaluations/evaluator.py` against a reference
batch (/root/reference/README.md:365-376) to get gFID / sFID / IS /
Precision / Recall. This tool computes the same five numbers natively:

  gFID        Frechet distance on InceptionV3 pool3 features (2048-d)
  sFID        Frechet distance on the 'mixed_6/conv' spatial features,
              first 7 channels flattened (17*17*7 = 2023-d; Nash et al.).
              Torch-port mapping documented in metrics/inception.py.
  IS          exp(mean KL) over the 1008-way logits softmax, ADM split
              policy (one split per 5000 samples)
  Precision / Recall   Kynkaanniemi k-NN manifold test (k=3) on pool3

  python tools/decode/evaluate_npz.py \
      --sample-batch samples.npz --ref-batch VIRTUAL_imagenet256_labeled.npz \
      [--inception-weights pt_inception.pkl] [--batch 64] [--max-items N]

npz layout: ADM convention, images under 'arr_0' as uint8 (N, H, W, 3).
Random-init Inception (no --inception-weights) only exercises the plumbing
and prints a warning — supply the pt_inception weights for real numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def npz_batches(path: str, batch: int, max_items: int | None):
    data = np.load(path)
    key = "arr_0" if "arr_0" in data else list(data.keys())[0]
    imgs = data[key]
    if max_items:
        imgs = imgs[:max_items]
    n = imgs.shape[0]
    for i in range(0, n, batch):
        yield imgs[i:i + batch]


def inception_score(probs: np.ndarray, split_size: int = 5000) -> float:
    """ADM split policy: one split per `split_size` samples (>= 1 split)."""
    n = probs.shape[0]
    splits = max(1, n // split_size)
    scores = []
    for part in np.array_split(probs, splits):
        kl = part * (np.log(part + 1e-12) - np.log(part.mean(axis=0, keepdims=True) + 1e-12))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample-batch", required=True)
    ap.add_argument("--ref-batch", required=True)
    ap.add_argument("--inception-weights", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-items", type=int, default=None)
    ap.add_argument("--nhood", type=int, default=3)
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.metrics.feature_stats import FeatureStats
    from vfm_vae_tpu.metrics.fid import frechet_distance
    from vfm_vae_tpu.metrics.inception import InceptionV3Features, load_inception_params
    from vfm_vae_tpu.metrics.precision_recall import compute_pr

    model = InceptionV3Features(return_logits=True)
    if args.inception_weights:
        params, buffers = load_inception_params(args.inception_weights)
        variables = {"params": params, "buffers": buffers}
    else:
        print("[warn] no --inception-weights: random-init Inception; the "
              "numbers are meaningless (plumbing check only)", file=sys.stderr)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))

    @jax.jit
    def features(x):
        (pool, logits), inters = model.apply(
            variables, x, mutable=["intermediates"])
        spatial = inters["intermediates"]["sfid_spatial"][0]
        probs = jax.nn.softmax(logits, axis=-1)
        return pool, spatial.reshape(spatial.shape[0], -1), probs

    def run(path, want_probs: bool):
        pool_stats = FeatureStats(capture_all=True, capture_mean_cov=True)
        sp_stats = FeatureStats(capture_mean_cov=True)
        probs_all = []
        for raw in npz_batches(path, args.batch, args.max_items):
            x = jnp.asarray(raw).astype(jnp.float32) / 255.0
            pool, spatial, probs = features(x)
            pool_stats.append(np.asarray(pool, np.float64))
            sp_stats.append(np.asarray(spatial, np.float64))
            if want_probs:
                probs_all.append(np.asarray(probs, np.float64))
        return pool_stats, sp_stats, (np.concatenate(probs_all) if probs_all else None)

    gen_pool, gen_sp, gen_probs = run(args.sample_batch, want_probs=True)
    ref_pool, ref_sp, _ = run(args.ref_batch, want_probs=False)

    mu_g, sig_g = gen_pool.get_mean_cov()
    mu_r, sig_r = ref_pool.get_mean_cov()
    smu_g, ssig_g = gen_sp.get_mean_cov()
    smu_r, ssig_r = ref_sp.get_mean_cov()
    precision, recall = compute_pr(
        ref_pool.get_all(), gen_pool.get_all(), nhood_size=args.nhood)

    result = {
        "fid": frechet_distance(mu_g, sig_g, mu_r, sig_r),
        "sfid": frechet_distance(smu_g, ssig_g, smu_r, ssig_r),
        "inception_score": inception_score(gen_probs),
        "precision": float(precision),
        "recall": float(recall),
        "n_samples": int(gen_pool.num_items),
        "n_ref": int(ref_pool.num_items),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
