"""Metric registry + runner (reference: metrics/metric_main.py:34-98).

`calc_metric(name, **opts)` dispatches into @register_metric functions and
times them; `report_metric` appends metric-<name>.jsonl in the run dir —
same file contract as the reference."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict

_METRICS: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    _METRICS[fn.__name__] = fn
    return fn


def is_valid_metric(name: str) -> bool:
    return name in _METRICS


def list_metrics():
    return list(_METRICS.keys())


def calc_metric(metric: str, **opts) -> Dict[str, Any]:
    assert is_valid_metric(metric), f"unknown metric {metric}; have {list_metrics()}"
    start = time.time()
    results = _METRICS[metric](**opts)
    return dict(
        results=results,
        metric=metric,
        total_time=time.time() - start,
        num_gpus=1,
    )


def report_metric(result_dict: Dict[str, Any], run_dir: str = None, snapshot_pkl: str = None) -> None:
    metric = result_dict["metric"]
    jsonl_line = json.dumps(
        dict(result_dict, snapshot_pkl=snapshot_pkl, timestamp=time.time())
    )
    print(jsonl_line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "a") as f:
            f.write(jsonl_line + "\n")


# ---------------------------------------------------------------- metrics


@register_metric
def rfid(real_batches=None, gen_batches=None, detector_fn=None, max_items=50000, **_):
    """Reconstruction FID over paired folders (README protocol)."""
    from .fid import compute_fid

    value = compute_fid(detector_fn, real_batches, gen_batches, max_items=max_items)
    return {"rfid": value}


@register_metric
def pr50k3(real_features=None, gen_features=None, **_):
    from .precision_recall import compute_pr

    p, r = compute_pr(real_features, gen_features, nhood_size=3)
    return {"precision": p, "recall": r}


@register_metric
def recon_suite(pairs=None, lpips_module=None, lpips_params=None, **_):
    from .recon import evaluate_pairs

    return evaluate_pairs(pairs, lpips_module, lpips_params)


@register_metric
def inception_score(probs=None, num_splits: int = 10, **_):
    """IS = exp(E KL(p(y|x) || p(y))) over splits; `probs` (N, classes) from
    the InceptionV3 logits head (rIS protocol, README tables)."""
    import numpy as np

    probs = np.asarray(probs)
    scores = []
    n = probs.shape[0]
    for i in range(num_splits):
        part = probs[i * n // num_splits : (i + 1) * n // num_splits]
        kl = part * (np.log(part + 1e-10) - np.log(part.mean(axis=0, keepdims=True) + 1e-10))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return {"is_mean": float(np.mean(scores)), "is_std": float(np.std(scores))}


@register_metric
def clip_score(image_features=None, text_features=None, **_):
    """Mean cosine similarity of (already L2-normalized) CLIP features
    (reference: metrics/clip_score.py:20-47, cs10k)."""
    import numpy as np

    sim = np.sum(np.asarray(image_features) * np.asarray(text_features), axis=-1)
    return {"clip_score": float(sim.mean())}
