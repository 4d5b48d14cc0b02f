"""Frechet distance (reference: metrics/frechet_inception_distance.py:20-39)
+ paired-folder reconstruction metrics (the rFID protocol the reference
delegates to torch-fidelity, README.md:348-354).

The Inception detector is pluggable (`detector_fn: images -> features`);
metrics/detectors.py provides the InceptionV3 port when a weights file is
available locally, and any jittable embedding network otherwise.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np
import scipy.linalg

from .feature_stats import FeatureStats


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """Classic FID formula with the sqrtm of the covariance product."""
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma1, sigma2), disp=False)
    fid = np.real(m + np.trace(sigma1 + sigma2 - s * 2))
    return float(fid)


def compute_fid_from_stats(stats_a: FeatureStats, stats_b: FeatureStats) -> float:
    mu1, s1 = stats_a.get_mean_cov()
    mu2, s2 = stats_b.get_mean_cov()
    return frechet_distance(mu1, s1, mu2, s2)


def accumulate_features(
    detector_fn: Callable[[np.ndarray], np.ndarray],
    batches: Iterable[np.ndarray],
    capture_all: bool = False,
    max_items: Optional[int] = None,
) -> FeatureStats:
    """Stream image batches (NHWC uint8/float) through the detector."""
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=True, max_items=max_items)
    for batch in batches:
        if stats.is_full():
            break
        feats = np.asarray(detector_fn(batch))
        stats.append(feats)
    return stats


def compute_fid(
    detector_fn,
    real_batches: Iterable[np.ndarray],
    gen_batches: Iterable[np.ndarray],
    max_items: Optional[int] = None,
) -> float:
    real = accumulate_features(detector_fn, real_batches, max_items=max_items)
    gen = accumulate_features(detector_fn, gen_batches, max_items=max_items)
    return compute_fid_from_stats(real, gen)
