"""Training statistics: per-name three-moment counters [n, sum(x), sum(x^2)].

Functional redesign of the reference's lock-free stats engine
(torch_utils/training_stats.py:56 report / :113 Collector / :234 _sync).
The reference accumulates moments on-device per process and all-reduces per
tick; here the moments are a plain pytree carried through the jitted step, so
the cross-device reduction is a psum the compiler schedules with everything
else, and the host Collector just drains numpy arrays.

Usage inside a jitted loss:
    stats = {}
    report(stats, 'Loss/G/l1', l1)         # any-shape tensor
    ... return loss, stats

Host side:
    collector = Collector()
    collector.update(jax.device_get(stats_out))
    collector.mean('Loss/G/l1'); collector.std('Loss/G/l1')
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

Moments = jnp.ndarray  # shape (3,): [n, sum, sumsq] in float32


def moments_of(value: jnp.ndarray) -> Moments:
    v = jnp.asarray(value, jnp.float32)
    return jnp.stack([jnp.asarray(v.size, jnp.float32), jnp.sum(v), jnp.sum(v * v)])


def report(stats: Dict[str, Moments], name: str, value) -> None:
    """Accumulate moments for `name` (reference: training_stats.py:56)."""
    m = moments_of(value)
    stats[name] = stats[name] + m if name in stats else m


def merge(a: Dict[str, Moments], b: Dict[str, Moments]) -> Dict[str, Moments]:
    out = dict(a)
    for k, v in b.items():
        out[k] = out[k] + v if k in out else v
    return out


class Collector:
    """Host-side drain of accumulated moments (reference: training_stats.py:113).

    `update(stats)` ingests a {name: (3,)} dict (numpy or device arrays);
    `mean/std` report over everything ingested since the last `reset`.
    """

    def __init__(self, regex: str = ".*"):
        import re

        self._regex = re.compile(regex)
        self._moments: Dict[str, np.ndarray] = {}
        self._cumulative: Dict[str, np.ndarray] = {}

    def update(self, stats: Dict[str, np.ndarray]) -> None:
        for name, m in stats.items():
            if not self._regex.fullmatch(name):
                continue
            m = np.asarray(m, np.float64)
            self._moments[name] = self._moments.get(name, np.zeros(3)) + m
            self._cumulative[name] = self._cumulative.get(name, np.zeros(3)) + m

    def names(self):
        return list(self._moments.keys())

    def num(self, name: str) -> int:
        return int(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0 or not np.isfinite(m[1]):
            return float("nan")
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        raw_var = m[2] / m[0]
        return float(math.sqrt(max(raw_var - mean * mean, 0.0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"num": self.num(name), "mean": self.mean(name), "std": self.std(name)}
            for name in self.names()
        }

    def reset(self) -> None:
        self._moments.clear()


def sync_across_processes(stats: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Cross-host moment reduction (reference: training_stats.py:234 _sync —
    one stacked all-reduce of [names, 3] per tick). Under single-program
    jit the in-step psum already yields global values; this covers host-side
    accumulations in true multi-process runs."""
    import jax

    if jax.process_count() == 1:
        return stats
    from jax.experimental import multihost_utils

    names = sorted(stats.keys())
    stacked = np.stack([np.asarray(stats[n], np.float64) for n in names])
    gathered = multihost_utils.process_allgather(stacked.astype(np.float32))
    total = np.asarray(gathered, np.float64).sum(axis=0)
    return {n: total[i] for i, n in enumerate(names)}
