"""Tracing / profiling utilities (reference: SURVEY.md section 5.1 — the
torch profiler scopes, CUDA-event phase timing, and psutil/cuda memory
telemetry of training_loop.py:630-635, 753-768)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def named_scope(name: str):
    """jax.named_scope passthrough (the torch record_function equivalent;
    scopes show up in the XLA/jax profiler traces)."""
    with jax.named_scope(name):
        yield


profiled_function = jax.named_scope  # decorator form, misc.py:110 analogue


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with device sync (the CUDA-event analogue:
    block_until_ready deltas, training_loop.py:630-635)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        """Yields a sync callable: call it with a step output to force a
        host read inside the timed window (block_until_ready alone does not
        guarantee execution through the axon tunnel). Without a call, the
        recorded time is dispatch wall only."""
        t0 = time.perf_counter()
        yield lambda r: jax.device_get(r)
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM usage telemetry (torch.cuda.max_memory_* analogue,
    training_loop.py:762-765)."""
    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    scale = 1 / 2**30
    return {
        "Resources/hbm_in_use_gb": stats.get("bytes_in_use", 0) * scale,
        "Resources/hbm_peak_gb": stats.get("peak_bytes_in_use", 0) * scale,
        "Resources/hbm_limit_gb": stats.get("bytes_limit", 0) * scale,
    }


def host_memory_stats() -> Dict[str, float]:
    try:
        import psutil

        rss = psutil.Process().memory_info().rss
        return {"Resources/cpu_mem_gb": rss / 2**30}
    except ImportError:
        return {}
