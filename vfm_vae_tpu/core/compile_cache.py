"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile (and EQ regularization
multiplies that: each (scale, rot, is_prior) bucket is its own jit variant,
models/adapter.py EquivarianceTransform — up to ~20 step variants). The
reference amortizes nothing (torch eager); here one flag makes every
compile survive process restarts, so stage restarts and auto-resume pay
compile cost once per code version.

Enabled by default from training_loop and the tools; opt out with
VFM_VAE_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os
from typing import Optional

_enabled = False


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's compilation cache at a durable directory. Idempotent.
    Returns the cache dir, or None when disabled."""
    global _enabled
    if os.environ.get("VFM_VAE_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    path = (
        path
        or os.environ.get("VFM_VAE_COMPILE_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "vfm-vae-tpu", "jax-cache")
    )
    os.makedirs(path, exist_ok=True)
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took >1s to compile (default threshold skips
        # exactly the tiny EQ-bucket variants we want to keep).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return path
