"""Device mesh + sharding layout.

The reference implements hand-rolled data parallelism over NCCL (SURVEY.md
section 2.8: per-rank batch split, manual sharded all_reduce of flattened
grads at 2^23 elements, rank-0 broadcast of params). On TPU all of that
collapses into one jit over a Mesh:

  * axis "data"  -- batch sharding; gradient mean == automatic psum.
  * axis "model" -- tensor parallelism for the big frozen-ViT matmuls
                    (optional; size 1 replicates exactly like the reference).

XLA inserts the collectives (all-reduce / all-gather / reduce-scatter) and
routes them over ICI. Nothing in this file moves bytes itself.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    With `model == 1` this is pure DP — the exact parallelism the reference
    implements (training_loop.py:272-289) — but the extra axis is free and
    lets the same train step scale to TP by reshaping the mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """Single-process mesh over all local devices, data-parallel only."""
    return make_mesh(jax.local_devices())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of per-host arrays with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )
