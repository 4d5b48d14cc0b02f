"""Local-mesh sharded execution for the offline tools (serving/eval layer).

The reference's tool layer is torchrun multi-GPU: one process per device
with a rank-based split of the work —
  * reconstruct: DistributedSampler over the image list
    (/root/reference/tools/reconstruct/reconstruct.py:116-122, :64-66)
  * decode: .safetensors files sharded by rank
    (/root/reference/tools/decode/decode_latents_to_images.py:49)
  * prefetch: wds split_by_node
    (/root/reference/tools/preprocess_for_lightningdit/prefetch.py:148-175)

The TPU-native analog collapses the per-device processes into ONE process
driving all local chips through a data-axis mesh (the same shape train.py
uses): each batch is padded to a fixed block, sharded over the mesh's data
axis, and XLA splits the compute — no rank bookkeeping, no per-process
model replicas in host RAM. Across HOSTS the file-level split stays
(`process_shard`), because offline tools want independent programs per
host, not one global jit.

Padding note: block padding repeats the final row, and the padded rows'
outputs are dropped before anything reaches disk. Per-example compute
(encode/decode/feature extraction — no cross-batch ops) makes the real
rows' results independent of the pad rows; threefry RNG is per-element on
the flattened index, so leading-dim padding does not perturb the real
rows' noise either.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from .mesh import DATA_AXIS, Mesh, batch_sharding, make_mesh, replicated


def process_shard(items: Sequence):
    """Rank-strided split of a work list across HOSTS (the reference's
    `files[rank::world]` / DistributedSampler convention). Identity when
    single-process."""
    return list(items)[jax.process_index() :: max(jax.process_count(), 1)]


def serving_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Data-only mesh over this process's devices. Every tool batch is
    sharded over DATA_AXIS; model weights replicate (the frozen towers fit
    per-chip — TP stays a train.py concern).

    VFM_VAE_SERVING_DEVICES=N caps the mesh to the first N local devices
    (tests use it to compare the 1-device and 8-device paths; ops also get
    a lever to park chips)."""
    import os

    devices = list(devices if devices is not None else jax.local_devices())
    cap = int(os.environ.get("VFM_VAE_SERVING_DEVICES", "0"))
    if cap > 0:
        devices = devices[:cap]
    return make_mesh(devices)


def replicate(mesh: Mesh, tree):
    """Commit a pytree (model variables) to fully-replicated layout on the
    mesh, once, so per-batch jit calls don't re-transfer weights."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def _pad_rows(x: np.ndarray, n: int) -> np.ndarray:
    b = x.shape[0]
    if b == n:
        return x
    assert b < n, f"batch {b} exceeds block {n}"
    return np.concatenate([x, np.repeat(x[-1:], n - b, axis=0)])


class ShardedFn:
    """Wrap a per-example function for fixed-block, mesh-sharded batches.

    `fn`'s args listed in `batch_argnums` carry a leading batch dim; every
    call pads them to one fixed block size (a multiple of the mesh's data
    axis — ONE compiled program for full and tail batches alike), shards
    them over DATA_AXIS, runs the jit, and trims outputs back to the true
    batch. Non-batch args (replicated variables, rng keys, scalars) pass
    through untouched.
    """

    def __init__(self, fn, batch_size: int, mesh: Optional[Mesh] = None,
                 batch_argnums: Sequence[int] = (0,)):
        self.mesh = mesh if mesh is not None else serving_mesh()
        n = self.mesh.shape[DATA_AXIS]
        self.block = -(-batch_size // n) * n
        self.fn = jax.jit(fn)
        self.batch_argnums = frozenset(batch_argnums)

    def __call__(self, *args):
        b = None
        prepared = []
        for i, a in enumerate(args):
            if i in self.batch_argnums:
                leaves = jax.tree_util.tree_leaves(a)
                if b is None:
                    b = int(np.shape(leaves[0])[0])
                a = jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        _pad_rows(np.asarray(x), self.block),
                        batch_sharding(self.mesh, np.ndim(x)),
                    ),
                    a,
                )
            prepared.append(a)
        out = self.fn(*prepared)
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:b], out)
