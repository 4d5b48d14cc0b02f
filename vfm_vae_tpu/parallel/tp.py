"""Tensor parallelism over the mesh's `model` axis (Megatron layout).

The reference has no TP (SURVEY.md §2.8: DP only); on TPU the frozen-ViT
towers are the FLOPs majority, and TP over ICI is how they scale past one
chip. Layout is the standard Megatron split driven by GSPMD:

  * fc1 / q / k / v projections: column-parallel — the (B, N, hidden)
    activation is sharded over `model` on the feature (or head) axis.
    XLA then shards the weight to match (replicated param -> local slice,
    no communication).
  * fc2 / out projections: row-parallel — contracting the sharded axis
    produces partial sums; XLA inserts ONE all-reduce (psum over `model`)
    per block site, exactly the Megatron schedule.

These helpers are no-ops unless a mesh with `model > 1` is active
(jax.sharding.set_mesh), so single-chip paths and the pure-DP mesh compile
byte-identical programs.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _active_tp_mesh():
    """The abstract mesh set via jax.sharding.set_mesh, when it has a
    non-trivial model axis; else None."""
    m = jax.sharding.get_abstract_mesh()
    shape = dict(m.shape)
    if shape.get(MODEL_AXIS, 1) <= 1:
        return None
    return m


def _batch_axis(mesh) -> object:
    return DATA_AXIS if dict(mesh.shape).get(DATA_AXIS, 1) > 1 else None


def shard_hidden(x: jax.Array) -> jax.Array:
    """Column-parallel constraint for a (B, ..., features) activation:
    features sharded over `model`, batch over `data`. No-op without an
    active model axis or when the feature dim doesn't divide."""
    mesh = _active_tp_mesh()
    if mesh is None or x.ndim < 2:
        return x
    if x.shape[-1] % dict(mesh.shape)[MODEL_AXIS] != 0:
        return x
    spec = P(_batch_axis(mesh), *([None] * (x.ndim - 2)), MODEL_AXIS)
    return jax.lax.with_sharding_constraint(x, spec)


def shard_heads(x: jax.Array) -> jax.Array:
    """Head-parallel constraint for a (B, N, heads, head_dim) attention
    tensor: heads sharded over `model`."""
    mesh = _active_tp_mesh()
    if mesh is None or x.ndim != 4:
        return x
    if x.shape[2] % dict(mesh.shape)[MODEL_AXIS] != 0:
        return x
    spec = P(_batch_axis(mesh), None, MODEL_AXIS, None)
    return jax.lax.with_sharding_constraint(x, spec)


def shard_replicated_features(x: jax.Array) -> jax.Array:
    """Row-parallel output constraint: feature axis replicated (forces the
    psum right after the contraction instead of letting a sharded layout
    leak downstream). Batch stays on `data`."""
    mesh = _active_tp_mesh()
    if mesh is None or x.ndim < 2:
        return x
    spec = P(_batch_axis(mesh), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)
