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
import jax.numpy as jnp
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
    """Default mesh, data-parallel only: all local devices single-process;
    all GLOBAL devices under jax.distributed (every host runs the same jit
    over one global mesh — the reference's per-rank DDP split collapses
    into this, torch_utils/distributed.py:24-41)."""
    if jax.process_count() > 1:
        return make_mesh(jax.devices())
    return make_mesh(jax.local_devices())


def warm_up_collectives(mesh: Mesh) -> None:
    """Establish cross-process communicator contexts while all processes
    are still in lockstep (right after jax.distributed.initialize), BEFORE
    any expensive train-step compile.

    Why: communicator setup (gloo on CPU, the NCCL-analog rendezvous the
    reference pays inside torch.distributed.init_process_group,
    torch_utils/distributed.py:24-41) happens lazily at the FIRST collective
    of a clique, and its key-value rendezvous has a hard ~30 s deadline that
    is NOT covered by the collective-call timeout flags. If process A
    finishes compiling the big train step minutes before process B, A's
    first collective starts the rendezvous and times out while B is still
    compiling. Running one trivial collective per clique here — full mesh
    plus each mesh axis — takes <2 s to compile, so the processes reach it
    nearly simultaneously; every later executable reuses the established
    contexts and tolerates arbitrary compile skew (verified with a forced
    60 s skew). No-op single-process.
    """
    if jax.process_count() == 1:
        return
    names = tuple(mesh.axis_names)
    axis_sets = [names] + ([(n,) for n in names] if len(names) > 1 else [])
    for axes in axis_sets:
        f = jax.shard_map(
            lambda v, _axes=axes: jax.lax.psum(v, _axes),
            mesh=mesh, in_specs=P(), out_specs=P(),
        )
        jax.jit(f)(jnp.zeros((8,), jnp.float32)).block_until_ready()
    # Also establish the DIFFERENT clique pattern process_allgather uses
    # (per-local-device pairs across processes — e.g. {dev0, dev2048} on a
    # 2-process CPU backend, NOT the full-mesh clique above). The stats
    # drain (core/stats.py), check_replica_consistency, and orbax's save
    # barrier all go through this helper, and its context-init thunk has
    # no data dependencies, so it starts its 30 s rendezvous the moment
    # the executable launches — even while earlier queued steps are still
    # waiting on a peer's multi-minute compile.
    from jax.experimental import multihost_utils

    np.asarray(multihost_utils.process_allgather(np.zeros((1,), np.float32)))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Shard a pytree of batches over the data axis.

    Single-process: plain device_put. Multi-process (global mesh): each
    host holds only ITS slice of the global batch — assemble the global
    array from the per-process shards (the jax analog of the reference's
    per-rank DDP batch, where each rank's tensor never leaves its host)."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                batch_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def zero1_sharding(mesh: Mesh, x) -> NamedSharding:
    """ZeRO-1 layout for one optimizer-state leaf: shard the first axis
    that divides the data-axis size, else replicate.

    The reference replicates Adam moments on every rank (hand-rolled DDP);
    sharding them over the data axis cuts per-chip optimizer memory by
    (N-1)/N — on a 16 GB v5e the flagship's 2x-params fp32 Adam state is
    what caps the per-chip training batch. Elementwise Adam math keeps the
    sharded layout; XLA all-gathers only the parameter UPDATE (same bytes
    as the DDP grad all-reduce it replaces)."""
    n = mesh.shape[DATA_AXIS]
    shape = np.shape(x)
    for axis, dim in enumerate(shape):
        if dim % n == 0 and dim >= n:
            spec = [None] * len(shape)
            spec[axis] = DATA_AXIS
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_opt_state(mesh: Mesh, opt_state):
    """device_put every array leaf of an optimizer state with zero1_sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, zero1_sharding(mesh, x))
        if hasattr(x, "shape") and np.ndim(x) > 0 else x,
        opt_state,
    )


def check_replica_consistency(tree) -> None:
    """Assert replicated arrays are bit-identical across processes — the
    reference's check_ddp_consistency (torch_utils/misc.py: per-param
    rank-0 broadcast + compare). Each process hashes the LOCAL copy of
    every replicated leaf; the fp64 digests are allgathered and compared.
    No-op single-process. Raises RuntimeError naming the first leaf whose
    digest diverges."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in leaves_with_paths]
    # Exact crc32 of the local copy's bytes (replicated => the local copy
    # IS the whole array on every process).
    import zlib

    digests = np.asarray(
        [zlib.crc32(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
         for _, leaf in leaves_with_paths],
        np.int64,
    )
    all_digests = np.asarray(multihost_utils.process_allgather(digests))
    bad = np.nonzero(~np.all(all_digests == all_digests[0:1], axis=0))[0]
    if bad.size:
        raise RuntimeError(
            f"replica divergence across processes in leaves: "
            f"{[names[i] for i in bad[:5]]}"
        )


def place_state(mesh: Mesh, state):
    """Commit a TrainState to its canonical layout: params/EMA/buffers
    replicated, optimizer moments ZeRO-1 sharded (zero1_state_shardings).

    Required for buffer donation: with uncommitted inputs GSPMD picks its
    own input shardings (e.g. model-axis TP sharding for the frozen-tower
    weights), which then cannot alias the replicated-pinned outputs —
    XLA rejects the aliasing with a sub-shape size mismatch.

    Also breaks buffer ALIASES inside the state: a TrainState fresh from
    init holds the same jax.Array as both g_params and ema_params (the
    reference's `copy.deepcopy(G).eval()` analog, training_loop.py:575).
    device_put with an unchanged sharding is a no-op, so both slots would
    donate one buffer and XLA rejects the step at runtime with
    INVALID_ARGUMENT "attempt to donate the same buffer twice" — surfaced
    through the axon tunnel as a bare "TPU backend error"."""
    sh = zero1_state_shardings(mesh, state)
    seen: set = set()

    def put(x, s):
        y = jax.device_put(x, s)
        if isinstance(x, jax.Array):
            if id(x) in seen:
                y = jnp.copy(y)
            else:
                seen.add(id(x))
        return y

    return jax.tree_util.tree_map(put, state, sh)


def zero1_state_shardings(mesh: Mesh, state):
    """Output-sharding tree for a jitted train step over a TrainState:
    params/EMA/buffers replicated, optimizer moments ZeRO-1 sharded.

    Without this constraint GSPMD propagates the moment sharding into the
    step's OTHER outputs (params/EMA come back tiled), and any eager use of
    those arrays outside jit (image snapshots, in-loop metrics) fails to
    convert the tiled HloSharding. Pinning outputs also makes the cost
    model deterministic: the update all-gather happens inside the step."""
    rep = NamedSharding(mesh, P())
    sh = jax.tree_util.tree_map(lambda x: rep, state)
    if mesh.shape[DATA_AXIS] > 1:
        sh = sh.replace(
            g_opt=jax.tree_util.tree_map(lambda x: zero1_sharding(mesh, x), state.g_opt),
            d_opt=jax.tree_util.tree_map(lambda x: zero1_sharding(mesh, x), state.d_opt),
        )
    return sh
