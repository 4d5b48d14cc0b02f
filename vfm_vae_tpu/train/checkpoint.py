"""Checkpoint / auto-resume (reference: training_loop.py:781-801 snapshots,
train.py:23-42 newest-snapshot discovery, :230-264 key-report loading).

Orbax-backed; a snapshot holds {G, D, G_ema, buffers, opt states, loss
state, cur_nimg} — unlike the reference we DO checkpoint optimizer state
(the reference restarts Adam fresh on resume, training_loop.py:364 note).
Directory naming keeps the reference contract: network-snapshot-{kimg:08d}.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np

SNAPSHOT_RE = re.compile(r"network-snapshot-(\d+)$")


def snapshot_name(kimg: int) -> str:
    return f"network-snapshot-{kimg:08d}"


def find_latest_snapshot(run_dir: str) -> Optional[Tuple[str, int]]:
    """Newest snapshot by kimg (reference: train.py:23-42)."""
    if not os.path.isdir(run_dir):
        return None
    best = None
    for name in os.listdir(run_dir):
        m = SNAPSHOT_RE.match(name)
        if m:
            kimg = int(m.group(1))
            if best is None or kimg > best[1]:
                best = (os.path.join(run_dir, name), kimg)
    return best


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_snapshot(run_dir: str, kimg: int, state_dict: dict) -> str:
    """state_dict: a pytree of arrays (TrainState fields as plain dict).

    Snapshot names carry integer kimg (the reference's auto-resume
    contract, train.py:23-42), so a snapshot cadence finer than 1 kimg
    maps several ticks onto the SAME name. The reference silently
    overwrites its .pth; here a second multi-GB orbax save to an
    already-committed path is pure waste (measured ~5 min/save at
    flagship size through the tunnel, and a re-save to the same path has
    been observed to wedge the writer) — skip it: the bits for this kimg
    are already on disk. Stale `.orbax-checkpoint-tmp` dirs from a
    crashed earlier save are removed first so the commit rename cannot
    collide (they never match SNAPSHOT_RE, so auto-resume ignores them
    either way).
    """
    path = os.path.abspath(os.path.join(run_dir, snapshot_name(kimg)))
    # Multi-process: the skip / stale-tmp decision must be SINGLE and
    # shared. Each rank evaluating os.path.isdir against shared storage can
    # disagree under a stale NFS view — one rank skips while the rest enter
    # the collective orbax save (hang), or several ranks rmtree the same
    # tmp dir concurrently. Rank 0 decides; the bit is broadcast so every
    # rank takes the same branch, and only rank 0 cleans the stale tmp.
    skip = os.path.isdir(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        skip = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(skip, np.uint8))
        )
    if skip:
        return path
    tmp = path + ".orbax-checkpoint-tmp"
    if jax.process_index() == 0 and os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # Nobody enters the collective orbax save until rank 0's cleanup
        # is visible on shared storage.
        multihost_utils.sync_global_devices("vfm_vae:pre-snapshot-save")
    ckpt = _checkpointer()
    ckpt.save(path, state_dict, force=True)
    ckpt.wait_until_finished()
    return path


def load_snapshot(path: str, template: Optional[dict] = None) -> dict:
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(path, template)
    # Template-free loads restore to HOST numpy arrays: a snapshot written
    # under one backend records concrete device shardings (e.g. TFRT_CPU_0)
    # that need not exist in the reading process (tools run under the TPU
    # plugin reading CPU-written snapshots and vice versa).
    import orbax.checkpoint as ocp

    pytree_ckpt = ocp.PyTreeCheckpointer()
    meta = pytree_ckpt.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    return pytree_ckpt.restore(path, restore_args=restore_args)


def report_key_diff(loaded: dict, template: dict, prefix: str = "") -> Tuple[list, list]:
    """Missing/unexpected key report (reference: training_loop.py:230-264)."""
    import flax.traverse_util as tu

    got = set(tu.flatten_dict(loaded, sep="/"))
    want = set(tu.flatten_dict(template, sep="/"))
    missing = sorted(want - got)
    unexpected = sorted(got - want)
    for k in missing:
        print(f"[resume]{prefix} missing key: {k}")
    for k in unexpected:
        print(f"[resume]{prefix} unexpected key: {k}")
    return missing, unexpected


def merge_loaded(template: dict, loaded) -> dict:
    """strict=False load: take loaded values where paths+shapes match.

    Recursive over the TEMPLATE (not flatten-based): flax's flatten_dict
    drops empty subtrees, but a state dict's empty dicts are load-bearing —
    optax serializes EmptyState/MaskedNode containers as {} and
    from_state_dict restores tuples by LENGTH, so a flatten/unflatten round
    trip fails with "size of the list and the state dict do not match".
    Hits exactly the four-stage recipe's handoffs, where a changed
    train_mode changes the Adam mask structure (reference strict=False
    resume: training_loop.py:230-264)."""
    if isinstance(template, dict):
        if not isinstance(loaded, dict):
            return template
        return {
            k: (merge_loaded(v, loaded[k]) if k in loaded else v)
            for k, v in template.items()
        }
    if loaded is not None and not isinstance(loaded, dict) \
            and np.shape(loaded) == np.shape(template):
        return loaded
    return template
