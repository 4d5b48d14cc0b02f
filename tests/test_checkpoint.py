"""Snapshot naming/skip contract (train/checkpoint.py).

The integer-kimg snapshot names are the reference's auto-resume contract
(reference train.py:23-42). A snapshot cadence finer than 1 kimg maps
several ticks onto the same name; re-saving multi-GB state to an
already-committed orbax path is wasted minutes and has been observed to
wedge the writer (round-4 flagship trajectory run) — save_snapshot must
skip it.
"""

import os

import numpy as np


def _state():
    return {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "cur_nimg": np.zeros(())}


def test_save_snapshot_skips_existing_kimg(tmp_path):
    from vfm_vae_tpu.train.checkpoint import load_snapshot, save_snapshot

    p1 = save_snapshot(str(tmp_path), 1, _state())
    assert os.path.isdir(p1) and p1.endswith("network-snapshot-00000001")
    mtime = os.path.getmtime(p1)

    changed = _state()
    changed["params"]["w"] = changed["params"]["w"] + 100.0
    p2 = save_snapshot(str(tmp_path), 1, changed)
    assert p2 == p1
    assert os.path.getmtime(p1) == mtime, "existing snapshot was rewritten"
    # The first write's bits survive (skip, not overwrite).
    loaded = load_snapshot(p1)
    np.testing.assert_array_equal(loaded["params"]["w"],
                                  np.arange(6, dtype=np.float32).reshape(2, 3))


def test_save_snapshot_clears_stale_tmp(tmp_path):
    from vfm_vae_tpu.train.checkpoint import save_snapshot

    stale = tmp_path / "network-snapshot-00000002.orbax-checkpoint-tmp"
    stale.mkdir()
    (stale / "junk").write_text("partial write from a crashed save")
    p = save_snapshot(str(tmp_path), 2, _state())
    assert os.path.isdir(p)
    assert not stale.exists()


def test_find_latest_ignores_tmp_dirs(tmp_path):
    from vfm_vae_tpu.train.checkpoint import find_latest_snapshot, save_snapshot

    save_snapshot(str(tmp_path), 3, _state())
    (tmp_path / "network-snapshot-00000009.orbax-checkpoint-tmp").mkdir()
    path, kimg = find_latest_snapshot(str(tmp_path))
    assert kimg == 3 and path.endswith("network-snapshot-00000003")
