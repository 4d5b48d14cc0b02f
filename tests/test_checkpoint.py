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


def test_merge_loaded_preserves_empty_subtrees():
    """Stage-to-stage resume with a changed Adam mask: the template's empty
    containers (optax EmptyState / MaskedNode serialize as {}) must survive
    the loose merge — from_state_dict restores tuples by LENGTH, so a
    dropped empty dict fails the whole restore (four-stage chain bug)."""
    import numpy as np

    from vfm_vae_tpu.train.checkpoint import merge_loaded

    template = {
        "g_opt": {
            "0": {"inner": {"count": np.zeros(()), "mu": {"b3": np.zeros(3)}}},
            "1": {},  # EmptyState — flatten_dict would drop this
        },
        "extra": {"only_template": np.ones(2)},
    }
    loaded = {
        "g_opt": {"0": {"inner": {"count": np.ones(()) * 5,
                                  "mu": {"b3": np.ones(3),
                                         "b0": np.ones(4)}}}},
    }
    out = merge_loaded(template, loaded)
    assert out["g_opt"]["1"] == {}  # empty subtree survived
    np.testing.assert_array_equal(out["g_opt"]["0"]["inner"]["mu"]["b3"],
                                  np.ones(3))  # matching leaf taken
    assert "b0" not in out["g_opt"]["0"]["inner"]["mu"]  # unknown key dropped
    np.testing.assert_array_equal(out["extra"]["only_template"], np.ones(2))
    # count scalar restored
    assert float(out["g_opt"]["0"]["inner"]["count"]) == 5.0


def test_merge_loaded_shape_mismatch_keeps_template():
    import numpy as np

    from vfm_vae_tpu.train.checkpoint import merge_loaded

    template = {"w": np.zeros((2, 2))}
    out = merge_loaded(template, {"w": np.ones((3, 3))})
    np.testing.assert_array_equal(out["w"], np.zeros((2, 2)))
