"""Multi-host logic smoke (no pod needed): the pure-python seams of the
pod path — per-process loader sharding (data_wds.py:303-305 split_by_node
equivalent) and the host-side stats reduction (training_stats.py:234
_sync equivalent) — exercised with faked process count/gather.
"""

import numpy as np

from tests.test_data import make_shards, write_c2t


def test_loader_shards_disjoint_across_processes(tmp_path):
    from vfm_vae_tpu.data.wds import wds_dataloader

    urls = make_shards(tmp_path, n_shards=4, per_shard=10)
    c2t = write_c2t(tmp_path)
    totals = {}
    for rank in (0, 1):
        logs = tmp_path / f"logs{rank}"
        it = wds_dataloader(
            urls, batch_size=5, resolution=32, workers=0, label_type="cls2id",
            cls_to_text_path=c2t, one_epoch=True, base_seed=1,
            num_processes=2, process_index=rank,
            processed_tar_write_dir=str(logs),
        )
        totals[rank] = sum(im.shape[0] for im, _ in it)
    # 4 shards x 10 samples, split 2/2 across the two processes.
    assert totals == {0: 20, 1: 20}
    logs0 = set((tmp_path / "logs0" / "processed_tars_rank00.txt").read_text().split())
    logs1 = set((tmp_path / "logs1" / "processed_tars_rank01.txt").read_text().split())
    assert logs0.isdisjoint(logs1), "processes consumed overlapping shards"
    assert logs0 | logs1 == set(urls), "processes did not cover all shards"


def test_sync_across_processes_sums_moments(monkeypatch):
    """sync_across_processes must sum per-name [n, Σx, Σx²] moment rows
    over processes; fake a 2-process world by stubbing the jax seams."""
    import jax

    from vfm_vae_tpu.core import stats as tstats

    local = {
        "Loss/G/l1": np.array([2.0, 3.0, 5.0]),
        "Loss/D/total": np.array([1.0, -1.0, 1.0]),
    }
    other = {
        "Loss/G/l1": np.array([1.0, 1.0, 1.0]),
        "Loss/D/total": np.array([4.0, 0.0, 8.0]),
    }

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    from jax.experimental import multihost_utils

    def fake_allgather(stacked):
        names = sorted(local.keys())
        other_stack = np.stack([np.asarray(other[n], np.float32) for n in names])
        return np.stack([np.asarray(stacked), other_stack])

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    out = tstats.sync_across_processes(local)
    np.testing.assert_allclose(out["Loss/G/l1"], [3.0, 4.0, 6.0])
    np.testing.assert_allclose(out["Loss/D/total"], [5.0, -1.0, 9.0])


def test_single_process_sync_is_identity():
    from vfm_vae_tpu.core import stats as tstats

    local = {"a": np.array([1.0, 2.0, 3.0])}
    assert tstats.sync_across_processes(local) is local
