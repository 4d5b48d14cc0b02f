"""Data-pipeline tests: synthetic tar shards -> batches, one-epoch resume
contract, augmentation geometry."""

import io
import json
import os
import random
import tarfile

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")
import PIL.Image  # noqa


def make_shards(root, n_shards=3, per_shard=20, size=40):
    os.makedirs(root / "part1", exist_ok=True)
    rng = np.random.default_rng(0)
    urls = []
    idx = 0
    for s in range(n_shards):
        url = str(root / "part1" / f"{s:05d}.tar")
        with tarfile.open(url, "w") as tf:
            for _ in range(per_shard):
                arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
                buf = io.BytesIO()
                PIL.Image.fromarray(arr).save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:08d}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(idx % 10).encode()
                info = tarfile.TarInfo(f"{idx:08d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
                idx += 1
        urls.append(url)
    return urls


def write_c2t(tmp_path):
    import json
    cls2text = {str(i): f"class number {i}" for i in range(10)}
    p = tmp_path / "c2t.json"
    p.write_text(json.dumps(cls2text))
    return str(p)


def test_one_epoch_loader_yields_all(tmp_path):
    from vfm_vae_tpu.data.wds import wds_dataloader

    urls = make_shards(tmp_path, n_shards=3, per_shard=20)
    it = wds_dataloader(
        urls, batch_size=8, resolution=32, workers=2, label_type="cls2id",
        cls_to_text_path=write_c2t(tmp_path),
        data_augmentation=True, one_epoch=True, base_seed=1,
        processed_tar_write_dir=str(tmp_path / "logs"),
    )
    total = 0
    for images, labels in it:
        assert images.shape == (8, 32, 32, 3) and images.dtype == np.uint8
        assert labels.shape == (8, 10)
        total += images.shape[0]
    assert total >= 56  # 60 minus the sub-batch tail
    # Shard log written with the exact reference file name.
    log = tmp_path / "logs" / "processed_tars_rank00.txt"
    assert log.exists()
    assert len(log.read_text().strip().splitlines()) == 3


def test_one_epoch_resume_skips_processed(tmp_path):
    from vfm_vae_tpu.data.wds import wds_dataloader

    urls = make_shards(tmp_path, n_shards=4, per_shard=10)
    logs = tmp_path / "logs"
    os.makedirs(logs)
    # Pretend the first 3 shards were processed; workers=0 so none dropped.
    (logs / "processed_tars_rank00.txt").write_text("\n".join(urls[:3]) + "\n")
    it = wds_dataloader(
        urls, batch_size=5, resolution=32, workers=0, label_type="cls2id",
        cls_to_text_path=write_c2t(tmp_path),
        one_epoch=True, base_seed=1,
        processed_tar_read_dir=str(logs), processed_tar_write_dir=str(logs),
    )
    total = sum(im.shape[0] for im, _ in it)
    assert total == 10  # only the 4th shard remains


def test_cls2text_labels(tmp_path):
    from vfm_vae_tpu.data.wds import wds_dataloader

    urls = make_shards(tmp_path, n_shards=1, per_shard=10)
    cls2text = {str(i): f"class number {i}" for i in range(10)}
    p = tmp_path / "c2t.json"
    p.write_text(json.dumps(cls2text))
    it = wds_dataloader(
        urls, batch_size=10, resolution=16, workers=1, label_type="cls2text",
        cls_to_text_path=str(p), one_epoch=True, base_seed=3,
    )
    images, labels = next(iter(it))
    assert all(l.startswith("class number ") for l in labels)


def test_transform_image_center_crop():
    from vfm_vae_tpu.data.wds import transform_image

    arr = np.zeros((40, 60, 3), dtype=np.uint8)
    arr[:, 30:] = 255  # right half white
    img = PIL.Image.fromarray(arr)
    out = transform_image(img, 20, augment=False, rng=random.Random(0))
    assert out.shape == (20, 20, 3)
    # center crop of a 60-wide image keeps both halves
    assert out[:, :5].mean() < 50 and out[:, 15:].mean() > 200


def test_wds_wrapper(tmp_path):
    from vfm_vae_tpu.data.wds import WdsWrapper

    make_shards(tmp_path, n_shards=2, per_shard=5)
    ds = WdsWrapper(str(tmp_path), resolution=32, label_type="cls2id")
    assert len(ds.urls) == 2
    assert ds.image_shape == [32, 32, 3]
    assert len(ds) == 1281167


def test_image_folder_dataset(tmp_path):
    import PIL.Image
    from vfm_vae_tpu.data.zipfolder import ImageFolderDataset

    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    ds = ImageFolderDataset(str(tmp_path), resolution=32, xflip=True)
    assert len(ds) == 12
    img, label = ds[0]
    assert img.shape == (32, 32, 3)
    img_f, _ = ds[6]  # xflip twin of ds[0]
    np.testing.assert_array_equal(img_f, img[:, ::-1])
    batches = list(ds.batches(4))
    assert sum(b[0].shape[0] for b in batches) == 12


def test_process_loader_close_does_not_hang(tmp_path):
    """Regression: closing the loader while process workers are mid-put must
    return promptly. Workers SIGTERMed mid-put leave a truncated pickle in
    the queue pipe; the old teardown drained with mp.Queue.get_nowait(),
    which blocks forever reading payload bytes that never arrive (observed
    as train.py hanging after 'Done'). Samples here are ~192 KB decoded —
    larger than the 64 KB pipe buffer — so a put is essentially always
    in flight when close() fires. queue_size must be large: with a small
    queue, workers block on the maxsize semaphore (cleanly, between
    messages) instead of mid-pipe-write, and the kill leaves no torn
    message."""
    import threading

    from vfm_vae_tpu.data.wds import wds_dataloader

    urls = make_shards(tmp_path, n_shards=2, per_shard=6, size=256)
    it = wds_dataloader(
        urls, batch_size=2, resolution=256, workers=2, label_type="cls2id",
        cls_to_text_path=write_c2t(tmp_path), base_seed=3,
        queue_size=4096, sample_shuffle_size=1, worker_type="process",
    )
    next(it)  # workers alive and the bounded queue saturated

    done = threading.Event()

    def closer():
        it.close()
        done.set()

    t = threading.Thread(target=closer, daemon=True)
    t.start()
    assert done.wait(timeout=30), "loader close() hung (queue drain deadlock)"


def test_worker_watchdog_kills_orphans_on_parent_sigkill(tmp_path):
    """Loader worker processes must die when the parent dies HARD (SIGKILL/
    SIGABRT) — paths where neither the daemon machinery nor atexit runs.
    Without the parent-death watchdog (wds._parent_watchdog), orphaned
    workers keep inherited stdout/stderr pipes open and any
    subprocess.run(capture_output=True) driving train.py blocks forever
    (observed with an aborted flagship run, round 4)."""
    import signal
    import subprocess
    import sys
    import time

    urls = make_shards(tmp_path, n_shards=2, per_shard=8)
    script = tmp_path / "loader_host.py"
    script.write_text(
        # NB the __main__ guard: mp spawn re-imports the main module in
        # every worker child.
        "import sys, time\n"
        f"sys.path.insert(0, {repr(os.getcwd())})\n"
        "from vfm_vae_tpu.data.wds import wds_dataloader\n"
        "if __name__ == '__main__':\n"
        f"    it = wds_dataloader({[str(u) for u in urls]!r}, batch_size=2,\n"
        "        resolution=32, workers=2, label_type='cls2id',\n"
        f"        cls_to_text_path={repr(str(write_c2t(tmp_path)))},\n"
        "        base_seed=0, sample_shuffle_size=1, worker_type='process')\n"
        "    next(it)\n"
        "    print('READY', flush=True)\n"
        "    time.sleep(300)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, str(script)], stdout=subprocess.PIPE, text=True,
        cwd=os.getcwd(),
    )
    def children_of(pid):
        # /proc scan instead of `ps`: forking ps can fail SILENTLY (empty
        # os.popen output) on a loaded 1-core host — observed flake.
        kids = []
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as f:
                    stat = f.read()
                ppid = int(stat.rsplit(")", 1)[1].split()[1])
                with open(f"/proc/{entry}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
            except OSError:
                continue
            if ppid == pid and "spawn_main" in cmd:
                kids.append(int(entry))
        return kids

    try:
        assert proc.stdout.readline().strip() == "READY"
        # Find the spawned worker PIDs (direct children running spawn_main).
        deadline = time.time() + 10
        kids = children_of(proc.pid)
        while not kids and time.time() < deadline:
            time.sleep(0.2)
            kids = children_of(proc.pid)
        assert kids, "no spawn worker children found"
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=10)
        deadline = time.time() + 20
        while time.time() < deadline:
            alive = [k for k in kids if os.path.exists(f"/proc/{k}")]
            if not alive:
                break
            time.sleep(0.5)
        assert not alive, f"orphaned loader workers survived parent SIGKILL: {alive}"
    finally:
        if proc.poll() is None:
            proc.kill()
