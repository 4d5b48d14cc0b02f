"""Native tar reader vs Python tarfile equivalence + build smoke test."""

import io
import os
import tarfile

import numpy as np
import pytest


def make_tar(path, n=25, long_names=False):
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            data = rng.integers(0, 255, rng.integers(10, 5000), dtype=np.uint8).tobytes()
            prefix = ("deep/" * 20) if long_names and i % 5 == 0 else ""
            info = tarfile.TarInfo(f"{prefix}{i:08d}.bin")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cls = str(i).encode()
            info = tarfile.TarInfo(f"{prefix}{i:08d}.cls")
            info.size = len(cls)
            tf.addfile(info, io.BytesIO(cls))


@pytest.fixture(scope="module")
def native_lib():
    from vfm_vae_tpu.data.ctar import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    return True


def test_ctar_index_matches_tarfile(tmp_path, native_lib):
    from vfm_vae_tpu.data.ctar import CTar

    p = str(tmp_path / "a.tar")
    make_tar(p, n=30, long_names=True)
    with tarfile.open(p) as tf:
        want = {m.name: tf.extractfile(m).read() for m in tf if m.isfile()}
    with CTar(p) as t:
        got = {name: t.read(off, size) for name, off, size in t.entries}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], k


def test_native_sample_iterator_matches_python(tmp_path, native_lib):
    from vfm_vae_tpu.data.ctar import iter_tar_samples_native
    from vfm_vae_tpu.data import wds

    p = str(tmp_path / "b.tar")
    make_tar(p, n=20)

    native = list(iter_tar_samples_native(p))

    # Pure-python reference path.
    import importlib

    samples_py = []
    with tarfile.open(p, "r|*") as tf:
        current_key, sample = None, {}
        for member in tf:
            if not member.isfile():
                continue
            name = os.path.basename(member.name)
            key, ext = name.split(".", 1)
            if current_key is not None and key != current_key and sample:
                sample["__key__"] = current_key.encode()
                samples_py.append(sample)
                sample = {}
            current_key = key
            sample[ext.lower()] = tf.extractfile(member).read()
        if sample:
            sample["__key__"] = current_key.encode()
            samples_py.append(sample)

    assert len(native) == len(samples_py)
    for a, b in zip(native, samples_py):
        assert a["__key__"] == b["__key__"]
        assert a["bin"] == b["bin"]
        assert a["cls"] == b["cls"]
