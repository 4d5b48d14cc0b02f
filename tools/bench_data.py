#!/usr/bin/env python
"""Input-pipeline throughput benchmark (SURVEY M3: the host loader must not
bottleneck the chips). Builds synthetic JPEG shards, then measures img/s of
the streaming loader (native ctar when available) with augmentation.

  python tools/bench_data.py [--images 4000] [--workers 8]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=4000)
    ap.add_argument("--per-shard", type=int, default=500)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--src-size", type=int, default=320)
    args = ap.parse_args()

    import PIL.Image

    from vfm_vae_tpu.data.wds import wds_dataloader
    from vfm_vae_tpu.data.ctar import native_available

    root = tempfile.mkdtemp(prefix="bench-data-")
    rng = np.random.default_rng(0)
    urls = []
    idx = 0
    n_shards = (args.images + args.per_shard - 1) // args.per_shard
    for s in range(n_shards):
        url = os.path.join(root, f"{s:05d}.tar")
        with tarfile.open(url, "w") as tf:
            for _ in range(min(args.per_shard, args.images - idx)):
                arr = rng.integers(0, 255, (args.src_size, args.src_size, 3), dtype=np.uint8)
                buf = io.BytesIO()
                PIL.Image.fromarray(arr).save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:08d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(idx % 1000).encode()
                info = tarfile.TarInfo(f"{idx:08d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
                idx += 1
        urls.append(url)

    print(f"built {idx} JPEGs in {len(urls)} shards; native ctar: {native_available()}")
    c2t = os.path.join(root, "c2t.json")
    import json

    with open(c2t, "w") as f:
        json.dump({str(i): f"class {i}" for i in range(1000)}, f)

    it = wds_dataloader(
        urls, batch_size=64, resolution=args.resolution, workers=args.workers,
        label_type="cls2id", cls_to_text_path=c2t, data_augmentation=True,
        one_epoch=True, base_seed=0,
    )
    t0 = time.perf_counter()
    total = 0
    for images, labels in it:
        total += images.shape[0]
    dt = time.perf_counter() - t0
    print(f"{total} images in {dt:.2f}s -> {total / dt:.0f} img/s host throughput "
          f"({args.workers} workers)")


if __name__ == "__main__":
    main()
