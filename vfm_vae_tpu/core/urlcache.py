"""URL download with local cache (reference: dnnlib/util.py:396 open_url,
:124 make_cache_dir_path — used for detector pickles and the LPIPS ckpt).
No-network environments simply pre-populate the cache dir."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from typing import Optional


def make_cache_dir_path(*paths: str) -> str:
    base = os.environ.get(
        "VFM_VAE_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "vfm-vae-tpu-cache"),
    )
    path = os.path.join(base, *paths)
    os.makedirs(path, exist_ok=True)
    return path


def md5_hash(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def open_url(
    url: str,
    cache_dir: Optional[str] = None,
    expected_md5: Optional[str] = None,
    return_filename: bool = True,
):
    """Fetch `url` into the cache (or reuse); local paths pass through.
    Returns the filename (or an open file object if return_filename=False).
    """
    if os.path.isfile(url):
        return url if return_filename else open(url, "rb")

    cache_dir = cache_dir or make_cache_dir_path("downloads")
    key = hashlib.md5(url.encode()).hexdigest()[:16]
    fname = os.path.join(cache_dir, f"{key}-{os.path.basename(url.split('?')[0])}")

    if not os.path.isfile(fname):
        import urllib.request

        tmp = fname + ".tmp"
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, fname)

    if expected_md5 is not None:
        got = md5_hash(fname)
        if got != expected_md5:
            os.remove(fname)
            raise IOError(f"md5 mismatch for {url}: {got} != {expected_md5}")
    return fname if return_filename else open(fname, "rb")
