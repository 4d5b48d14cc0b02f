"""ctypes binding for the native tar reader (data/native/ctar.cpp).

Builds the shared library on first use (g++ -O3 -shared, cached next to the
source); falls back cleanly to Python tarfile when no compiler is available
so the pipeline still works everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Iterator, List, Optional, Tuple

_SRC = os.path.join(os.path.dirname(__file__), "native", "ctar.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "libctar.so")
_LIB = None
_LOCK = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _LIB = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _LIB = False
            return None
        lib.ctar_open.restype = ctypes.c_void_p
        lib.ctar_open.argtypes = [ctypes.c_char_p]
        lib.ctar_count.restype = ctypes.c_long
        lib.ctar_count.argtypes = [ctypes.c_void_p]
        lib.ctar_entry.restype = ctypes.c_int
        lib.ctar_entry.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.ctar_read.restype = ctypes.c_long
        lib.ctar_read.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_char_p
        ]
        lib.ctar_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def native_available() -> bool:
    return get_lib() is not None


class CTar:
    """Indexed random-access tar reader over the native library."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ctar unavailable")
        self._lib = lib
        self._h = lib.ctar_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.entries: List[Tuple[str, int, int]] = []
        name_buf = ctypes.create_string_buffer(4096)
        off = ctypes.c_long()
        size = ctypes.c_long()
        for i in range(lib.ctar_count(self._h)):
            if lib.ctar_entry(self._h, i, name_buf, 4096, ctypes.byref(off), ctypes.byref(size)) == 0:
                self.entries.append((name_buf.value.decode(), off.value, size.value))

    def read(self, offset: int, size: int) -> bytes:
        buf = ctypes.create_string_buffer(size)
        got = self._lib.ctar_read(self._h, offset, size, buf)
        return buf.raw[:got]

    def close(self):
        if self._h:
            self._lib.ctar_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def iter_tar_samples_native(url: str) -> Iterator[Dict[str, bytes]]:
    """Same grouping contract as data.wds.iter_tar_samples, native-backed."""
    with CTar(url) as t:
        current_key = None
        sample: Dict[str, bytes] = {}
        for name, off, size in t.entries:
            base = os.path.basename(name)
            if "." not in base:
                continue
            key, ext = base.split(".", 1)
            if current_key is not None and key != current_key and sample:
                sample["__key__"] = current_key.encode()
                sample["__url__"] = url.encode()
                yield sample
                sample = {}
            current_key = key
            sample[ext.lower()] = t.read(off, size)
        if sample and current_key is not None:
            sample["__key__"] = current_key.encode()
            sample["__url__"] = url.encode()
            yield sample
