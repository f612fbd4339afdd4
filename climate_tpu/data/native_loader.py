"""ctypes bridge to the native C++ chunk decoder (native/zarr_loader.cpp).

Builds the shared library on first use if the toolchain is available; falls
back to the pure-ctypes blosc path in zarr.py otherwise (returns None).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libzarrloader.so")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _try_build() -> bool:
    makefile_dir = os.path.join(_REPO_ROOT, "native")
    if not os.path.exists(os.path.join(makefile_dir, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", makefile_dir],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.SubprocessError, OSError):
        return False
    return os.path.exists(_LIB_PATH)


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL | None:
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ctpu_decode_chunks.restype = ctypes.c_int
    lib.ctpu_decode_chunks.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    return lib


def native_available() -> bool:
    return _lib() is not None


def native_decode_chunks(paths: list[str], chunk_nbytes: int) -> list[memoryview] | None:
    """Decode chunk files into one contiguous buffer; returns per-chunk views.

    Returns None when the native library is unavailable (caller falls back).
    """
    lib = _lib()
    if lib is None or not paths:
        return None if lib is None else []
    n = len(paths)
    out = bytearray(n * chunk_nbytes)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    n_threads = min(os.cpu_count() or 1, 8)
    out_buf = (ctypes.c_char * len(out)).from_buffer(out)
    rc = lib.ctpu_decode_chunks(c_paths, n, out_buf, chunk_nbytes, n_threads)
    if rc != 0:
        return None
    view = memoryview(out)
    return [view[i * chunk_nbytes : (i + 1) * chunk_nbytes] for i in range(n)]
