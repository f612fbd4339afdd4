"""Blosc chunk decompression.

The reference's Zarr store (data/processed.zarr) compresses every chunk with
blosc/LZ4 + byte-shuffle (see any `.zarray`: compressor id "blosc", cname
"lz4", shuffle 1). The reference relies on the numcodecs wheel; here we bind
the system C-Blosc library directly via ctypes, and the high-throughput path
is the native C++ loader in native/zarr_loader.cpp (which links the same lib).

Blosc chunk header (16 bytes):
  [0] format version  [1] codec version  [2] flags  [3] typesize
  [4:8]  nbytes  (uncompressed size, LE u32)
  [8:12] blocksize
  [12:16] cbytes (compressed size incl. header)
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from functools import lru_cache


class BloscError(RuntimeError):
    pass


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    for name in ("libblosc.so.1", "libblosc.so", ctypes.util.find_library("blosc")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.blosc_decompress_ctx.restype = ctypes.c_int
        lib.blosc_decompress_ctx.argtypes = [
            ctypes.c_void_p,  # src
            ctypes.c_void_p,  # dest
            ctypes.c_size_t,  # destsize
            ctypes.c_int,     # numinternalthreads
        ]
        return lib
    raise BloscError("C-Blosc shared library not found")


def decompressed_size(chunk: bytes) -> int:
    """Read the uncompressed byte count from a blosc chunk header."""
    if len(chunk) < 16:
        raise BloscError(f"blosc chunk too short: {len(chunk)} bytes")
    (nbytes,) = struct.unpack_from("<I", chunk, 4)
    return nbytes


def decompress(chunk: bytes, out: memoryview | None = None) -> bytes | memoryview:
    """Decompress one blosc chunk. Writes into `out` if given, else allocates."""
    nbytes = decompressed_size(chunk)
    if out is None:
        buf = ctypes.create_string_buffer(nbytes)
        dest = ctypes.addressof(buf)
    else:
        if len(out) < nbytes:
            raise BloscError(f"output buffer too small: {len(out)} < {nbytes}")
        dest = ctypes.addressof(ctypes.c_char.from_buffer(out))
    rc = _lib().blosc_decompress_ctx(chunk, dest, nbytes, 1)
    if rc <= 0:
        raise BloscError(f"blosc_decompress_ctx failed with code {rc}")
    if out is None:
        return buf.raw[:nbytes]
    return out[:nbytes]
