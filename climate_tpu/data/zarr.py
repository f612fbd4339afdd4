"""Minimal Zarr v2 directory-store reader (consolidated metadata).

Replaces the reference's xarray/zarr/dask ingestion (main_baseline.py:169,
xr.open_zarr) with a dependency-free reader tuned for this workload: the whole
store is ~368 MB compressed / ~1.5 GB raw, so arrays are decoded once into
contiguous host buffers and cached; all downstream slicing is plain numpy.

Chunk decode goes through the native C++ loader (native/zarr_loader.cpp) when
built, else the ctypes C-Blosc binding (climate_tpu.data.blosc).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from . import blosc
from .native_loader import native_decode_chunks


@dataclass(frozen=True)
class ArrayMeta:
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    fill_value: Any
    order: str
    compressor: dict | None
    dims: tuple[str, ...]
    attrs: dict = field(default_factory=dict)


def _parse_fill(fill, dtype: np.dtype):
    if fill is None:
        return None
    if isinstance(fill, str) and fill in ("NaN", "Infinity", "-Infinity"):
        return {"NaN": math.nan, "Infinity": math.inf, "-Infinity": -math.inf}[fill]
    return fill


class ZarrGroup:
    """Read-only Zarr v2 group over a directory store."""

    def __init__(self, path: str):
        self.path = path
        self._meta: dict[str, dict] = {}
        self._attrs: dict[str, dict] = {}
        self._cache: dict[str, np.ndarray] = {}
        zmeta = os.path.join(path, ".zmetadata")
        if os.path.exists(zmeta):
            with open(zmeta) as f:
                consolidated = json.load(f)["metadata"]
            for key, val in consolidated.items():
                if key.endswith("/.zarray"):
                    self._meta[key[: -len("/.zarray")]] = val
                elif key.endswith("/.zattrs"):
                    self._attrs[key[: -len("/.zattrs")]] = val
        else:  # walk the directory (non-consolidated store)
            for name in sorted(os.listdir(path)):
                zarray = os.path.join(path, name, ".zarray")
                if os.path.exists(zarray):
                    with open(zarray) as f:
                        self._meta[name] = json.load(f)
                    zattrs = os.path.join(path, name, ".zattrs")
                    if os.path.exists(zattrs):
                        with open(zattrs) as f:
                            self._attrs[name] = json.load(f)

    @property
    def array_names(self) -> list[str]:
        return sorted(self._meta)

    def meta(self, name: str) -> ArrayMeta:
        m = self._meta[name]
        dtype = np.dtype(m["dtype"])
        attrs = self._attrs.get(name, {})
        return ArrayMeta(
            shape=tuple(m["shape"]),
            chunks=tuple(m["chunks"]),
            dtype=dtype,
            fill_value=_parse_fill(m.get("fill_value"), dtype),
            order=m.get("order", "C"),
            compressor=m.get("compressor"),
            dims=tuple(attrs.get("_ARRAY_DIMENSIONS", ())),
            attrs=attrs,
        )

    def dims(self, name: str) -> tuple[str, ...]:
        return self.meta(name).dims

    def __contains__(self, name: str) -> bool:
        return name in self._meta

    def read(self, name: str) -> np.ndarray:
        """Decode the full array into a contiguous numpy buffer (cached)."""
        if name in self._cache:
            return self._cache[name]
        meta = self.meta(name)
        if meta.order != "C":
            raise NotImplementedError(f"order={meta.order!r} not supported")
        arr = self._read_full(name, meta)
        arr.setflags(write=False)
        self._cache[name] = arr
        return arr

    def _read_full(self, name: str, meta: ArrayMeta) -> np.ndarray:
        shape, chunks = meta.shape, meta.chunks
        grid = tuple(-(-s // c) for s, c in zip(shape, chunks))
        if meta.fill_value is not None and np.issubdtype(meta.dtype, np.floating):
            out = np.full(shape, meta.fill_value, dtype=meta.dtype)
        else:
            out = np.zeros(shape, dtype=meta.dtype)

        # Enumerate chunk files; missing chunk files mean "all fill_value".
        jobs = []  # (path, chunk_index_tuple)
        for flat in range(int(np.prod(grid)) if grid else 1):
            idx, rem = [], flat
            for g in reversed(grid):
                idx.append(rem % g)
                rem //= g
            idx = tuple(reversed(idx))
            cpath = os.path.join(self.path, name, ".".join(map(str, idx)) or "0")
            if os.path.exists(cpath):
                jobs.append((cpath, idx))

        if not jobs:
            return out

        chunk_nbytes = int(np.prod(chunks)) * meta.dtype.itemsize
        decoded = native_decode_chunks([p for p, _ in jobs], chunk_nbytes)
        if decoded is None:
            decoded = []
            for p, _ in jobs:
                with open(p, "rb") as f:
                    raw = f.read()
                if meta.compressor is None:
                    decoded.append(raw)
                elif meta.compressor.get("id") == "blosc":
                    decoded.append(blosc.decompress(raw))
                else:
                    raise NotImplementedError(f"compressor {meta.compressor}")

        for (cpath, idx), buf in zip(jobs, decoded):
            carr = np.frombuffer(buf, dtype=meta.dtype).reshape(chunks)
            sel = tuple(
                slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, shape)
            )
            trim = tuple(slice(0, sl.stop - sl.start) for sl in sel)
            out[sel] = carr[trim]
        return out


def open_zarr(path: str) -> ZarrGroup:
    if not os.path.exists(path):
        raise FileNotFoundError(f"Data path not found: {path}")
    return ZarrGroup(path)
