"""Native (C++) host-side geometry ops, loaded over ctypes.

Counterpart of the reference's CPython extension modules
(reference: cpp_wrappers/cpp_subsampling/wrapper.cpp,
cpp_wrappers/cpp_neighbors/wrapper.cpp) with the same observable semantics
(barycenter voxels; distance-sorted, shadow-padded neighbor rows) but a
cell-grid search design and a plain C ABI (no Python C-API surface to
maintain). Built on demand with g++ (-O3 -fopenmp); used for CPU parity
tests and offline dataset preparation — the training path runs the
on-device XLA versions in :mod:`d3feat_tpu.ops`.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "geometry.cpp")
_SO = os.path.join(_HERE, "_build", "libd3feat_geometry.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _src_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path.

    The build is keyed on a content hash of the source (recorded in a
    sidecar file), never on mtimes: a fresh checkout gives the source and
    any stale artifact identical timestamps, and only a from-source build
    is trustworthy — binaries are never committed (``_build/`` is
    gitignored).
    """
    with _lock:
        digest = _src_digest()
        stamp = _SO + ".sha256"
        if not force and os.path.exists(_SO) and os.path.exists(stamp):
            with open(stamp) as f:
                if f.read().strip() == digest:
                    return _SO
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
            "-o", _SO, _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(stamp, "w") as f:
            f.write(digest + "\n")
        return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.d3f_grid_subsample_batch.restype = ctypes.c_int
        lib.d3f_grid_subsample_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.d3f_radius_neighbors_batch.restype = ctypes.c_int
        lib.d3f_radius_neighbors_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.float32)


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.int32)


def grid_subsample_batch(
    points: np.ndarray, lengths, voxel: float, capacity: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Barycenter voxel subsampling of stacked clouds.

    Returns (points [total, 3], lengths [B], overflow). Output rows are
    deterministically ordered by (cloud, voxel z, y, x).
    """
    lib = _load()
    pts = _f32(points)
    lens = _i32(lengths)
    cap = int(capacity) if capacity is not None else len(pts)
    out = np.empty((cap, 3), np.float32)
    out_lens = np.zeros(len(lens), np.int32)
    total = np.zeros(1, np.int32)
    rc = lib.d3f_grid_subsample_batch(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(lens), ctypes.c_float(voxel),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        total.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[: int(total[0])].copy(), out_lens, bool(rc)


def radius_neighbors_batch(
    queries: np.ndarray, supports: np.ndarray, q_lengths, s_lengths,
    radius: float, max_k: int,
) -> np.ndarray:
    """[Nq, max_k] int32 distance-sorted neighbor indices, shadow = Ns."""
    lib = _load()
    q = _f32(queries)
    s = _f32(supports)
    ql = _i32(q_lengths)
    sl = _i32(s_lengths)
    out = np.empty((len(q), max_k), np.int32)
    lib.d3f_radius_neighbors_batch(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ql.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(ql), ctypes.c_float(radius), max_k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
