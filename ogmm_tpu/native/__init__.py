"""Native host library (C++) for the input pipeline, with numpy fallbacks.

Supplies the capabilities the reference delegates to third-party C++
(SURVEY.md §2.9): Open3D KD-tree radius search for GT overlap labels
(lib/o3dutils.py:96-135, 217-226), sklearn/scipy 1-NN
(datasets/datautils.py:23-39), and the per-cloud sequential FPS loop
(datasets/datautils.py:249-272). Bound via ctypes (no pybind11 in this
image); compiled on first use with g++ and cached next to the source.

Public API (all numpy in/out, fp32):
    radius_overlap(src_t, tgt, thresh) -> (src_label, tgt_label)
    nearest_neighbor(src, dst)         -> (dist, idx)
    fps_indices(xyz, npoint, start)    -> idx
    available()                        -> bool (native lib loaded)

Every entry point falls back to scipy/numpy when the native library can't be
built (missing toolchain), so the pipeline never hard-depends on it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cc")
_LIB = os.path.join(_HERE, "libogmm_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.ogmm_radius_overlap.argtypes = [
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_float,
            f32p, f32p]
        lib.ogmm_radius_overlap.restype = None
        lib.ogmm_nearest_neighbor.argtypes = [
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, f32p, i32p]
        lib.ogmm_nearest_neighbor.restype = None
        lib.ogmm_fps.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_int32, i32p]
        lib.ogmm_fps.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _c3(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a[:, :3], dtype=np.float32)


def radius_overlap(src_t: np.ndarray, tgt: np.ndarray, thresh: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Overlap masks after GT alignment — Open3D radius-search semantics."""
    lib = _load()
    s, t = _c3(src_t), _c3(tgt)
    if lib is not None:
        src_label = np.empty(len(s), np.float32)
        tgt_label = np.empty(len(t), np.float32)
        lib.ogmm_radius_overlap(s, len(s), t, len(t),
                                ctypes.c_float(thresh), src_label, tgt_label)
        return src_label, tgt_label
    from scipy.spatial import cKDTree
    tree = cKDTree(t)
    neigh = tree.query_ball_point(s, thresh)
    src_label = np.array([len(n) > 0 for n in neigh], dtype=np.float32)
    tgt_label = np.zeros(len(t), np.float32)
    hit = sorted({j for n in neigh for j in n})
    tgt_label[hit] = 1.0
    return src_label, tgt_label


def nearest_neighbor(src: np.ndarray, dst: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """1-NN distances + indices of src into dst."""
    lib = _load()
    s, d = _c3(src), _c3(dst)
    if lib is not None:
        dist = np.empty(len(s), np.float32)
        idx = np.empty(len(s), np.int32)
        lib.ogmm_nearest_neighbor(s, len(s), d, len(d), dist, idx)
        return dist, idx
    from scipy.spatial import cKDTree
    tree = cKDTree(d)
    dist, idx = tree.query(s, k=1)
    return dist.ravel().astype(np.float32), idx.ravel().astype(np.int32)


def fps_indices(xyz: np.ndarray, npoint: int, start: int) -> np.ndarray:
    """Sequential FPS index set with an explicit start point."""
    lib = _load()
    x = _c3(xyz)
    if lib is not None:
        idx = np.empty(npoint, np.int32)
        lib.ogmm_fps(x, len(x), npoint, int(start), idx)
        return idx
    n = len(x)
    dist = np.full(n, np.inf, np.float64)
    idx = np.zeros(npoint, np.int32)
    farthest = int(np.clip(start, 0, n - 1))
    for i in range(npoint):
        idx[i] = farthest
        d = np.sum((x - x[farthest]) ** 2, -1)
        np.minimum(dist, d, out=dist)
        farthest = int(np.argmax(dist))
    return idx
