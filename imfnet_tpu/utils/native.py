"""ctypes bindings for the native host library (native/host_ops.cpp).

Auto-builds with `make -C native` on first use when a toolchain is present;
falls back to the numpy implementations otherwise. The accelerated op is the
data-loader voxel dedup (the reference's `ME.utils.sparse_quantize` C++ path,
`lib/data_loaders.py:291`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimfnet_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # always invoke make: a no-op when the .so is current, a rebuild when
    # host_ops.cpp is newer (a stale .so would miss newly added symbols)
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.voxel_dedup.restype = ctypes.c_int64
    lib.voxel_dedup.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.count_within_radius.restype = ctypes.c_int64
    lib.count_within_radius.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
    ]
    lib.count_pairs_within_radius.restype = ctypes.c_int64
    lib.count_pairs_within_radius.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
    ]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def voxel_dedup(xyz: np.ndarray, voxel_size: float,
                max_out: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """(coords int32[k,3], sel int32[k]) — first-occurrence voxel dedup.
    Native hash table when available, numpy sort-unique fallback."""
    lib = _load()
    n = len(xyz)
    if max_out is None:
        max_out = n
    if lib is not None and n > 0:
        x = np.ascontiguousarray(xyz, np.float32)
        sel = np.empty(max_out, np.int32)
        coords = np.empty((max_out, 3), np.int32)
        k = lib.voxel_dedup(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, ctypes.c_float(voxel_size),
            sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_out,
        )
        order = np.argsort(sel[:k], kind="stable")
        return coords[:k][order], sel[:k][order]
    v = np.floor(xyz / voxel_size).astype(np.int32)
    _, sel = np.unique(v, axis=0, return_index=True)
    sel = np.sort(sel)
    return v[sel], sel.astype(np.int32)


def count_within_radius(src: np.ndarray, dst: np.ndarray, radius: float) -> int:
    lib = _load()
    if lib is not None:
        s = np.ascontiguousarray(src, np.float32)
        d = np.ascontiguousarray(dst, np.float32)
        return int(lib.count_within_radius(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(d),
            ctypes.c_float(radius),
        ))
    from scipy.spatial import cKDTree

    tree = cKDTree(dst)
    dd, _ = tree.query(src, k=1)
    return int((dd <= radius).sum())


def count_pairs_within_radius(src: np.ndarray, dst: np.ndarray,
                              radius: float) -> int:
    """Total (i, j) pairs with |src_i - dst_j| <= radius — the statistic
    `len(get_matching_indices(...))` measures (`util/pointcloud.py:56-69`),
    used by the KITTI <1000-GT-match pair rejection
    (`lib/data_loaders.py:586-588`)."""
    if len(src) == 0 or len(dst) == 0:
        return 0
    lib = _load()
    if lib is not None:
        s = np.ascontiguousarray(src, np.float32)
        d = np.ascontiguousarray(dst, np.float32)
        return int(lib.count_pairs_within_radius(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(d),
            ctypes.c_float(radius),
        ))
    from scipy.spatial import cKDTree

    tree = cKDTree(dst)
    return int(np.sum(tree.query_ball_point(src, radius, return_length=True)))
