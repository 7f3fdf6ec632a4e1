"""ctypes bindings for the native host kernels (native/beam_native.cpp).

The shared library is built on first use with g++ (cached next to the
source); every entry point has a NumPy fallback so the package works on
machines without a toolchain. The native path covers the per-scan host
critical path: ring-grid organization and voxel downsampling (SURVEY.md §7's
'host orchestration … data loaders' as native components).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "beam_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "beam_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.organize_scan.restype = ctypes.c_int
            lib.voxel_downsample.restype = ctypes.c_int
            lib.interp_positions.restype = None
            lib.index_log.restype = ctypes.c_int64
            lib.decode_imu_batch.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def organize_scan_native(points: np.ndarray, rings: np.ndarray,
                         times: Optional[np.ndarray], n_rings: int,
                         width: int):
    """Ring-grid organization; returns (xyz [R,W,3], time [R,W],
    valid [R,W]) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    rg = np.ascontiguousarray(rings, np.int32)
    tm = (np.ascontiguousarray(times, np.float32) if times is not None
          else None)
    n = len(pts)
    out_xyz = np.zeros((n_rings, width, 3), np.float32)
    out_time = np.zeros((n_rings, width), np.float32)
    out_valid = np.zeros((n_rings, width), np.uint8)
    lib.organize_scan(
        _ptr(pts, ctypes.c_float), _ptr(rg, ctypes.c_int32),
        _ptr(tm, ctypes.c_float) if tm is not None else None,
        ctypes.c_int(n), ctypes.c_int(n_rings), ctypes.c_int(width),
        _ptr(out_xyz, ctypes.c_float), _ptr(out_time, ctypes.c_float),
        _ptr(out_valid, ctypes.c_uint8))
    return out_xyz, out_time, out_valid.astype(bool)


def voxel_downsample(points: np.ndarray, voxel: float,
                     valid: Optional[np.ndarray] = None,
                     cap: Optional[int] = None) -> np.ndarray:
    """Centroid voxel filter; native when available, NumPy otherwise."""
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    n = len(pts)
    if cap is None:
        cap = n
    lib = _load()
    if lib is not None and n > 0:
        out = np.zeros((cap, 3), np.float32)
        v = (np.ascontiguousarray(valid, np.uint8) if valid is not None
             else None)
        m = lib.voxel_downsample(
            _ptr(pts, ctypes.c_float),
            _ptr(v, ctypes.c_uint8) if v is not None else None,
            ctypes.c_int(n), ctypes.c_float(voxel),
            _ptr(out, ctypes.c_float), ctypes.c_int(cap))
        return out[:m]
    # NumPy fallback
    if valid is not None:
        pts = pts[np.asarray(valid, bool)]
    if len(pts) == 0 or voxel <= 0:
        return pts[:cap]
    cells = np.floor(pts / voxel).astype(np.int64)
    _, inv = np.unique(cells, axis=0, return_inverse=True)
    k = inv.max() + 1 if len(inv) else 0
    sums = np.zeros((k, 3), np.float64)
    cnts = np.zeros(k, np.int64)
    np.add.at(sums, inv, pts)
    np.add.at(cnts, inv, 1)
    return (sums / cnts[:, None]).astype(np.float32)[:cap]


def interp_positions(traj_t: np.ndarray, traj_p: np.ndarray,
                     query_t: np.ndarray) -> np.ndarray:
    lib = _load()
    tt = np.ascontiguousarray(traj_t, np.float64)
    tp = np.ascontiguousarray(traj_p, np.float32)
    qt = np.ascontiguousarray(query_t, np.float64)
    if lib is not None:
        out = np.zeros((len(qt), 3), np.float32)
        lib.interp_positions(
            _ptr(tt, ctypes.c_double), _ptr(tp, ctypes.c_float),
            ctypes.c_int(len(tt)), _ptr(qt, ctypes.c_double),
            ctypes.c_int(len(qt)), _ptr(out, ctypes.c_float))
        return out
    out = np.stack([np.interp(qt, tt, tp[:, k]) for k in range(3)], axis=1)
    return out.astype(np.float32)


def index_log_native(buf: bytes):
    """Index a sensor log buffer: (types u8[N], stamps f64[N],
    offsets i64[N], sizes i64[N]) or None without the native lib."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(buf, np.uint8)
    max_records = max(len(buf) // 13, 1)
    types = np.zeros(max_records, np.uint8)
    stamps = np.zeros(max_records, np.float64)
    offsets = np.zeros(max_records, np.int64)
    sizes = np.zeros(max_records, np.int64)
    n = lib.index_log(_ptr(arr, ctypes.c_uint8), ctypes.c_int64(len(buf)),
                      _ptr(types, ctypes.c_uint8),
                      _ptr(stamps, ctypes.c_double),
                      _ptr(offsets, ctypes.c_int64),
                      _ptr(sizes, ctypes.c_int64),
                      ctypes.c_int64(max_records))
    return types[:n], stamps[:n], offsets[:n], sizes[:n]


def decode_imu_batch_native(buf: bytes, offsets: np.ndarray):
    """[N,6] float32 (w, a) rows gathered from IMU record payloads."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(buf, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    out = np.zeros((len(offsets), 6), np.float32)
    lib.decode_imu_batch(_ptr(arr, ctypes.c_uint8),
                         _ptr(offsets, ctypes.c_int64),
                         ctypes.c_int(len(offsets)),
                         _ptr(out, ctypes.c_float))
    return out
