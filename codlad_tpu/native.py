"""ctypes bindings for the native C++ helpers (native/codlad_native.cpp).

Lazily builds `libcodlad_native.so` with g++ on first use; every entry
point has a pure-Python fallback (scipy LAP, numpy O(N^2) radius graph), so
the framework works without a toolchain — the native path is the production
data-loader/OT configuration.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "codlad_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libcodlad_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.lap_solve.restype = ctypes.c_int
            lib.lap_solve.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            lib.radius_graph.restype = ctypes.c_int64
            lib.radius_graph.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            lib.xtc_decode.restype = ctypes.c_int
            lib.xtc_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
            lib.xtc_encode.restype = ctypes.c_int64
            lib.xtc_encode.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_float,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def lap_solve(cost):
    """Exact assignment: returns col_of_row [n] minimizing sum cost[i, col[i]]."""
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    lib = load()
    if lib is not None:
        out = np.empty(n, dtype=np.int32)
        rc = lib.lap_solve(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc == 0:
            return out
    from scipy.optimize import linear_sum_assignment

    _, col = linear_sum_assignment(cost)
    return col.astype(np.int32)


def radius_graph(xyz, valid, cutoff):
    """Undirected (i<j) pairs within cutoff among valid points."""
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    n = xyz.shape[0]
    lib = load()
    if lib is not None:
        cap = max(int(n) * 64, 1024)
        for _ in range(4):
            out = np.empty((cap, 2), dtype=np.int32)
            cnt = lib.radius_graph(
                xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n, float(cutoff),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
            if cnt <= cap:
                pairs = out[:cnt]
                # canonical sorted order (numpy fallback emits sorted rows)
                order = np.lexsort((pairs[:, 1], pairs[:, 0]))
                return pairs[order]
            cap = int(cnt) + 1024
    # numpy fallback: dense distances, masked
    pos = np.where(valid[:, None].astype(bool), xyz,
                   1e6 * (1.0 + np.arange(n, dtype=np.float64))[:, None])
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    ii, jj = np.where((d <= cutoff) & np.triu(np.ones((n, n), dtype=bool), k=1))
    return np.stack([ii, jj], axis=-1).astype(np.int32)


def xtc_decode(data, natoms, minint, maxint, smallidx, precision):
    """Decode a 3dfcoord payload -> [natoms, 3] float32, or None if the
    native library is unavailable (caller falls back to pure Python)."""
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    mi = np.asarray(minint, dtype=np.int32)
    ma = np.asarray(maxint, dtype=np.int32)
    out = np.empty((int(natoms), 3), dtype=np.float32)
    rc = lib.xtc_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        int(natoms), mi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ma.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), int(smallidx),
        float(precision), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"xtc_decode failed (rc={rc})")
    return out


def xtc_encode(xyz, precision):
    """Encode [N, 3] float32 -> (payload bytes, minint, maxint, smallidx),
    or None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    cap = max(n * 16, 4096)
    mi = np.empty(3, np.int32)
    ma = np.empty(3, np.int32)
    si = np.empty(1, np.int32)
    out = np.empty(cap, np.uint8)
    nb = lib.xtc_encode(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        float(precision), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, mi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ma.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        si.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if nb < 0:
        raise ValueError(f"xtc_encode failed (rc={nb})")
    return bytes(out[:nb]), mi.tolist(), ma.tolist(), int(si[0])
