"""ctypes loader for the native runtime core (fvcore.cpp).

Builds libfvcore.so lazily with g++ on first use (cached next to the source);
every entry point has a NumPy fallback so the framework works without a
toolchain. No pybind11 — plain C ABI through ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fvcore.cpp")
_SO = os.path.join(_HERE, "libfvcore.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            i64 = ctypes.c_int64
            i32 = ctypes.c_int32
            p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.fv_extract_faces.restype = i64
            lib.fv_extract_faces.argtypes = [i64, i32, p64, p64, p64]
            lib.fv_ilu0_factor.restype = i64
            lib.fv_ilu0_factor.argtypes = [i64, p32, p32, pf64, p64]
            lib.fv_level_schedule.restype = i64
            lib.fv_level_schedule.argtypes = [i64, p32, p32, i32, p32]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def extract_faces(cells: np.ndarray):
    """cells: (nC, 8|4) int64 → (face_vertices (nF,4) -1-padded, face_cells
    (nF,2)); None if native core unavailable (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    n_cells, nv = cells.shape
    nf = 6 if nv == 8 else 4
    fv = np.empty((n_cells * nf, 4), dtype=np.int64)
    fc = np.empty((n_cells * nf, 2), dtype=np.int64)
    count = lib.fv_extract_faces(n_cells, nv, cells, fv, fc)
    if count < 0:
        raise ValueError("broken mesh: face shared by >2 cells")
    return fv[:count], fc[:count]


def ilu0_factor(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray):
    """Returns (factored data copy, diag positions); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(indptr) - 1
    data = np.ascontiguousarray(data, dtype=np.float64).copy()
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    diag = np.empty(n, dtype=np.int64)
    rc = lib.fv_ilu0_factor(n, indptr, indices, data, diag)
    if rc != 0:
        raise ValueError(f"ILU(0): missing diagonal in row {-rc - 1}")
    return data, diag


def level_schedule(indptr: np.ndarray, indices: np.ndarray, strict_lower: bool, n: int):
    """Returns per-row level array; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    level = np.zeros(n, dtype=np.int32)
    lib.fv_level_schedule(n, indptr, indices, 1 if strict_lower else 0, level)
    return level
