"""Native (C++) host-runtime kernels, loaded via ctypes.

The device owns the numerics; the host owns GA bookkeeping. These kernels
replace the numpy O(n^2) dominance-matrix machinery, which allocates
n^2-size temporaries (10k-candidate populations — the BASELINE north-star
ensemble — need ~1.2 GB per sort in numpy and ~100 KB here).

The library compiles on first use with g++ (cached next to the source) and
every entry point has a pure-numpy fallback, so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nsga_core.cpp")
_LIB = os.path.join(_DIR, "libnsga_core.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.nd_sort.restype = ctypes.c_int
    lib.nd_sort.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    lib.crowding.restype = None
    lib.crowding.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
    if hasattr(lib, "hv3d_contrib"):  # absent in a stale prebuilt .so
        lib.hv3d_contrib.restype = None
        lib.hv3d_contrib.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
    if hasattr(lib, "hv3d_one_contrib"):
        lib.hv3d_one_contrib.restype = ctypes.c_double
        lib.hv3d_one_contrib.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
    lib.associate.restype = None
    lib.associate.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
    _lib = lib
    return _lib


def nd_sort_ranks(F: np.ndarray) -> np.ndarray | None:
    """(n,) int32 front rank per solution, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    F = np.ascontiguousarray(F, np.float64)
    n, m = F.shape
    ranks = np.empty(n, np.int32)
    lib.nd_sort(F, n, m, ranks)
    return ranks


def crowding_native(F: np.ndarray, idx: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    F = np.ascontiguousarray(F, np.float64)
    idx = np.ascontiguousarray(idx, np.int32)
    out = np.empty(len(idx), np.float64)
    lib.crowding(F, F.shape[0], F.shape[1], idx, len(idx), out)
    return out


def associate_native(Fn: np.ndarray, unit_dirs: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    Fn = np.ascontiguousarray(Fn, np.float64)
    U = np.ascontiguousarray(unit_dirs, np.float64)
    niche = np.empty(Fn.shape[0], np.int32)
    dist = np.empty(Fn.shape[0], np.float64)
    lib.associate(Fn, Fn.shape[0], Fn.shape[1], U, U.shape[0], niche, dist)
    return niche, dist


def hv3d_contrib_native(F: np.ndarray, ref: np.ndarray) -> np.ndarray | None:
    """Leave-one-out 3-objective hypervolume contributions (exact), or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "hv3d_contrib"):
        return None
    F = np.ascontiguousarray(F, np.float64)
    ref = np.ascontiguousarray(ref, np.float64)
    out = np.empty(len(F), np.float64)
    lib.hv3d_contrib(F, len(F), ref, out)
    return out


def hv3d_one_contrib_native(F: np.ndarray, i: int,
                            ref: np.ndarray) -> float | None:
    """Exact exclusive hypervolume of point ``i`` of F (n, 3) w.r.t. ref,
    O(n log n) — the single-point refresh behind SMS-EMOA's lazy-greedy
    survival. None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "hv3d_one_contrib"):
        return None
    F = np.ascontiguousarray(F, np.float64)
    ref = np.ascontiguousarray(ref, np.float64)
    return float(lib.hv3d_one_contrib(F, len(F), int(i), ref))
