"""ctypes bindings to the native AMR graph builder (tree_builder.cpp).

Built by `make` in this directory (g++ -shared). Falls back gracefully:
callers check `available()` and use the pure-Python mesh/tree.py builder
when the shared library is missing. The two implementations are
cross-checked leaf-for-leaf and table-for-table in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libm3native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-s"], cwd=os.path.dirname(__file__),
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.m3_build_quadtree.restype = ctypes.c_int64
    lib.m3_build_quadtree.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    lib.m3_neighbor_table.restype = ctypes.c_int32
    lib.m3_neighbor_table.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_quadtree(coef: float, index_exp: float, depth: int,
                   max_leaves: int = 1 << 20
                   ) -> Optional[List[Tuple[int, int, int]]]:
    """Hilbert-ordered leaves for predicate r < coef / level^index
    (root always refines). None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros(3 * max_leaves, np.int64)
    n = lib.m3_build_quadtree(
        coef, index_exp, depth,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_leaves)
    if n < 0:
        raise MemoryError("m3_build_quadtree: too many leaves")
    tri = out[:3 * n].reshape(n, 3)
    return [(int(l), int(i), int(j)) for l, i, j in tri]


def neighbor_table(leaves):
    """NeighborTable arrays for a Hilbert-ordered leaf list, or None."""
    lib = _load()
    if lib is None:
        return None
    count = len(leaves)
    flat = np.asarray(leaves, np.int64).reshape(-1)
    case = np.zeros((count, 4), np.int32)
    same = np.zeros((count, 4), np.int32)
    coarse = np.zeros((count, 4), np.int32)
    half = np.zeros((count, 4), np.int32)
    fine = np.zeros((count, 4, 2), np.int32)
    p32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.m3_neighbor_table(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), count,
        p32(case), p32(same), p32(coarse), p32(half), p32(fine))
    if rc != 0:
        raise ValueError("m3_neighbor_table: tree is not 2:1 balanced")
    return case, same, coarse, half, fine
