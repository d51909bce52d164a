"""ctypes loader for the native host kernels (solvercore.cpp).

Compiles on first import (g++ -O3 -shared), caches the .so next to the
source, and exposes NumPy-checked wrappers. Every function has a pure-NumPy
fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "solvercore.cpp")
_SO = os.path.join(_HERE, "libsolvercore.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # toolchain missing: numpy fallbacks take over
        print(f"[solvercore] native build failed: {e}", file=sys.stderr)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.ell_from_sorted_coo.restype = i64
    lib.ell_from_sorted_coo.argtypes = [
        i64, i64, i64, p64, p64, pf64, i64, pf64, p32, i64,
    ]
    lib.greedy_color.restype = i32
    lib.greedy_color.argtypes = [i64, i64, p32, p32]
    lib.patch_widths.restype = i64
    lib.patch_widths.argtypes = [p64, p32, i64, i64, p64]
    lib.patch_fill.restype = None
    lib.patch_fill.argtypes = [p64, p32, i64, i64, i64, i32, p32]
    lib.rcm_order.restype = None
    lib.rcm_order.argtypes = [i64, i64, p32, p32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def greedy_color(cols: np.ndarray) -> np.ndarray:
    """Greedy coloring of an ELL adjacency; returns per-node colors."""
    n, K = cols.shape
    lib = _load()
    cols = np.ascontiguousarray(cols, np.int32)
    if lib is not None:
        out = np.empty(n, np.int32)
        lib.greedy_color(n, K, cols, out)
        return out
    # numpy fallback (slow python loop)
    colors = -np.ones(n, dtype=np.int32)
    for i in range(n):
        used = set(
            colors[c] for c in cols[i] if c != i and 0 <= c < n and colors[c] >= 0
        )
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def union_patches(indptr: np.ndarray, indices: np.ndarray, lo: int, hi: int,
                  dummy: int) -> np.ndarray:
    """Padded patch table: row p in [lo,hi) -> sorted unique(indices[p] + p)."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    npatch = hi - lo
    if lib is not None:
        widths = np.empty(npatch, np.int64)
        W = int(lib.patch_widths(indptr, indices, lo, hi, widths))
        table = np.empty((npatch, W), np.int32)
        lib.patch_fill(indptr, indices, lo, hi, W, dummy, table)
        return table
    rows = []
    W = 0
    for p in range(lo, hi):
        d = np.unique(
            np.concatenate([indices[indptr[p]: indptr[p + 1]], [p]])
        )
        rows.append(d)
        W = max(W, len(d))
    table = np.full((npatch, W), dummy, np.int32)
    for i, d in enumerate(rows):
        table[i, : len(d)] = d
    return table


def rcm_order(cols: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation from an ELL adjacency."""
    n, K = cols.shape
    lib = _load()
    cols = np.ascontiguousarray(cols, np.int32)
    if lib is not None:
        out = np.empty(n, np.int32)
        lib.rcm_order(n, K, cols, out)
        return out
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    rows = np.repeat(np.arange(n), K)
    S = sp.coo_matrix(
        (np.ones(n * K), (rows, cols.reshape(-1))), shape=(n, n)
    ).tocsr()
    return reverse_cuthill_mckee(S).astype(np.int32)


def ell_from_sorted_coo(n_rows, n_cols, rows, cols, vals, K=None):
    """COO (lexicographically sorted) -> padded ELL arrays."""
    lib = _load()
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    if lib is not None:
        if K is None:
            # one cheap pass for max degree via bincount on unique pairs
            keys = rows * n_cols + cols
            uniq = np.unique(keys)
            K = int(np.bincount((uniq // n_cols).astype(np.int64),
                                minlength=n_rows).max())
        out_vals = np.empty((n_rows, K), np.float64)
        out_cols = np.empty((n_rows, K), np.int32)
        r = lib.ell_from_sorted_coo(
            n_rows, n_cols, len(rows), rows, cols, vals, K, out_vals,
            out_cols, K,
        )
        if r < 0:
            raise ValueError("row degree exceeds requested ELL width")
        return out_vals, out_cols
    from ..algebra.ell import ell_from_coo

    ell = ell_from_coo(n_rows, n_cols, rows, cols, vals, row_width=K)
    return np.asarray(ell.values), np.asarray(ell.cols)
