"""ctypes bindings for the native host runtime (native/manifold_native.cc).

Provides host-side exact kNN (the FAISS replacement for graphs too large to
build on-chip), edge coalescing and Dijkstra geodesics. All entry points have
pure-Python/scipy fallbacks so the package works without the compiled
library; ``build_native()`` compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libmanifold_native.so"
_lib = None
_lib_checked = False


def build_native(verbose: bool = False) -> bool:
    """Compile the native library in place. Returns True on success."""
    try:
        res = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], capture_output=True, text=True
        )
        if verbose:
            print(res.stdout, res.stderr)
        return res.returncode == 0
    except OSError:
        return False


def get_lib():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    path = _NATIVE_DIR / _LIB_NAME
    if not path.exists():
        build_native()
    if not path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.exact_knn.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.coalesce_mean.restype = ctypes.c_int64
    lib.coalesce_mean.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.dijkstra.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def knn_search_host(database, queries, k: int):
    """Exact host-side kNN; (sqdist, idx) ascending, like ops.knn.knn_search.
    Falls back to a numpy implementation without the native library."""
    db = np.ascontiguousarray(database, np.float32)
    q = np.ascontiguousarray(queries, np.float32)
    lib = get_lib()
    if lib is not None:
        out_d = np.empty((q.shape[0], k), np.float32)
        out_i = np.empty((q.shape[0], k), np.int64)
        lib.exact_knn(
            _fptr(db), db.shape[0], db.shape[1], _fptr(q), q.shape[0], k,
            _fptr(out_d), _iptr(out_i),
        )
        return out_d, out_i.astype(np.int32)
    # numpy fallback (blocked)
    dn = (db * db).sum(1)
    out_d = np.empty((q.shape[0], k), np.float32)
    out_i = np.empty((q.shape[0], k), np.int32)
    bs = 512
    for s in range(0, q.shape[0], bs):
        qb = q[s : s + bs]
        d = (qb * qb).sum(1)[:, None] + dn[None, :] - 2 * qb @ db.T
        np.maximum(d, 0, out=d)
        part = np.argpartition(d, min(k, d.shape[1] - 1), axis=1)[:, :k]
        pd = np.take_along_axis(d, part, axis=1)
        order = np.argsort(pd, axis=1, kind="stable")
        out_i[s : s + bs] = np.take_along_axis(part, order, axis=1)
        out_d[s : s + bs] = np.take_along_axis(pd, order, axis=1)
    return out_d, out_i


def coalesce_mean_host(rows, cols, vals, num_nodes):
    """Native duplicate-edge merge; falls back to ops.graph.coalesce_mean."""
    lib = get_lib()
    if lib is None:
        from ..ops.graph import coalesce_mean

        return coalesce_mean(rows, cols, vals, num_nodes)
    r = np.ascontiguousarray(rows, np.int64)
    c = np.ascontiguousarray(cols, np.int64)
    v = np.ascontiguousarray(vals, np.float64)
    out_r = np.empty_like(r)
    out_c = np.empty_like(c)
    out_v = np.empty_like(v)
    m = lib.coalesce_mean(
        _iptr(r), _iptr(c), _dptr(v), r.shape[0], num_nodes,
        _iptr(out_r), _iptr(out_c), _dptr(out_v),
    )
    return (
        out_r[:m].astype(np.int32),
        out_c[:m].astype(np.int32),
        out_v[:m].astype(np.float32),
    )


def dijkstra_host(num_nodes, indptr, indices, weights, source: int = 0):
    """Native single-source geodesics over a CSR graph; scipy fallback."""
    lib = get_lib()
    if lib is None:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import dijkstra as sp_dijkstra

        g = sp.csr_matrix(
            (weights, indices, indptr), shape=(num_nodes, num_nodes)
        )
        return sp_dijkstra(g, directed=False, indices=source).astype(np.float32)
    ip = np.ascontiguousarray(indptr, np.int64)
    ix = np.ascontiguousarray(indices, np.int64)
    w = np.ascontiguousarray(weights, np.float32)
    out = np.empty(num_nodes, np.float32)
    lib.dijkstra(num_nodes, _iptr(ip), _iptr(ix), _fptr(w), source, _fptr(out))
    return out
