"""Keyed on-disk cache for the two expensive one-time artifacts: the kNN
graph and the spectral eigenbasis.

SURVEY §5 (checkpoint/resume): the reference recomputes the kNN graph and
the eigendecomposition on every process start (``torch.save`` stores only
the ~15 hyperparameter scalars). At reference scale that is seconds; at the
TPU build's million-node scale the kNN build and the LOBPCG basis are tens
of seconds each, so eval/resume cycles pay them repeatedly. This module
caches both, keyed by content hashes:

  * graph: sha256(data bytes, k, backend) — bandwidth-INDEPENDENT structure
    (edge squared-distances; the learnable bandwidth only reweights them);
  * basis: sha256(graph edge structure, num_modes, normalization,
    eigensolver config, graphbandwidth value) — the basis DOES depend on the
    bandwidth at which it was extracted, so the value participates in the
    key (quantized to f32 bytes; an optimizer step that moves the bandwidth
    invalidates the entry, exactly as it must).

Entries are ``.npz`` files named by their key; a lookup with a different
key simply misses (stale entries for other keys are inert, and
``clear_cache`` removes everything). Writes are atomic (tmp + rename) so a
killed process never leaves a truncated entry that a resume would load.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np


def _atomic_save(path: str, **arrays):
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


# Bumped whenever the builder's edge-value semantics change (v2: exact
# coordinate-differenced edge lengths replaced the search's cancellation-
# prone |q|^2 - 2qx + |x|^2 values; v3: the neighbor RANKING itself is now
# exact too — global centering + two-stage coordinate-differenced re-rank,
# fixing the 0.33 recall measured at the 1M operating point).
_GRAPH_BUILDER_VERSION = 3


def graph_cache_key(x, nearest_neighbors: int, backend: str = "device") -> str:
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    h = hashlib.sha256()
    h.update(x.tobytes())
    h.update(
        f"|k={int(nearest_neighbors)}|backend={backend}"
        f"|v={_GRAPH_BUILDER_VERSION}".encode()
    )
    return h.hexdigest()[:32]


def cached_graph(
    x,
    nearest_neighbors: int,
    cache_dir: str,
    knn_backend: str = "device",
    builder=None,
):
    """``ops.graph.build_graph`` with an on-disk cache.

    Returns (graph, hit: bool). ``builder`` overrides the build call (used
    by tests to count invocations and by callers with custom searches, e.g.
    the sharded builder — pass ``builder=lambda: build_graph_sharded(...)``
    with a ``knn_backend`` string that names it for the key).
    """
    from ..ops.graph import build_graph, graph_from_edges

    key = graph_cache_key(x, nearest_neighbors, knn_backend)
    path = os.path.join(cache_dir, f"graph_{key}.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                graph = graph_from_edges(
                    z["rows"], z["cols"], z["sqdist"], int(z["num_nodes"])
                )
            return graph, True
        except Exception:
            os.unlink(path)  # corrupt entry: evict and rebuild
    graph = (
        builder()
        if builder is not None
        else build_graph(x, nearest_neighbors, knn_backend=knn_backend)
    )
    _atomic_save(
        path,
        rows=np.asarray(graph.rows, np.int32),
        cols=np.asarray(graph.cols, np.int32),
        sqdist=np.asarray(graph.sqdist, np.float32),
        num_nodes=np.int64(graph.num_nodes),
    )
    return graph, False


def basis_cache_key(kernel, graphbandwidth) -> str:
    gb = np.float32(np.asarray(graphbandwidth).reshape(()))
    h = hashlib.sha256()
    h.update(np.asarray(kernel.graph.rows, np.int32).tobytes())
    h.update(np.asarray(kernel.graph.cols, np.int32).tobytes())
    h.update(np.asarray(kernel.graph.sqdist, np.float32).tobytes())
    h.update(
        f"|m={kernel.num_modes}|norm={kernel.laplacian_normalization}"
        f"|eigh_max={kernel.cfg.eigh_max_size}"
        f"|eig_iter={kernel.cfg.eigensolver_max_iter}"
        f"|solver={kernel.cfg.eigensolver}"
        f"|cheb={kernel.cfg.cheb_degree}x{kernel.cfg.cheb_iters}".encode()
    )
    h.update(gb.tobytes())
    return h.hexdigest()[:32]


def cached_eval_basis(kernel, params, cache_dir: str):
    """``kernel.eval_basis`` with an on-disk cache keyed by the graph
    structure, basis config, and the CURRENT graphbandwidth value (a changed
    bandwidth is a different Laplacian — automatic eviction-by-key).

    Returns ((eigval, eigvec), hit: bool)."""
    import jax.numpy as jnp

    key = basis_cache_key(kernel, kernel.graphbandwidth(params))
    path = os.path.join(cache_dir, f"basis_{key}.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return (jnp.asarray(z["eigval"]), jnp.asarray(z["eigvec"])), True
        except Exception:
            os.unlink(path)
    eigval, eigvec = kernel.eval_basis(params)
    _atomic_save(
        path,
        eigval=np.asarray(eigval, np.float32),
        eigvec=np.asarray(eigvec, np.float32),
    )
    return (eigval, eigvec), False


def clear_cache(cache_dir: str):
    """Remove every cache entry (graph_*.npz / basis_*.npz) in the dir."""
    if not os.path.isdir(cache_dir):
        return 0
    n = 0
    for f in os.listdir(cache_dir):
        if (f.startswith("graph_") or f.startswith("basis_")) and f.endswith(
            ".npz"
        ):
            os.unlink(os.path.join(cache_dir, f))
            n += 1
    return n
