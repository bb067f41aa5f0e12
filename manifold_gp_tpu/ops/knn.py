"""Exact k-nearest-neighbor search, TPU-native.

Replaces the reference's FAISS dependency (``manifold_gp/utils/nearest_neighbors.py``:
``IndexFlatL2`` / ``IndexIVFFlat``, C++/CUDA) with a tiled brute-force squared-L2
top-k that runs on the MXU: each query tile computes a [B, N] distance block as
``|q|^2 + |x|^2 - 2 q x^T`` (one large matmul in float32/HIGHEST precision) and
reduces it with ``jax.lax.top_k``. For the dataset sizes the reference targets
(N up to ~10^5, kNN graphs with k <= 100) exact brute force on the MXU is both
faster and simpler than an IVF quantizer; rows can be sharded across chips for
larger N (see manifold_gp_tpu.parallel).

A multithreaded C++ host fallback for gigantic N lives in native/ (see
``manifold_gp_tpu.utils.native``).

Parity notes vs the reference:
  * FAISS returns *squared* L2 distances sorted ascending; so do we.
  * When searching the database against itself the self-match must rank first
    (the reference drops column 0 as the self-loop,
    ``utils/nearest_neighbors.py:42-43``). Floating-point distance computation
    makes the self-distance ~1e-7 rather than exactly 0, so we pin the
    diagonal below zero before the top-k and clamp after.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


def _pad_rows(a: jnp.ndarray, multiple: int):
    n = a.shape[0]
    pad = (-n) % multiple
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, n


@functools.partial(jax.jit, static_argnames=("k", "self_query", "block_size"))
def knn_search(
    database: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    self_query: bool = False,
    block_size: int = 512,
):
    """Exact L2 top-k.

    Args:
      database: [N, D] float array of database points.
      queries: [Nq, D] float array of query points.
      k: number of neighbors (including the self-match when self_query).
      self_query: queries are the database itself (guarantees the self-match
        ranks first in column 0, as FAISS does for exact search).
      block_size: query rows per MXU tile.

    Returns:
      (sqdist, idx): both [Nq, k]; squared L2 distances ascending.
    """
    database = jnp.asarray(database, jnp.float32)
    queries = jnp.asarray(queries, jnp.float32)
    n = database.shape[0]
    db_norm = jnp.sum(database * database, axis=-1)

    q_padded, nq = _pad_rows(queries, block_size)
    num_blocks = q_padded.shape[0] // block_size
    q_blocks = q_padded.reshape(num_blocks, block_size, -1)
    row_base = jnp.arange(num_blocks) * block_size

    def one_block(args):
        qb, base = args
        qn = jnp.sum(qb * qb, axis=-1)
        d = (
            qn[:, None]
            + db_norm[None, :]
            - 2.0 * jnp.dot(qb, database.T, precision=_HIGHEST)
        )
        if self_query:
            rows = base + jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            d = jnp.where(rows == cols, -1.0, d)
        neg_topk, idx = jax.lax.top_k(-d, k)
        return jnp.maximum(-neg_topk, 0.0), idx

    dists, idxs = jax.lax.map(one_block, (q_blocks, row_base))
    dists = dists.reshape(-1, k)[:nq]
    idxs = idxs.reshape(-1, k)[:nq]
    return dists, idxs


class NearestNeighbors:
    """Convenience wrapper mirroring the reference class's surface
    (``utils/nearest_neighbors.py:10-63``): holds the database, exposes
    ``search`` and ``graph``."""

    def __init__(self, x):
        self.x = jnp.asarray(x, jnp.float32)

    def search(self, queries, k: int):
        """Returns (sqdist, idx), each [Nq, k]. If the queries are the stored
        database array itself, the self-match is pinned to column 0."""
        self_query = queries is self.x or (
            queries.shape == self.x.shape and bool(jnp.array_equal(queries, self.x))
        )
        return knn_search(self.x, jnp.asarray(queries, jnp.float32), k, self_query)

    def graph(self, k: int):
        """Symmetric kNN edge list; see ops.graph.build_graph."""
        from .graph import build_graph

        return build_graph(self.x, k)
