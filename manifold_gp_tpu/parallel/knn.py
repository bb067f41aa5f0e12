"""Row-sharded exact kNN search + graph build over a device mesh.

SURVEY §2.2 row 1 defines the FAISS equivalent (reference
``manifold_gp/utils/nearest_neighbors.py:22-37``) as a tiled brute-force L2
top-k with "rows sharded across chips with shard_map". This module is that
multi-chip build. Two database schedules:

  * ``replicated`` (default): every chip holds the whole database; each chip
    runs the exact MXU-tiled top-k (ops.knn's inner loop) for its own query
    row block. Zero per-step communication — the right schedule while the
    database fits in per-chip HBM (a 1M x 3 f32 database is 12 MB; the
    compute, not the points, is what outgrows one chip).
  * ``ring``: the database is row-sharded too; ndev ring steps ``ppermute``
    the database shards around the mesh while every chip folds each visiting
    shard into a running top-k. Peak database memory per chip is 1/ndev of
    the total and the ICI traffic is one full database rotation — the
    pod-scale schedule for databases that do NOT fit replicated (e.g.
    high-dimensional embeddings).

Both schedules compute exactly the same distances as the single-device
``ops.knn.knn_search`` (same |q|^2 + |x|^2 - 2 q x' tiles in f32/HIGHEST);
the ring merge is a per-step top-k of [running k | new k] candidates, so
results are identical up to the ordering of exactly-tied distances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import NODE_AXIS

_HIGHEST = jax.lax.Precision.HIGHEST


from ..ops.knn import _pad_rows as _pad_to  # pad-to-multiple, returns (a, n)


def _block_topk(qb, q_rows, database, db_norm, col_base, n_db, k,
                self_query: bool):
    """Exact top-k of one query tile against one database panel.

    Two stages, like ``ops.knn.knn_search``: an approximate top-m on the
    expanded-form MXU sweep, then an exact coordinate-differenced re-rank
    of the m survivors against the (panel-local) database — the expanded
    form's cancellation scrambles the ranking at million-point density
    (ops.knn._rerank_exact). Re-ranking PER PANEL means the ring schedule's
    cross-step merge always compares exact distances.

    ``q_rows``: global query row ids [B]; ``col_base``: global id of the
    panel's first database row; rows >= n_db are padding (+inf distance).
    When the panel holds fewer than k rows (ring schedule with small
    per-device shards) the result is padded to k with +inf/-1 — the
    cross-step merge discards them."""
    from ..ops.knn import refine_slack

    qn = jnp.sum(qb * qb, axis=-1)
    d = (
        qn[:, None]
        + db_norm[None, :]
        - 2.0 * jnp.dot(qb, database.T, precision=_HIGHEST)
    )
    cols = col_base + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(cols < n_db, d, jnp.inf)
    if self_query:
        d = jnp.where(cols == q_rows[:, None], -1.0, d)
    mm = min(refine_slack(k, d.shape[1]), d.shape[1])
    neg_topm, pos = jax.lax.top_k(-d, mm)
    # exact re-rank against the local panel (pos indexes it directly)
    pts = database[pos]  # [B, mm, D]
    diff = qb[:, None, :] - pts
    dd_m = jnp.sum(diff * diff, axis=-1)
    dd_m = jnp.where(jnp.isfinite(-neg_topm), dd_m, jnp.inf)
    cols_m = jnp.take_along_axis(cols, pos, axis=1)
    if self_query:
        dd_m = jnp.where(cols_m == q_rows[:, None], -1.0, dd_m)
    kk = min(k, d.shape[1])
    neg_topk, pos_k = jax.lax.top_k(-dd_m, kk)
    dd = -neg_topk
    ii = jnp.take_along_axis(cols_m, pos_k, axis=1)
    if kk < k:
        pad = k - kk
        dd = jnp.concatenate(
            [dd, jnp.full((dd.shape[0], pad), jnp.inf, dd.dtype)], axis=1
        )
        ii = jnp.concatenate(
            [ii, jnp.full((ii.shape[0], pad), -1, ii.dtype)], axis=1
        )
    return dd, ii


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "self_query", "block_size")
)
def _replicated_search(database, queries, k, mesh, self_query, block_size):
    ndev = mesh.devices.size
    n_db = database.shape[0]
    # global centering — see ops.knn.knn_search (cancellation-error scale)
    mu = jnp.mean(database, axis=0)
    database = database - mu
    queries = queries - mu
    db_norm = jnp.sum(database * database, axis=-1)
    qp, nq = _pad_to(queries, ndev * block_size)
    rows_per_dev = qp.shape[0] // ndev

    def shard_fn(q_loc):
        dev = jax.lax.axis_index(NODE_AXIS)
        base = dev * rows_per_dev
        nb = q_loc.shape[0] // block_size
        qb = q_loc.reshape(nb, block_size, -1)
        row0 = base + jnp.arange(nb) * block_size

        def one_block(args):
            blk, r0 = args
            rows = r0 + jnp.arange(block_size, dtype=jnp.int32)
            d, i = _block_topk(
                blk, rows, database, db_norm, jnp.int32(0), n_db, k,
                self_query,
            )
            return jnp.maximum(d, 0.0), i

        d, i = jax.lax.map(one_block, (qb, row0))
        return d.reshape(-1, k), i.reshape(-1, k)

    d, i = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(NODE_AXIS, None),),
        out_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None)),
        check_vma=False,
    )(qp)
    return d[:nq], i[:nq]


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "self_query", "block_size")
)
def _ring_search(database, queries, k, mesh, self_query, block_size):
    ndev = mesh.devices.size
    n_db = database.shape[0]
    # global centering — see ops.knn.knn_search (cancellation-error scale).
    # One mean over the whole database (computed before sharding; on a real
    # pod this is a cheap psum'd reduction at build time).
    mu = jnp.mean(database, axis=0)
    database = database - mu
    queries = queries - mu
    dbp, _ = _pad_to(database, ndev)
    db_rows_per_dev = dbp.shape[0] // ndev
    qp, nq = _pad_to(queries, ndev * block_size)
    q_rows_per_dev = qp.shape[0] // ndev
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def shard_fn(db_loc, q_loc):
        dev = jax.lax.axis_index(NODE_AXIS)
        q_base = dev * q_rows_per_dev
        nb = q_loc.shape[0] // block_size
        qb = q_loc.reshape(nb, block_size, -1)
        row0 = q_base + jnp.arange(nb) * block_size

        def ring_step(carry, _):
            best_d, best_i, db_cur, shard_id = carry
            db_norm = jnp.sum(db_cur * db_cur, axis=-1)
            col_base = shard_id * db_rows_per_dev

            def one_block(args):
                blk, r0 = args
                rows = r0 + jnp.arange(block_size, dtype=jnp.int32)
                return _block_topk(
                    blk, rows, db_cur, db_norm, col_base, n_db, k, self_query
                )

            new_d, new_i = jax.lax.map(one_block, (qb, row0))
            new_d = new_d.reshape(-1, k)
            new_i = new_i.reshape(-1, k)
            cand_d = jnp.concatenate([best_d, new_d], axis=1)
            cand_i = jnp.concatenate([best_i, new_i], axis=1)
            neg_topk, pos = jax.lax.top_k(-cand_d, k)
            best_d = -neg_topk
            best_i = jnp.take_along_axis(cand_i, pos, axis=1)
            db_next = jax.lax.ppermute(db_cur, NODE_AXIS, perm)
            shard_next = jax.lax.ppermute(shard_id, NODE_AXIS, perm)
            return (best_d, best_i, db_next, shard_next), None

        init = (
            jnp.full((q_loc.shape[0], k), jnp.inf, jnp.float32),
            jnp.full((q_loc.shape[0], k), -1, jnp.int32),
            db_loc,
            dev,
        )
        (best_d, best_i, _, _), _ = jax.lax.scan(
            ring_step, init, None, length=ndev
        )
        return jnp.maximum(best_d, 0.0), best_i

    d, i = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None)),
        out_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None)),
        check_vma=False,
    )(dbp, qp)
    return d[:nq], i[:nq]


def sharded_knn_search(
    database,
    queries,
    k: int,
    mesh: Mesh,
    self_query: bool = False,
    block_size: int = 512,
    schedule: str = "replicated",
):
    """Exact L2 top-k with query rows sharded over ``mesh``.

    Same contract as ``ops.knn.knn_search`` (squared distances ascending;
    ``self_query`` pins the self-match to column 0). ``schedule``:
    'replicated' keeps the database whole on every chip; 'ring' row-shards
    it and rotates shards over ICI (ndev ppermute steps)."""
    if schedule not in ("replicated", "ring"):
        raise ValueError(
            f"schedule must be 'replicated' or 'ring', got {schedule!r}"
        )
    database = jnp.asarray(database, jnp.float32)
    queries = jnp.asarray(queries, jnp.float32)
    if k > database.shape[0]:
        raise ValueError(
            f"k={k} exceeds the database size {database.shape[0]}"
        )
    fn = _replicated_search if schedule == "replicated" else _ring_search
    return fn(database, queries, k, mesh, bool(self_query), int(block_size))


def build_graph_sharded(
    x,
    nearest_neighbors: int,
    mesh: Mesh,
    schedule: str = "replicated",
    block_size: int = 512,
):
    """Symmetric kNN graph built with the row-sharded search — the mesh form
    of ``ops.graph.build_graph`` with identical edge-list semantics (search k
    incl. self, drop self column, triu-orient, mean-coalesce; reference
    ``utils/nearest_neighbors.py:39-55``). The symmetrize/coalesce tail is
    the same one-time host pass as the single-device builder."""
    from ..ops.graph import symmetrize_knn_edges

    x = jnp.asarray(x, jnp.float32)
    sqd, idx = sharded_knn_search(
        x, x, nearest_neighbors, mesh, self_query=True,
        block_size=block_size, schedule=schedule,
    )
    return symmetrize_knn_edges(
        np.asarray(sqd), np.asarray(idx), x.shape[0], x=np.asarray(x)
    )


# ---------------------------------------------------------------------------
# Sharded IVF: query rows sharded over the mesh, quantizer replicated
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "mesh", "self_query", "block_size")
)
def _sharded_ivf_chunk(index, q, k, nprobe, mesh, self_query, block_size,
                       row_offset):
    """One dispatch of the query-row-sharded IVF search: the coarse quantizer
    (tiny), posting lists and database are replicated; each device probes the
    nprobe nearest lists for its own query rows — the exact per-query work of
    ``ops.knn._ivf_search_jit`` under a shard_map. Candidate ordering is
    probes-major, identical to the single-device kernel, so results match it
    exactly (not just statistically)."""
    # global centering — mirrors ops.knn._ivf_search_jit exactly (the
    # equality tests compare the two paths' results)
    mu = jnp.mean(index.database, axis=0)
    db, cent = index.database - mu, index.centroids - mu
    q = q - mu
    cn = jnp.sum(cent * cent, axis=-1)
    ndev = mesh.devices.size
    qp, nq = _pad_to(q, ndev * block_size)
    rows_per_dev = qp.shape[0] // ndev

    def shard_fn(q_loc):
        dev = jax.lax.axis_index(NODE_AXIS)
        base = jnp.int32(row_offset) + dev * rows_per_dev
        nb = q_loc.shape[0] // block_size
        qb = q_loc.reshape(nb, block_size, -1)
        row0 = base + jnp.arange(nb) * block_size

        def one_block(args):
            blk, r0 = args
            qn = jnp.sum(blk * blk, axis=-1)
            cd = (
                qn[:, None]
                + cn[None, :]
                - 2.0 * jnp.dot(blk, cent.T, precision=_HIGHEST)
            )
            _, probes = jax.lax.top_k(-cd, nprobe)
            cand = index.lists[probes].reshape(block_size, -1)
            cmask = index.list_mask[probes].reshape(block_size, -1)
            pts = db[cand]
            d = (
                qn[:, None]
                + jnp.sum(pts * pts, axis=-1)
                - 2.0 * jnp.einsum("bd,bcd->bc", blk, pts, precision=_HIGHEST)
            )
            d = jnp.where(cmask > 0, d, jnp.inf)
            rows = r0 + jnp.arange(block_size, dtype=jnp.int32)
            if self_query:
                d = jnp.where(
                    (cand == rows[:, None]) & (cmask > 0), -1.0, d
                )
            # two-stage exact re-rank, mirroring ops.knn._ivf_search_jit
            from ..ops.knn import _rerank_exact, refine_slack

            m = min(refine_slack(k, d.shape[1]), d.shape[1])
            neg_topm, pos = jax.lax.top_k(-d, m)
            cand_m = jnp.take_along_axis(cand, pos, axis=1)
            return _rerank_exact(
                blk, -neg_topm, cand_m, db, k,
                self_query=self_query, q_rows=rows,
            )

        dd, ii = jax.lax.map(one_block, (qb, row0))
        return dd.reshape(-1, k), ii.reshape(-1, k)

    d, i = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(NODE_AXIS, None),),
        out_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None)),
        check_vma=False,
    )(qp)
    return d[:nq], i[:nq]


def sharded_ivf_search(
    index,
    queries,
    k: int,
    mesh: Mesh,
    nprobe: int = 8,
    self_query: bool = False,
    block_size: int = 256,
    queries_per_dispatch: int = 131072,
):
    """Approximate IVF L2 top-k with query rows sharded over ``mesh``.

    The pod-scale form of ``ops.knn.ivf_search`` (round-4 VERDICT item 5;
    SURVEY §2.2 row 1 "IVF-style coarse quantization optional" on the
    sharded build): quantizer/lists/database replicated (centroids are tiny;
    the *search* compute is what outgrows one chip — a 1M x nprobe·Lmax
    candidate sweep), query rows sharded, host-level chunking like the
    single-device dispatch (a single million-query XLA program is liable to
    be killed by tunneled workers). Results are identical to the
    single-device IVF search on the same index.
    """
    from ..ops.knn import IVFIndex  # noqa: F401 (type documentation)

    q = jnp.asarray(queries, jnp.float32)
    nprobe = min(nprobe, index.nlist)
    nq = q.shape[0]
    if nq > queries_per_dispatch:
        outs = []
        for s in range(0, nq, queries_per_dispatch):
            outs.append(
                _sharded_ivf_chunk(
                    index, q[s : s + queries_per_dispatch], k, nprobe, mesh,
                    bool(self_query), int(block_size), s,
                )
            )
        return (
            jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
        )
    return _sharded_ivf_chunk(
        index, q, k, nprobe, mesh, bool(self_query), int(block_size), 0
    )
