"""Explicit row-sharded SpMV via shard_map.

For graphs that outgrow one chip, the symmetric-adjacency matvec is sharded
by contiguous row blocks: each device owns N/ndev rows of the ELL table and
the corresponding output rows; the input vector block is all-gathered over
ICI once per matvec (for kNN graphs nnz/N = O(k), so gathering the [N, B]
operand is the bandwidth-optimal schedule until N*B presses on HBM — above
``_OPERAND_GATHER_BUDGET`` the ppermute ring schedule in
``sharded_adjacency_matvec`` holds one shard at a time instead).

The edge-value array (one scalar per coalesced edge) is replicated: it is
k/2 floats per node and is re-derived from the learnable bandwidth each step
anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.graph import SparseGraph
from .mesh import NODE_AXIS


def shard_graph_rows(graph: SparseGraph, mesh: Mesh):
    """Pad the ELL table to a device-divisible row count and lay it out
    row-sharded. Returns (ell_edge, ell_col, ell_mask, n_padded)."""
    ndev = mesh.devices.size
    n = graph.num_nodes
    pad = (-n) % ndev

    def pad_rows(a):
        a = np.asarray(a)
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a

    sh = NamedSharding(mesh, P(NODE_AXIS, None))
    ell_edge = jax.device_put(pad_rows(graph.ell_edge), sh)
    ell_col = jax.device_put(pad_rows(graph.ell_col), sh)
    ell_mask = jax.device_put(pad_rows(graph.ell_mask), sh)
    return ell_edge, ell_col, ell_mask, n + pad


# Per-chip byte budget for materializing the all-gathered [Np, B] operand.
# Above it the ring schedule holds only one [Np/ndev, B] shard at a time:
# identical total ICI traffic ((ndev-1)/ndev * Np*B*itemsize moved either
# way), 1/ndev the peak operand memory. 256 MB leaves plenty of HBM headroom
# next to the CG/SLQ state on a 16 GB chip.
_OPERAND_GATHER_BUDGET = 2**28


def sharded_adjacency_matvec(
    ell_edge, ell_col, ell_mask, triu, v, mesh: Mesh, ring: bool = None
):
    """A_sym @ v with row-sharded rows.

    Operand exchange schedule:
      * all-gather (default): one collective, each chip holds the full
        [Np, B] operand for its local gathers;
      * ``ring``: ndev steps of compute-on-resident-shard + ppermute — each
        chip only ever holds one [Np/ndev, B] shard, engaged automatically
        when the gathered operand would exceed ``_OPERAND_GATHER_BUDGET``
        (SURVEY §5's ppermute schedule; same total ICI bytes as the gather).

    Args:
      ell_edge/ell_col/ell_mask: [Np, D] row-sharded ELL table (padded).
      triu: [M] replicated edge values.
      v: [Np, B] row-sharded operand (padding rows must be zero).
    Returns: [Np, B] row-sharded result.
    """
    ndev = mesh.devices.size
    if ring is None:
        ring = v.shape[0] * v.shape[1] * v.dtype.itemsize > _OPERAND_GATHER_BUDGET
    chunk = v.shape[0] // ndev

    def block_gather(ee, ec, em, triu_full, v_blk):
        v_full = jax.lax.all_gather(v_blk, NODE_AXIS, axis=0, tiled=True)
        ev = triu_full[ee] * em  # [rows/dev, D]

        def step(acc, args):
            col, val = args
            return acc + val[:, None] * v_full[col], None

        # zeros_like keeps the carry varying over the manual mesh axis
        # (jax>=0.8 vma typing), unlike a fresh jnp.zeros.
        acc0 = jnp.zeros_like(v_blk)
        out, _ = jax.lax.scan(step, acc0, (ec.T, ev.T))
        return out

    def block_ring(ee, ec, em, triu_full, v_blk):
        ev = triu_full[ee] * em  # [rows/dev, D]
        me = jax.lax.axis_index(NODE_AXIS)
        perm = [(i, (i - 1) % ndev) for i in range(ndev)]

        def ring_step(carry, s):
            acc, v_shard = carry
            # after s ppermutes of "shard moves one device left", this chip
            # holds the shard originally owned by device (me + s) % ndev
            base = ((me + s) % ndev) * chunk
            idx = ec - base  # [rows/dev, D] local column within the shard
            inb = ((idx >= 0) & (idx < chunk)).astype(ev.dtype)
            idxc = jnp.clip(idx, 0, chunk - 1)

            def slot(a, args):
                col, val = args
                return a + val[:, None] * v_shard[col], None

            acc, _ = jax.lax.scan(slot, acc, (idxc.T, (ev * inb).T))
            return (acc, jax.lax.ppermute(v_shard, NODE_AXIS, perm)), None

        acc0 = jnp.zeros_like(v_blk)
        (out, _), _ = jax.lax.scan(
            ring_step, (acc0, v_blk), jnp.arange(ndev)
        )
        return out

    fn = shard_map(
        block_ring if ring else block_gather,
        mesh=mesh,
        in_specs=(
            P(NODE_AXIS, None),
            P(NODE_AXIS, None),
            P(NODE_AXIS, None),
            P(),
            P(NODE_AXIS, None),
        ),
        out_specs=P(NODE_AXIS, None),
    )
    return fn(ell_edge, ell_col, ell_mask, triu, v)


def pad_nodes(a, n_padded: int, mesh: Mesh = None, fill: float = 0.0):
    """Pad a [N]-leading array to the mesh-divisible row count and (optionally)
    lay it out row-sharded."""
    a = np.asarray(a)
    pad = n_padded - a.shape[0]
    if pad:
        a = np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )
    if mesh is None:
        return jnp.asarray(a)
    spec = P(NODE_AXIS, *([None] * (a.ndim - 1)))
    return jax.device_put(a, NamedSharding(mesh, spec))


def make_sharded_matern_precision_matvec(
    graph: SparseGraph,
    mesh: Mesh,
    coeffs,
    nu: int,
    lengthscale,
    normalization: str = "randomwalk",
    tables=None,
):
    """Row-sharded symmetric Matérn precision matvec for multi-chip CG/SLQ.

    The same telescoped form as the single-chip fused block path
    (ops/matern.py): Q = D^{1/2} (2 nu/l^2 I + L_sym)^nu D^{1/2}
    (randomwalk; the symmetric normalization drops the D factors). Each of
    the nu inner applications is one row-sharded SpMV (ICI all-gather of the
    operand block) plus a row-local diagonal term; CG dot products over the
    sharded vectors reduce with psum under GSPMD automatically.

    Fully trace-differentiable in ``coeffs`` / ``lengthscale`` (the padding
    is jnp.pad, the static ELL tables come from ``shard_graph_rows``), so the
    training loss — quad, SLQ logdet and their custom VJPs — runs directly
    on this matvec (the model-level multi-chip path, models/riemann_gp.py).

    ``tables``: optional pre-built ``shard_graph_rows`` result so kernels
    can shard the (static) ELL structure once at construction.

    Returns (matvec, n_padded): matvec maps row-sharded [Np, B] -> [Np, B]
    (padding rows must be zero, as produced by ``pad_nodes``).
    """
    if tables is None:
        tables = shard_graph_rows(graph, mesh)
    ell_edge, ell_col, ell_mask, n_pad = tables
    pad = n_pad - graph.num_nodes
    sharding = NamedSharding(mesh, P(NODE_AXIS, None))

    shift = 2.0 * nu / jnp.square(jnp.reshape(lengthscale, ()))
    diag_p = jnp.pad(coeffs.diag, (0, pad)) + shift
    # Padding rows get degree 1 so sqrt/mul keep the zero padding invariant.
    dsq_p = jnp.sqrt(jnp.pad(coeffs.deg, (0, pad), constant_values=1.0))

    def matvec(v):
        squeeze = v.ndim == 1
        out = v[:, None] if squeeze else v
        out = jax.lax.with_sharding_constraint(out, sharding)
        if normalization == "randomwalk":
            out = out * dsq_p[:, None]
        for _ in range(nu):
            av = sharded_adjacency_matvec(
                ell_edge, ell_col, ell_mask, coeffs.triu, out, mesh
            )
            out = diag_p[:, None] * out - av
        if normalization == "randomwalk":
            out = out * dsq_p[:, None]
        return out[:, 0] if squeeze else out

    return matvec, n_pad
