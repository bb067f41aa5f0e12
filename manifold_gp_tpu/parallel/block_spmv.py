"""Row-sharded fused block-ELL SpMV — the multi-chip hot path.

Round 2's mesh path ran a per-column gather ``lax.scan`` over an all-gathered
operand (parallel/spmv.py) — correctness-complete but ~70x off the fused
single-chip kernel. This module puts the fused panel format ON the mesh:

  * the global RCM block-ELL layout (ops.block_sparse.build_block_layout) is
    built once; its row blocks are padded to a device-divisible count and the
    panel buffer [nrb, BLOCK, S*BLOCK] is row-block-sharded across the mesh;
  * panel ASSEMBLY is per-shard: each device scatters exactly the (directed)
    edges and diagonals whose permuted row it owns, from the replicated
    coefficient vectors (k/2 floats per node) — zero cross-device traffic;
  * each MATVEC all-gathers the [rows, B] operand over ICI once (the same
    schedule as the scan path) and runs the single-chip Pallas kernel (or the
    portable block-gather einsum) on the LOCAL panels against the gathered
    operand — the per-device work is identical to 1/ndev of the single-chip
    fused matvec;
  * one custom VJP wraps the whole shard_map matvec: bar_pv is one more
    fused matvec (the globally-assembled operator is symmetric — both edge
    directions plus the diagonal are scattered), bar_blocks is the per-shard
    panel-cotangent kernel/einsum on local cotangent rows x gathered operand.

Vectors live in *permuted padded row space* ([rows, B], RCM order, zero
padding rows — the invariant subspace contract of ops.block_sparse); the
kernel/model layer keeps its embeddings (y, masks, probes, one-hots) in this
space via ``MeshBlockTables.row_of_node``, so the hot loop does ZERO
per-matvec permutation gathers. Reference analogue: none (single device) —
this is BASELINE.json's matvecs/s/chip north star applied to the mesh path.
"""

from __future__ import annotations

import dataclasses

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.block_sparse import BLOCK, BlockLayout, build_block_layout
from ..ops.graph import SparseGraph
from .mesh import NODE_AXIS

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class MeshBlockTables:
    """Static per-mesh block-ELL structure (host numpy + device-sharded)."""

    mesh: Mesh
    s_max: int
    num_nodes: int
    nrb: int  # device-divisible row-block count (>= layout's)
    rows: int  # nrb * BLOCK — the padded permuted row space
    block_col: jnp.ndarray  # [nrb, S] int32, row-block-sharded P(nodes)
    # per-shard assembly tables, sharded P(nodes) on the leading dim:
    edge_sel: jnp.ndarray  # [ndev, Emax] int32 edge id into triu (-1 pad)
    edge_pos: jnp.ndarray  # [ndev, Emax] int32 local flat panel position
    diag_sel: jnp.ndarray  # [ndev, Nmax] int32 node id (-1 pad)
    diag_pos: jnp.ndarray  # [ndev, Nmax] int32 local flat panel position
    # permuted-row-space maps (host numpy, static):
    perm_np: np.ndarray  # [rows] node id at each row (0 on padding rows)
    row_mask_np: np.ndarray  # [rows] 1.0 real row / 0.0 padding
    row_of_node_np: np.ndarray  # [N] padded row index of each node
    # device copies for traced indexing / masking:
    row_of_node: jnp.ndarray  # [N] int32 (replicated)
    row_mask: jnp.ndarray  # [rows, 1] f32, sharded P(nodes)
    perm_rows: jnp.ndarray  # [rows] int32 = perm_np, sharded P(nodes)
    # Halo width in column BLOCKs: every device's needed column blocks lie
    # within (modular) distance ``halo`` of its own row-block range, so the
    # operand exchange is one ppermute of halo*BLOCK rows from each ring
    # neighbor instead of the full all-gather — 2*halo*BLOCK*B bytes over
    # ICI per matvec vs (ndev-1)/ndev * rows*B. None when some device needs
    # columns beyond its immediate neighbors (fall back to all-gather).
    halo: Optional[int] = None

    @property
    def ndev(self) -> int:
        return self.mesh.devices.size

    def node_sharding(self, ndim: int = 2) -> NamedSharding:
        return NamedSharding(self.mesh, P(NODE_AXIS, *([None] * (ndim - 1))))

    # -- permuted-space embedding helpers (host-side, construction-time) ----
    def embed_rows(self, values: np.ndarray, node_idx=None, fill=0.0):
        """[N(+idx)]-indexed host values -> [rows, ...] permuted padded array,
        laid out row-sharded."""
        values = np.asarray(values)
        out = np.full((self.rows,) + values.shape[1:], fill, values.dtype)
        rows = self.row_of_node_np if node_idx is None else self.row_of_node_np[node_idx]
        out[rows] = values
        return jax.device_put(out, self.node_sharding(out.ndim))

    def gather_coeff(self, coeff: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
        """Traced [N] per-node coefficient -> [rows] permuted padded vector
        (fill on padding rows), row-sharded. Replicated-operand gather by a
        static sharded index: each device gathers its rows locally."""
        out = jnp.where(self.row_mask[:, 0] > 0, coeff[self.perm_rows], fill)
        return jax.lax.with_sharding_constraint(out, self.node_sharding(1))


def build_mesh_block_tables(
    graph: SparseGraph, mesh: Mesh, max_blocks_cap: int = 40
) -> Optional[MeshBlockTables]:
    """Host-side construction. Returns None when the RCM-reordered graph is
    not block-sparse enough (callers fall back to the ELL gather scan)."""
    layout = build_block_layout(graph, max_blocks_cap=max_blocks_cap)
    if layout is None:
        return None
    ndev = mesh.devices.size
    n = graph.num_nodes
    s_max = layout.max_blocks
    nrb0 = layout.num_row_blocks
    nrb = -(-nrb0 // ndev) * ndev
    rows = nrb * BLOCK
    lrb = nrb // ndev
    lsize = lrb * BLOCK * s_max * BLOCK

    bc = np.zeros((nrb, s_max), np.int32)
    bc[:nrb0] = np.asarray(layout.block_col)
    node_sh = NamedSharding(mesh, P(NODE_AXIS, None))
    block_col = jax.device_put(bc, node_sh)

    # --- per-shard assembly tables --------------------------------------
    # build_block_layout's edge_flat covers both directed edge copies
    # ([2M]: triu then its transpose — assemble scatters [-triu, -triu]);
    # diag_flat covers the N node diagonals. Split both by owning device
    # (flat // lsize, contiguous row-block sharding) into padded tables.
    ef = np.asarray(layout.edge_flat, np.int64)
    df = np.asarray(layout.diag_flat, np.int64)
    m2 = ef.shape[0]
    eid = np.arange(m2, dtype=np.int64) % (m2 // 2)  # edge id into triu
    nid = np.arange(n, dtype=np.int64)

    def split(flat, ids):
        owner = flat // lsize
        sel_rows, pos_rows = [], []
        for d in range(ndev):
            m = owner == d
            sel_rows.append(ids[m])
            pos_rows.append(flat[m] - d * lsize)
        width = max(1, max(r.shape[0] for r in sel_rows))
        sel = np.full((ndev, width), -1, np.int32)
        # padding entries scatter 0.0 into the dummy slot ``lsize``
        pos = np.full((ndev, width), lsize, np.int32)
        for d in range(ndev):
            sel[d, : sel_rows[d].shape[0]] = sel_rows[d]
            pos[d, : pos_rows[d].shape[0]] = pos_rows[d]
        return (
            jax.device_put(sel, node_sh),
            jax.device_put(pos, node_sh),
        )

    edge_sel, edge_pos = split(ef, eid)
    diag_sel, diag_pos = split(df, nid)

    # --- permuted-row-space maps -----------------------------------------
    # layout.perm lists the node at each permuted row (padding rows clamped
    # to node 0); layout.unperm is the inverse map node -> row.
    perm_np = np.zeros(rows, np.int64)
    perm_np[: layout.num_padded] = np.asarray(layout.perm)
    row_of_node_np = np.asarray(layout.unperm, np.int64)  # [N] node -> row
    row_mask_np = np.zeros(rows, np.float32)
    row_mask_np[row_of_node_np] = 1.0

    # --- halo width -------------------------------------------------------
    # Minimal H (in column blocks) such that every device's needed blocks
    # sit within modular distance H of its own [d*lrb, (d+1)*lrb) range.
    # For RCM-banded manifold graphs H ~ ceil(bandwidth/BLOCK) + 1, tiny vs
    # lrb; clustered graphs whose columns reach beyond the ring neighbors
    # (H > lrb) fall back to the all-gather exchange.
    halo = 0
    # unused slots of short rows point at block 0 with zero panel columns;
    # exclude them from the need-set of devices other than block 0's owner
    # by masking with the per-row used-slot count.
    used = np.zeros((nrb, s_max), bool)
    used[:nrb0] = True
    for i in range(nrb0):
        cs = bc[i]
        # slots are sorted unique; trailing repeats of the pad value 0 only
        # occur after slot 0 when the row has fewer used slots
        nz = np.count_nonzero(np.diff(cs) > 0) + 1
        used[i, nz:] = False
    for d in range(ndev):
        own_lo, own_hi = d * lrb, (d + 1) * lrb - 1
        needed = np.unique(bc[own_lo : own_hi + 1][used[own_lo : own_hi + 1]])
        for b in needed:
            if own_lo <= b <= own_hi:
                continue
            left = (own_lo - b) % nrb
            right = (b - own_hi) % nrb
            halo = max(halo, int(min(left, right)))
    halo_opt = halo if halo <= lrb else None

    row_mask = jax.device_put(row_mask_np[:, None], node_sh)
    return MeshBlockTables(
        mesh=mesh,
        s_max=s_max,
        num_nodes=n,
        nrb=int(nrb),
        rows=int(rows),
        block_col=block_col,
        edge_sel=edge_sel,
        edge_pos=edge_pos,
        diag_sel=diag_sel,
        diag_pos=diag_pos,
        perm_np=perm_np,
        row_mask_np=row_mask_np,
        row_of_node_np=row_of_node_np,
        row_of_node=jnp.asarray(row_of_node_np, jnp.int32),
        row_mask=row_mask,
        perm_rows=jax.device_put(
            perm_np.astype(np.int32), NamedSharding(mesh, P(NODE_AXIS))
        ),
        halo=halo_opt,
    )


def assemble_sharded(
    tables: MeshBlockTables, diag: jnp.ndarray, triu: jnp.ndarray, dtype=None
):
    """Scatter the current Laplacian coefficients (L = diag - A_sym) into the
    row-block-sharded panel buffer [nrb, BLOCK, S*BLOCK]. Each device
    scatters only its own rows' entries from the replicated coefficient
    vectors; differentiable w.r.t. (diag, triu) through the gathers."""
    lrb = tables.nrb // tables.ndev
    lsize = lrb * BLOCK * tables.s_max * BLOCK
    s_max = tables.s_max

    def body(edge_sel, edge_pos, diag_sel, diag_pos, triu, diag):
        # leading [1] shard axis from the [ndev, W] tables
        edge_sel, edge_pos = edge_sel[0], edge_pos[0]
        diag_sel, diag_pos = diag_sel[0], diag_pos[0]
        ev = -triu[jnp.clip(edge_sel, 0)] * (edge_sel >= 0)
        dv = diag[jnp.clip(diag_sel, 0)] * (diag_sel >= 0)
        # dummy slot at lsize absorbs the padding entries; real positions are
        # unique (edges mean-coalesced, diagonal slots never carry edges)
        flat = jnp.zeros(lsize + 1, diag.dtype)
        flat = flat.at[jnp.concatenate([edge_pos, diag_pos])].add(
            jnp.concatenate([ev, dv]), mode="promise_in_bounds"
        )
        return flat[:lsize].reshape(lrb, BLOCK, s_max * BLOCK)

    out = shard_map(
        body,
        mesh=tables.mesh,
        in_specs=(
            P(NODE_AXIS, None),
            P(NODE_AXIS, None),
            P(NODE_AXIS, None),
            P(NODE_AXIS, None),
            P(),
            P(),
        ),
        out_specs=P(NODE_AXIS, None, None),
    )(tables.edge_sel, tables.edge_pos, tables.diag_sel, tables.diag_pos, triu, diag)
    return out if dtype is None else out.astype(dtype)


# Same physical-VMEM residency budget as the single-chip dispatch
# (ops.pallas_spmv): below it the gathered operand is pinned in VMEM, above
# it the streaming kernel double-buffers DMA from HBM.
from ..ops.pallas_spmv import (  # noqa: E402
    _OPERAND_VMEM_BUDGET,
    bwd_blocks_call,
    resident_matvec_call,
    stream_matvec_call,
)


def _local_matvec(tables, bc, blocks, pv_full, impl: str, interpret: bool,
                  schedule: str = "auto"):
    """Local panels x full gathered operand -> local rows [lrb*BLOCK, B].

    ``schedule`` (pallas impl only): "auto" picks resident vs streaming by
    the exchanged-operand byte count against the single-chip VMEM budget;
    "resident"/"streaming" force one — the measurement hook for pinning the
    dispatch rule on the mesh halo window (round-3 VERDICT item 6, where the
    9% 1M mesh residual was attributed loosely to this choice)."""
    lrb = blocks.shape[0]
    if impl == "einsum":
        grouped = pv_full.reshape(pv_full.shape[0] // BLOCK, BLOCK, -1)
        cb = grouped[bc].reshape(lrb, tables.s_max * BLOCK, -1)
        if blocks.dtype == jnp.bfloat16:
            out = jnp.einsum(
                "rik,rkb->rib",
                blocks,
                cb.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            out = jnp.einsum("rik,rkb->rib", blocks, cb, precision=_HIGHEST)
        return out.reshape(lrb * BLOCK, -1).astype(pv_full.dtype)
    bc_flat = bc.reshape(-1)
    phys = pv_full.shape[0] * max(pv_full.shape[1], BLOCK) * pv_full.dtype.itemsize
    resident = (
        phys <= _OPERAND_VMEM_BUDGET
        if schedule == "auto"
        else schedule == "resident"
    )
    if resident:
        return resident_matvec_call(
            bc_flat, blocks, pv_full, s_max=tables.s_max, interpret=interpret
        )
    b = pv_full.shape[1]
    pad = -b % BLOCK
    if pad:
        pv_full = jnp.pad(pv_full, ((0, 0), (0, pad)))
    out = stream_matvec_call(
        bc_flat, blocks, pv_full, s_max=tables.s_max, interpret=interpret
    )
    return out[:, :b] if pad else out


def _local_bwd_blocks(tables, bc, g, pv_full, out_dtype, impl: str, interpret: bool):
    """Local panel cotangent: bar_blocks[r] = g_local[r] @ gathered_pv[r]^T."""
    lrb = g.shape[0] // BLOCK
    phys = pv_full.shape[0] * max(pv_full.shape[1], BLOCK) * pv_full.dtype.itemsize
    if impl == "pallas" and phys > _OPERAND_VMEM_BUDGET:
        pad = -pv_full.shape[1] % BLOCK
        if pad:
            pv_full = jnp.pad(pv_full, ((0, 0), (0, pad)))
            g = jnp.pad(g, ((0, 0), (0, pad)))
        return bwd_blocks_call(
            bc.reshape(-1),
            g,
            pv_full,
            s_max=tables.s_max,
            out_dtype=out_dtype,
            interpret=interpret,
        )
    grouped = pv_full.reshape(pv_full.shape[0] // BLOCK, BLOCK, -1)
    cb = grouped[bc].reshape(lrb, tables.s_max * BLOCK, -1)
    gg = g.reshape(lrb, BLOCK, -1)
    if out_dtype == jnp.bfloat16:
        bar = jnp.einsum(
            "rib,rkb->rik",
            gg.astype(jnp.bfloat16),
            cb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        bar = jnp.einsum("rib,rkb->rik", gg, cb, precision=_HIGHEST)
    return bar.astype(out_dtype)


def _exchange(tables: MeshBlockTables, pvb, bc, force_gather: bool):
    """Operand exchange inside the shard_map body: (local shard pvb
    [lrb*BLOCK, B], global column-block ids bc) -> (operand buffer, block
    ids into it).

    Halo schedule (default whenever ``tables.halo`` is not None): one
    ppermute of halo*BLOCK rows from each ring neighbor builds the
    [lrb + 2*halo blocks] window every local panel column falls in —
    2*halo*BLOCK*B bytes over ICI per matvec vs the all-gather's
    (ndev-1)/ndev * rows*B. Padding slots of short rows remap outside the
    window and are clamped: their panel columns are zero, same contract as
    the single-chip kernels' block-0 padding reads."""
    ndev = tables.ndev
    if force_gather or tables.halo is None:
        return jax.lax.all_gather(pvb, NODE_AXIS, axis=0, tiled=True), bc
    h = tables.halo
    lrb = tables.nrb // ndev
    if ndev > 1 and h > 0:
        left = jax.lax.ppermute(
            pvb[-h * BLOCK :], NODE_AXIS,
            [(i, (i + 1) % ndev) for i in range(ndev)],
        )
        right = jax.lax.ppermute(
            pvb[: h * BLOCK], NODE_AXIS,
            [(i, (i - 1) % ndev) for i in range(ndev)],
        )
        window = jnp.concatenate([left, pvb, right], axis=0)
    else:
        window = pvb
    d = jax.lax.axis_index(NODE_AXIS)
    nblk = window.shape[0] // BLOCK
    bcl = jnp.mod(bc - d * lrb + h, tables.nrb)
    return window, jnp.clip(bcl, 0, nblk - 1).astype(bc.dtype)


def make_sharded_block_matvec_ad(
    tables: MeshBlockTables,
    impl: str = "einsum",
    interpret: bool = False,
    exchange: str = "auto",
    schedule: str = "auto",
):
    """Differentiable row-sharded fused matvec: (blocks, pv) -> L_sym @ pv in
    permuted padded row space ([rows, B] -> [rows, B], both row-sharded).

    The custom VJP mirrors ops.pallas_spmv.make_matvec_ad at the GLOBAL
    operator level: bar_pv = L_sym @ g (one more sharded fused matvec —
    symmetry of the globally-assembled panels), bar_blocks = the per-shard
    panel cotangent on (local g rows) x (exchanged pv). Defining the VJP
    outside shard_map keeps the symmetric-adjoint trick valid (a local row
    slice of L_sym is NOT symmetric on its own).

    ``exchange``: "auto" (halo ppermute when the layout admits it, else
    all-gather) or "gather" (force the all-gather schedule).
    ``schedule``: forwarded to ``_local_matvec`` (pallas resident vs
    streaming kernel; "auto" dispatches on operand bytes).
    """
    mesh = tables.mesh
    force_gather = exchange == "gather"

    def primal(blocks, pv):
        def body(bc, blk, pvb):
            pv_op, bcl = _exchange(tables, pvb, bc, force_gather)
            return _local_matvec(
                tables, bcl, blk, pv_op, impl, interpret, schedule
            )

        # check_vma=False: pallas_call's out_shape carries no vma typing,
        # which the jax>=0.8 shard_map checker would reject.
        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None, None), P(NODE_AXIS, None)),
            out_specs=P(NODE_AXIS, None),
            check_vma=False,
        )(tables.block_col, blocks, pv)

    def bwd_blocks(g, pv, out_dtype):
        def body(bc, gb, pvb):
            pv_op, bcl = _exchange(tables, pvb, bc, force_gather)
            return _local_bwd_blocks(tables, bcl, gb, pv_op, out_dtype, impl, interpret)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None), P(NODE_AXIS, None)),
            out_specs=P(NODE_AXIS, None, None),
            check_vma=False,
        )(tables.block_col, g, pv)

    @jax.custom_vjp
    def mv(blocks, pv):
        return primal(blocks, pv)

    def fwd(blocks, pv):
        return mv(blocks, pv), (blocks, pv)

    def bwd(res, g):
        blocks, pv = res
        g = g.astype(pv.dtype)
        bar_pv = primal(blocks, g)
        bar_blocks = bwd_blocks(g, pv, blocks.dtype)
        return bar_blocks, bar_pv

    mv.defvjp(fwd, bwd)
    return mv


def make_sharded_block_matvec_edge_ad(
    tables: MeshBlockTables,
    impl: str = "einsum",
    interpret: bool = False,
    exchange: str = "auto",
    schedule: str = "auto",
):
    """Row-sharded fused matvec with EDGE-SPACE cotangents:
    ``mv(qblocks, diag, triu, pv)`` — the mesh twin of
    ``ops.pallas_spmv.make_matvec_edge_ad`` (see its docstring and
    ``config.InferenceConfig.solve_cotangent`` for the memory rationale:
    panel-space solve cotangents keep ~8 [lrb, 128, S*128] instances live
    per chip at a 2-D 262k graph — edge space bounds that at ONE transient).

    Caller contract: ``qblocks == assemble_sharded(tables, diag, triu,
    dtype=...)`` and the panel buffer passes through ``stop_gradient``.
    The backward contracts each shard's panel cotangent to the replicated
    coefficient vectors via the transpose of ``assemble_sharded``'s scatter
    (a gather at the per-shard ``edge_pos``/``diag_pos`` tables followed by
    a scatter-add over edge/node ids and one ``psum`` — each directed edge
    copy lives in exactly one shard, so the psum is a disjoint union, not a
    reduction of duplicates).
    """
    mesh = tables.mesh
    force_gather = exchange == "gather"

    def primal(blocks, pv):
        def body(bc, blk, pvb):
            pv_op, bcl = _exchange(tables, pvb, bc, force_gather)
            return _local_matvec(
                tables, bcl, blk, pv_op, impl, interpret, schedule
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(NODE_AXIS, None), P(NODE_AXIS, None, None), P(NODE_AXIS, None)),
            out_specs=P(NODE_AXIS, None),
            check_vma=False,
        )(tables.block_col, blocks, pv)

    def bwd_edge(g, pv, n_nodes, n_edges):
        def body(bc, gb, pvb, edge_sel, edge_pos, diag_sel, diag_pos):
            pv_op, bcl = _exchange(tables, pvb, bc, force_gather)
            bar = _local_bwd_blocks(
                tables, bcl, gb, pv_op, jnp.float32, impl, interpret
            )
            # dummy slot ``lsize`` absorbs the padding gathers (same
            # convention as assemble_sharded's scatter)
            flat = jnp.concatenate(
                [bar.reshape(-1), jnp.zeros((1,), bar.dtype)]
            )
            es, ep = edge_sel[0], edge_pos[0]
            ds, dp = diag_sel[0], diag_pos[0]
            ev = flat[ep] * (es >= 0)
            dv = flat[dp] * (ds >= 0)
            # assemble scatters (-triu) at edge slots, (+diag) at diagonals
            bar_triu = (
                jnp.zeros((n_edges,), jnp.float32)
                .at[jnp.clip(es, 0)]
                .add(-ev)
            )
            bar_diag = (
                jnp.zeros((n_nodes,), jnp.float32)
                .at[jnp.clip(ds, 0)]
                .add(dv)
            )
            return (
                jax.lax.psum(bar_diag, NODE_AXIS),
                jax.lax.psum(bar_triu, NODE_AXIS),
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(NODE_AXIS, None),
                P(NODE_AXIS, None),
                P(NODE_AXIS, None),
                P(NODE_AXIS, None),
                P(NODE_AXIS, None),
                P(NODE_AXIS, None),
                P(NODE_AXIS, None),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(
            tables.block_col, g, pv, tables.edge_sel, tables.edge_pos,
            tables.diag_sel, tables.diag_pos,
        )

    @jax.custom_vjp
    def mv(qblocks, diag, triu, pv):
        return primal(qblocks, pv)

    def fwd(qblocks, diag, triu, pv):
        return primal(qblocks, pv), (qblocks, diag.shape[0], triu.shape[0], pv)

    def bwd(res, g):
        qblocks, n_nodes, n_edges, pv = res
        g = g.astype(pv.dtype)
        bar_pv = primal(qblocks, g)
        bar_diag, bar_triu = bwd_edge(g, pv, n_nodes, n_edges)
        return jnp.zeros_like(qblocks), bar_diag, bar_triu, bar_pv

    mv.defvjp(fwd, bwd)
    return mv


def _check_normalization(normalization: str):
    if normalization not in ("randomwalk", "symmetric"):
        raise ValueError(
            "normalization must be 'randomwalk' or 'symmetric', got "
            f"{normalization!r}"
        )


def sharded_matern_precision_operands(
    tables: MeshBlockTables,
    coeffs,
    nu: int,
    lengthscale,
    dtype=None,
    normalization: str = "randomwalk",
):
    """Assemble the per-coeffs operands of the fused mesh Matérn matvec:
    the shift-folded panel buffer [nrb, BLOCK, S*BLOCK] (row-block-sharded)
    and the permuted sqrt-degree vector [rows] (None for symmetric
    normalization, which uses no D^{1/2} factors).

    Exposed separately so eager callers (benchmarks, repeated solves at
    fixed hyperparameters) can pass both as jit ARGUMENTS — the tunneled
    TPU backend ships closure constants inside the compile request, which
    has a hard size limit the multi-GB panel buffer exceeds."""
    _check_normalization(normalization)
    shift = 2.0 * nu / jnp.square(jnp.reshape(lengthscale, ()))
    qblocks = assemble_sharded(tables, coeffs.diag + shift, coeffs.triu, dtype=dtype)
    dsq_p = (
        jnp.sqrt(tables.gather_coeff(coeffs.deg, fill=1.0))
        if normalization == "randomwalk"
        else None
    )
    return qblocks, dsq_p


def make_sharded_matern_precision_matvec_operand(
    tables: MeshBlockTables,
    nu: int,
    normalization: str = "randomwalk",
    impl: str = "einsum",
    interpret: bool = False,
    schedule: str = "auto",
):
    """Operand-explicit form of the fused mesh Matérn matvec:
    ``matvec(qblocks, dsq_p, v)`` with operands from
    :func:`sharded_matern_precision_operands` (``dsq_p`` is ignored — pass
    None — for symmetric normalization). See
    :func:`make_sharded_matern_precision_matvec_fused` for semantics."""
    _check_normalization(normalization)
    mv_ad = make_sharded_block_matvec_ad(
        tables, impl=impl, interpret=interpret, schedule=schedule
    )
    sharding = tables.node_sharding(2)

    def matvec(qblocks, dsq_p, v):
        squeeze = v.ndim == 1
        out = v[:, None] if squeeze else v
        out = jax.lax.with_sharding_constraint(out, sharding)
        if normalization == "randomwalk":
            out = out * dsq_p[:, None]
        for _ in range(nu):
            out = mv_ad(qblocks, out)
        if normalization == "randomwalk":
            out = out * dsq_p[:, None]
        return out[:, 0] if squeeze else out

    return matvec


def make_sharded_matern_precision_matvec_fused(
    tables: MeshBlockTables,
    coeffs,
    nu: int,
    lengthscale,
    normalization: str = "randomwalk",
    dtype=None,
    impl: str = "einsum",
    interpret: bool = False,
    grad_space: str = "panel",
):
    """Row-sharded fused Matérn precision matvec over permuted padded rows.

    Same telescoped form as the single-chip fused block path (ops/matern.py):
    Q = D^{1/2} (2 nu/l^2 I + L_sym)^nu D^{1/2} (randomwalk; symmetric drops
    the D factors), with the shift scattered into the panel diagonal once per
    coefficient change so each of the nu inner applications is ONE bare
    sharded fused matvec. Vectors: [rows, B], zero padding rows (padding
    degree fill 1.0 keeps the sqrt/mul a no-op there).

    ``grad_space``: "panel" (default) or "edge" — edge-space solve
    cotangents via ``make_sharded_block_matvec_edge_ad`` (see
    ``config.InferenceConfig.solve_cotangent``).
    """
    if grad_space == "edge":
        _check_normalization(normalization)
        shift = 2.0 * nu / jnp.square(jnp.reshape(lengthscale, ()))
        diag_s = coeffs.diag + shift
        qblocks = jax.lax.stop_gradient(
            assemble_sharded(tables, diag_s, coeffs.triu, dtype=dtype)
        )
        mv_edge = make_sharded_block_matvec_edge_ad(
            tables, impl=impl, interpret=interpret
        )
        dsq_p = (
            jnp.sqrt(tables.gather_coeff(coeffs.deg, fill=1.0))
            if normalization == "randomwalk"
            else None
        )
        sharding = tables.node_sharding(2)

        def matvec(v):
            squeeze = v.ndim == 1
            out = v[:, None] if squeeze else v
            out = jax.lax.with_sharding_constraint(out, sharding)
            if normalization == "randomwalk":
                out = out * dsq_p[:, None]
            for _ in range(nu):
                out = mv_edge(qblocks, diag_s, coeffs.triu, out)
            if normalization == "randomwalk":
                out = out * dsq_p[:, None]
            return out[:, 0] if squeeze else out

        return matvec
    qblocks, dsq_p = sharded_matern_precision_operands(
        tables, coeffs, nu, lengthscale, dtype=dtype, normalization=normalization
    )
    inner = make_sharded_matern_precision_matvec_operand(
        tables, nu, normalization, impl=impl, interpret=interpret
    )
    return lambda v: inner(qblocks, dsq_p, v)
