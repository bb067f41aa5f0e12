"""Block-sparse (block-ELL) Laplacian matvec — the MXU-native SpMV.

TPUs hate per-row gathers (the torch_sparse COO spmm the reference leans on,
``operators/graph_laplacian_operator.py:118-119``, has no good analogue); the
MXU wants 128x128 dense tiles. This module restructures the kNN-graph
Laplacian for that:

  * nodes are reordered host-side with reverse Cuthill-McKee (scipy), which
    clusters each row's neighbors into a narrow band of 128-wide column
    blocks (measured: dumbbell k=10 -> 3 blocks/row-block; 10k-node
    clustered 64-d k=50 -> <=17);
  * the static layout stores, per 128-row block, its <=S nonzero 128-column
    blocks plus flat scatter indices that place every (directed) edge value
    and every diagonal entry into a [nrb, S, 128, 128] dense-block buffer;
  * per training step (i.e. once per bandwidth value), ``assemble`` scatters
    the current Laplacian coefficients into the block buffer;
  * per matvec, ``matvec`` does one row gather (the permutation), one
    coarse block gather of the operand, and a batched 128x128 einsum on the
    MXU — no per-row gathers in the hot path.

The assembly cost is amortized over the whole CG/SLQ solve (every iteration
reuses the assembled blocks); the matvec is HBM-bandwidth-bound on the block
buffer, the MXU work is effectively free.

A fused Pallas kernel for the block matvec lives in
``manifold_gp_tpu.ops.pallas_spmv`` (dynamic-slice operand access driven by
scalar-prefetched block-column indices); this module's einsum path is the
portable reference implementation with identical numerics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .graph import SparseGraph

_HIGHEST = jax.lax.Precision.HIGHEST

BLOCK = 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BlockLayout:
    """Static block-ELL structure of a symmetric graph Laplacian."""

    perm: jnp.ndarray  # [Np] int32: permuted_v[new] = v[perm[new]] (old idx)
    unperm: jnp.ndarray  # [N] int32: out[old] = permuted_out[unperm[old]]
    block_col: jnp.ndarray  # [nrb, S] int32 column-block ids (0 = padding)
    edge_flat: jnp.ndarray  # [2M] int32 flat index into [nrb*S*B*B] per directed edge
    diag_flat: jnp.ndarray  # [N] int32 flat index for node diagonals (old order)
    num_nodes: int
    num_padded: int
    num_row_blocks: int
    max_blocks: int  # S
    # NOTE on single-window DMA (measured, rejected): banded layouts admit a
    # streaming-kernel variant that fetches each row block's operand as ONE
    # [S*BLOCK, B] DMA (window-enumerated block_col) instead of S separate
    # [BLOCK, B] slices. Measured on v5e: 1M nodes / k=50 / batch 128 (S=3)
    # 12.32k vs 12.56k matvec/s — 2% SLOWER (same bytes; the slices are
    # already 64 KB, so DMA count is not the bottleneck), and the wide-S
    # streaming regime is unreachable (manifold graphs at large N are
    # narrow-band; wide-S clustered graphs either fit the VMEM-resident
    # kernel or exceed the S cap). Removed rather than kept as dead code.

    def tree_flatten(self):
        children = (self.perm, self.unperm, self.block_col, self.edge_flat, self.diag_flat)
        aux = (
            self.num_nodes,
            self.num_padded,
            self.num_row_blocks,
            self.max_blocks,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_block_layout(
    graph: SparseGraph, max_blocks_cap: int = 40
) -> Optional[BlockLayout]:
    """Host-side construction: RCM ordering + block-ELL structure.

    Returns None when the reordered graph is not block-sparse enough
    (more than ``max_blocks_cap`` column blocks in some row block) — callers
    then fall back to the gather SpMV.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = graph.num_nodes
    r = np.asarray(graph.rows, np.int64)
    c = np.asarray(graph.cols, np.int64)
    rr = np.concatenate([r, c])
    cc = np.concatenate([c, r])
    adj = coo_matrix(
        (np.ones(rr.shape[0], np.float32), (rr, cc)), shape=(n, n)
    ).tocsr()
    perm_old = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True), np.int64)
    inv = np.empty(n, np.int64)
    inv[perm_old] = np.arange(n)

    npad = -(-n // BLOCK) * BLOCK
    nrb = npad // BLOCK
    pr, pc = inv[rr], inv[cc]  # directed edges in new order
    rb = pr // BLOCK
    cb = pc // BLOCK

    # per row-block: sorted unique column blocks (always include the diagonal)
    cols_per_rb = [set([i]) for i in range(nrb)]
    for a, b in zip(rb, cb):
        cols_per_rb[a].add(b)
    s_max = max(len(s) for s in cols_per_rb)
    if s_max > max_blocks_cap:
        return None
    block_col = np.zeros((nrb, s_max), np.int64)
    slot_of = {}  # (rb, cb) -> slot
    for i, s in enumerate(cols_per_rb):
        for j, cbj in enumerate(sorted(s)):
            block_col[i, j] = cbj
            slot_of[(i, cbj)] = j

    # flat scatter index for a (new-order) entry (i, j) in the transposed
    # panel buffer [nrb, BLOCK, S*BLOCK]: row-block panels are [BLOCK, S*BLOCK]
    # so each row block does ONE [BLOCK, S*BLOCK] @ [S*BLOCK, batch] matmul.
    def flat_idx(pi, pj):
        rbi = pi // BLOCK
        slots = np.fromiter(
            (slot_of[(a, b)] for a, b in zip(rbi, pj // BLOCK)),
            np.int64,
            count=pi.shape[0],
        )
        return pi * (s_max * BLOCK) + slots * BLOCK + pj % BLOCK

    edge_flat = flat_idx(pr, pc)
    nodes = np.arange(n, dtype=np.int64)
    pd = inv[nodes]
    diag_flat = flat_idx(pd, pd)

    # padded permutation gathers: padding rows read (and later write) row n,
    # which callers guarantee is in-range by padding v with one zero row? No:
    # we gather with mode="fill" semantics via clipping + masking in matvec.
    perm = np.concatenate([perm_old, np.zeros(npad - n, np.int64)])
    return BlockLayout(
        perm=jnp.asarray(perm, jnp.int32),
        unperm=jnp.asarray(inv, jnp.int32),
        block_col=jnp.asarray(block_col, jnp.int32),
        edge_flat=jnp.asarray(edge_flat, jnp.int32),
        diag_flat=jnp.asarray(diag_flat, jnp.int32),
        num_nodes=n,
        num_padded=int(npad),
        num_row_blocks=int(nrb),
        max_blocks=int(s_max),
    )


def assemble(layout: BlockLayout, diag: jnp.ndarray, triu: jnp.ndarray,
             dtype=None):
    """Scatter the current Laplacian coefficients (L = diag - A_sym) into the
    panel buffer [nrb, BLOCK, S*BLOCK]. Once per coefficient change; every
    matvec of the surrounding CG/SLQ solve reuses it.

    ``dtype``: None/f32 (exact), jnp.bfloat16 (half the panel stream), or
    the string "float32x3" — the f32 panels split into stacked (hi, lo)
    bf16 [2, nrb, BLOCK, S*BLOCK] for the 3-pass MXU kernel
    (ops.pallas_spmv module docstring)."""
    # One scatter-SET over the disjoint union of edge and diagonal slots:
    # every buffer position receives at most one value (edges were
    # mean-coalesced at graph build; diagonal slots never carry edges), and
    # declaring that (unique_indices + promise_in_bounds) lowers to a ~1.5x
    # faster TPU scatter than two overlapping scatter-adds.
    vals = jnp.concatenate([-triu, -triu, diag])  # both edge directions of -A_sym
    idx = jnp.concatenate([layout.edge_flat, layout.diag_flat])
    if dtype == "float32x3":
        flat = jnp.zeros(
            layout.num_padded * layout.max_blocks * BLOCK, diag.dtype
        )
        flat = flat.at[idx].set(
            vals, unique_indices=True, mode="promise_in_bounds"
        )
        out = flat.reshape(
            layout.num_row_blocks, BLOCK, layout.max_blocks * BLOCK
        )
        hi = out.astype(jnp.bfloat16)
        lo = (out - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.stack([hi, lo], axis=0)
    # Scatter in the TARGET dtype: casting the [M]/[N] coefficient vectors
    # loses exactly the same bits as casting the assembled panels, while the
    # GB-scale scatter buffer (and, critically, its VJP cotangent — 2.7 GB
    # f32 at a 2-D 262k graph's S=22) stays in the panel dtype.
    buf_dtype = diag.dtype if dtype is None else dtype
    vals = vals.astype(buf_dtype)
    flat = jnp.zeros(layout.num_padded * layout.max_blocks * BLOCK, buf_dtype)
    flat = flat.at[idx].set(
        vals, unique_indices=True, mode="promise_in_bounds"
    )
    return flat.reshape(
        layout.num_row_blocks, BLOCK, layout.max_blocks * BLOCK
    )


def matvec(layout: BlockLayout, blocks: jnp.ndarray, v: jnp.ndarray):
    """L_sym @ v through the block layout. v: [N, B] -> [N, B]."""
    return permute_out(layout, matvec_permuted(layout, blocks, permute_in(layout, v)))


def permute_in(layout: BlockLayout, v: jnp.ndarray) -> jnp.ndarray:
    """[N, B] original order -> [Np, B] RCM order with zeroed padding rows.
    The zero-padding subspace is invariant under the assembled operator and
    under all diagonal/scalar wrappers, so whole CG/SLQ solves can run in
    permuted space with one permute_in/permute_out pair at the boundary."""
    pv = v[layout.perm]
    if layout.num_padded > layout.num_nodes:
        row_ids = jnp.arange(layout.num_padded)[:, None]
        pv = jnp.where(row_ids < layout.num_nodes, pv, 0.0)
    return pv


def permute_out(layout: BlockLayout, pv: jnp.ndarray) -> jnp.ndarray:
    """[Np, B] RCM order -> [N, B] original order."""
    return pv[layout.unperm]


def matvec_permuted(layout: BlockLayout, blocks: jnp.ndarray, pv: jnp.ndarray):
    """L_sym @ pv entirely in permuted (RCM) space: [Np, B] -> [Np, B].
    CG/SLQ solves run here so the permutation gathers happen once per solve,
    not once per matvec."""
    if blocks.ndim == 4:  # x3-split panels: portable path merges back to f32
        blocks = blocks[0].astype(jnp.float32) + blocks[1].astype(jnp.float32)
    grouped = pv.reshape(layout.num_row_blocks, BLOCK, -1)
    cb = grouped[layout.block_col]  # [nrb, S, BLOCK, batch] block gather
    cb = cb.reshape(layout.num_row_blocks, layout.max_blocks * BLOCK, -1)
    if blocks.dtype == jnp.bfloat16:
        out = jnp.einsum(
            "rik,rkb->rib",
            blocks,
            cb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum("rik,rkb->rib", blocks, cb, precision=_HIGHEST)
    return out.reshape(layout.num_padded, -1).astype(pv.dtype)
