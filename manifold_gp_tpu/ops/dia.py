"""DIA (diagonal-offset) SpMV — the TPU format for near-banded graphs.

The RCM-reordered kNN graph of a densely sampled low-dimensional manifold is
(nearly) *banded*: every edge's column offset ``perm_col - perm_row`` falls in
a small set of D distinct values. The block-ELL panel format
(``ops.block_sparse``) stores such rows inside 128-wide column blocks, so a
17-nnz row still streams S*128 >= 256 panel floats per matvec — >90% zeros.
This module stores exactly one float per (row, offset) instead:

  band[i, d] = A[i, i + off_d]          (band: [Npd, D], offsets static)
  (A v)[i]   = sum_d band[i, d] * v[i + off_d]

which is D vector FMAs over shifted row windows — pure VPU work (band is
D/(S*128) of the equivalent panel buffer). The catch: each diagonal's
unaligned sublane shift is a VMEM relayout, so per-row cost grows linearly
in D while the MXU panel kernel's does not — measured on v5e at 1M nodes
DIA wins up to D~24 and loses beyond (see config.dia_max_offsets). This is
the idiomatic TPU analogue of the classic DIA format; the reference's
torch-COO spmm (``operators/graph_laplacian_operator.py:118-119``) has no
counterpart.

Layout contract (mirrors ops.block_sparse's permuted space):
  * true row i lives at padded index TILE + i — a full leading halo tile plus
    a trailing pad keep every kernel window DMA in range with *static*
    per-diagonal slice starts;
  * halo/pad rows carry zero band values and zero vector entries, so the
    zero-padding subspace is invariant under the operator and whole CG/SLQ
    solves run in this space with one permute_in/permute_out pair;
  * offsets are compile-time constants (python ints) — every shifted window
    slice in the kernel is static.

``build_dia_layout`` returns None when the reordered graph is not banded
enough (more than ``max_offsets`` distinct diagonals or halfwidth > TILE);
callers then fall back to the block-ELL format.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import SparseGraph

TILE = 512  # rows per kernel program (and the leading halo size)
# The band buffer is stored 128 lanes wide regardless of the offset count:
# an [Npd, D<128] HBM array DMAs into (8,128)-tiled VMEM as D-element strided
# row transfers (244 B rows at D=61 — latency-bound, measured ~55 GB/s);
# padding to the full lane width makes every pipeline transfer a contiguous
# 4 KB tile. Costs zeros (D..127 lanes) but streams at full bandwidth.
BAND_WIDTH = 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiaLayout:
    """Static DIA structure of a symmetric graph Laplacian (RCM-reordered)."""

    perm: jnp.ndarray  # [Npd] int32: permuted_v[new] = v[perm[new]] (old idx)
    unperm: jnp.ndarray  # [N] int32: out[old] = permuted_out[unperm[old]]
    edge_flat: jnp.ndarray  # [2M] int32 flat index into [Npd*D] per directed edge
    diag_flat: jnp.ndarray  # [N] int32 flat index for node diagonals (old order)
    offsets: Tuple[int, ...]  # D static diagonal offsets (sorted, includes 0)
    num_nodes: int
    num_padded: int  # Npd (halo tile + N + trailing pad, multiple of TILE)
    halfwidth: int  # W = max |offset|

    def tree_flatten(self):
        children = (self.perm, self.unperm, self.edge_flat, self.diag_flat)
        aux = (self.offsets, self.num_nodes, self.num_padded, self.halfwidth)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_offsets(self) -> int:
        return len(self.offsets)


def build_dia_layout(
    graph: SparseGraph, max_offsets: int = 24
) -> Optional[DiaLayout]:
    """Host-side construction: RCM ordering + diagonal-offset structure.

    Returns None when the reordered graph has more than ``max_offsets``
    distinct diagonals or a band halfwidth above TILE (window DMA must fit
    one tile's halo) — callers fall back to the block-ELL layout.
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

    pr, pc = inv[rr], inv[cc]
    offs = np.unique(np.concatenate([pc - pr, np.zeros(1, np.int64)]))
    w = int(np.max(np.abs(offs))) if offs.size else 0
    if offs.size > min(max_offsets, BAND_WIDTH) or w > TILE or n < 2 * w:
        return None
    d = offs.size
    slot = {int(o): j for j, o in enumerate(offs)}

    # One leading halo tile + one trailing halo tile: every tile containing
    # valid rows gets an in-range [t*TILE - W, t*TILE + TILE + W) window; the
    # all-halo edge tiles use clamped windows whose reads the zero band
    # annihilates.
    npd = (-(-(TILE + n) // TILE) + 1) * TILE

    edge_slots = np.fromiter(
        (slot[int(o)] for o in (pc - pr)), np.int64, count=pr.shape[0]
    )
    edge_flat = (TILE + pr) * BAND_WIDTH + edge_slots
    diag_flat = (TILE + inv) * BAND_WIDTH + slot[0]

    # perm gathers: halo/pad rows read row 0 and are masked to zero by
    # permute_in (same clamp-and-mask scheme as ops.block_sparse).
    perm = np.zeros(npd, np.int64)
    perm[TILE : TILE + n] = perm_old
    return DiaLayout(
        perm=jnp.asarray(perm, jnp.int32),
        unperm=jnp.asarray(TILE + inv, jnp.int32),
        edge_flat=jnp.asarray(edge_flat, jnp.int32),
        diag_flat=jnp.asarray(diag_flat, jnp.int32),
        offsets=tuple(int(o) for o in offs),
        num_nodes=n,
        num_padded=int(npd),
        halfwidth=w,
    )


def assemble(layout: DiaLayout, diag: jnp.ndarray, triu: jnp.ndarray, dtype=None):
    """Scatter the current Laplacian coefficients (L = diag - A_sym) into the
    band buffer [Npd, D]. Once per coefficient change, reused across the
    surrounding CG/SLQ solve (same contract as block_sparse.assemble)."""
    vals = jnp.concatenate([-triu, -triu, diag])
    idx = jnp.concatenate([layout.edge_flat, layout.diag_flat])
    flat = jnp.zeros(layout.num_padded * BAND_WIDTH, diag.dtype)
    flat = flat.at[idx].set(vals, unique_indices=True, mode="promise_in_bounds")
    out = flat.reshape(layout.num_padded, BAND_WIDTH)
    return out if dtype is None else out.astype(dtype)


def permute_in(layout: DiaLayout, v: jnp.ndarray) -> jnp.ndarray:
    """[N, B] original order -> [Npd, B] RCM order with zeroed halo/pad rows."""
    pv = v[layout.perm]
    row_ids = jnp.arange(layout.num_padded)[:, None]
    valid = (row_ids >= TILE) & (row_ids < TILE + layout.num_nodes)
    return jnp.where(valid, pv, 0.0)


def permute_out(layout: DiaLayout, pv: jnp.ndarray) -> jnp.ndarray:
    """[Npd, B] RCM order -> [N, B] original order."""
    return pv[layout.unperm]


def matvec_permuted(layout: DiaLayout, band: jnp.ndarray, pv: jnp.ndarray):
    """A @ pv in DIA space via XLA shifted FMAs: [Npd, B] -> [Npd, B].

    The portable reference path (CPU/tests): one roll per diagonal. Rolled
    wrap-around reads land only on rows whose band value is zero (halo/pad),
    so they contribute nothing.
    """
    out = jnp.zeros_like(pv)
    for j, off in enumerate(layout.offsets):
        out = out + band[:, j : j + 1].astype(pv.dtype) * jnp.roll(pv, -off, axis=0)
    return out


# ---------------------------------------------------------------------------
# Fused Pallas kernel: HBM operand, double-buffered window DMA, VPU FMAs
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _dia_kernel(offsets, w, npd, band_ref, pv_ref, out_ref, win_ref, sem_ref):
    """One program per TILE rows. The operand window [TILE + 2W, B] for tile
    t covers rows [t*TILE - W, t*TILE + TILE + W); the leading and trailing
    halo tiles keep that range in-bounds for every tile with nonzero band
    values (the all-halo edge tiles use clamped windows whose reads the zero
    band annihilates). Per-diagonal slice starts W + off_d are static."""
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    t = TILE
    win_rows = t + 2 * w
    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    def dma(tile, slot):
        s0 = jnp.clip(tile * t - w, 0, npd - win_rows)
        return pltpu.make_async_copy(
            pv_ref.at[pl.ds(s0, win_rows), :],
            win_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nt)
    def _():
        dma(i + 1, next_slot).start()

    dma(i, slot).wait()

    # Grouped pairwise reduction: groups of 8 independent FMAs give the VPU
    # ILP without holding all D [TILE, B] terms live at once (a full tree at
    # D=61 blows the 16 MB VMEM scratch budget).
    acc = None
    group = 8
    for g0 in range(0, len(offsets), group):
        terms = [
            band_ref[:, j : j + 1] * win_ref[slot, pl.ds(w + off, t), :]
            for j, off in enumerate(
                offsets[g0 : g0 + group], start=g0
            )
        ]
        while len(terms) > 1:
            paired = [a + b for a, b in zip(terms[::2], terms[1::2])]
            if len(terms) % 2:
                paired.append(terms[-1])
            terms = paired
        acc = terms[0] if acc is None else acc + terms[0]
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dia_matvec_pallas(
    layout: DiaLayout, band: jnp.ndarray, pv: jnp.ndarray, interpret: bool = False
):
    """A @ pv with the band pipelined through VMEM and the operand window
    DMA'd (double-buffered) from HBM. pv: [Npd, B], B a multiple of 128
    (Mosaic DMA lane-alignment); halo/pad rows zero. Exact f32 numerics
    (pure VPU FMAs; no MXU passes involved)."""
    npd = layout.num_padded
    d = layout.num_offsets
    w = layout.halfwidth
    batch = pv.shape[1]
    nt = npd // TILE
    return pl.pallas_call(
        functools.partial(_dia_kernel, layout.offsets, w, npd),
        out_shape=jax.ShapeDtypeStruct((npd, batch), pv.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((TILE, BAND_WIDTH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # operand stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE, batch), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TILE + 2 * w, batch), pv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: cross-step DMA
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * npd * d * batch,
            bytes_accessed=band.size * band.dtype.itemsize
            + (nt * (TILE + 2 * w) + npd) * batch * pv.dtype.itemsize,
            transcendentals=0,
        ),
    )(band, pv)


def make_matvec_ad(layout: DiaLayout, interpret: bool = False):
    """Differentiable DIA matvec (band, pv) -> A @ pv in DIA space.

    Same shape of custom VJP as pallas_spmv.make_matvec_ad: the operator is
    symmetric (both edge directions + diagonal live in the band), so
    bar_pv = A g is one more fused matvec; bar_band[i, d] = sum_b g[i,b] *
    pv[i+off_d, b] is one shifted elementwise reduction per diagonal
    (paid only inside solve/logdet VJPs, once per solve)."""

    def run_kernel(band, pv):
        # Mosaic window DMA needs a 128-multiple lane (batch) dim: pad and
        # slice (one [Npd, Bp] copy) rather than falling back to the XLA roll
        # path, which materializes D full shifted operand copies per matvec.
        b = pv.shape[1]
        pad = -b % 128
        if pad:
            pv = jnp.pad(pv, ((0, 0), (0, pad)))
        out = dia_matvec_pallas(layout, band, pv, interpret=interpret)
        return out[:, :b] if pad else out

    @jax.custom_vjp
    def mv(band, pv):
        return run_kernel(band, pv)

    def fwd(band, pv):
        return mv(band, pv), (band, pv)

    def bwd(res, g):
        band, pv = res
        g = g.astype(pv.dtype)
        bar_pv = run_kernel(band, g)
        cols = [
            jnp.sum(g * jnp.roll(pv, -off, axis=0), axis=1)
            for off in layout.offsets
        ]
        bar_band = jnp.stack(cols, axis=1).astype(band.dtype)
        # band is stored BAND_WIDTH lanes wide; padding lanes never
        # contribute, so their cotangent is zero.
        pad = band.shape[1] - bar_band.shape[1]
        if pad:
            bar_band = jnp.pad(bar_band, ((0, 0), (0, pad)))
        return bar_band, bar_pv

    mv.defvjp(fwd, bwd)
    return mv
