"""Sparse-layout format dispatch: block-ELL panels vs DIA bands.

Two TPU-native SpMV formats share one permuted-space calling convention
(layout-build at graph construction, ``assemble`` once per coefficient
change, ``matvec_permuted`` in the solver hot loop, ``permute_in/out`` at
solve boundaries, ``make_matvec_ad`` for the differentiable fused kernel):

  * ``ops.dia``          — diagonal-offset bands for (near-)banded RCM
                           orderings: one stored float per (row, diagonal),
                           VPU shifted-FMA kernel. ~S*128/D times less HBM
                           traffic than panels when it applies.
  * ``ops.block_sparse`` — 128x128 panel blocks for general graphs: MXU
                           matmul kernel (VMEM-resident or HBM-streaming
                           operand, ops.pallas_spmv).

``build_layout`` prefers DIA whenever the reordered graph is banded enough;
every downstream function here dispatches on the layout type so operator /
kernel / model code is format-agnostic.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from . import block_sparse, dia
from .block_sparse import BlockLayout
from .dia import DiaLayout
from .graph import SparseGraph

Layout = Union[BlockLayout, DiaLayout]


def build_layout(
    graph: SparseGraph,
    max_blocks_cap: int = 40,
    dia_max_offsets: int = 24,
    use_dia: bool = True,
) -> Optional[Layout]:
    """RCM-reorder the graph and pick the cheapest fused-SpMV layout.

    DIA stores D <= dia_max_offsets floats per row versus the panel buffer's
    S*128 >= 128, but pays a VPU relayout per diagonal — it wins only for
    narrow bands (see config.dia_max_offsets for measurements). Falls back
    to block-ELL panels, then to None (callers use the ELL gather scan)."""
    if use_dia:
        layout = dia.build_dia_layout(graph, max_offsets=dia_max_offsets)
        if layout is not None:
            return layout
    return block_sparse.build_block_layout(graph, max_blocks_cap=max_blocks_cap)


def assemble(layout: Layout, diag: jnp.ndarray, triu: jnp.ndarray, dtype=None):
    if isinstance(layout, DiaLayout):
        # DIA is VPU shifted-FMA work — no MXU passes, so the x3 split has
        # nothing to buy; keep exact f32 bands.
        return dia.assemble(
            layout, diag, triu, dtype=None if dtype == "float32x3" else dtype
        )
    return block_sparse.assemble(layout, diag, triu, dtype=dtype)


def matvec_permuted(layout: Layout, buf: jnp.ndarray, pv: jnp.ndarray):
    if isinstance(layout, DiaLayout):
        return dia.matvec_permuted(layout, buf, pv)
    return block_sparse.matvec_permuted(layout, buf, pv)


def permute_in(layout: Layout, v: jnp.ndarray) -> jnp.ndarray:
    if isinstance(layout, DiaLayout):
        return dia.permute_in(layout, v)
    return block_sparse.permute_in(layout, v)


def permute_out(layout: Layout, pv: jnp.ndarray) -> jnp.ndarray:
    if isinstance(layout, DiaLayout):
        return dia.permute_out(layout, pv)
    return block_sparse.permute_out(layout, pv)


def make_matvec_ad(layout: Layout, interpret: bool = False):
    """The returned matvec dispatches on the assembled buffer it is called
    with: f32 panels (exact, 6-pass MXU), bf16 panels (single pass), or the
    x3-split stacked-bf16 panels from ``assemble(dtype="float32x3")``
    (3-pass bf16x3 — half the MXU cost of f32 at ~2^-15 relative error;
    see ops.pallas_spmv). DIA bands are VPU work with one f32 path."""
    if isinstance(layout, DiaLayout):
        return dia.make_matvec_ad(layout, interpret=interpret)
    from .pallas_spmv import make_matvec_ad as block_make_matvec_ad

    return block_make_matvec_ad(layout, interpret=interpret)


def matvec(layout: Layout, buf: jnp.ndarray, v: jnp.ndarray):
    """L_sym @ v in original node order (permute boundary included)."""
    return permute_out(layout, matvec_permuted(layout, buf, permute_in(layout, v)))
