"""Fused Pallas TPU kernel for the block-ELL Laplacian matvec.

The XLA einsum path in ``ops.block_sparse`` materializes the gathered
operand blocks ([nrb, S, 128, B]) in HBM every matvec. This kernel keeps the
whole operand resident in VMEM and walks the block-column index table with
scalar prefetching: per 128-row block, S dynamic 128-row slices of the
operand feed MXU matmuls accumulated in registers — no operand
materialization, one HBM stream over the block buffer.

Grid: one program per row block. VMEM footprint: operand [Np, B] (e.g.
10,240 x 64 f32 = 2.6 MB) + one [S, 128, 128] block slice (S<=40 -> <=2.6 MB)
+ the [128, B] accumulator — comfortably under the ~16 MB budget.

Numerics match ops.block_sparse.matvec exactly in float32; an optional
bfloat16 block/operand mode trades ~3 mantissa digits for the MXU's native
bf16 throughput (single-pass instead of 6-pass f32 emulation) — acceptable
for CG at the reference's 1e-2 relative tolerance, gated behind
``InferenceConfig`` rather than default.

Two kernels share the panel format:
  * ``block_matvec_pallas`` — operand VMEM-resident (fastest; small/medium N);
  * ``block_matvec_pallas_streaming`` — operand HBM-resident, each row block's
    S operand slices DMA'd into a double-buffered VMEM stage (large N, e.g.
    the 1M-node BASELINE config where [Np, B] is hundreds of MB).

NOTE: the bare kernels define no autodiff rules; training uses
``make_matvec_ad``, which picks the kernel by operand size at trace time and
wraps it in a custom VJP (symmetric operator: bar_pv is one more fused
matvec; bar_blocks is a per-row-block outer-product einsum) so the training
hot loop (laplacian_matvec / matern precision with pallas=True) runs a fused
kernel at every scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_sparse import BLOCK, BlockLayout


def _resolve_f32_precision(label: str):
    """f32 panel matmul precision: "highest" = 6-pass bf16x3 emulation
    (bitwise CG-parity default), "high" = 3-pass bf16x3 (drops the lowest
    cross term; ~2^-21 relative matmul error vs f32's 2^-24 — far inside
    the solvers' 1e-2 tolerances) at HALF the MXU cost. Roofline context:
    at 1M nodes the streaming apply is ~3 ms MXU (6-pass) + ~5.6 ms HBM,
    so the 6-pass emulation is a material co-bottleneck (PARITY round-5)."""
    return (
        jax.lax.Precision.HIGH if label == "high" else jax.lax.Precision.HIGHEST
    )



def _kernel(s_max: int, f32_prec, bc_ref, blocks_ref, v_ref, out_ref, scratch_ref):
    i = pl.program_id(0)
    # Stage the S needed operand blocks contiguously, then ONE panel matmul
    # [BLOCK, S*BLOCK] @ [S*BLOCK, batch] on the MXU.
    for s in range(s_max):  # static unroll over the block-column slots
        # flat 1D scalar table: 2D SMEM operands are lane-padded to 128
        # columns, which overflows the 1 MB SMEM at large nrb.
        col = bc_ref[i * s_max + s]
        scratch_ref[pl.ds(s * BLOCK, BLOCK), :] = v_ref[
            pl.ds(col * BLOCK, BLOCK), :
        ].astype(scratch_ref.dtype)
    # Explicit precision: on Mosaic a plain f32 jnp.dot may lower to bf16
    # MXU multiplies; HIGHEST forces the full-f32 multi-pass when the panel
    # buffer is f32. bf16 panels must pin DEFAULT — precision=None inherits
    # the session's jax_default_matmul_precision (training pins "highest"),
    # and Mosaic rejects an fp32-contract matmul over bf16 operands.
    prec = (
        jax.lax.Precision.DEFAULT
        if blocks_ref.dtype == jnp.bfloat16
        else f32_prec
    )
    out_ref[:] = jnp.dot(
        blocks_ref[0],
        scratch_ref[:],
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def resident_matvec_call(bc_flat, blocks, pv, *, s_max: int,
                         interpret: bool = False,
                         f32_precision: str = "highest"):
    """Core VMEM-resident matvec pallas_call with explicit dims: the row
    panels (``blocks`` [nrb, BLOCK, S*BLOCK] + ``bc_flat`` [nrb*S]) may cover
    only a SLICE of the rows while ``pv`` is the full operand those panels'
    column ids index — the shape the row-sharded mesh path needs (local
    panels x all-gathered operand). Returns [nrb*BLOCK, batch]."""
    nrb = blocks.shape[0]
    batch = pv.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_col index table
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK, s_max * BLOCK),
                lambda i, bc: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full operand (constant)
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, batch), lambda i, bc: (i, 0), memory_space=pltpu.VMEM
        ),
        # bf16 panels need a bf16 staged operand (the MXU matmul must see
        # matching element types); f32 panels stage in f32.
        scratch_shapes=[pltpu.VMEM((s_max * BLOCK, batch), blocks.dtype)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, s_max, _resolve_f32_precision(f32_precision)
        ),
        out_shape=jax.ShapeDtypeStruct((nrb * BLOCK, batch), pv.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * s_max * BLOCK * BLOCK * batch,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + 2 * pv.size * pv.dtype.itemsize,
            transcendentals=0,
        ),
    )(bc_flat, blocks, pv)


@functools.partial(jax.jit, static_argnames=("interpret", "f32_precision"))
def block_matvec_pallas(
    layout: BlockLayout, blocks: jnp.ndarray, pv: jnp.ndarray,
    interpret: bool = False, f32_precision: str = "highest",
):
    """L_sym @ pv in *permuted* space. pv: [Np, B] with zeroed padding rows
    (see ops.block_sparse.matvec for the permutation contract). Returns the
    permuted-product [Np, B]. ``blocks`` is the [nrb, BLOCK, S*BLOCK] panel
    buffer (f32 or bf16)."""
    return resident_matvec_call(
        layout.block_col.reshape(-1),
        blocks,
        pv,
        s_max=layout.max_blocks,
        interpret=interpret,
        f32_precision=f32_precision,
    )


# The fused kernel keeps the whole [Np, B] operand VMEM-resident; beyond
# this budget (VMEM is ~16 MB less panel/accumulator slices) callers switch
# to the streaming kernel below, which keeps the operand in HBM and
# double-buffers per-row-block DMA of the needed column slices.
_OPERAND_VMEM_BUDGET = 8 * 2**20


def _kernel_stream(
    s_max: int, nrb: int, f32_prec, bc_ref, blocks_ref, pv_ref, out_ref, stage_ref,
    sem_ref,
):
    """Streaming variant: the [Np, B] operand stays in HBM; each row block
    DMAs its S needed [BLOCK, B] operand slices into a double-buffered VMEM
    stage, prefetching row block i+1's slices while computing block i. The
    panel stream ([BLOCK, S*BLOCK] per block) rides the ordinary Pallas
    pipeline, so both HBM streams overlap the MXU work."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    def dma(row_block, slot, s):
        # bc_ref is the block_col table flattened to 1D: 2D SMEM operands are
        # lane-padded to 128 columns, which at 1M nodes (nrb ~ 8k) would blow
        # the 1 MB SMEM budget ~43x; flat scalars are stored unpadded.
        col = bc_ref[row_block * s_max + s]
        return pltpu.make_async_copy(
            pv_ref.at[pl.ds(col * BLOCK, BLOCK), :],
            stage_ref.at[slot, pl.ds(s * BLOCK, BLOCK), :],
            sem_ref.at[slot, s],
        )

    @pl.when(i == 0)
    def _():
        for s in range(s_max):
            dma(0, 0, s).start()

    @pl.when(i + 1 < nrb)
    def _():
        for s in range(s_max):
            dma(i + 1, next_slot, s).start()

    for s in range(s_max):
        dma(i, slot, s).wait()

    prec = (
        jax.lax.Precision.DEFAULT
        if blocks_ref.dtype == jnp.bfloat16
        else f32_prec
    )
    out_ref[:] = jnp.dot(
        blocks_ref[0],
        stage_ref[slot].astype(blocks_ref.dtype),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def stream_matvec_call(
    bc_flat,
    blocks,
    pv,
    *,
    s_max: int,
    interpret: bool = False,
    f32_precision: str = "highest",
):
    """Core HBM-operand streaming matvec pallas_call with explicit dims (see
    ``resident_matvec_call`` for the local-panels x full-operand contract).
    Returns [nrb*BLOCK, batch]; batch must be a multiple of 128."""
    nrb = blocks.shape[0]
    batch = pv.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_col index table
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec(
                (1, BLOCK, s_max * BLOCK),
                lambda i, bc: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # operand stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, batch), lambda i, bc: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, s_max * BLOCK, batch), pv.dtype),
            pltpu.SemaphoreType.DMA((2, s_max)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_stream, s_max, nrb,
            _resolve_f32_precision(f32_precision),
        ),
        out_shape=jax.ShapeDtypeStruct((nrb * BLOCK, batch), pv.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: cross-step DMA
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * s_max * BLOCK * BLOCK * batch,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + (nrb * s_max * BLOCK + nrb * BLOCK) * batch * pv.dtype.itemsize,
            transcendentals=0,
        ),
    )(bc_flat, blocks, pv)


@functools.partial(jax.jit, static_argnames=("interpret", "f32_precision"))
def block_matvec_pallas_streaming(
    layout: BlockLayout, blocks: jnp.ndarray, pv: jnp.ndarray,
    interpret: bool = False, f32_precision: str = "highest",
):
    """L_sym @ pv in permuted space with an HBM-resident operand.

    Same contract as ``block_matvec_pallas`` but without the VMEM-residency
    limit on pv: built for the large-N regime (BASELINE config 5, 1M nodes)
    where [Np, B] is hundreds of MB. HBM traffic per call is
    ``blocks.nbytes + nrb*S*BLOCK*B*4 (operand slices) + out.nbytes`` — the
    einsum path additionally writes AND re-reads the gathered operand."""
    return stream_matvec_call(
        layout.block_col.reshape(-1),
        blocks,
        pv,
        s_max=layout.max_blocks,
        interpret=interpret,
        f32_precision=f32_precision,
    )


def _kernel_bwd_blocks(
    s_max: int, nrb: int, bc_ref, g_ref, pv_ref, out_ref, stage_ref, sem_ref
):
    """bar_blocks[r] = g[r] @ gathered_pv[r]^T — the panel-cotangent of the
    streaming matvec, with the same double-buffered operand-slice DMA as the
    forward kernel (no [nrb, S*128, B] HBM materialization)."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    def dma(row_block, slot, s):
        col = bc_ref[row_block * s_max + s]
        return pltpu.make_async_copy(
            pv_ref.at[pl.ds(col * BLOCK, BLOCK), :],
            stage_ref.at[slot, pl.ds(s * BLOCK, BLOCK), :],
            sem_ref.at[slot, s],
        )

    @pl.when(i == 0)
    def _():
        for s in range(s_max):
            dma(0, 0, s).start()

    @pl.when(i + 1 < nrb)
    def _():
        for s in range(s_max):
            dma(i + 1, next_slot, s).start()

    for s in range(s_max):
        dma(i, slot, s).wait()

    prec = (
        jax.lax.Precision.DEFAULT
        if out_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    g = g_ref[:].astype(jnp.bfloat16) if out_ref.dtype == jnp.bfloat16 else g_ref[:]
    st = stage_ref[slot].astype(g.dtype)
    out_ref[0] = jax.lax.dot_general(
        g,
        st,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def bwd_blocks_call(
    bc_flat,
    g,
    pv,
    *,
    s_max: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Core panel-cotangent pallas_call with explicit dims: ``g`` covers the
    panel rows ([nrb*BLOCK, B]), ``pv`` the full operand the panel column ids
    index. Returns [nrb, BLOCK, S*BLOCK]; batch a multiple of 128."""
    nrb = g.shape[0] // BLOCK
    batch = pv.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK, batch), lambda i, bc: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # operand stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK, s_max * BLOCK),
            lambda i, bc: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, s_max * BLOCK, batch), pv.dtype),
            pltpu.SemaphoreType.DMA((2, s_max)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_bwd_blocks, s_max, nrb),
        out_shape=jax.ShapeDtypeStruct(
            (nrb, BLOCK, s_max * BLOCK), out_dtype
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * s_max * BLOCK * BLOCK * batch,
            bytes_accessed=(nrb * s_max * BLOCK + nrb * BLOCK + pv.shape[0])
            * batch
            * pv.dtype.itemsize
            + nrb * BLOCK * s_max * BLOCK * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(bc_flat, g, pv)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def block_bwd_blocks_pallas_streaming(
    layout: BlockLayout,
    g: jnp.ndarray,
    pv: jnp.ndarray,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Panel cotangent bar_blocks [nrb, BLOCK, S*BLOCK] from cotangent g and
    operand pv (both [Np, B] in permuted space, B a multiple of 128)."""
    return bwd_blocks_call(
        layout.block_col.reshape(-1),
        g,
        pv,
        s_max=layout.max_blocks,
        out_dtype=out_dtype,
        interpret=interpret,
    )


def make_matvec_ad(layout: BlockLayout, interpret: bool = False,
                   f32_precision: str = "highest"):
    """Differentiable Pallas block matvec: (blocks, pv) -> L @ pv in permuted
    space, with a custom VJP so the *training* hot loop can run the fused
    kernel too (the bare kernel defines no transpose/JVP rules).

    Kernel selection is at trace time on static shapes: operands that fit the
    VMEM-residency budget use ``block_matvec_pallas`` (whole [Np, B] operand
    pinned in VMEM); larger operands use ``block_matvec_pallas_streaming``
    (operand in HBM, double-buffered per-row-block slice DMA) — the large-N
    regime where round 1 silently fell back to the einsum path.

    VJP derivation for out = M(blocks) @ pv:
      * bar_pv = M^T g = M g — valid because ``assemble`` always scatters both
        edge directions plus the diagonal, so the panel buffer encodes a
        symmetric matrix (same reason CG may reuse the forward matvec as the
        adjoint, ops/cg.py:84-86);
      * bar_blocks[r, i, k] = sum_b g[r*B+i, b] * pv_gathered[r, k, b] — one
        einsum over the gathered operand blocks (the einsum path's
        materialization, paid only inside solve/logdet VJPs, once per solve).
    """

    def run_kernel(blocks, pv):
        # Physical VMEM footprint: the lane (batch) dim is tiled to 128, so
        # a [1M, 1] operand really occupies [1M, 128] floats in VMEM.
        phys = pv.shape[0] * max(pv.shape[1], 128) * pv.dtype.itemsize
        if phys <= _OPERAND_VMEM_BUDGET:
            return block_matvec_pallas(
                layout, blocks, pv, interpret=interpret,
                f32_precision=f32_precision,
            )
        # Mosaic DMA slices need a 128-multiple lane (batch) dim: pad the RHS
        # up to the lane width and slice the result, so batch-1 quad matvecs,
        # 100-probe average_variance solves and odd-width Schur inner solves
        # all ride the streaming kernel at large N (the lanes are
        # physically occupied either way — padding costs one [Np, Bp] copy,
        # not extra DMA lanes, while the einsum fallback re-materializes the
        # full gathered operand through HBM).
        b = pv.shape[1]
        pad = -b % BLOCK
        if pad:
            pv = jnp.pad(pv, ((0, 0), (0, pad)))
        out = block_matvec_pallas_streaming(
            layout, blocks, pv, interpret=interpret,
            f32_precision=f32_precision,
        )
        return out[:, :b] if pad else out

    @jax.custom_vjp
    def mv_pallas(blocks, pv):
        return run_kernel(blocks, pv)

    def fwd(blocks, pv):
        return mv_pallas(blocks, pv), (blocks, pv)

    def bwd(res, g):
        blocks, pv = res
        g = g.astype(pv.dtype)
        bar_pv = run_kernel(blocks, g)
        phys = pv.shape[0] * max(pv.shape[1], 128) * pv.dtype.itemsize
        if phys > _OPERAND_VMEM_BUDGET:
            # Large-N: fused panel-cotangent kernel (same operand-slice DMA
            # as the forward) instead of materializing the [nrb, S*128, B]
            # gathered operand in HBM for an einsum. Odd batch widths pad the
            # lane dim like the forward; the zero columns contribute nothing
            # to the per-panel outer products.
            pad = -pv.shape[1] % BLOCK
            if pad:
                pv = jnp.pad(pv, ((0, 0), (0, pad)))
                g = jnp.pad(g, ((0, 0), (0, pad)))
            bar_blocks = block_bwd_blocks_pallas_streaming(
                layout, g, pv, out_dtype=blocks.dtype, interpret=interpret
            )
            return bar_blocks, bar_pv
        grouped = pv.reshape(layout.num_row_blocks, BLOCK, -1)
        cb = grouped[layout.block_col].reshape(
            layout.num_row_blocks, layout.max_blocks * BLOCK, -1
        )
        gg = g.reshape(layout.num_row_blocks, BLOCK, -1)
        if blocks.dtype == jnp.bfloat16:
            bar_blocks = jnp.einsum(
                "rib,rkb->rik",
                gg.astype(jnp.bfloat16),
                cb.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        else:
            bar_blocks = jnp.einsum(
                "rib,rkb->rik", gg, cb, precision=jax.lax.Precision.HIGHEST
            )
        return bar_blocks, bar_pv

    mv_pallas.defvjp(fwd, bwd)

    return mv_pallas


def matvec(layout: BlockLayout, blocks: jnp.ndarray, v: jnp.ndarray,
           interpret: bool = False):
    """Drop-in replacement for ops.block_sparse.matvec using the fused
    kernel. v: [N, B] in original node order."""
    n = layout.num_nodes
    pv = v[layout.perm]
    if layout.num_padded > n:
        row_ids = jnp.arange(layout.num_padded)[:, None]
        pv = jnp.where(row_ids < n, pv, 0.0)
    out = block_matvec_pallas(layout, blocks, pv, interpret=interpret)
    return out[layout.unperm]
