"""Fused Pallas TPU kernels for the block-ELL Laplacian matvec.

The XLA einsum path in ``ops.block_sparse`` materializes the gathered
operand blocks ([nrb, S, 128, B]) in HBM every matvec. These kernels keep the
whole operand resident in VMEM and walk the block-column index table with
scalar prefetching: per 128-row block, S dynamic 128-row slices of the
operand feed MXU matmuls accumulated in registers — no operand
materialization, one HBM stream over the block buffer.

Grid: one program per row block. VMEM footprint: operand [Np, B] (e.g.
10,240 x 64 f32 = 2.6 MB) + one [S, 128, 128] block slice (S<=40 -> <=2.6 MB)
+ the [128, B] accumulator — comfortably under the ~16 MB budget.

Three panel dtypes share the kernels (picked by the assembled buffer):

  * float32  — [nrb, BLOCK, S*BLOCK] f32 panels, MXU matmul at HIGHEST
    (the 6-pass bf16x3 emulation; bitwise f32 parity). Roofline (measured,
    v5e, 1M nodes, S=3, batch 128): ~3 ms MXU + ~5.6 ms HBM per apply —
    the 6-pass emulation is a material co-bottleneck (PARITY round-5).
  * float32x3 — [2, nrb, BLOCK, S*BLOCK] bf16: the f32 panels split as
    hi = bf16(x), lo = bf16(x - f32(hi)) at assemble time; the kernel
    splits the staged f32 operand the same way and issues THREE bf16 MXU
    passes (hi.hi + hi.lo + lo.hi — the bf16_3x scheme, dropping only the
    lo.lo term): HALF the MXU cost of HIGHEST at ~2^-15 relative matmul
    error (vs f32's 2^-24) — far inside the solvers' 1e-2 tolerances.
    Same HBM panel bytes as f32 (2 x bf16). Mosaic has no built-in HIGH
    (bf16_3x) dot lowering, hence the explicit split.
  * bfloat16 — [nrb, BLOCK, S*BLOCK] bf16, single native MXU pass, f32
    accumulation: half the panel HBM stream and 1/6 the MXU cost; ~1e-3
    relative matvec error (bounds pinned by tests/test_bf16_solve.py).

Two kernel schedules share each dtype:
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


def split_bf16x3(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> stacked [2, ...] bf16 (hi, lo) with x ~ hi + lo to ~2^-16."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, lo], axis=0)


def merge_bf16x3(x: jnp.ndarray) -> jnp.ndarray:
    """Stacked [2, ...] bf16 (hi, lo) -> f32 reconstruction."""
    return x[0].astype(jnp.float32) + x[1].astype(jnp.float32)


def _is_x3(blocks) -> bool:
    return blocks.ndim == 4 and blocks.shape[0] == 2


def _panel_dot(blocks_blk, staged, out_dtype):
    """One row block's panel matmul, dispatching on the panel dtype.

    ``blocks_blk``: [BLOCK, S*BLOCK] (f32/bf16) or [2, BLOCK, S*BLOCK]
    (x3 split). ``staged``: the gathered operand [S*BLOCK, B] in f32 (f32 /
    x3 panels) or bf16 (bf16 panels). Explicit precision everywhere: on
    Mosaic a plain f32 jnp.dot may lower to bf16 MXU multiplies; HIGHEST
    forces the full-f32 multi-pass when the panel buffer is f32. bf16
    operands must pin DEFAULT — precision=None inherits the session's
    jax_default_matmul_precision (training pins "highest"), and Mosaic
    rejects an fp32-contract matmul over bf16 operands."""
    if blocks_blk.ndim == 3:  # x3 split panels
        sh = staged.astype(jnp.bfloat16)
        sl = (staged - sh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = (
            dot(blocks_blk[0], sh)
            + dot(blocks_blk[0], sl)
            + dot(blocks_blk[1], sh)
        )
        return acc.astype(out_dtype)
    prec = (
        jax.lax.Precision.DEFAULT
        if blocks_blk.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    return jnp.dot(
        blocks_blk,
        staged,
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_dtype)


def _blocks_spec(x3: bool, s_max: int):
    if x3:
        return pl.BlockSpec(
            (2, 1, BLOCK, s_max * BLOCK),
            lambda i, bc: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, BLOCK, s_max * BLOCK),
        lambda i, bc: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _kernel(s_max: int, bc_ref, blocks_ref, v_ref, out_ref, scratch_ref):
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
    blk = blocks_ref[:, 0] if blocks_ref.ndim == 4 else blocks_ref[0]
    out_ref[:] = _panel_dot(blk, scratch_ref[:], out_ref.dtype)


def resident_matvec_call(bc_flat, blocks, pv, *, s_max: int,
                         interpret: bool = False):
    """Core VMEM-resident matvec pallas_call with explicit dims: the row
    panels (``blocks`` [nrb, BLOCK, S*BLOCK], or [2, nrb, BLOCK, S*BLOCK]
    for x3-split, + ``bc_flat`` [nrb*S]) may cover only a SLICE of the rows
    while ``pv`` is the full operand those panels' column ids index — the
    shape the row-sharded mesh path needs (local panels x all-gathered
    operand). Returns [nrb*BLOCK, batch]."""
    x3 = _is_x3(blocks)
    nrb = blocks.shape[1] if x3 else blocks.shape[0]
    batch = pv.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_col index table
        grid=(nrb,),
        in_specs=[
            _blocks_spec(x3, s_max),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full operand (constant)
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, batch), lambda i, bc: (i, 0), memory_space=pltpu.VMEM
        ),
        # bf16 panels need a bf16 staged operand (the MXU matmul must see
        # matching element types); f32 and x3 panels stage in f32 (x3 splits
        # the stage in-register per block).
        scratch_shapes=[
            pltpu.VMEM((s_max * BLOCK, batch), pv.dtype if x3 else blocks.dtype)
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, s_max),
        out_shape=jax.ShapeDtypeStruct((nrb * BLOCK, batch), pv.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(3 if x3 else 2) * nrb * s_max * BLOCK * BLOCK * batch,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + 2 * pv.size * pv.dtype.itemsize,
            transcendentals=0,
        ),
    )(bc_flat, blocks, pv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_matvec_pallas(
    layout: BlockLayout, blocks: jnp.ndarray, pv: jnp.ndarray, interpret: bool = False
):
    """L_sym @ pv in *permuted* space. pv: [Np, B] with zeroed padding rows
    (see ops.block_sparse.matvec for the permutation contract). Returns the
    permuted-product [Np, B]. ``blocks`` is the panel buffer (f32, bf16, or
    x3-split)."""
    return resident_matvec_call(
        layout.block_col.reshape(-1),
        blocks,
        pv,
        s_max=layout.max_blocks,
        interpret=interpret,
    )


# The fused kernel keeps the whole [Np, B] operand VMEM-resident; beyond
# this budget (VMEM is ~16 MB less panel/accumulator slices) callers switch
# to the streaming kernel below, which keeps the operand in HBM and
# double-buffers per-row-block DMA of the needed column slices.
_OPERAND_VMEM_BUDGET = 8 * 2**20


def _kernel_stream(
    s_max: int, nrb: int, bc_ref, blocks_ref, pv_ref, out_ref, stage_ref, sem_ref
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

    x3 = blocks_ref.ndim == 4
    blk = blocks_ref[:, 0] if x3 else blocks_ref[0]
    st = stage_ref[slot]
    if not x3:
        st = st.astype(blk.dtype)
    out_ref[:] = _panel_dot(blk, st, out_ref.dtype)


def stream_matvec_call(
    bc_flat,
    blocks,
    pv,
    *,
    s_max: int,
    interpret: bool = False,
):
    """Core HBM-operand streaming matvec pallas_call with explicit dims (see
    ``resident_matvec_call`` for the local-panels x full-operand contract).
    Returns [nrb*BLOCK, batch]; batch must be a multiple of 128."""
    x3 = _is_x3(blocks)
    nrb = blocks.shape[1] if x3 else blocks.shape[0]
    batch = pv.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_col index table
        grid=(nrb,),
        in_specs=[
            _blocks_spec(x3, s_max),
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
        functools.partial(_kernel_stream, s_max, nrb),
        out_shape=jax.ShapeDtypeStruct((nrb * BLOCK, batch), pv.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: cross-step DMA
        ),
        cost_estimate=pl.CostEstimate(
            flops=(3 if x3 else 2) * nrb * s_max * BLOCK * BLOCK * batch,
            bytes_accessed=blocks.size * blocks.dtype.itemsize
            + (nrb * s_max * BLOCK + nrb * BLOCK) * batch * pv.dtype.itemsize,
            transcendentals=0,
        ),
    )(bc_flat, blocks, pv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_matvec_pallas_streaming(
    layout: BlockLayout, blocks: jnp.ndarray, pv: jnp.ndarray, interpret: bool = False
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


def _run_block_kernel(layout: BlockLayout, blocks, pv, interpret: bool = False):
    """Trace-time kernel dispatch shared by the AD wrappers: VMEM-resident
    for small operands, HBM-streaming above the budget (with the lane-dim
    padding Mosaic DMA slices require)."""
    # Physical VMEM footprint: the lane (batch) dim is tiled to 128, so
    # a [1M, 1] operand really occupies [1M, 128] floats in VMEM.
    phys = pv.shape[0] * max(pv.shape[1], 128) * pv.dtype.itemsize
    if phys <= _OPERAND_VMEM_BUDGET:
        return block_matvec_pallas(layout, blocks, pv, interpret=interpret)
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
    out = block_matvec_pallas_streaming(layout, blocks, pv, interpret=interpret)
    return out[:, :b] if pad else out


def make_matvec_ad(layout: BlockLayout, interpret: bool = False):
    """Differentiable Pallas block matvec: (blocks, pv) -> L @ pv in permuted
    space, with a custom VJP so the *training* hot loop can run the fused
    kernel too (the bare kernel defines no transpose/JVP rules).

    Kernel selection is at trace time on static shapes: operands that fit the
    VMEM-residency budget use ``block_matvec_pallas`` (whole [Np, B] operand
    pinned in VMEM); larger operands use ``block_matvec_pallas_streaming``
    (operand in HBM, double-buffered per-row-block slice DMA) — the large-N
    regime where round 1 silently fell back to the einsum path. x3-split
    panel buffers ([2, nrb, BLOCK, S*BLOCK] bf16) ride the same dispatch.

    VJP derivation for out = M(blocks) @ pv:
      * bar_pv = M^T g = M g — valid because ``assemble`` always scatters both
        edge directions plus the diagonal, so the panel buffer encodes a
        symmetric matrix (same reason CG may reuse the forward matvec as the
        adjoint, ops/cg.py:84-86);
      * bar_blocks[r, i, k] = sum_b g[r*B+i, b] * pv_gathered[r, k, b] — one
        einsum over the gathered operand blocks (the einsum path's
        materialization, paid only inside solve/logdet VJPs, once per solve).
        For x3 panels the output is linear in (hi + lo), so both split slots
        receive the same cotangent (bf16-cast, stacked to match the primal).
    """

    def run_kernel(blocks, pv):
        return _run_block_kernel(layout, blocks, pv, interpret=interpret)

    @jax.custom_vjp
    def mv_pallas(blocks, pv):
        return run_kernel(blocks, pv)

    def fwd(blocks, pv):
        return mv_pallas(blocks, pv), (blocks, pv)

    def bwd(res, g):
        blocks, pv = res
        x3 = _is_x3(blocks)
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
                layout, g, pv,
                out_dtype=jnp.bfloat16 if x3 else blocks.dtype,
                interpret=interpret,
            )
            if x3:
                bar_blocks = jnp.stack([bar_blocks, bar_blocks], axis=0)
            return bar_blocks, bar_pv
        grouped = pv.reshape(layout.num_row_blocks, BLOCK, -1)
        cb = grouped[layout.block_col].reshape(
            layout.num_row_blocks, layout.max_blocks * BLOCK, -1
        )
        gg = g.reshape(layout.num_row_blocks, BLOCK, -1)
        if x3 or blocks.dtype == jnp.bfloat16:
            bar_blocks = jnp.einsum(
                "rib,rkb->rik",
                gg.astype(jnp.bfloat16),
                cb.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            if x3:
                bar_blocks = jnp.stack([bar_blocks, bar_blocks], axis=0)
        else:
            bar_blocks = jnp.einsum(
                "rib,rkb->rik", gg, cb, precision=jax.lax.Precision.HIGHEST
            )
        return bar_blocks, bar_pv

    mv_pallas.defvjp(fwd, bwd)

    return mv_pallas


def make_matvec_edge_ad(
    layout: BlockLayout, interpret: bool = False, use_pallas: bool = True
):
    """Differentiable block matvec with EDGE-SPACE cotangents:
    ``mv(qblocks, diag, triu, pv)``.

    Caller contract: ``qblocks == assemble(layout, diag, triu, dtype=...)``
    (up to the panel dtype cast) and the caller passes the panel buffer
    through ``stop_gradient`` — the forward uses only ``qblocks`` while the
    VJP claims the mathematically equivalent dependence on (diag, triu).

    Why (round 5, the 262k 2-D memory wall): with ``make_matvec_ad`` every
    solve VJP in a training step produces a PANEL-shaped cotangent
    ([nrb, 128, S*128] — 2.7 GB f32 at a 262k S=22 torus graph) that stays
    live until the accumulated sum finally backs through ``assemble``;
    ~8 such instances (quad + SLQ probes + Hutchinson gradient solves x nu
    chained applies) put a single training step at 33 GB on a 16 GB chip.
    Here each solve's backward contracts its panel cotangent to edge space
    IMMEDIATELY — ``bar_triu [M]``/``bar_diag [N]`` (~30 MB at 262k) via the
    transpose of ``assemble``'s scatter (a gather at ``edge_flat``/
    ``diag_flat``) — so cross-solve accumulation happens in O(M + N) memory
    and at most one transient panel-shaped buffer is live at a time.

    The panel cotangent itself reuses the fused backward kernel
    (``block_bwd_blocks_pallas_streaming``) at large N and the resident
    gather-einsum otherwise, always accumulated in f32 (for bf16/x3 panels
    this is slightly MORE accurate than the panel path's bf16 cotangent).
    bar for ``qblocks`` is a broadcast zero (dead under the caller's
    stop_gradient; XLA folds it).
    """

    def _run(qblocks, pv):
        if use_pallas:
            return _run_block_kernel(layout, qblocks, pv, interpret=interpret)
        from .block_sparse import matvec_permuted

        return matvec_permuted(layout, qblocks, pv)

    @jax.custom_vjp
    def mv_edge(qblocks, diag, triu, pv):
        return _run(qblocks, pv)

    def fwd(qblocks, diag, triu, pv):
        return _run(qblocks, pv), (qblocks, pv)

    def bwd(res, g):
        qblocks, pv = res
        g = g.astype(pv.dtype)
        # Symmetric operator: the adjoint matvec is the forward matvec (same
        # reasoning as make_matvec_ad's bwd / ops.cg:84-86).
        bar_pv = _run(qblocks, g)
        phys = pv.shape[0] * max(pv.shape[1], 128) * pv.dtype.itemsize
        if use_pallas and phys > _OPERAND_VMEM_BUDGET:
            pad = -pv.shape[1] % BLOCK
            gp, pvp = g, pv
            if pad:
                gp = jnp.pad(g, ((0, 0), (0, pad)))
                pvp = jnp.pad(pv, ((0, 0), (0, pad)))
            bar_blocks = block_bwd_blocks_pallas_streaming(
                layout, gp, pvp, out_dtype=jnp.float32, interpret=interpret
            )
        else:
            grouped = pv.reshape(layout.num_row_blocks, BLOCK, -1)
            cb = grouped[layout.block_col].reshape(
                layout.num_row_blocks, layout.max_blocks * BLOCK, -1
            )
            gg = g.reshape(layout.num_row_blocks, BLOCK, -1)
            bar_blocks = jnp.einsum(
                "rib,rkb->rik", gg, cb, precision=jax.lax.Precision.HIGHEST
            )
        flat = bar_blocks.reshape(-1)
        e = flat[layout.edge_flat]  # [2M]
        m = e.shape[0] // 2
        # assemble scatters (-triu, -triu, diag): transpose accordingly.
        bar_triu = -(e[:m] + e[m:])
        bar_diag = flat[layout.diag_flat]
        return jnp.zeros_like(qblocks), bar_diag, bar_triu, bar_pv

    mv_edge.defvjp(fwd, bwd)
    return mv_edge


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
