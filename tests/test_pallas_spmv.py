"""Fused Pallas block-ELL SpMV (interpret mode on CPU) vs the einsum path."""

import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops import block_sparse
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
from manifold_gp_tpu.ops.pallas_spmv import matvec as pallas_matvec


def test_pallas_matches_einsum(rng):
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, 600)] + 0.2 * rng.standard_normal(
        (600, 8)
    ).astype(np.float32)
    graph = build_graph(x, 8)
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = block_sparse.build_block_layout(graph)
    assert layout is not None
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))
    expected = block_sparse.matvec(layout, blocks, v)
    got = pallas_matvec(layout, blocks, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.fixture(scope="module")
def small_block_problem(rng):
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, 600)] + 0.2 * rng.standard_normal(
        (600, 8)
    ).astype(np.float32)
    graph = build_graph(x, 8)
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = block_sparse.build_block_layout(graph)
    assert layout is not None
    return graph, coeffs, layout


def test_pallas_ad_forward_and_vjp(small_block_problem, rng):
    """make_matvec_ad (interpret mode): forward matches einsum; VJP w.r.t.
    both blocks and operand matches jax.grad of the einsum path."""
    import jax

    from manifold_gp_tpu.ops.pallas_spmv import make_matvec_ad

    graph, coeffs, layout = small_block_problem
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, 4)).astype(np.float32))
    pv = block_sparse.permute_in(layout, v)
    cot = jnp.asarray(
        rng.standard_normal((layout.num_padded, 4)).astype(np.float32)
    )
    mv_ad = make_matvec_ad(layout, interpret=True)

    np.testing.assert_allclose(
        np.asarray(mv_ad(blocks, pv)),
        np.asarray(block_sparse.matvec_permuted(layout, blocks, pv)),
        atol=2e-5,
    )

    def loss_pallas(blocks, pv):
        return jnp.sum(mv_ad(blocks, pv) * cot)

    def loss_einsum(blocks, pv):
        return jnp.sum(block_sparse.matvec_permuted(layout, blocks, pv) * cot)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(blocks, pv)
    ge = jax.grad(loss_einsum, argnums=(0, 1))(blocks, pv)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(ge[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(ge[1]), atol=2e-5)


def test_fused_precision_pallas_interpret(small_block_problem, rng):
    """End-to-end: the fused Matérn precision on the Pallas kernel (interpret)
    matches the einsum fused path, value and bandwidth/lengthscale grads."""
    import functools
    import unittest.mock

    import jax

    from manifold_gp_tpu.ops import pallas_spmv, sparse_formats
    from manifold_gp_tpu.ops.matern import make_matern_precision_matvec

    graph, _, layout = small_block_problem
    v = jnp.asarray(rng.standard_normal((600,)).astype(np.float32))

    def interp_ad(layout, interpret=False):
        return pallas_spmv.make_matvec_ad(layout, interpret=True)

    def quad(eps, ls, pallas):
        c = laplacian_coeffs(graph, eps)
        blk = (layout, block_sparse.assemble(layout, c.diag, c.triu))
        mv = make_matern_precision_matvec(
            graph, c, 2, ls, "randomwalk", block=blk, pallas=pallas
        )
        return jnp.sum(v * mv(v[:, None])[:, 0])

    args = (jnp.float32(0.4), jnp.float32(1.1))
    with unittest.mock.patch.object(sparse_formats, "make_matvec_ad", interp_ad):
        val_p = quad(*args, True)
        g_p = jax.grad(quad, argnums=(0, 1))(*args, True)
    val_e = quad(*args, False)
    g_e = jax.grad(quad, argnums=(0, 1))(*args, False)
    np.testing.assert_allclose(float(val_p), float(val_e), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_e), rtol=1e-4)


def test_streaming_kernel_matches_einsum(small_block_problem, rng):
    """HBM-operand streaming kernel (interpret mode) vs the einsum path."""
    from manifold_gp_tpu.ops.pallas_spmv import block_matvec_pallas_streaming

    graph, coeffs, layout = small_block_problem
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))
    pv = block_sparse.permute_in(layout, v)
    expected = block_sparse.matvec_permuted(layout, blocks, pv)
    got = block_matvec_pallas_streaming(layout, blocks, pv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_streaming_ad_dispatch_and_vjp(small_block_problem, rng):
    """With the VMEM budget patched to 0, make_matvec_ad routes through the
    streaming kernel; forward + VJPs still match the einsum path."""
    import unittest.mock

    import jax

    from manifold_gp_tpu.ops import pallas_spmv

    graph, coeffs, layout = small_block_problem
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, 4)).astype(np.float32))
    pv = block_sparse.permute_in(layout, v)
    cot = jnp.asarray(
        rng.standard_normal((layout.num_padded, 4)).astype(np.float32)
    )

    with unittest.mock.patch.object(pallas_spmv, "_OPERAND_VMEM_BUDGET", 0):
        mv_ad = pallas_spmv.make_matvec_ad(layout, interpret=True)
        np.testing.assert_allclose(
            np.asarray(mv_ad(blocks, pv)),
            np.asarray(block_sparse.matvec_permuted(layout, blocks, pv)),
            atol=2e-5,
        )
        gp = jax.grad(
            lambda b, p: jnp.sum(mv_ad(b, p) * cot), argnums=(0, 1)
        )(blocks, pv)
    ge = jax.grad(
        lambda b, p: jnp.sum(
            block_sparse.matvec_permuted(layout, b, p) * cot
        ),
        argnums=(0, 1),
    )(blocks, pv)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(ge[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(ge[1]), atol=2e-5)


@pytest.mark.parametrize("batch", [1, 100])
def test_streaming_engages_for_odd_batch_widths(small_block_problem, rng, batch):
    """Above the VMEM budget the dispatch must PAD odd RHS widths up to the
    lane width and ride the streaming kernel — not silently fall back to the
    einsum path (round-2 verdict weak-point 1): batch-1 quad matvecs and
    100-probe average_variance solves are exactly these shapes."""
    import unittest.mock

    import jax

    from manifold_gp_tpu.ops import pallas_spmv

    graph, coeffs, layout = small_block_problem
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, batch)).astype(np.float32))
    pv = block_sparse.permute_in(layout, v)
    cot = jnp.asarray(
        rng.standard_normal((layout.num_padded, batch)).astype(np.float32)
    )

    calls = {"fwd": 0, "bwd": 0}
    real_stream = pallas_spmv.block_matvec_pallas_streaming
    real_bwd = pallas_spmv.block_bwd_blocks_pallas_streaming

    def spy_stream(layout, blocks, pv, interpret=False):
        calls["fwd"] += 1
        assert pv.shape[1] % 128 == 0, "streaming kernel saw an unpadded RHS"
        return real_stream(layout, blocks, pv, interpret=interpret)

    def spy_bwd(layout, g, pv, out_dtype=jnp.float32, interpret=False):
        calls["bwd"] += 1
        assert pv.shape[1] % 128 == 0 and g.shape[1] % 128 == 0
        return real_bwd(layout, g, pv, out_dtype=out_dtype, interpret=interpret)

    with unittest.mock.patch.object(
        pallas_spmv, "_OPERAND_VMEM_BUDGET", 0
    ), unittest.mock.patch.object(
        pallas_spmv, "block_matvec_pallas_streaming", spy_stream
    ), unittest.mock.patch.object(
        pallas_spmv, "block_bwd_blocks_pallas_streaming", spy_bwd
    ):
        mv_ad = pallas_spmv.make_matvec_ad(layout, interpret=True)
        out = mv_ad(blocks, pv)
        gp = jax.grad(
            lambda b, p: jnp.sum(mv_ad(b, p) * cot), argnums=(0, 1)
        )(blocks, pv)
    assert calls["fwd"] >= 1 and calls["bwd"] >= 1
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(block_sparse.matvec_permuted(layout, blocks, pv)),
        atol=2e-5,
    )
    ge = jax.grad(
        lambda b, p: jnp.sum(
            block_sparse.matvec_permuted(layout, b, p) * cot
        ),
        argnums=(0, 1),
    )(blocks, pv)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(ge[0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(ge[1]), atol=2e-5)


def test_streaming_bwd_blocks_kernel_matches_einsum(small_block_problem, rng):
    """The fused panel-cotangent kernel (interpret mode) vs the einsum
    bar_blocks, both standalone and through the VJP dispatch."""
    import unittest.mock

    import jax

    from manifold_gp_tpu.ops import pallas_spmv

    graph, coeffs, layout = small_block_problem
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, 128)).astype(np.float32))
    pv = block_sparse.permute_in(layout, v)
    g = jnp.asarray(
        rng.standard_normal((layout.num_padded, 128)).astype(np.float32)
    )

    grouped = pv.reshape(layout.num_row_blocks, 128, -1)
    cb = grouped[layout.block_col].reshape(
        layout.num_row_blocks, layout.max_blocks * 128, -1
    )
    gg = g.reshape(layout.num_row_blocks, 128, -1)
    expected = jnp.einsum("rib,rkb->rik", gg, cb)

    got = pallas_spmv.block_bwd_blocks_pallas_streaming(
        layout, g, pv, interpret=True
    )
    scale = float(jnp.max(jnp.abs(expected)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5 * max(scale, 1.0)
    )

    # through the VJP with the budget patched so dispatch takes this path
    with unittest.mock.patch.object(pallas_spmv, "_OPERAND_VMEM_BUDGET", 0):
        mv_ad = pallas_spmv.make_matvec_ad(layout, interpret=True)
        gp = jax.grad(lambda b: jnp.sum(mv_ad(b, pv) * g))(blocks)
    ge = jax.grad(
        lambda b: jnp.sum(block_sparse.matvec_permuted(layout, b, pv) * g)
    )(blocks)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(ge), atol=2e-5 * max(scale, 1.0)
    )


def test_x3_split_panels_match_f32(small_block_problem, rng):
    """float32x3 split panels (3-pass bf16x3): resident + streaming kernels
    (interpret) and the einsum merge path all reproduce the exact-f32 matvec
    to the bf16x3 error bound (~2^-15 relative, amplified ~sqrt(S*128) by
    accumulation)."""
    from manifold_gp_tpu.ops.pallas_spmv import (
        block_matvec_pallas,
        block_matvec_pallas_streaming,
        merge_bf16x3,
    )

    graph, coeffs, layout = small_block_problem
    blocks_f32 = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    blocks_x3 = block_sparse.assemble(
        layout, coeffs.diag, coeffs.triu, dtype="float32x3"
    )
    assert blocks_x3.shape == (2,) + blocks_f32.shape
    assert blocks_x3.dtype == jnp.bfloat16
    # the split reconstructs the panels to ~2^-16
    np.testing.assert_allclose(
        np.asarray(merge_bf16x3(blocks_x3)), np.asarray(blocks_f32),
        rtol=2e-5, atol=1e-6,
    )
    v = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))
    pv = block_sparse.permute_in(layout, v)
    want = block_sparse.matvec_permuted(layout, blocks_f32, pv)
    scale = float(jnp.max(jnp.abs(want))) + 1e-30
    for got in (
        block_sparse.matvec_permuted(layout, blocks_x3, pv),  # einsum merge
        block_matvec_pallas(layout, blocks_x3, pv, interpret=True),
        block_matvec_pallas_streaming(
            layout, blocks_x3, jnp.pad(pv, ((0, 0), (0, 120))),
            interpret=True,
        )[:, :8],
    ):
        err = float(jnp.max(jnp.abs(got - want))) / scale
        assert err < 5e-4, err


def test_x3_ad_dispatch_and_vjp(small_block_problem, rng):
    """make_matvec_ad over x3 panels: forward matches the merged-f32 einsum;
    bar_pv rides the symmetric forward; bar_blocks comes back in the stacked
    x3 format with both slots carrying the shared cotangent."""
    import jax

    from manifold_gp_tpu.ops import pallas_spmv

    graph, coeffs, layout = small_block_problem
    blocks_x3 = block_sparse.assemble(
        layout, coeffs.diag, coeffs.triu, dtype="float32x3"
    )
    mv_ad = pallas_spmv.make_matvec_ad(layout, interpret=True)
    pv = block_sparse.permute_in(
        layout, jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))
    )
    out, vjp = jax.vjp(mv_ad, blocks_x3, pv)
    want = block_sparse.matvec_permuted(layout, blocks_x3, pv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
    g = jnp.ones_like(out)
    bar_blocks, bar_pv = vjp(g)
    assert bar_blocks.shape == blocks_x3.shape
    assert bar_blocks.dtype == jnp.bfloat16
    # symmetric operator: bar_pv = M g
    want_bar = block_sparse.matvec_permuted(layout, blocks_x3, g)
    np.testing.assert_allclose(np.asarray(bar_pv), np.asarray(want_bar),
                               rtol=5e-4, atol=5e-4)
