"""Row-sharded fused block-ELL SpMV (parallel.block_spmv) on the 8-device
virtual mesh vs the single-chip fused paths and the portable scan path.

Round-2 VERDICT item 1: mesh kernels previously ran only the per-column
gather scan; the fused layouts had zero multi-chip coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops import block_sparse
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
from manifold_gp_tpu.parallel import make_mesh
from manifold_gp_tpu.parallel.block_spmv import (
    assemble_sharded,
    build_mesh_block_tables,
    make_sharded_block_matvec_ad,
    make_sharded_matern_precision_matvec_fused,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture(scope="module")
def problem(rng):
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, 900)] + 0.2 * rng.standard_normal(
        (900, 8)
    ).astype(np.float32)
    graph = build_graph(x, 8)
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = block_sparse.build_block_layout(graph)
    assert layout is not None
    return graph, coeffs, layout


def test_assemble_sharded_matches_single_chip(problem, mesh):
    graph, coeffs, layout = problem
    tables = build_mesh_block_tables(graph, mesh)
    assert tables is not None
    got = np.asarray(assemble_sharded(tables, coeffs.diag, coeffs.triu))
    expected = np.asarray(
        block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    )
    nrb0 = layout.num_row_blocks
    np.testing.assert_allclose(got[:nrb0], expected, atol=0)
    assert np.all(got[nrb0:] == 0.0), "padding row blocks must stay zero"


@pytest.mark.parametrize("impl", ["einsum", "pallas"])
def test_sharded_matvec_matches_single_chip(problem, mesh, rng, impl):
    """Forward + both VJPs of the sharded fused matvec vs the single-chip
    einsum path (pallas impl runs in interpret mode on the CPU mesh)."""
    graph, coeffs, layout = problem
    tables = build_mesh_block_tables(graph, mesh)
    blocks_1c = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    blocks_sh = assemble_sharded(tables, coeffs.diag, coeffs.triu)

    n = graph.num_nodes
    v = rng.standard_normal((n, 4)).astype(np.float32)
    pv_1c = block_sparse.permute_in(layout, jnp.asarray(v))
    pv_sh = tables.embed_rows(v)
    cot = rng.standard_normal((tables.rows, 4)).astype(np.float32)
    cot_sh = jax.device_put(cot, tables.node_sharding(2))
    nrows0 = layout.num_padded

    mv = make_sharded_block_matvec_ad(tables, impl=impl, interpret=True)
    out = np.asarray(mv(blocks_sh, pv_sh))
    expected = np.asarray(block_sparse.matvec_permuted(layout, blocks_1c, pv_1c))
    np.testing.assert_allclose(out[:nrows0], expected, atol=2e-5)
    assert np.all(out[nrows0:] == 0.0)

    def loss_sh(blk, p):
        return jnp.sum(mv(blk, p) * cot_sh)

    def loss_1c(blk, p):
        return jnp.sum(
            block_sparse.matvec_permuted(layout, blk, p)
            * jnp.asarray(cot[:nrows0])
        )

    g_sh = jax.grad(loss_sh, argnums=(0, 1))(blocks_sh, pv_sh)
    g_1c = jax.grad(loss_1c, argnums=(0, 1))(blocks_1c, pv_1c)
    np.testing.assert_allclose(
        np.asarray(g_sh[0])[: layout.num_row_blocks],
        np.asarray(g_1c[0]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_sh[1])[:nrows0], np.asarray(g_1c[1]), atol=2e-5
    )


def test_halo_exchange_matches_gather(mesh, rng):
    """Banded (circle) graph: the layout admits a small halo; the ppermute
    halo exchange must equal the all-gather schedule (fwd + VJPs) — the ICI
    schedule a real pod runs, 2*halo*BLOCK*B bytes instead of the full
    operand."""
    n = 2048
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    x += 0.005 * rng.standard_normal(x.shape).astype(np.float32)
    graph = build_graph(x, 6)
    coeffs = laplacian_coeffs(graph, 0.35)
    tables = build_mesh_block_tables(graph, mesh)
    assert tables is not None
    assert tables.halo is not None and tables.halo <= 2, (
        "banded circle layout must admit a neighbor halo",
        tables.halo,
    )
    blocks = assemble_sharded(tables, coeffs.diag, coeffs.triu)
    v = rng.standard_normal((n, 4)).astype(np.float32)
    pv = tables.embed_rows(v)
    cot = jax.device_put(
        rng.standard_normal((tables.rows, 4)).astype(np.float32),
        tables.node_sharding(2),
    )

    mv_halo = make_sharded_block_matvec_ad(tables, impl="einsum")
    mv_gath = make_sharded_block_matvec_ad(
        tables, impl="einsum", exchange="gather"
    )
    np.testing.assert_allclose(
        np.asarray(mv_halo(blocks, pv)),
        np.asarray(mv_gath(blocks, pv)),
        atol=1e-5,
    )
    gh = jax.grad(lambda b, p: jnp.sum(mv_halo(b, p) * cot), argnums=(0, 1))(
        blocks, pv
    )
    gg = jax.grad(lambda b, p: jnp.sum(mv_gath(b, p) * cot), argnums=(0, 1))(
        blocks, pv
    )
    np.testing.assert_allclose(np.asarray(gh[0]), np.asarray(gg[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh[1]), np.asarray(gg[1]), atol=1e-5)


def test_sharded_fused_matern_matches_single_chip_and_scan(problem, mesh, rng):
    """The fused mesh Matérn precision matvec == the single-chip fused block
    path == the round-2 scan path (embedded at the right rows), including
    gradients w.r.t. graphbandwidth and lengthscale."""
    from manifold_gp_tpu.ops.matern import make_matern_precision_matvec
    from manifold_gp_tpu.parallel.spmv import (
        make_sharded_matern_precision_matvec,
        pad_nodes,
    )

    graph, _, layout = problem
    tables = build_mesh_block_tables(graph, mesh)
    n = graph.num_nodes
    v = rng.standard_normal((n,)).astype(np.float32)
    v_sh = tables.embed_rows(v[:, None])
    nu = 2

    def quad_fused(eps, ls):
        c = laplacian_coeffs(graph, eps)
        mv = make_sharded_matern_precision_matvec_fused(
            tables, c, nu, ls, "randomwalk", impl="einsum"
        )
        return jnp.sum(v_sh * mv(v_sh))

    def quad_1c(eps, ls):
        c = laplacian_coeffs(graph, eps)
        mv = make_matern_precision_matvec(
            graph, c, nu, ls, "randomwalk",
            block=(layout, None), permuted_io=False, pallas=False,
        )
        return jnp.sum(v * mv(jnp.asarray(v)[:, None])[:, 0])

    def quad_scan(eps, ls):
        c = laplacian_coeffs(graph, eps)
        mv, n_pad = make_sharded_matern_precision_matvec(
            graph, mesh, c, nu, ls, "randomwalk"
        )
        vp = pad_nodes(v[:, None], n_pad, mesh)
        return jnp.sum(vp * mv(vp))

    args = (jnp.float32(0.45), jnp.float32(1.2))
    vals = [float(q(*args)) for q in (quad_fused, quad_1c, quad_scan)]
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-5)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-5)

    g_fused = jax.grad(quad_fused, argnums=(0, 1))(*args)
    g_1c = jax.grad(quad_1c, argnums=(0, 1))(*args)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_1c), rtol=1e-4
    )
