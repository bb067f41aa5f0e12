"""Block-ELL (RCM-reordered, MXU-tile) SpMV vs the COO scatter oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops.block_sparse import assemble, build_block_layout, matvec
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import adjacency_matvec_coo, laplacian_coeffs


@pytest.fixture(scope="module")
def setup(small_cloud):
    x, _ = small_cloud
    graph = build_graph(x, 6)
    coeffs = laplacian_coeffs(graph, 0.35)
    layout = build_block_layout(graph)
    return graph, coeffs, layout


def test_layout_builds(setup):
    graph, _, layout = setup
    assert layout is not None
    assert layout.num_padded % 128 == 0
    assert layout.max_blocks <= layout.num_row_blocks


def test_block_matvec_matches_coo(setup, rng):
    graph, coeffs, layout = setup
    blocks = assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(
        rng.standard_normal((graph.num_nodes, 5)).astype(np.float32)
    )
    expected = coeffs.diag[:, None] * v - adjacency_matvec_coo(
        graph, coeffs.triu, v
    )
    got = matvec(layout, blocks, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_block_matvec_larger_graph(rng):
    """Multi-row-block case (N > 128) with clustered data."""
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, 700)] + 0.2 * rng.standard_normal(
        (700, 8)
    ).astype(np.float32)
    graph = build_graph(x, 8)
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = build_block_layout(graph)
    assert layout is not None and layout.num_row_blocks >= 5
    blocks = assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((700, 3)).astype(np.float32))
    expected = coeffs.diag[:, None] * v - adjacency_matvec_coo(
        graph, coeffs.triu, v
    )
    got = matvec(layout, blocks, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_gradient_flows_through_assembly(setup):
    """d/d(eps) of a quadratic form through assemble+matvec equals the COO
    path's gradient (assembly scatter is differentiable)."""
    import jax

    graph, _, layout = setup

    v = jnp.ones((graph.num_nodes, 1), jnp.float32)

    def f_block(eps):
        c = laplacian_coeffs(graph, eps)
        blocks = assemble(layout, c.diag, c.triu)
        return jnp.sum(v * matvec(layout, blocks, v))

    def f_coo(eps):
        c = laplacian_coeffs(graph, eps)
        return jnp.sum(v * (c.diag[:, None] * v - adjacency_matvec_coo(graph, c.triu, v)))

    g1 = jax.grad(f_block)(jnp.float32(0.35))
    g2 = jax.grad(f_coo)(jnp.float32(0.35))
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-4)
