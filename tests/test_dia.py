"""DIA (banded) SpMV layout, XLA path and Pallas kernel vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops import dia
from manifold_gp_tpu.ops.graph import build_graph, graph_from_edges
from manifold_gp_tpu.ops.laplacian import (
    adjacency_matvec_coo,
    laplacian_coeffs,
)


def banded_curve_graph(n=1500, k=8, seed=0):
    """Banded kNN graph over a noisy closed 3D curve (the BASELINE config 5
    shape at test scale, see benchmark/bench_large_scale.py)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    x = np.stack([np.cos(t), np.sin(t), 0.3 * np.sin(2 * t)], axis=1).astype(
        np.float32
    )
    x += (0.1 / n) * rng.standard_normal(x.shape).astype(np.float32)
    half = max(1, k // 2)
    rows = np.repeat(np.arange(n, dtype=np.int64), half)
    offs = np.tile(np.arange(1, half + 1, dtype=np.int64), n)
    cols = (rows + offs) % n
    d = x[rows] - x[cols]
    sqd = np.einsum("ij,ij->i", d, d).astype(np.float32)
    return graph_from_edges(
        np.minimum(rows, cols), np.maximum(rows, cols), sqd, n
    )


@pytest.fixture(scope="module")
def banded_problem():
    graph = banded_curve_graph()
    coeffs = laplacian_coeffs(graph, 0.05)
    layout = dia.build_dia_layout(graph)
    assert layout is not None, "curve graph must be DIA-able"
    return graph, coeffs, layout


def test_dia_layout_shape(banded_problem):
    graph, _, layout = banded_problem
    assert layout.num_nodes == graph.num_nodes
    assert 0 in layout.offsets
    assert layout.halfwidth <= dia.TILE
    assert layout.num_padded % dia.TILE == 0


def test_dia_matvec_matches_coo(banded_problem, rng):
    graph, coeffs, layout = banded_problem
    band = dia.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(
        rng.standard_normal((graph.num_nodes, 8)).astype(np.float32)
    )
    # L_sym v = diag*v - A_sym v through the COO oracle
    expected = coeffs.diag[:, None] * v - adjacency_matvec_coo(
        graph, coeffs.triu, v
    )
    pv = dia.permute_in(layout, v)
    got = dia.permute_out(layout, dia.matvec_permuted(layout, band, pv))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-4, rtol=1e-4
    )


def test_dia_pallas_matches_xla(banded_problem, rng):
    graph, coeffs, layout = banded_problem
    band = dia.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(
        rng.standard_normal((graph.num_nodes, 128)).astype(np.float32)
    )
    pv = dia.permute_in(layout, v)
    expected = dia.matvec_permuted(layout, band, pv)
    got = dia.dia_matvec_pallas(layout, band, pv, interpret=True)
    # values reach ~1e3 (diag ~ 1/eps^2); tolerance is relative to that scale
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-3, rtol=1e-5
    )


def test_dia_ad_forward_and_vjp(banded_problem, rng):
    graph, coeffs, layout = banded_problem
    band = dia.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(
        rng.standard_normal((graph.num_nodes, 128)).astype(np.float32)
    )
    pv = dia.permute_in(layout, v)
    cot = jnp.asarray(
        rng.standard_normal((layout.num_padded, 128)).astype(np.float32)
    )
    mv_ad = dia.make_matvec_ad(layout, interpret=True)
    np.testing.assert_allclose(
        np.asarray(mv_ad(band, pv)),
        np.asarray(dia.matvec_permuted(layout, band, pv)),
        atol=1e-3,
    )
    gp = jax.grad(lambda b, p: jnp.sum(mv_ad(b, p) * cot), argnums=(0, 1))(
        band, pv
    )
    ge = jax.grad(
        lambda b, p: jnp.sum(dia.matvec_permuted(layout, b, p) * cot),
        argnums=(0, 1),
    )(band, pv)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(ge[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(ge[1]), atol=1e-3)


def test_dia_rejects_unbanded(rng):
    """A clustered high-dimensional cloud has a wide RCM band — DIA declines
    and callers fall back to block-ELL."""
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, 600)] + 0.2 * rng.standard_normal(
        (600, 8)
    ).astype(np.float32)
    graph = build_graph(x, 8)
    assert dia.build_dia_layout(graph, max_offsets=16) is None
