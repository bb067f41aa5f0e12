"""Laplacian operator vs dense oracle (reference test/test_laplacian.py model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import (
    adjacency_matvec_coo,
    adjacency_matvec_ell,
    laplacian_coeffs,
    laplacian_dense,
    laplacian_matvec,
)

from _dense_oracles import dense_graph_laplacian

EPS = 0.35


@pytest.fixture(scope="module")
def graph(small_cloud):
    x, _ = small_cloud
    return build_graph(x, 6)


@pytest.fixture(scope="module")
def oracle(graph):
    return dense_graph_laplacian(
        np.asarray(graph.rows),
        np.asarray(graph.cols),
        np.asarray(graph.sqdist),
        EPS,
        graph.num_nodes,
        normalization="unnormalized",
    )


def test_coeffs_match_dense(graph, oracle):
    _, w_dense, q_dense, a_dense, d_dense = oracle
    c = laplacian_coeffs(graph, EPS)
    np.testing.assert_allclose(np.asarray(c.deg_unnorm), q_dense, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c.deg), d_dense, rtol=1e-5)


@pytest.mark.parametrize("normalization", ["symmetric", "randomwalk"])
def test_matvec_matches_dense(graph, small_cloud, normalization, rng):
    x, _ = small_cloud
    lap_dense = dense_graph_laplacian(
        np.asarray(graph.rows),
        np.asarray(graph.cols),
        np.asarray(graph.sqdist),
        EPS,
        graph.num_nodes,
        normalization=normalization,
    )[0]
    c = laplacian_coeffs(graph, EPS)
    v = rng.standard_normal((graph.num_nodes, 3)).astype(np.float32)
    out = laplacian_matvec(graph, c, jnp.asarray(v), normalization)
    np.testing.assert_allclose(np.asarray(out), lap_dense @ v, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("normalization", ["symmetric", "randomwalk"])
def test_transpose_matvec(graph, normalization, rng):
    c = laplacian_coeffs(graph, EPS)
    n = graph.num_nodes
    v = rng.standard_normal((n, 2)).astype(np.float32)
    mat = np.asarray(
        laplacian_matvec(graph, c, jnp.eye(n), normalization)
    )
    out_t = laplacian_matvec(graph, c, jnp.asarray(v), normalization, transposed=True)
    np.testing.assert_allclose(np.asarray(out_t), mat.T @ v, rtol=1e-4, atol=1e-4)


def test_ell_equals_coo(graph, rng):
    c = laplacian_coeffs(graph, EPS)
    v = jnp.asarray(rng.standard_normal((graph.num_nodes, 4)).astype(np.float32))
    a1 = adjacency_matvec_ell(graph, c.triu, v)
    a2 = adjacency_matvec_coo(graph, c.triu, v)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-5)


def test_dense_path_equals_sparse(graph, rng):
    c = laplacian_coeffs(graph, EPS)
    dense = laplacian_dense(graph, c)
    v = jnp.asarray(rng.standard_normal((graph.num_nodes, 3)).astype(np.float32))
    s = laplacian_matvec(graph, c, v, "randomwalk")
    d = laplacian_matvec(graph, c, v, "randomwalk", dense=dense)
    np.testing.assert_allclose(np.asarray(s), np.asarray(d), rtol=1e-4, atol=1e-4)


def test_gradient_through_bandwidth(graph, rng):
    """d/d(eps) of a matvec functional: finite difference vs AD (the
    reference validates the same gradient in test/_test_functions.py:59-74)."""
    v = jnp.asarray(rng.standard_normal((graph.num_nodes,)).astype(np.float32))

    def f(eps):
        c = laplacian_coeffs(graph, eps)
        return jnp.sum(laplacian_matvec(graph, c, v, "symmetric") * v)

    g = jax.grad(f)(jnp.float32(EPS))
    h = 1e-3
    fd = (f(jnp.float32(EPS + h)) - f(jnp.float32(EPS - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)
