"""Matérn precision + wrapper compositions vs dense oracles
(reference test/test_precision.py model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs, laplacian_dense
from manifold_gp_tpu.ops.matern import (
    labeled_split,
    make_matern_precision_matvec,
    make_noisy_matvec,
    make_scaled_matvec,
    make_schur_matvec,
)

from _dense_oracles import (
    dense_graph_laplacian,
    dense_matern_precision,
    dense_noisy,
    dense_scaled,
    dense_schur_labeled,
)

EPS = 0.35
NU = 2
LS = 1.3
SCALE = 0.7
NOISE = 0.01


@pytest.fixture(scope="module")
def graph(small_cloud):
    return build_graph(small_cloud[0], 6)


def _dense_prec(graph, normalization):
    lap, _, _, _, deg = dense_graph_laplacian(
        np.asarray(graph.rows),
        np.asarray(graph.cols),
        np.asarray(graph.sqdist),
        EPS,
        graph.num_nodes,
        normalization=normalization,
    )
    return dense_matern_precision(
        lap, NU, LS, degree=deg if normalization == "randomwalk" else None
    )


@pytest.mark.parametrize("normalization", ["symmetric", "randomwalk"])
def test_matern_precision_matvec(graph, normalization, rng):
    c = laplacian_coeffs(graph, EPS)
    mv = make_matern_precision_matvec(graph, c, NU, LS, normalization)
    v = rng.standard_normal((graph.num_nodes, 2)).astype(np.float32)
    expected = _dense_prec(graph, normalization) @ v
    np.testing.assert_allclose(np.asarray(mv(jnp.asarray(v))), expected, rtol=1e-3, atol=1e-4)


def test_randomwalk_precision_is_symmetric(graph):
    c = laplacian_coeffs(graph, EPS)
    mv = make_matern_precision_matvec(graph, c, NU, LS, "randomwalk")
    q = np.asarray(mv(jnp.eye(graph.num_nodes)))
    np.testing.assert_allclose(q, q.T, rtol=1e-3, atol=1e-5)
    evals = np.linalg.eigvalsh(q)
    assert evals.min() > 0


def test_scale_and_noise_wrappers(graph, rng):
    c = laplacian_coeffs(graph, EPS)
    mv = make_matern_precision_matvec(graph, c, NU, LS, "randomwalk")
    mv = make_scaled_matvec(mv, SCALE)
    mv = make_noisy_matvec(mv, NOISE)
    dense = dense_noisy(dense_scaled(_dense_prec(graph, "randomwalk"), SCALE), NOISE)
    v = rng.standard_normal((graph.num_nodes, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mv(jnp.asarray(v))), dense @ v, rtol=1e-3, atol=1e-4
    )


def test_inverse_scale(graph, rng):
    c = laplacian_coeffs(graph, EPS)
    base = make_matern_precision_matvec(graph, c, NU, LS, "randomwalk")
    mv = make_scaled_matvec(base, SCALE, inverse_scale=True)
    v = rng.standard_normal((graph.num_nodes,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mv(jnp.asarray(v))),
        np.asarray(base(jnp.asarray(v))) / SCALE,
        rtol=1e-5,
    )


def test_schur_complement(graph, rng):
    n = graph.num_nodes
    labeled = np.zeros(n, bool)
    labeled[rng.choice(n, 12, replace=False)] = True
    li, ui = labeled_split(labeled)
    c = laplacian_coeffs(graph, EPS)
    base = make_matern_precision_matvec(graph, c, NU, LS, "randomwalk")
    mv = make_schur_matvec(base, li, ui, n, cg_tol=1e-8, cg_max_iter=2000)
    dense = dense_schur_labeled(_dense_prec(graph, "randomwalk"), labeled)
    v = rng.standard_normal((12, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mv(jnp.asarray(v))), dense @ v, rtol=1e-3, atol=1e-3
    )


def test_schur_gradient_flows(graph, rng):
    """The inner CG's implicit VJP must propagate d/d(lengthscale)."""
    n = graph.num_nodes
    labeled = np.zeros(n, bool)
    labeled[:8] = True
    li, ui = labeled_split(labeled)
    v = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    c = laplacian_coeffs(graph, EPS)

    def f(ls):
        base = make_matern_precision_matvec(graph, c, NU, ls, "randomwalk")
        mv = make_schur_matvec(base, li, ui, n, cg_tol=1e-8, cg_max_iter=2000)
        return jnp.sum(v * mv(v[:, None])[:, 0])

    g = jax.grad(f)(jnp.float32(LS))
    h = 1e-2
    fd = (f(jnp.float32(LS + h)) - f(jnp.float32(LS - h))) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-2)


@pytest.mark.parametrize("normalization", ["symmetric", "randomwalk"])
@pytest.mark.parametrize("permuted_io", [False, True])
def test_fused_block_precision_matvec(graph, normalization, permuted_io, rng):
    """The fused block path (shifted panel diagonal, boundary D^{1/2}
    scalings) must match the dense oracle exactly like the loop path."""
    from manifold_gp_tpu.ops.block_sparse import (
        build_block_layout,
        assemble,
        permute_in,
        permute_out,
    )

    layout = build_block_layout(graph)
    assert layout is not None
    c = laplacian_coeffs(graph, EPS)
    blocks = assemble(layout, c.diag, c.triu)
    mv = make_matern_precision_matvec(
        graph, c, NU, LS, normalization,
        block=(layout, blocks), permuted_io=permuted_io,
    )
    v = rng.standard_normal((graph.num_nodes, 2)).astype(np.float32)
    expected = _dense_prec(graph, normalization) @ v
    if permuted_io:
        got = np.asarray(permute_out(layout, mv(permute_in(layout, jnp.asarray(v)))))
    else:
        got = np.asarray(mv(jnp.asarray(v)))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_fused_block_precision_gradient(graph, rng):
    """d/d(lengthscale) and d/d(bandwidth) must flow through the shifted
    panel scatter identically to the loop path."""
    from manifold_gp_tpu.ops.block_sparse import assemble, build_block_layout

    layout = build_block_layout(graph)
    v = jnp.asarray(rng.standard_normal((graph.num_nodes,)).astype(np.float32))

    def quad(eps, ls, block):
        c = laplacian_coeffs(graph, eps)
        blk = (layout, assemble(layout, c.diag, c.triu)) if block else None
        mv = make_matern_precision_matvec(graph, c, NU, ls, "randomwalk", block=blk)
        return jnp.sum(v * mv(v[:, None])[:, 0])

    args = (jnp.float32(EPS), jnp.float32(LS))
    g_block = jax.grad(quad, argnums=(0, 1))(*args, True)
    g_loop = jax.grad(quad, argnums=(0, 1))(*args, False)
    np.testing.assert_allclose(
        np.asarray(g_block), np.asarray(g_loop), rtol=1e-4, atol=1e-6
    )
