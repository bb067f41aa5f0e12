"""Jacobi-preconditioned CG: same solutions, fewer iterations.

The reference's every solve/logdet rides GPyTorch mBCG, which preconditions
by default (pivoted Cholesky; ``utils/train_model.py:68`` context). Our
precision-form equivalent is Jacobi with the operator's (approximate)
diagonal (ops/matern.py: matern_precision_diag / noisy_scaled_diag).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP
from manifold_gp_tpu.ops.cg import cg_raw, cg_solve
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
from manifold_gp_tpu.ops.matern import (
    make_jacobi_precond,
    make_matern_precision_matvec,
    matern_precision_diag,
)


@pytest.fixture(scope="module")
def ill_conditioned(rng):
    """nu=3, small-epsilon Matérn precision on *clustered* data: the
    density-corrected degree spans ~2 orders of magnitude across cluster
    cores vs gaps, so diag(Q) spreads by (spread)^nu and Jacobi has real
    spectral content to flatten. (On near-uniform-density manifolds like the
    noisy circle the diagonal is nearly constant and Jacobi is a no-op — the
    conditioning there is purely spectral in lambda.)"""
    n = 600
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, n)] + 0.25 * rng.standard_normal(
        (n, 8)
    ).astype(np.float32)
    from manifold_gp_tpu.ops.graph import build_graph

    graph = build_graph(x, 10)
    eps, nu, ls = 0.15, 3, 1.0
    coeffs = laplacian_coeffs(graph, eps)
    mv = make_matern_precision_matvec(graph, coeffs, nu, ls, "randomwalk")
    diag = matern_precision_diag(graph, coeffs, nu, ls, "randomwalk")
    b = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    return graph, mv, diag, b


def test_jacobi_reduces_iterations(ill_conditioned):
    graph, mv, diag, b = ill_conditioned
    tol, max_iter = 1e-4, 4000
    x_plain, it_plain = cg_raw(mv, b, tol, max_iter, with_info=True)
    x_pcg, it_pcg = cg_raw(
        mv, b, tol, max_iter, precond=make_jacobi_precond(diag), with_info=True
    )
    it_plain, it_pcg = int(it_plain), int(it_pcg)
    # Same solution (termination measures the true residual in both).
    scale = float(jnp.max(jnp.abs(x_plain)))
    np.testing.assert_allclose(
        np.asarray(x_pcg), np.asarray(x_plain), atol=2 * tol * scale
    )
    # The point of the exercise: a real iteration-count reduction
    # (measured here: 81 -> 56).
    assert it_pcg < 0.8 * it_plain, (it_pcg, it_plain)
    assert it_plain < max_iter, "plain CG must converge for a fair comparison"


def test_precision_diag_exact_nu12(rng):
    """matern_precision_diag is exact for nu in {1, 2} vs densified Q."""
    n = 120
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], axis=1).astype(np.float32)
    from manifold_gp_tpu.ops.graph import build_graph

    graph = build_graph(x, 6)
    coeffs = laplacian_coeffs(graph, 0.3)
    for nu in (1, 2):
        for norm in ("symmetric", "randomwalk"):
            mv = make_matern_precision_matvec(graph, coeffs, nu, 0.7, norm)
            dense = mv(jnp.eye(n, dtype=jnp.float32))
            d = matern_precision_diag(graph, coeffs, nu, 0.7, norm)
            np.testing.assert_allclose(
                np.asarray(d),
                np.asarray(jnp.diagonal(dense)),
                rtol=2e-5,
                atol=1e-5,
            )


def test_cg_solve_precond_gradients_match(ill_conditioned):
    """The implicit-function VJP is preconditioner-independent: gradients of
    a solve-based loss match with and without Jacobi."""
    graph, _, _, b = ill_conditioned
    eps0, nu, ls = 0.05, 2, 1.0

    def loss(eps, precondition):
        coeffs = laplacian_coeffs(graph, eps)
        mv = make_matern_precision_matvec(graph, coeffs, nu, ls, "randomwalk")
        pc = (
            make_jacobi_precond(
                matern_precision_diag(graph, coeffs, nu, ls, "randomwalk")
            )
            if precondition
            else None
        )
        x = cg_solve(mv, b, tol=1e-6, max_iter=4000, precond=pc)
        return jnp.sum(x * b)

    v0, g0 = jax.value_and_grad(loss)(jnp.float32(eps0), False)
    v1, g1 = jax.value_and_grad(loss)(jnp.float32(eps0), True)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-4)
    np.testing.assert_allclose(float(g1), float(g0), rtol=1e-3)


def test_model_loss_same_with_precondition(small_cloud):
    """cfg.cg_precondition must not change mll_loss values/gradients (it only
    changes CG iteration paths) — semisupervised stochastic regime."""
    x, y = small_cloud
    labeled = np.zeros(len(y), bool)
    labeled[::8] = True

    def build(precondition):
        cfg = InferenceConfig(
            max_cholesky=0,
            num_probes=32,
            cg_tolerance=1e-5,
            cg_max_iter=2000,
            cg_precondition=precondition,
        )
        kernel = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=6,
            laplacian_normalization="randomwalk", num_modes=10, cfg=cfg,
        )
        model = RiemannGP(x[labeled], y[labeled], kernel, labeled=labeled, cfg=cfg)
        params = model.init_params(
            noise=1e-3, outputscale=1.0, graphbandwidth=0.3, lengthscale=1.0
        )
        return model, params

    key = jax.random.PRNGKey(7)
    m0, p0 = build(False)
    m1, p1 = build(True)
    v0, g0 = jax.value_and_grad(lambda p: m0.mll_loss(p, key=key))(p0)
    v1, g1 = jax.value_and_grad(lambda p: m1.mll_loss(p, key=key))(p1)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-3)
    for k in g0:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g0[k]), rtol=2e-2, atol=1e-4
        )
