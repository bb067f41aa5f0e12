"""Model-level tests: MLL, training protocol, posterior, hybrid blend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RBFKernel, RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP, VanillaGP
from manifold_gp_tpu.utils.evaluate import test_model as eval_model
from manifold_gp_tpu.utils.train import manifold_informed_train, vanilla_train

from _dense_oracles import (
    dense_graph_laplacian,
    dense_matern_precision,
    dense_noisy,
    dense_scaled,
)

EPS = 0.35


def _make_model(x, y, cfg=None, labeled=None):
    kernel = RiemannMaternKernel(
        nu=2,
        x=x,
        nearest_neighbors=6,
        laplacian_normalization="randomwalk",
        num_modes=20,
        bump_scale=10.0,
        bump_decay=1.0,
        cfg=cfg or InferenceConfig(max_cholesky=800),
    )
    if labeled is not None:
        ty = y[labeled]
        tx = x[labeled]
    else:
        tx, ty = x, y
    return RiemannGP(
        tx, ty, kernel, labeled=labeled, cfg=cfg or InferenceConfig(max_cholesky=800)
    )


def test_mll_matches_dense_formula(small_cloud):
    """Precision-form MLL vs direct dense computation
    (reference test/_test_functions.py:77-104 model)."""
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=0.7, graphbandwidth=EPS, lengthscale=1.3
    )
    loss = float(model.mll_loss(params))

    lap, _, _, _, deg = dense_graph_laplacian(
        np.asarray(model.kernel.graph.rows),
        np.asarray(model.kernel.graph.cols),
        np.asarray(model.kernel.graph.sqdist),
        EPS,
        model.kernel.graph.num_nodes,
        normalization="randomwalk",
    )
    q = dense_noisy(
        dense_scaled(dense_matern_precision(lap, 2, 1.3, degree=deg), 0.7), 1e-2
    )
    n = y.shape[0]
    expected = 0.5 * (
        y @ (q @ y) - np.linalg.slogdet(q)[1] + n * np.log(2 * np.pi)
    ) / n
    np.testing.assert_allclose(loss, expected, rtol=5e-3)


def test_mll_gradient_matches_dense(small_cloud):
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=0.7, graphbandwidth=EPS, lengthscale=1.3
    )
    grads = jax.grad(lambda p: model.mll_loss(p))(params)

    def dense_loss(p):
        gb = model.kernel.graphbandwidth(p)
        ls = model.kernel.lengthscale(p)
        s = model.outputscale(p)
        sigma2 = model.noise(p)
        g = model.kernel.graph
        w = jnp.zeros((g.num_nodes, g.num_nodes))
        w = w.at[g.rows, g.cols].set(jnp.exp(-g.sqdist / (4 * gb**2)))
        w = w + w.T + jnp.eye(g.num_nodes)
        qd = w.sum(axis=1)
        a = w / jnp.outer(qd, qd)
        d = a.sum(axis=1)
        lap = (jnp.eye(g.num_nodes) - a / d[:, None]) / gb**2
        base = jnp.eye(g.num_nodes) * 2 * 2 / ls**2 + lap
        prec = jnp.diag(d) @ (base @ base) * s
        qn = prec - sigma2 * prec @ prec + sigma2**2 * prec @ prec @ prec
        n = y.shape[0]
        sign, ld = jnp.linalg.slogdet(qn)
        return 0.5 * (y @ (qn @ y) - ld + n * jnp.log(2 * jnp.pi)) / n

    dgrads = jax.grad(dense_loss)(params)
    for k in ["raw_graphbandwidth", "raw_lengthscale", "raw_noise", "raw_outputscale"]:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(dgrads[k]), rtol=2e-2, atol=1e-5
        ), k


def test_average_variance_protocol(small_cloud):
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=EPS, lengthscale=1.3
    )
    av = float(model.average_variance(params, num_rand_vec=1000))
    # oracle: mean diagonal of inverse of the *unscaled* precision
    lap, _, _, _, deg = dense_graph_laplacian(
        np.asarray(model.kernel.graph.rows),
        np.asarray(model.kernel.graph.cols),
        np.asarray(model.kernel.graph.sqdist),
        EPS,
        model.kernel.graph.num_nodes,
        normalization="randomwalk",
    )
    q = dense_matern_precision(lap, 2, 1.3, degree=deg)
    np.testing.assert_allclose(av, np.diagonal(np.linalg.inv(q)).mean(), rtol=1e-3)


def test_posterior_interpolates_train_targets(small_cloud):
    """With tiny noise the geometric posterior mean should track the targets
    at the training points."""
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-4, outputscale=1.0, graphbandwidth=EPS, lengthscale=0.5
    )
    model.eval(params)
    post = model.posterior(params, x)
    corr = np.corrcoef(np.asarray(post.mean), y)[0, 1]
    assert corr > 0.95
    assert post.covar.shape == (x.shape[0], x.shape[0])
    assert np.all(np.asarray(post.stddev) >= 0)


def test_posterior_matches_dense_gp_formulas(small_cloud):
    """Feature-space Woodbury posterior == textbook dense GP posterior on
    K = s Z Z' + noise."""
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=0.8, graphbandwidth=EPS, lengthscale=0.9
    )
    model.eval(params)
    basis = model.kernel.eval_basis(params)
    z = np.asarray(model.kernel.features_train(params, basis))
    s, sigma2 = 0.8, 1e-2
    k_train = s * z @ z.T + sigma2 * np.eye(z.shape[0])
    test_x = x[:17]
    post = model.posterior(params, test_x, noisy_posterior=True)
    # test_x is not the kernel's node array, so the model (like the
    # reference's torch.equal dispatch) uses Nystrom out-of-sample features —
    # the oracle must use the same feature rows.
    zs = np.asarray(model.kernel.features_test(params, basis, test_x))
    k_star = s * zs @ z.T
    mean_expected = k_star @ np.linalg.solve(k_train, y)
    cov_expected = (
        s * zs @ zs.T - k_star @ np.linalg.solve(k_train, k_star.T) + sigma2 * np.eye(17)
    )
    np.testing.assert_allclose(np.asarray(post.mean), mean_expected, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(post.covar), cov_expected, rtol=1e-2, atol=1e-4)


def test_vanilla_gp_end_to_end(small_cloud):
    x, y = small_cloud
    model = VanillaGP(x, y, RBFKernel())
    params = model.init_params(noise=1e-2, outputscale=1.0, lengthscale=0.5)
    params, loss, _ = vanilla_train(model, params, lr=0.1, max_iter=30)
    assert np.isfinite(loss)
    rmse, nll = eval_model(model, params, x, y, noisy_test=True)
    assert rmse < 0.5


def test_manifold_training_improves_loss(small_cloud):
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=1.0, lengthscale=1.0
    )
    l0 = float(model.mll_loss(params))
    params, loss, history = manifold_informed_train(
        model, params, lr=0.1, max_iter=15
    )
    assert history[-1] < history[0]
    rmse, nll = eval_model(model, params, x, y, noisy_test=True)
    assert np.isfinite(nll)
    assert rmse < 1.0


def test_semisupervised_schur_training(small_cloud):
    x, y = small_cloud
    labeled = np.zeros(x.shape[0], bool)
    labeled[::8] = True
    model = _make_model(x, y, labeled=labeled)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=EPS, lengthscale=1.0
    )
    loss = float(model.mll_loss(params))
    assert np.isfinite(loss)
    params, _, history = manifold_informed_train(model, params, lr=0.1, max_iter=5)
    assert np.isfinite(history[-1])


def test_hybrid_posterior_blend(small_cloud):
    """Far from the manifold the hybrid posterior reduces to the vanilla GP
    (base_scale -> 1); on-manifold it is the geometric posterior."""
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=EPS, lengthscale=0.9
    )
    vanilla = VanillaGP(x, y, RBFKernel())
    vparams = vanilla.init_params(noise=1e-2, outputscale=1.0, lengthscale=0.5)
    model.eval(params)
    vanilla.eval(vparams)
    far = np.full((4, 2), 30.0, np.float32)
    post = model.posterior(
        params, far, noisy_posterior=True, base_model=vanilla, base_params=vparams
    )
    vpost = vanilla.posterior(vparams, far, noisy_posterior=True)
    np.testing.assert_allclose(
        np.asarray(post.mean), np.asarray(vpost.mean), rtol=1e-4, atol=1e-5
    )


def test_posterior_samples_match_moments(small_cloud):
    """Pathwise feature-space samples reproduce the posterior's mean and
    covariance (and the generic dense sampler agrees)."""
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=EPS, lengthscale=1.0
    )
    model.eval(params)
    xq = x[:40]
    post = model.posterior(params, xq)
    s = model.posterior_samples(params, xq, jax.random.PRNGKey(0), 20000)
    assert s.shape == (20000, 40)
    emp_mean = np.asarray(s).mean(axis=0)
    np.testing.assert_allclose(emp_mean, np.asarray(post.mean), atol=2e-2)
    emp_cov = np.cov(np.asarray(s).T)
    np.testing.assert_allclose(emp_cov, np.asarray(post.covar), atol=2e-2)

    from manifold_gp_tpu.utils import sample_posterior

    s2 = sample_posterior(post, jax.random.PRNGKey(1), 20000)
    np.testing.assert_allclose(
        np.asarray(s2).mean(axis=0), np.asarray(post.mean), atol=2e-2
    )
    np.testing.assert_allclose(
        np.cov(np.asarray(s2).T), np.asarray(post.covar), atol=2e-2
    )


def test_checkpoint_resume_reproduces_uninterrupted_run(small_cloud, tmp_path):
    """Training 12 epochs with a checkpoint every 5, killed after 10 and
    resumed, must land exactly where an uninterrupted run lands."""
    x, y = small_cloud
    ck = str(tmp_path / "state.pkl")

    def fresh():
        model = _make_model(x, y)
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=EPS, lengthscale=1.0
        )
        return model, params

    model, params = fresh()
    p_full, loss_full, _ = manifold_informed_train(
        model, params, lr=1e-1, max_iter=12, verbose=False
    )

    model2, params2 = fresh()
    # "crash" after 10 epochs (chunk cut at the checkpoint boundary)
    manifold_informed_train(
        model2, params2, lr=1e-1, max_iter=9,
        checkpoint_path=ck, checkpoint_every=5, verbose=False,
    )
    model3, params3 = fresh()
    p_res, loss_res, _ = manifold_informed_train(
        model3, params3, lr=1e-1, max_iter=12,
        checkpoint_path=ck, checkpoint_every=5, verbose=False,
    )
    # The resumed run restarts from epoch 10's checkpoint; outputscale
    # normalization uses fresh keys pre/post so compare the raw kernel
    # hypers and the final loss.
    np.testing.assert_allclose(float(loss_res), float(loss_full), rtol=1e-3)
    for k in ("raw_graphbandwidth", "raw_lengthscale", "raw_noise"):
        np.testing.assert_allclose(
            np.asarray(p_res[k]), np.asarray(p_full[k]), rtol=1e-3, atol=1e-5
        )


def test_precond_refresh_training_converges(small_cloud):
    """Round-4 VERDICT item 7: precond_refresh caches the (stop_gradient-ed)
    pivchol preconditioner across epochs. A stale-M run must still train:
    loss decreases, params stay finite, and the result lands near the
    rebuild-every-epoch run."""
    from manifold_gp_tpu.utils import ReduceLROnPlateau, manifold_informed_train

    x, y = small_cloud
    cfg = InferenceConfig(
        max_cholesky=0, num_probes=32, lanczos_max_iter=30,
        cg_tolerance=1e-3, cg_max_iter=200,
        precond_type="pivchol", slq_precond_quadrature=True,
    )
    kernel = RiemannMaternKernel(
        nu=2, x=x, nearest_neighbors=6,
        laplacian_normalization="randomwalk", num_modes=10, cfg=cfg,
    )
    model = RiemannGP(x, y, kernel, cfg=cfg)
    params0 = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.35, lengthscale=1.0
    )

    params, loss, hist = manifold_informed_train(
        model, dict(params0), lr=5e-2, max_iter=9, tolerance=0.0,
        update_norm=None, verbose=False, precond_refresh=4,
    )
    assert np.isfinite(loss)
    assert hist[-1] < hist[0], (hist[0], hist[-1])
    for k, v in params.items():
        assert np.all(np.isfinite(np.asarray(v))), k

    # fresh-M comparison run (same seed): stale M changes only the MC
    # estimator draws, so the trained hyperparameters land close
    params_f, loss_f, hist_f = manifold_informed_train(
        model, dict(params0), lr=5e-2, max_iter=9, tolerance=0.0,
        update_norm=None, verbose=False, precond_refresh=1,
    )
    for k in params:
        np.testing.assert_allclose(
            np.asarray(params[k]), np.asarray(params_f[k]), rtol=0.2,
            atol=0.05,
        )
