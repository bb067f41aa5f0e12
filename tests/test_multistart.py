"""Vmapped multi-start training: finds the better of two basins and matches
single-run training for the same init."""

import jax
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP
from manifold_gp_tpu.utils import manifold_informed_train
from manifold_gp_tpu.utils.multistart import multi_start_train, random_restarts


@pytest.fixture(scope="module")
def model_and_inits(small_cloud):
    x, y = small_cloud
    cfg = InferenceConfig(max_cholesky=500)
    kernel = RiemannMaternKernel(
        nu=1, x=x, nearest_neighbors=6, laplacian_normalization="randomwalk",
        num_modes=10, cfg=cfg,
    )
    model = RiemannGP(x, y, kernel, cfg=cfg)
    return model


def test_multi_start_matches_single_run(model_and_inits):
    model = model_and_inits
    init = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.35, lengthscale=1.0
    )
    single, loss_single, _ = manifold_informed_train(
        model, dict(init), lr=1e-1, max_iter=10, tolerance=0.0, seed=0
    )
    # multi-start with one init and the same per-restart seed stream
    stacked_params, losses = multi_start_train(
        model, [dict(init)], lr=1e-1, max_iter=10, seed=0, return_all=True
    )
    one = jax.tree.map(lambda x: x[0], stacked_params)
    # Seeds differ between the two drivers, so trajectories are not bitwise
    # equal; but 11 epochs from the same init must land in the same region.
    np.testing.assert_allclose(float(losses[0]), loss_single, atol=0.02)
    for k in single:
        if k == "raw_outputscale":
            # multi_start_train skips the outputscale average-variance
            # normalization protocol, so raw_outputscale trajectories differ
            # by the normalization factor.
            continue
        np.testing.assert_allclose(
            np.asarray(one[k]), np.asarray(single[k]), rtol=0.15, atol=0.05
        )


def test_multi_start_picks_best_basin(model_and_inits):
    model = model_and_inits
    inits = [
        model.init_params(noise=1e-2, outputscale=1.0, graphbandwidth=5.0,
                          lengthscale=0.2),
        model.init_params(noise=1e-2, outputscale=1.0, graphbandwidth=0.35,
                          lengthscale=1.0),
    ]
    best, best_loss, losses = multi_start_train(model, inits, lr=1e-1, max_iter=15)
    assert best_loss == float(np.min(np.asarray(losses)))
    assert np.asarray(losses).shape == (2,)


def test_random_restarts_shapes(model_and_inits):
    model = model_and_inits
    inits = random_restarts(model, jax.random.PRNGKey(0), 3)
    assert len(inits) == 3
    gbs = [float(model.kernel.graphbandwidth(p)) for p in inits]
    assert len(set(gbs)) == 3  # distinct draws
