"""Model evaluation: RMSE and negative log predictive density.

Mirrors reference ``manifold_gp/utils/test_model.py:10-30``:
  rmse = sqrt(mean((y - posterior_mean)^2))
  nll  = 0.5 [ e' Sigma^{-1} e + logdet Sigma + n log 2pi ] / n
computed on the (noisy) posterior covariance. Where the reference runs this
through GPyTorch LOVE + CG (``fast_pred_var``), our posterior covariance is
an exact low-rank + diagonal matrix, so a dense Cholesky on the test block is
both exact and fast.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def gaussian_nll(error, covar):
    n = error.shape[0]
    chol = jnp.linalg.cholesky(covar)
    alpha = jax.scipy.linalg.cho_solve((chol, True), error[:, None])[:, 0]
    inv_quad = jnp.dot(error, alpha, precision=_HIGHEST)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return 0.5 * (inv_quad + logdet + n * math.log(2.0 * math.pi)) / n


def test_model(
    model,
    params,
    test_x,
    test_y,
    noisy_test: bool = False,
    base_model=None,
    base_params=None,
):
    """Returns (rmse, nll) floats."""
    model.eval(params)
    if base_model is not None:
        base_model.eval(base_params)
        post = model.posterior(
            params,
            test_x,
            noisy_posterior=noisy_test,
            base_model=base_model,
            base_params=base_params,
        )
    else:
        post = model.posterior(params, test_x, noisy_posterior=noisy_test)
    test_y = jnp.asarray(test_y, jnp.float32)
    error = test_y - post.mean
    rmse = jnp.sqrt(jnp.mean(error * error))
    nll = gaussian_nll(error, post.covar)
    return float(rmse), float(nll)
