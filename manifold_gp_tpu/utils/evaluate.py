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


def gaussian_nll_stochastic(
    error,
    covar,
    key,
    num_probes: int = 10,
    lanczos_steps: int = 20,
    cg_tol: float = 1e-2,
    cg_max_iter: int = 1000,
    jitter: float = 1e-4,
):
    """The *reference's* NLL metric, faithfully stochastic.

    ``utils/test_model.py:23-24`` computes the eval NLL through
    ``posterior_covar.inv_quad_logdet`` — for test blocks larger than
    ``max_cholesky_size=800`` that is GPyTorch mBCG: the inv_quad via
    preconditioned CG at cg_tolerance=1e-2 and the logdet via stochastic
    Lanczos quadrature with ``num_trace_samples=10`` probes and
    ``max_lanczos_quadrature_iterations=20`` steps (gpytorch defaults under
    the ``fast_pred_var`` context of ``test_model.py:11``). On the
    near-singular low-rank posterior covariances this metric carries
    O(0.1-nat) bias/variance — this function exists to *quantify* that when
    adjudicating stored-notebook NLL targets against our exact
    ``gaussian_nll`` (see PARITY.md). GPyTorch also adds a relative jitter to
    keep Lanczos on the PSD cone; we mirror that with ``jitter``·mean-diag.
    """
    from ..ops.cg import cg_raw
    from ..ops.slq import rademacher_probes, slq_logdet_raw

    n = error.shape[0]
    jit_val = jitter * jnp.mean(jnp.diagonal(covar))
    cov_j = covar + jit_val * jnp.eye(n, dtype=covar.dtype)

    def matvec(v):
        return jnp.matmul(cov_j, v, precision=_HIGHEST)

    alpha = cg_raw(matvec, error[:, None], cg_tol, cg_max_iter)[:, 0]
    inv_quad = jnp.dot(error, alpha, precision=_HIGHEST)
    probes = rademacher_probes(key, n, num_probes)
    logdet = slq_logdet_raw(matvec, probes, lanczos_steps)
    return 0.5 * (inv_quad + logdet + n * math.log(2.0 * math.pi)) / n


def test_model(
    model,
    params,
    test_x,
    test_y,
    noisy_test: bool = False,
    base_model=None,
    base_params=None,
    metric: str = "exact",
    key=None,
):
    """Returns (rmse, nll) floats.

    ``metric``: "exact" (dense Cholesky NLL — our default) or "reference"
    (the reference's stochastic mBCG inv_quad_logdet metric at GPyTorch
    defaults, for adjudicating stored notebook targets; needs ``key``).
    """
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
    if metric == "reference":
        assert key is not None, "reference metric is stochastic: pass a key"
        nll = gaussian_nll_stochastic(error, post.covar, key)
    else:
        nll = gaussian_nll(error, post.covar)
    return float(rmse), float(nll)
