"""Sampling helpers (reference ``utils/torch_utils.py:44-49``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_uniform(key, center, la, lb=None, samples: int = 1):
    """Uniform samples in the axis-aligned box centered at ``center`` with
    half-widths (la, lb); lb defaults to la (reference grid_uniform)."""
    if lb is None:
        lb = la
    center = jnp.asarray(center, jnp.float32)
    lo = center - jnp.asarray([la, lb], jnp.float32)
    hi = center + jnp.asarray([la, lb], jnp.float32)
    return jax.random.uniform(
        key, (samples, 2), jnp.float32, minval=lo, maxval=hi
    )


def sample_posterior(posterior, key, num_samples: int, jitter: float = 1e-6):
    """Joint samples [num_samples, n*] from any ``Posterior`` (mean, covar)
    via a jittered dense Cholesky — the generic path for hybrid/vanilla
    posteriors whose covariance is already materialized. For the geometric
    model prefer ``RiemannGP.posterior_samples`` (O(m^2) feature-space
    sampling, no n*^3 factorization)."""
    n = posterior.mean.shape[0]
    cov = posterior.covar + jitter * jnp.eye(n, dtype=posterior.covar.dtype)
    chol = jnp.linalg.cholesky(cov)
    xi = jax.random.normal(key, (n, num_samples), posterior.mean.dtype)
    return (posterior.mean[:, None] + chol @ xi).T
