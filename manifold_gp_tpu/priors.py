"""Hyperpriors over constrained hyperparameters.

The reference ships an InverseGamma prior
(``manifold_gp/priors/inverse_gamma_prior.py:16-68``, built as
Gamma + PowerTransform(-1)) and the notebooks optionally place a data-driven
``gpytorch.priors.GammaPrior`` on the graph bandwidth (cell "74cd3ae2" in
every example notebook). Here priors are plain log-density functions over the
*constrained* value — the training loss subtracts their log-prob exactly like
reference ``manifold_gp/utils/train_model.py:71-74``.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GammaPrior:
    """Gamma(concentration, rate) over a positive hyperparameter."""

    concentration: float
    rate: float

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        return (
            a * math.log(b)
            - jax.lax.lgamma(jnp.asarray(a, jnp.float32))
            + (a - 1.0) * jnp.log(value)
            - b * value
        )

    def sample(self, key):
        return jax.random.gamma(key, self.concentration) / self.rate


@dataclasses.dataclass(frozen=True)
class InverseGammaPrior:
    """InverseGamma(concentration, rate): X~Gamma(a,b) => 1/X~InvGamma(a,b).

    Log-density matches the reference's TransformedDistribution construction
    (``priors/inverse_gamma_prior.py:32-38``):
      log p(y) = a log b - lgamma(a) - (a+1) log y - b / y
    """

    concentration: float
    rate: float

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        return (
            a * math.log(b)
            - jax.lax.lgamma(jnp.asarray(a, jnp.float32))
            - (a + 1.0) * jnp.log(value)
            - b / value
        )

    def sample(self, key):
        return self.rate / jax.random.gamma(key, self.concentration)


@dataclasses.dataclass(frozen=True)
class NormalPrior:
    loc: float
    scale: float

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - math.log(self.scale) - 0.5 * math.log(2 * math.pi)

    def sample(self, key):
        return self.loc + self.scale * jax.random.normal(key)


def data_driven_bandwidth_prior(edge_sqdists):
    """Reproduce the notebooks' data-driven Gamma prior over graphbandwidth.

    Given squared distances to the k nearest non-self neighbors (shape [N, k]),
    computes (graphbandwidth_min, GammaPrior) following the identical cell
    "74cd3ae2" in every reference example notebook:
      eps_min   = sqrt(max_i d_{i,1}^2 / (-4 ln 1e-4))
      median    = median over i of mean_j sqrt(d_{ij}^2)
      rate      = 4 median / (median - eps_min)^2
      concentr. = rate * median + 1
    """
    d = jnp.asarray(edge_sqdists)
    eps_min = jnp.sqrt(d[:, 0].max() / (-4.0 * math.log(1e-4)))
    mean_dist = jnp.sqrt(d).mean(axis=1)
    sorted_md = jnp.sort(mean_dist)
    median = sorted_md[int(round(d.shape[0] * 0.50))]
    rate = 4.0 * median / (median - eps_min) ** 2
    concentration = rate * median + 1.0
    return float(eps_min), GammaPrior(float(concentration), float(rate))
