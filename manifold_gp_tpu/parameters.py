"""Constrained-parameter transforms.

The reference stores every positive hyperparameter as an unconstrained "raw"
tensor plus a GPyTorch constraint object (softplus transforms; see reference
``manifold_gp/kernels/riemann_kernel.py:48-63`` registering
``raw_graphbandwidth`` with a ``Positive()`` constraint, and the notebooks
using ``GreaterThan(1e-8)`` for the likelihood noise). We reproduce the same
raw <-> constrained mapping so that checkpointed hyperparameters and
optimization trajectories are directly comparable, but as pure functions over
a flat params dict instead of stateful modules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    # Numerically-stable inverse of softplus: x = y + log(1 - exp(-y)).
    y = jnp.asarray(y, dtype=jnp.result_type(float))
    return y + jnp.log(-jnp.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Interval:
    """Base constraint: value = lower + (upper-lower)*sigmoid(raw)."""

    lower_bound: float = -np.inf
    upper_bound: float = np.inf

    def transform(self, raw):
        return self.lower_bound + (self.upper_bound - self.lower_bound) * (
            1.0 / (1.0 + jnp.exp(-raw))
        )

    def inverse_transform(self, value):
        t = (value - self.lower_bound) / (self.upper_bound - self.lower_bound)
        return jnp.log(t) - jnp.log1p(-t)


@dataclasses.dataclass(frozen=True)
class GreaterThan:
    """value = softplus(raw) + lower_bound (matches GPyTorch's default)."""

    lower_bound: float = 0.0

    def transform(self, raw):
        return softplus(raw) + self.lower_bound

    def inverse_transform(self, value):
        return inv_softplus(value - self.lower_bound)


class Positive(GreaterThan):
    def __init__(self):
        super().__init__(lower_bound=0.0)


@dataclasses.dataclass(frozen=True)
class ConstrainedParam:
    """Declaration of one learnable scalar (or small-array) hyperparameter."""

    name: str
    constraint: GreaterThan | Interval
    init_value: float = 1.0
    shape: tuple = ()

    @property
    def raw_name(self) -> str:
        return "raw_" + self.name

    def init_raw(self, value: Optional[float] = None):
        v = self.init_value if value is None else value
        return jnp.broadcast_to(
            self.constraint.inverse_transform(jnp.asarray(v, jnp.float32)),
            self.shape,
        ).astype(jnp.float32)

    def value(self, params):
        return self.constraint.transform(params[self.raw_name])
