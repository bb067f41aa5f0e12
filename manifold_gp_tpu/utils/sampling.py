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
