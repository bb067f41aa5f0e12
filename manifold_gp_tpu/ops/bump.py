"""Compactly-supported bump function.

Mirrors reference ``manifold_gp/utils/torch_utils.py:38-41``:
  bump(x; alpha, beta) = exp(beta/(x^2 - alpha^2)) / exp(-beta/alpha^2)
for |x| < alpha, and 0 outside. Used for the out-of-sample feature support
mask (``kernels/riemann_kernel.py:146-147``) and the geometric/vanilla
posterior blending weight (``models/riemann_gp.py:41-43``).

Written branch-free with ``jnp.where`` (safe denominator) so it is jittable
and differentiable everywhere, including through ``alpha`` (which depends on
the learnable graph bandwidth).
"""

from __future__ import annotations

import jax.numpy as jnp


def bump_function(x, alpha, beta):
    x = jnp.asarray(x)
    inside = jnp.abs(x) < alpha
    denom = jnp.where(inside, x * x - alpha * alpha, -1.0)
    # exp(beta/(x^2-a^2)) / exp(-beta/a^2) = exp(beta/(x^2-a^2) + beta/a^2)
    val = jnp.exp(beta / denom + beta / (alpha * alpha))
    return jnp.where(inside, val, 0.0)
