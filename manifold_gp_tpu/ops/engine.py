"""Inference-engine dispatch: exact (dense Cholesky) vs stochastic (CG+SLQ).

GPyTorch routes every ``inv_quad_logdet`` / ``solve`` through
``settings.max_cholesky_size``: small operators are densified and factorized,
large ones go through mBCG (see reference ``utils/train_model.py:21,66``,
``utils/test_model.py:11``). We keep the same two-regime semantics — it is
what makes the 1D configs (N=1,556 <= max_cholesky=2000) *exact* and hence
bit-comparable — but the dispatch happens at trace time on static shapes, so
each regime compiles to its own XLA program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import InferenceConfig
from .cg import cg_solve
from .slq import slq_logdet, rademacher_probes

_HIGHEST = jax.lax.Precision.HIGHEST


def densify(matvec: Callable, n: int) -> jnp.ndarray:
    """Materialize an operator by applying it to the identity (the same
    batched-matvec densification linear_operator uses for ``to_dense``)."""
    return matvec(jnp.eye(n, dtype=jnp.float32))


def logdet(
    matvec: Callable,
    n: int,
    cfg: InferenceConfig,
    key: Optional[jax.Array] = None,
    dense: Optional[jnp.ndarray] = None,
    precond: Optional[Callable] = None,
):
    """log det of the SPD operator. Exact (Cholesky) when n <= max_cholesky
    or a densified matrix is supplied; SLQ otherwise (requires ``key``).
    ``precond`` (M^{-1} matvec) accelerates the SLQ gradient's CG solves."""
    if dense is None and n <= cfg.max_cholesky:
        dense = densify(matvec, n)
    if dense is not None:
        chol = jnp.linalg.cholesky(dense)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    assert key is not None, "stochastic logdet needs a PRNG key"
    from ..parallel.mesh import constrain_probes

    probes = constrain_probes(rademacher_probes(key, n, cfg.num_probes))
    return slq_logdet(
        matvec,
        probes,
        num_steps=cfg.lanczos_max_iter,
        cg_tol=cfg.cg_tolerance,
        cg_max_iter=cfg.cg_max_iter,
        precond=precond,
    )


def solve(
    matvec: Callable,
    b: jnp.ndarray,
    n: int,
    cfg: InferenceConfig,
    dense: Optional[jnp.ndarray] = None,
    precond: Optional[Callable] = None,
):
    """A^{-1} b, differentiable in both regimes (Cholesky AD / implicit CG)."""
    if dense is None and n <= cfg.max_cholesky:
        dense = densify(matvec, n)
    if dense is not None:
        chol = jnp.linalg.cholesky(dense)
        squeeze = b.ndim == 1
        bb = b[:, None] if squeeze else b
        x = jax.scipy.linalg.cho_solve((chol, True), bb)
        return x[:, 0] if squeeze else x
    return cg_solve(
        matvec, b, tol=cfg.cg_tolerance, max_iter=cfg.cg_max_iter,
        precond=precond,
    )


def inv_quad(
    matvec: Callable,
    rhs: jnp.ndarray,
    n: int,
    cfg: InferenceConfig,
    dense: Optional[jnp.ndarray] = None,
    precond: Optional[Callable] = None,
):
    """sum_i rhs_i' A^{-1} rhs_i (the GPyTorch inv_quad term)."""
    x = solve(matvec, rhs, n, cfg, dense=dense, precond=precond)
    return jnp.sum(rhs * x)


def average_variance(
    matvec: Callable,
    n: int,
    num_rand_vec: int,
    cfg: InferenceConfig,
    key: Optional[jax.Array] = None,
    precond: Optional[Callable] = None,
):
    """Mean diagonal of A^{-1}, estimated with random one-hot probes.

    Mirrors ``PrecisionMaternOperator._average_variance``
    (reference ``operators/precision_matern_operator.py:45-53``): exact mean
    of the full diagonal when num_rand_vec >= n, otherwise the average over
    uniformly sampled coordinates. Used for the outputscale normalization
    protocol in training (``utils/train_model.py:53-55,96-104``).
    """
    if num_rand_vec >= n:
        rhs = jnp.eye(n, dtype=jnp.float32)
        denom = n
    else:
        assert key is not None
        from ..parallel.mesh import constrain_probes

        idx = jax.random.randint(key, (num_rand_vec,), 0, n)
        rhs = jnp.zeros((n, num_rand_vec), jnp.float32).at[idx, jnp.arange(num_rand_vec)].set(1.0)
        rhs = constrain_probes(rhs)
        denom = num_rand_vec
    return inv_quad(matvec, rhs, n, cfg, precond=precond) / denom
