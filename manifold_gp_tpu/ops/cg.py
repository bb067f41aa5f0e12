"""Batched (preconditioned) conjugate gradients with implicit differentiation.

This replaces the core of GPyTorch/linear_operator's solve machinery that the
reference merely imports (``linear_operator`` CG invoked through ``solve`` at
``operators/schur_complement_operator.py:28`` and through ``inv_quad_logdet``
at ``utils/train_model.py:68``). GPyTorch's mBCG applies a preconditioner by
default (pivoted Cholesky of the covariance); our precision-form operators
expose (approximate) diagonals cheaply, so the equivalent here is Jacobi PCG
— the ``precond`` hook takes any SPD M^{-1} matvec closure.

TPU-first design:
  * one ``lax.while_loop`` drives all right-hand sides jointly (multi-RHS CG
    shares every matvec — on TPU a [N, B] matvec is barely more expensive
    than [N, 1]);
  * the two reduction scalars per iteration (alpha, beta) are plain jnp sums,
    so under a sharded-in/sharded-out jit they lower to ICI ``psum``s
    automatically;
  * gradients do NOT backprop through the Krylov iterations. ``cg_solve`` has
    a custom VJP via the implicit-function theorem: for x = A(theta)^{-1} b,
      bar_b     = A^{-1} bar_x          (one adjoint CG solve; A symmetric)
      bar_theta = -vjp_theta(A(theta) x)(bar_b)
    The preconditioner only changes the iteration path, never the solution,
    so its captured values correctly receive zero cotangents.
    Closure-captured traced values inside the matvec are handled with
    ``jax.closure_convert`` so any operator composition works.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def cg_raw(
    matvec: Callable,
    b: jnp.ndarray,
    tol: float,
    max_iter: int,
    x0=None,
    precond: Optional[Callable] = None,
    with_info: bool = False,
):
    """Plain batched (P)CG (no custom gradient). b: [N] or [N, B].

    Terminates when every column's residual norm drops below
    ``tol * ||b_col||`` (GPyTorch-equivalent relative tolerance) or at
    ``max_iter``. Converged columns are frozen to avoid roundoff drift.

    ``precond``: optional SPD M^{-1} matvec (e.g. Jacobi: v / diag(A));
    termination still measures the true residual, so tolerances mean the
    same thing with and without preconditioning.
    ``with_info``: also return the iteration count (a traced scalar).
    """
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    b_norm2 = jnp.sum(b * b, axis=0)
    # Guard all-zero columns (solution 0).
    stop2 = (tol * tol) * jnp.maximum(b_norm2, 1e-30)

    apply_p = (lambda v: v) if precond is None else precond

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b if x0 is None else b - matvec(x)
    z = apply_p(r)
    p = z
    rs = jnp.sum(r * r, axis=0)
    rz = rs if precond is None else jnp.sum(r * z, axis=0)

    def cond(state):
        i, x, r, p, rs, rz = state
        return jnp.logical_and(i < max_iter, jnp.any(rs > stop2))

    def body(state):
        i, x, r, p, rs, rz = state
        ap = matvec(p)
        pap = jnp.sum(p * ap, axis=0)
        active = rs > stop2
        alpha = jnp.where(active, rz / jnp.where(pap == 0, 1.0, pap), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        rs_new = jnp.sum(r * r, axis=0)
        if precond is None:
            rz_new = rs_new
        else:
            z = apply_p(r)
            rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = (r if precond is None else z) + beta[None, :] * p
        rs = jnp.where(active, rs_new, rs)
        rz = jnp.where(active, rz_new, rz)
        return i + 1, x, r, p, rs, rz

    iters, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rs, rz)
    )
    x_out = x[:, 0] if squeeze else x
    return (x_out, iters) if with_info else x_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _cg_solve_cc(matvec_c, precond_c, n_mv_consts, tol, max_iter, b, *consts):
    mvc, pc = consts[:n_mv_consts], consts[n_mv_consts:]
    precond = None if precond_c is None else (lambda v: precond_c(v, *pc))
    return cg_raw(lambda v: matvec_c(v, *mvc), b, tol, max_iter, precond=precond)


def _cg_solve_fwd(matvec_c, precond_c, n_mv_consts, tol, max_iter, b, *consts):
    x = _cg_solve_cc(matvec_c, precond_c, n_mv_consts, tol, max_iter, b, *consts)
    return x, (x, consts)


def _cg_solve_bwd(matvec_c, precond_c, n_mv_consts, tol, max_iter, res, g):
    x, consts = res
    mvc, pc = consts[:n_mv_consts], consts[n_mv_consts:]
    precond = None if precond_c is None else (lambda v: precond_c(v, *pc))
    # A is symmetric for every operator in this framework.
    lam = cg_raw(
        lambda v: matvec_c(v, *mvc), g, tol, max_iter, precond=precond
    )
    _, vjp_fn = jax.vjp(lambda *c: matvec_c(x, *c), *mvc)
    mvc_bar = vjp_fn(-lam)
    # x = A^{-1} b does not depend on the preconditioner: zero cotangents.
    pc_bar = tuple(jnp.zeros_like(c) for c in pc)
    return (lam, *mvc_bar, *pc_bar)


_cg_solve_cc.defvjp(_cg_solve_fwd, _cg_solve_bwd)


def cg_solve(
    matvec: Callable,
    b: jnp.ndarray,
    tol: float = 1e-2,
    max_iter: int = 1000,
    precond: Optional[Callable] = None,
):
    """Solve A x = b with (P)CG; differentiable w.r.t. traced values captured
    by ``matvec`` (and w.r.t. ``b``) via the implicit-function VJP above.

    ``matvec`` must be a symmetric positive-definite linear map [N, B]->[N, B]
    (or [N]->[N]); it may close over arbitrary traced arrays. ``precond`` is
    an optional M^{-1} matvec used in both the forward and the adjoint solve.
    """
    matvec_c, mv_consts = jax.closure_convert(matvec, b)
    if precond is None:
        precond_c, p_consts = None, ()
    else:
        precond_c, p_consts = jax.closure_convert(precond, b)
    return _cg_solve_cc(
        matvec_c,
        precond_c,
        len(mv_consts),
        float(tol),
        int(max_iter),
        b,
        *mv_consts,
        *p_consts,
    )
