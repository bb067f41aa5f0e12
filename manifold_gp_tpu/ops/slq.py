"""Stochastic Lanczos quadrature (SLQ) log-determinant with unbiased gradient.

Replaces GPyTorch's mBCG-based ``inv_quad_logdet(logdet=True)`` stochastic
path (invoked by the reference at ``utils/train_model.py:66-69`` for the
precision-form marginal likelihood when the operator exceeds
``max_cholesky_size``).

Value:  tr(log Q) ~= (n / p) * sum_i  e1' log(T_i) e1
        with T_i the m-step Lanczos tridiagonalization of Q started at the
        i-th normalized Rademacher probe (||z||^2 = n).
Gradient (custom VJP, the Hutchinson trace identity GPyTorch also uses):
        d tr(log Q) / d theta = E_z[ z' Q^{-1} (dQ/dtheta) z ]
        estimated with the same probes; the solves Q^{-1} z are CG solves
        performed in the backward pass only (no differentiation through the
        Lanczos recurrence).

TPU notes: all probes advance together — each Lanczos step is one [N, P]
matvec (batched RHS ride the same SpMV/matmul), and each T_i is a tiny
[m, m] eigh, batched with vmap. Probe vectors are embarrassingly parallel
across chips (shard the P axis; see manifold_gp_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from .cg import cg_raw

_BREAKDOWN_TOL = 1e-10


def lanczos_batched(matvec: Callable, q0: jnp.ndarray, num_steps: int):
    """m-step Lanczos without reorthogonalization, batched over columns.

    Args:
      matvec: symmetric linear map [N, P] -> [N, P].
      q0: [N, P] unit-norm start vectors.
      num_steps: m.
    Returns:
      alphas [m, P], betas [m, P] (betas[j] couples step j and j+1; the last
      row is unused), valid [m, P] (False after a breakdown).
    """

    n = q0.shape[0]
    num_steps = min(num_steps, n)

    def step(carry, _):
        q_prev, q, beta_prev, alive = carry
        w = matvec(q)
        alpha = jnp.sum(q * w, axis=0)
        w = w - alpha[None, :] * q - beta_prev[None, :] * q_prev
        beta = jnp.sqrt(jnp.sum(w * w, axis=0))
        alive_next = jnp.logical_and(alive, beta > _BREAKDOWN_TOL)
        safe_beta = jnp.where(alive_next, beta, 1.0)
        q_next = jnp.where(alive_next[None, :], w / safe_beta[None, :], 0.0)
        beta_out = jnp.where(alive_next, beta, 0.0)
        carry = (q, q_next, beta_out, alive_next)
        return carry, (alpha, beta_out, alive)

    p = q0.shape[1]
    init = (
        jnp.zeros_like(q0),
        q0,
        jnp.zeros((p,), q0.dtype),
        jnp.ones((p,), bool),
    )
    _, (alphas, betas, valid) = jax.lax.scan(step, init, None, length=num_steps)
    return alphas, betas, valid


def _tridiag_e1_quadrature(alphas, betas, valid, f):
    """Per-probe Gauss quadrature e1' f(T) e1 from Lanczos coefficients.

    alphas/betas/valid: [m, P]. Steps after a breakdown are replaced by an
    identity block (f(1) contributions get ~zero e1-weight for log, and the
    block decouples from the leading one, so estimates stay exact for
    graphs whose Krylov space is exhausted early).
    """

    def one(a, b, v):
        a = jnp.where(v, a, 1.0)
        b = jnp.where(v[1:], b[:-1], 0.0)
        t = jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
        evals, evecs = jnp.linalg.eigh(t)
        w = evecs[0, :] ** 2
        return jnp.sum(w * f(evals))

    return jax.vmap(one, in_axes=(1, 1, 1))(alphas, betas, valid)


def slq_logdet_raw(matvec, probes, num_steps: int, num_nodes: int = None):
    """Forward SLQ estimate of log det Q. probes: [N, P] Rademacher.

    ``num_nodes``: Hutchinson trace dimension; defaults to the probe length.
    Pass the true node count when probes are zero-padded (padding rows make
    e1-quadrature weights unchanged — q0 is normalized — but the trace scale
    must be ||z||^2 = num_nodes, not the padded length)."""
    n = probes.shape[0] if num_nodes is None else num_nodes
    q0 = probes / jnp.sqrt(jnp.sum(probes * probes, axis=0))[None, :]
    alphas, betas, valid = lanczos_batched(matvec, q0, num_steps)
    quad = _tridiag_e1_quadrature(
        alphas, betas, valid, lambda lam: jnp.log(jnp.maximum(lam, 1e-20))
    )
    return n * jnp.mean(quad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _slq_logdet_cc(
    matvec_c, precond_c, n_mv, num_steps, cg_tol, cg_max_iter, num_nodes,
    probes, *consts
):
    return slq_logdet_raw(
        lambda v: matvec_c(v, *consts[:n_mv]), probes, num_steps,
        num_nodes=num_nodes,
    )


def _slq_fwd(
    matvec_c, precond_c, n_mv, num_steps, cg_tol, cg_max_iter, num_nodes,
    probes, *consts
):
    val = _slq_logdet_cc(
        matvec_c, precond_c, n_mv, num_steps, cg_tol, cg_max_iter, num_nodes,
        probes, *consts
    )
    return val, (probes, consts)


def _slq_bwd(
    matvec_c, precond_c, n_mv, num_steps, cg_tol, cg_max_iter, num_nodes,
    res, g
):
    probes, consts = res
    mvc, pc = consts[:n_mv], consts[n_mv:]
    precond = None if precond_c is None else (lambda v: precond_c(v, *pc))
    p = probes.shape[1]
    solves = cg_raw(
        lambda v: matvec_c(v, *mvc), probes, cg_tol, cg_max_iter,
        precond=precond,
    )
    solves = jax.lax.stop_gradient(solves)
    # d logdet = (1/p) sum_i (Q^{-1} z_i)' dQ z_i
    _, vjp_fn = jax.vjp(
        lambda *c: jnp.sum(solves * matvec_c(probes, *c)) / p, *mvc
    )
    consts_bar = vjp_fn(g)
    # The preconditioner never changes solutions: zero cotangents.
    pc_bar = tuple(jnp.zeros_like(c) for c in pc)
    return (jnp.zeros_like(probes), *consts_bar, *pc_bar)


_slq_logdet_cc.defvjp(_slq_fwd, _slq_bwd)


def slq_logdet(
    matvec: Callable,
    probes: jnp.ndarray,
    num_steps: int,
    cg_tol: float = 1e-2,
    cg_max_iter: int = 1000,
    precond: Callable = None,
    num_nodes: int = None,
):
    """Stochastic log det of the SPD operator behind ``matvec``.

    Differentiable w.r.t. traced values captured by ``matvec`` (unbiased
    Hutchinson gradient); the probes themselves get a zero cotangent.

    ``precond``: optional M^{-1} matvec for the backward CG solves (the
    forward Lanczos quadrature stays unpreconditioned — preconditioned SLQ
    would need the generalized Lanczos recurrence plus a logdet(M)
    correction, while convergence of the *gradient* solves is where the
    ill-conditioned cost lives).
    ``num_nodes``: true trace dimension when the probes live in a padded
    space with zeroed padding rows (e.g. row-sharded vectors) — the
    Hutchinson scaling must count only the rows the probes actually cover.
    """
    matvec_c, mv_consts = jax.closure_convert(matvec, probes)
    if precond is None:
        precond_c, p_consts = None, ()
    else:
        precond_c, p_consts = jax.closure_convert(precond, probes)
    return _slq_logdet_cc(
        matvec_c,
        precond_c,
        len(mv_consts),
        int(num_steps),
        float(cg_tol),
        int(cg_max_iter),
        None if num_nodes is None else int(num_nodes),
        probes,
        *mv_consts,
        *p_consts,
    )


def rademacher_probes(key, n: int, num_probes: int, dtype=jnp.float32):
    return jax.random.rademacher(key, (n, num_probes), dtype=dtype)


# ---------------------------------------------------------------------------
# Preconditioned SLQ (true mBCG semantics)
# ---------------------------------------------------------------------------


def pcg_tridiag_batched(matvec, minv, b, num_steps: int):
    """Preconditioned-CG coefficient extraction, batched over RHS columns.

    Runs ``num_steps`` of PCG on A x = b with preconditioner M^{-1} and
    records the (alpha_k, beta_k) recurrence coefficients. The classic
    CG-Lanczos identity turns them into the tridiagonalization T of
    B = M^{-1/2} A M^{-1/2} in the Krylov basis started at
    M^{-1/2} b / ||M^{-1/2} b|| — exactly the t_mats GPyTorch's
    ``linear_cg`` returns for its mBCG quadrature.

    Returns (alphas [m, P], betas [m, P], valid [m, P]).
    """
    n, p = b.shape
    num_steps = min(num_steps, n)

    def step(carry, _):
        x, r, z, pvec, rz, alive = carry
        ap = matvec(pvec)
        pap = jnp.sum(pvec * ap, axis=0)
        alive_now = jnp.logical_and(alive, rz > 1e-30)
        alive_now = jnp.logical_and(alive_now, pap > 0.0)
        safe_pap = jnp.where(alive_now, pap, 1.0)
        alpha = jnp.where(alive_now, rz / safe_pap, 1.0)
        x = x + alpha[None, :] * pvec
        r = r - alpha[None, :] * ap
        z = minv(r)
        rz_new = jnp.sum(r * z, axis=0)
        rel = rz_new / jnp.where(rz == 0, 1.0, rz)
        beta = jnp.where(alive_now, jnp.maximum(rel, 0.0), 0.0)
        alive_next = jnp.logical_and(alive_now, rz_new > 1e-30)
        pvec = z + beta[None, :] * pvec
        carry = (x, r, z, pvec, jnp.where(alive_next, rz_new, rz), alive_next)
        return carry, (alpha, beta, alive_now)

    z0 = minv(b)
    rz0 = jnp.sum(b * z0, axis=0)
    init = (
        jnp.zeros_like(b),
        b,
        z0,
        z0,
        rz0,
        jnp.ones((p,), bool),
    )
    _, (alphas, betas, valid) = jax.lax.scan(step, init, None, length=num_steps)
    return alphas, betas, valid


def _pcg_t_quadrature(alphas, betas, valid, f):
    """e1' f(T) e1 per probe from PCG coefficients:
    T[k,k] = 1/alpha_k + beta_{k-1}/alpha_{k-1},  T[k,k+1] = sqrt(beta_k)/alpha_k.
    Steps after a breakdown become decoupled identity blocks (f(1) gets ~zero
    e1-weight for log), matching ``_tridiag_e1_quadrature``'s convention."""

    def one(a, bt, v):
        safe_a = jnp.where(v, a, 1.0)
        diag = 1.0 / safe_a
        diag = diag + jnp.concatenate(
            [jnp.zeros((1,)), jnp.where(v[:-1], bt[:-1] / safe_a[:-1], 0.0)]
        )
        diag = jnp.where(v, diag, 1.0)
        off = jnp.where(
            jnp.logical_and(v[:-1], v[1:]),
            jnp.sqrt(jnp.maximum(bt[:-1], 0.0)) / safe_a[:-1],
            0.0,
        )
        t = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
        evals, evecs = jnp.linalg.eigh(t)
        w = evecs[0, :] ** 2
        return jnp.sum(w * f(evals))

    return jax.vmap(one, in_axes=(1, 1, 1))(alphas, betas, valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _slq_mbcg_cc(
    matvec_c, papply_c, n_mv, num_steps, cg_tol, cg_max_iter,
    zm, zr, mlogdet, *consts
):
    mvc, pc = consts[:n_mv], consts[n_mv:]
    minv = lambda v: papply_c(v, *pc)  # noqa: E731
    gamma = jnp.sum(zm * minv(zm), axis=0)  # ||M^{-1/2} z||^2 per probe
    alphas, betas, valid = pcg_tridiag_batched(
        lambda v: matvec_c(v, *mvc), minv, zm, num_steps
    )
    quad = _pcg_t_quadrature(
        alphas, betas, valid, lambda lam: jnp.log(jnp.maximum(lam, 1e-20))
    )
    return mlogdet + jnp.mean(gamma * quad)


def _slq_mbcg_fwd(
    matvec_c, papply_c, n_mv, num_steps, cg_tol, cg_max_iter,
    zm, zr, mlogdet, *consts
):
    val = _slq_mbcg_cc(
        matvec_c, papply_c, n_mv, num_steps, cg_tol, cg_max_iter,
        zm, zr, mlogdet, *consts
    )
    return val, (zr, consts)


def _slq_mbcg_bwd(
    matvec_c, papply_c, n_mv, num_steps, cg_tol, cg_max_iter, res, g
):
    zr, consts = res
    mvc, pc = consts[:n_mv], consts[n_mv:]
    minv = lambda v: papply_c(v, *pc)  # noqa: E731
    p = zr.shape[1]
    solves = cg_raw(
        lambda v: matvec_c(v, *mvc), zr, cg_tol, cg_max_iter, precond=minv
    )
    solves = jax.lax.stop_gradient(solves)
    # d logdet(A) = (1/p) sum_i (A^{-1} z_i)' dA z_i with E[z z'] = I —
    # the same unbiased Hutchinson gradient as the unpreconditioned path;
    # the preconditioner (and its logdet correction, which only recenters
    # the ESTIMATOR, not the estimand) gets zero cotangents.
    _, vjp_fn = jax.vjp(
        lambda *c: jnp.sum(solves * matvec_c(zr, *c)) / p, *mvc
    )
    consts_bar = vjp_fn(g)
    pc_bar = tuple(jnp.zeros_like(c) for c in pc)
    return (
        jnp.zeros_like(zr),  # zm cotangent (same shape as zr)
        jnp.zeros_like(zr),
        jnp.zeros(()),
        *consts_bar,
        *pc_bar,
    )


_slq_mbcg_cc.defvjp(_slq_mbcg_fwd, _slq_mbcg_bwd)


def slq_logdet_mbcg(
    matvec: Callable,
    precond,
    key,
    num_probes: int,
    num_steps: int,
    cg_tol: float = 1e-2,
    cg_max_iter: int = 1000,
):
    """Preconditioned stochastic Lanczos quadrature — GPyTorch's full mBCG
    logdet semantics (Gardner et al. 2018), engaged by the reference through
    ``inv_quad_logdet`` whenever a preconditioner exists:

        logdet(A) = logdet(M) + tr log(M^{-1/2} A M^{-1/2})
                  ~= M.logdet() + mean_i [ z_i' M^{-1} z_i * e1' log(T_i) e1 ]

    with probes z_i ~ (E[zz'] = M) drawn by ``precond.sample`` and T_i the
    PCG-coefficient tridiagonalization. A good M concentrates the
    preconditioned spectrum, so the SAME Lanczos depth yields a far more
    accurate quadrature than the plain path on ill-conditioned operators.

    ``precond``: an object with ``apply`` / ``sample`` / ``logdet``
    (ops.pivchol: DiagPrecond, LowRankDiagPrecond, DeflationPrecond).
    Differentiable w.r.t. traced values captured by ``matvec`` (unbiased
    Hutchinson gradient on separate plain Rademacher probes, solved with
    M-preconditioned CG); the preconditioner gets zero cotangents.
    """
    precond = jax.tree_util.tree_map(jax.lax.stop_gradient, precond)
    k_m, k_r = jax.random.split(jnp.asarray(key))
    zm = precond.sample(k_m, num_probes)
    # gradient probes: E[zz'] = I on the operator's SUPPORT — on padded row
    # spaces (mesh models) the preconditioner masks them, since components
    # in the operator's null space would stall the gradient CG.
    zr = precond.unit_sample(k_r, num_probes)
    mlogdet = precond.logdet()
    matvec_c, mv_consts = jax.closure_convert(matvec, zm)
    papply_c, p_consts = jax.closure_convert(precond.apply, zm)
    return _slq_mbcg_cc(
        matvec_c,
        papply_c,
        len(mv_consts),
        int(num_steps),
        float(cg_tol),
        int(cg_max_iter),
        zm,
        zr,
        mlogdet,
        *mv_consts,
        *p_consts,
    )
