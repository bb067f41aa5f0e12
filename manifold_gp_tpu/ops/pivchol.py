"""Preconditioner factory: partial pivoted Cholesky, Jacobi, deflation.

GPyTorch's mBCG preconditions solves AND the stochastic Lanczos quadrature
with a rank-r partial pivoted Cholesky whenever the operator is an
``AddedDiagLinearOperator`` (covariance + noise; rank from
``settings.max_preconditioner_size`` = 15). The reference rides that
machinery in ``vanilla_train`` and the eval-time NLL
(``utils/test_model.py:23`` — the posterior covariance is low-rank + noise),
while its IMGP *training* operator stack (NoiseWrapper(Scale(...)),
``models/riemann_gp.py:32-39``) is a plain custom LinearOperator whose
``_preconditioner()`` is None — i.e. the reference's own training mBCG is
unpreconditioned. This module supplies the full mBCG-parity preconditioner
family for OUR engine, all behind one protocol consumed by CG
(``apply``) and by the preconditioned SLQ quadrature in ops.slq
(``apply`` + ``sample`` + ``logdet``):

  * ``DiagPrecond``          — Jacobi M = diag(d); the natural precision-form
                               default (diagonals are cheaply computable);
  * ``LowRankDiagPrecond``   — M = L L' + diag(d): the pivoted-Cholesky
                               preconditioner (GPyTorch keeps sigma^2 I as
                               the diagonal part; we keep the CLAMPED
                               residual diagonal, which reduces to the same
                               thing on covariance+noise operators and stays
                               SPD in precision form);
  * ``pivoted_cholesky``     — rank-r greedy factorization from matvecs
                               alone (one batched matvec per step, lax.scan);
  * ``make_deflation_precond`` — M = V f(Lam) V' + tau (I - V V'): deflates
                               the known low Laplacian modes, the regime
                               (uniform density, small graphbandwidth,
                               nu=3) where both Jacobi and pivoted Cholesky
                               are provably inert. No reference analogue —
                               the spectral basis the framework already
                               maintains makes it nearly free.

All constructions are wrapped in ``stop_gradient``: a preconditioner never
changes solutions, so its parameter-dependence must not leak into gradients
(matching the zero-cotangent convention of ops.cg / ops.slq).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class DiagPrecond:
    """M = diag(d) (Jacobi)."""

    d: jnp.ndarray  # [n] > 0

    def apply(self, v):
        d = self.d if v.ndim == 1 else self.d[:, None]
        return v / d

    def logdet(self):
        return jnp.sum(jnp.log(self.d))

    def sample(self, key, num_probes: int):
        """z with E[z z'] = M: sqrt(d) * Rademacher."""
        z = jax.random.rademacher(key, (self.d.shape[0], num_probes), jnp.float32)
        return jnp.sqrt(self.d)[:, None] * z

    def unit_sample(self, key, num_probes: int):
        """z with E[z z'] = I on the operator's support (plain Rademacher
        here) — the probes the Hutchinson gradient identity needs."""
        return jax.random.rademacher(
            key, (self.d.shape[0], num_probes), jnp.float32
        )

    def tree_flatten(self):
        return (self.d,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(DiagPrecond)


@dataclasses.dataclass(frozen=True)
class MaskedDiagPrecond:
    """Jacobi preconditioner on a padded row space: M = diag(d) restricted to
    the support rows (mask = 1), identity elsewhere. Samples are supported on
    the mask and the logdet counts only support rows, so the mBCG quadrature
    on padded row-sharded vectors (models._mll_loss_sharded) estimates the
    true support-block logdet."""

    d: jnp.ndarray  # [Np] > 0 (1.0 fill off support)
    mask: jnp.ndarray  # [Np] 1.0 support / 0.0 padding

    def apply(self, v):
        d = self.d if v.ndim == 1 else self.d[:, None]
        return v / d

    def logdet(self):
        return jnp.sum(self.mask * jnp.log(self.d))

    def sample(self, key, num_probes: int):
        z = jax.random.rademacher(key, (self.d.shape[0], num_probes), jnp.float32)
        return (self.mask * jnp.sqrt(self.d))[:, None] * z

    def unit_sample(self, key, num_probes: int):
        """Support-masked Rademacher: E[z z'] = I on the support rows.
        Padding components would make the gradient CG run on the operator's
        null space (the padded rows map to zero) and never converge."""
        z = jax.random.rademacher(key, (self.d.shape[0], num_probes), jnp.float32)
        return self.mask[:, None] * z

    def tree_flatten(self):
        return (self.d, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(MaskedDiagPrecond)


@dataclasses.dataclass(frozen=True)
class LowRankDiagPrecond:
    """M = L L' + diag(d), applied via Woodbury.

    M^{-1} = D^{-1} - D^{-1} L C^{-1} L' D^{-1},  C = I_r + L' D^{-1} L
    log det M = log det D + log det C
    """

    L: jnp.ndarray  # [n, r]
    d: jnp.ndarray  # [n] > 0 (clamped residual diagonal)
    chol_c: jnp.ndarray  # [r, r] lower Cholesky of the capacitance C

    def apply(self, v):
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        div = vv / self.d[:, None]
        w = jnp.matmul(self.L.T, div, precision=_HIGHEST)
        u = jax.scipy.linalg.cho_solve((self.chol_c, True), w)
        out = div - jnp.matmul(self.L, u, precision=_HIGHEST) / self.d[:, None]
        return out[:, 0] if squeeze else out

    def logdet(self):
        return jnp.sum(jnp.log(self.d)) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(self.chol_c))
        )

    def sample(self, key, num_probes: int):
        """z = L z1 + sqrt(d) z2 with independent Rademacher z1, z2:
        E[z z'] = L L' + diag(d) = M."""
        k1, k2 = jax.random.split(key)
        n, r = self.L.shape
        z1 = jax.random.rademacher(k1, (r, num_probes), jnp.float32)
        z2 = jax.random.rademacher(k2, (n, num_probes), jnp.float32)
        return (
            jnp.matmul(self.L, z1, precision=_HIGHEST)
            + jnp.sqrt(self.d)[:, None] * z2
        )

    def unit_sample(self, key, num_probes: int):
        return jax.random.rademacher(
            key, (self.L.shape[0], num_probes), jnp.float32
        )

    def tree_flatten(self):
        return (self.L, self.d, self.chol_c), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(LowRankDiagPrecond)


@dataclasses.dataclass(frozen=True)
class MaskedLowRankDiagPrecond:
    """Pivoted-Cholesky preconditioner on a padded row space:
    M = L L' + diag(d) restricted to the support rows (mask = 1), identity
    elsewhere. The mesh analogue of ``LowRankDiagPrecond``: L's off-support
    rows are structurally zero (pivots are drawn from the support diagonal),
    d carries 1.0 fill off support so the Woodbury division is the identity
    there, and logdet / probe sampling count only support rows — so the mBCG
    quadrature on padded row-sharded vectors estimates the true support-block
    logdet (the padded operator maps padding rows to zero)."""

    L: jnp.ndarray  # [Np, r], zero rows off support
    d: jnp.ndarray  # [Np] > 0, 1.0 fill off support
    chol_c: jnp.ndarray  # [r, r] lower Cholesky of C = I_r + L' D^{-1} L
    mask: jnp.ndarray  # [Np] 1.0 support / 0.0 padding

    def apply(self, v):
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        div = vv / self.d[:, None]
        w = jnp.matmul(self.L.T, div, precision=_HIGHEST)
        u = jax.scipy.linalg.cho_solve((self.chol_c, True), w)
        out = div - jnp.matmul(self.L, u, precision=_HIGHEST) / self.d[:, None]
        return out[:, 0] if squeeze else out

    def logdet(self):
        return jnp.sum(self.mask * jnp.log(self.d)) + 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(self.chol_c))
        )

    def sample(self, key, num_probes: int):
        """z = L z1 + mask * sqrt(d) z2 — E[z z'] = M on the support block."""
        k1, k2 = jax.random.split(key)
        n, r = self.L.shape
        z1 = jax.random.rademacher(k1, (r, num_probes), jnp.float32)
        z2 = jax.random.rademacher(k2, (n, num_probes), jnp.float32)
        return (
            jnp.matmul(self.L, z1, precision=_HIGHEST)
            + (self.mask * jnp.sqrt(self.d))[:, None] * z2
        )

    def unit_sample(self, key, num_probes: int):
        z = jax.random.rademacher(
            key, (self.L.shape[0], num_probes), jnp.float32
        )
        return self.mask[:, None] * z

    def tree_flatten(self):
        return (self.L, self.d, self.chol_c, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(MaskedLowRankDiagPrecond)


def pivoted_cholesky(matvec: Callable, diag0: jnp.ndarray, rank: int):
    """Rank-r partial pivoted Cholesky of the SPD operator behind ``matvec``
    from matvecs alone: A ~= L L' + diag(d_res).

    Greedy largest-residual-diagonal pivoting (the classic algorithm GPyTorch
    runs on AddedDiag operators, ``linear_operator.utils.pivoted_cholesky``);
    each of the r steps applies the operator to one pivot one-hot (a [n, 1]
    matvec — the streaming SpMV pads it to a lane anyway). Runs under jit as
    a lax.scan; the whole construction is ``stop_gradient``-ed (argmax pivots
    are non-differentiable, and preconditioners must not leak gradients).

    Returns (L [n, r], d_res [n] >= 0).
    """
    n = diag0.shape[0]
    rank = int(min(rank, n))

    def step(carry, i):
        bigl, d = carry
        j = jnp.argmax(d)
        e = jnp.zeros((n,), diag0.dtype).at[j].set(1.0)
        col = matvec(e[:, None])[:, 0]
        col = col - jnp.matmul(bigl, bigl[j], precision=_HIGHEST)
        pivot = jnp.maximum(d[j], 1e-12)
        ell = col * jax.lax.rsqrt(pivot)
        # degenerate pivot (operator numerically rank-deficient): stop adding
        ell = jnp.where(d[j] > 1e-10 * jnp.max(diag0), ell, 0.0)
        bigl = bigl.at[:, i].set(ell)
        d = jnp.maximum(d - ell * ell, 0.0)
        d = d.at[j].set(0.0)
        return (bigl, d), None

    (bigl, d_res), _ = jax.lax.scan(
        step,
        (jnp.zeros((n, rank), diag0.dtype), diag0),
        jnp.arange(rank),
    )
    return jax.lax.stop_gradient(bigl), jax.lax.stop_gradient(d_res)


def make_pivchol_precond(
    matvec: Callable, diag0: jnp.ndarray, rank: int, min_diag_frac: float = 1e-4
) -> LowRankDiagPrecond:
    """Build the pivoted-Cholesky preconditioner M = L L' + diag(d_clamped)
    for the operator behind ``matvec`` (with known/approximate diagonal
    ``diag0``).

    The residual diagonal is floored at its own MEAN (not just epsilon):
    pivoted rows have exactly-zero residuals, and tiny d entries make the
    Woodbury capacitance C = I + L' D^{-1} L unfactorizable in f32
    (kappa(C) ~ ||L||^2 / d_min). The mean-residual floor reproduces
    GPyTorch's P = L L' + sigma^2 I on covariance+noise operators (residual
    ~= sigma^2 there) while staying SPD in precision form."""
    bigl, d_res = pivoted_cholesky(matvec, diag0, rank)
    floor = jnp.maximum(
        jnp.mean(d_res),
        min_diag_frac * jnp.mean(jax.lax.stop_gradient(diag0)),
    )
    d = jnp.maximum(d_res, floor)
    r = bigl.shape[1]
    c = jnp.eye(r, dtype=bigl.dtype) + jnp.matmul(
        bigl.T, bigl / d[:, None], precision=_HIGHEST
    )
    chol_c = jnp.linalg.cholesky(c)
    return LowRankDiagPrecond(L=bigl, d=d, chol_c=chol_c)


def make_pivchol_precond_masked(
    matvec: Callable,
    diag0: jnp.ndarray,
    mask: jnp.ndarray,
    rank: int,
    min_diag_frac: float = 1e-4,
) -> MaskedLowRankDiagPrecond:
    """Masked/padded-row-space ``make_pivchol_precond`` for mesh operators.

    ``matvec`` is the padded composed operator (padding rows map to zero and
    support one-hots produce support-only columns — the composed stack is a
    polynomial in Q with no constant term, and the masked Schur output is
    explicitly mask_l-restricted). ``diag0`` is the padded operator diagonal;
    it is zeroed off support before pivoting so the greedy argmax never
    selects a padding row, the residual then stays identically zero there,
    and the clamp floor / capacitance are computed from support rows only.
    """
    diag0_s = jnp.where(mask > 0, diag0, 0.0)
    bigl, d_res = pivoted_cholesky(matvec, diag0_s, rank)
    n_sup = jnp.maximum(jnp.sum(mask), 1.0)
    floor = jnp.maximum(
        jnp.sum(d_res * mask) / n_sup,
        min_diag_frac
        * jnp.sum(jax.lax.stop_gradient(diag0_s) * mask)
        / n_sup,
    )
    d = jnp.where(mask > 0, jnp.maximum(d_res, floor), 1.0)
    r = bigl.shape[1]
    c = jnp.eye(r, dtype=bigl.dtype) + jnp.matmul(
        bigl.T, bigl / d[:, None], precision=_HIGHEST
    )
    chol_c = jnp.linalg.cholesky(c)
    return MaskedLowRankDiagPrecond(
        L=bigl, d=d, chol_c=chol_c, mask=jax.lax.stop_gradient(mask)
    )


@dataclasses.dataclass(frozen=True)
class DeflationPrecond:
    """M = V diag(q) V' + tau (I - V V') with orthonormal V [n, m].

    Matches the operator exactly on span(V) (q = the operator's eigenvalues
    there) and is a scalar tau on the complement:
      M^{-1} = V diag(1/q - 1/tau) V' + (1/tau) I
      log det M = sum log q + (n - m) log tau
      M^{1/2} z = V diag(sqrt(q) - sqrt(tau)) V' z + sqrt(tau) z
    """

    v: jnp.ndarray  # [n, m] orthonormal columns
    q: jnp.ndarray  # [m] > 0 deflated eigenvalues
    tau: jnp.ndarray  # scalar bulk eigenvalue scale

    def apply(self, x):
        squeeze = x.ndim == 1
        xx = x[:, None] if squeeze else x
        w = jnp.matmul(self.v.T, xx, precision=_HIGHEST)
        out = xx / self.tau + jnp.matmul(
            self.v, (1.0 / self.q - 1.0 / self.tau)[:, None] * w,
            precision=_HIGHEST,
        )
        return out[:, 0] if squeeze else out

    def logdet(self):
        n, m = self.v.shape
        return jnp.sum(jnp.log(self.q)) + (n - m) * jnp.log(self.tau)

    def sample(self, key, num_probes: int):
        z = jax.random.rademacher(
            key, (self.v.shape[0], num_probes), jnp.float32
        )
        w = jnp.matmul(self.v.T, z, precision=_HIGHEST)
        return jnp.sqrt(self.tau) * z + jnp.matmul(
            self.v, (jnp.sqrt(self.q) - jnp.sqrt(self.tau))[:, None] * w,
            precision=_HIGHEST,
        )

    def unit_sample(self, key, num_probes: int):
        return jax.random.rademacher(
            key, (self.v.shape[0], num_probes), jnp.float32
        )

    def tree_flatten(self):
        return (self.v, self.q, self.tau), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(DeflationPrecond)


@dataclasses.dataclass(frozen=True)
class MaskedDeflationPrecond:
    """Deflation preconditioner on a padded row space: M = V diag(q) V' +
    tau (I - V V') on the support rows (mask = 1), identity on padding.
    V's rows are structurally zero off support (eigenvectors embedded at
    their support rows), so V' x never sees padding; the complement term
    x / tau is masked back to the identity there, logdet counts
    sum(mask) - m bulk modes, and samples are supported on the mask."""

    v: jnp.ndarray  # [Np, m] orthonormal columns, zero rows off support
    q: jnp.ndarray  # [m] > 0 deflated eigenvalues
    tau: jnp.ndarray  # scalar bulk eigenvalue scale
    mask: jnp.ndarray  # [Np] 1.0 support / 0.0 padding

    def apply(self, x):
        squeeze = x.ndim == 1
        xx = x[:, None] if squeeze else x
        w = jnp.matmul(self.v.T, xx, precision=_HIGHEST)
        on = xx / self.tau + jnp.matmul(
            self.v, (1.0 / self.q - 1.0 / self.tau)[:, None] * w,
            precision=_HIGHEST,
        )
        out = jnp.where(self.mask[:, None] > 0, on, xx)
        return out[:, 0] if squeeze else out

    def logdet(self):
        m = self.v.shape[1]
        n_sup = jnp.sum(self.mask)
        return jnp.sum(jnp.log(self.q)) + (n_sup - m) * jnp.log(self.tau)

    def sample(self, key, num_probes: int):
        z = self.mask[:, None] * jax.random.rademacher(
            key, (self.v.shape[0], num_probes), jnp.float32
        )
        w = jnp.matmul(self.v.T, z, precision=_HIGHEST)
        return jnp.sqrt(self.tau) * z + jnp.matmul(
            self.v, (jnp.sqrt(self.q) - jnp.sqrt(self.tau))[:, None] * w,
            precision=_HIGHEST,
        )

    def unit_sample(self, key, num_probes: int):
        z = jax.random.rademacher(
            key, (self.v.shape[0], num_probes), jnp.float32
        )
        return self.mask[:, None] * z

    def tree_flatten(self):
        return (self.v, self.q, self.tau, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(MaskedDeflationPrecond)


@dataclasses.dataclass(frozen=True)
class ConjugatedPrecond:
    """M = diag(d) M_inner diag(d) — a diagonal similarity wrap of any
    preconditioner object.

    Built for the randomwalk operator family: the telescoped randomwalk
    Matérn stack is Q_rw = D^{1/2} (shift I + L_sym)^nu D^{1/2}
    (ops/matern.py block path), so a preconditioner for the SYMMETRIC core
    extends to the randomwalk stack by conjugating with d = sqrt(deg). The
    noise composition interleaves with D (Q_rw^2 != D^{1/2} A^{2nu} D^{1/2})
    so the wrap is APPROXIMATE for the noisy stack — exactly the
    degree-conjugated approximate deflation round-4 VERDICT item 9 asked to
    measure; a preconditioner only needs a spectrally-reasonable SPD
    surrogate (tests pin the measured iteration savings).

      M^{-1} x  = D^{-1} M_i^{-1} D^{-1} x           (D = diag(d))
      logdet M  = logdet M_i + 2 sum log d
      F = D M_i^{1/2}  =>  F F' = M  (sample = d * inner.sample)
    """

    d: jnp.ndarray  # [n] > 0 conjugation diagonal (1.0 on padding rows)
    inner: object  # any precond object (apply/sample/unit_sample/logdet)

    def apply(self, v):
        d = self.d if v.ndim == 1 else self.d[:, None]
        return self.inner.apply(v / d) / d

    def logdet(self):
        return self.inner.logdet() + 2.0 * jnp.sum(jnp.log(self.d))

    def sample(self, key, num_probes: int):
        d = self.d[:, None]
        return d * self.inner.sample(key, num_probes)

    def unit_sample(self, key, num_probes: int):
        return self.inner.unit_sample(key, num_probes)

    def tree_flatten(self):
        return (self.d, self.inner), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node_class(ConjugatedPrecond)


def make_deflation_precond(eigvec, q, tau, mask=None):
    """Deflation preconditioner from m known (orthonormal) eigenvectors of
    the operator with eigenvalues ``q`` and bulk scale ``tau`` (e.g. the
    geometric mean of the remaining spectrum's endpoints). All inputs are
    stop_gradient-ed. With ``mask`` (padded row spaces — mesh kernels, where
    ``eigvec`` rows are embedded at support rows and zero elsewhere) returns
    the :class:`MaskedDeflationPrecond` form."""
    v = jax.lax.stop_gradient(eigvec)
    q = jnp.maximum(jax.lax.stop_gradient(q), 1e-20)
    tau = jnp.reshape(jax.lax.stop_gradient(tau), ())
    if mask is not None:
        return MaskedDeflationPrecond(
            v=v, q=q, tau=tau, mask=jax.lax.stop_gradient(mask)
        )
    return DeflationPrecond(v=v, q=q, tau=tau)
