"""Matrix-free Lanczos eigensolver for the spectral basis.

The reference computes its spectral basis with a dense ``torch.linalg.eigh``
(``manifold_gp/kernels/riemann_kernel.py:121-124``) — an O(N^3) cliff — but
keeps a Lanczos path through linear_operator's ``diagonalization`` with
``max_root_decomposition_size = 3 * num_modes``
(``manifold_gp/operators/graph_laplacian_operator.py:132-144``). Here the
matrix-free path is a first-class solver so the basis scales with the sparse
matvec instead of N^3:

  * single-vector Lanczos with FULL reorthogonalization (num_steps is a few
    hundred at most, so the [N, m] basis fits comfortably in HBM and the
    reorth GEMMs run on the MXU);
  * one extra reorthogonalization pass per step (classical twice-is-enough)
    keeps the basis orthonormal to fp32 roundoff — necessary because the
    smallest Laplacian eigenvalues we want are the slowest to converge;
  * Ritz pairs of the [m, m] tridiagonal give the smallest ``num_modes``
    eigenpairs; eigenvectors are recovered as V @ S on the MXU.

Everything is a fixed-shape ``lax.fori_loop`` — jit-compatible, and the
matvec may be the sharded SpMV (reorth dots then lower to ICI psums).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST
# Relative breakdown threshold: fp32 residuals after double
# reorthogonalization carry ~1e-7-relative roundoff noise; normalizing such a
# residual would inject a garbage direction, so stop well above it.
_BREAKDOWN_RTOL = 1e-5


def lanczos_eigh(
    matvec: Callable,
    v0: jnp.ndarray,
    num_modes: int,
    num_steps: int,
):
    """Smallest ``num_modes`` eigenpairs of the symmetric operator behind
    ``matvec`` via full-reorthogonalization Lanczos.

    Args:
      matvec: symmetric linear map [N] -> [N] (or [N, 1] -> [N, 1]).
      v0: [N] start vector (any nonzero vector; randomized by the caller).
      num_modes: number of smallest eigenpairs to return.
      num_steps: Krylov dimension m >= num_modes (reference uses
        3 * num_modes, graph_laplacian_operator.py:139).

    Returns:
      (eigval [num_modes], eigvec [N, num_modes]) sorted ascending.
    """
    n = v0.shape[0]
    m = int(min(num_steps, n))
    num_modes = int(min(num_modes, m))

    def mv(q):
        out = matvec(q)
        return out.reshape(q.shape)

    q0 = v0 / jnp.linalg.norm(v0)

    def step(j, carry):
        basis, alphas, betas, q, alive, scale = carry
        basis = jax.lax.dynamic_update_slice(basis, q[None, :], (j, 0))
        w = mv(q)
        alpha = jnp.dot(q, w, precision=_HIGHEST)
        # Full reorthogonalization (two passes): projects out *all* previous
        # basis vectors, including the alpha/beta terms of the three-term
        # recurrence. Unfilled rows of ``basis`` are zero, so they project
        # out nothing.
        for _ in range(2):
            w = w - jnp.matmul(
                basis.T,
                jnp.matmul(basis, w, precision=_HIGHEST),
                precision=_HIGHEST,
            )
        beta = jnp.linalg.norm(w)
        # Running estimate of the operator scale; a residual this far below
        # it is reorthogonalization roundoff, i.e. the Krylov space is
        # exhausted.
        scale = jnp.maximum(scale, jnp.abs(alpha) + beta)
        alive_next = jnp.logical_and(alive, beta > _BREAKDOWN_RTOL * scale)
        q_next = jnp.where(alive_next, w / jnp.where(beta == 0, 1.0, beta), 0.0)
        alphas = alphas.at[j].set(jnp.where(alive, alpha, 0.0))
        betas = betas.at[j].set(jnp.where(alive_next, beta, 0.0))
        return basis, alphas, betas, q_next, alive_next, scale

    basis0 = jnp.zeros((m, n), q0.dtype)
    alphas0 = jnp.zeros((m,), q0.dtype)
    betas0 = jnp.zeros((m,), q0.dtype)
    basis, alphas, betas, _, _, _ = jax.lax.fori_loop(
        0,
        m,
        step,
        (basis0, alphas0, betas0, q0, jnp.bool_(True), jnp.float32(0.0)),
    )

    # Ritz pairs of the tridiagonal. After a breakdown the trailing block is
    # an identity-decoupled zero block (alpha=0, beta=0); those spurious zero
    # Ritz values must not displace genuine small eigenvalues, so push them
    # to +inf before sorting. A breakdown at step j means the Krylov space
    # was exhausted with j exact eigenpairs.
    filled = betas > 0
    # Row j of the basis is valid if it was ever written with a live vector:
    # row 0 always is, row j>0 iff beta_{j-1} survived.
    valid = jnp.concatenate([jnp.ones((1,), bool), filled[:-1]])
    t = (
        jnp.diag(jnp.where(valid, alphas, 0.0))
        + jnp.diag(betas[:-1] * filled[:-1], 1)
        + jnp.diag(betas[:-1] * filled[:-1], -1)
    )
    evals, evecs = jnp.linalg.eigh(t)
    # Ritz weight of invalid rows is zero, so spurious pairs have zero
    # basis support; detect them by their (near-)zero Ritz residual weight.
    support = jnp.sum(jnp.square(evecs) * valid[:, None], axis=0)
    evals = jnp.where(support > 0.5, evals, jnp.inf)
    order = jnp.argsort(evals)
    sel = order[:num_modes]
    ritz_val = evals[sel]
    ritz_vec = jnp.matmul(basis.T, evecs[:, sel], precision=_HIGHEST)
    ritz_vec = ritz_vec / jnp.linalg.norm(ritz_vec, axis=0, keepdims=True)
    return ritz_val, ritz_vec


def lobpcg_smallest(
    matvec: Callable,
    x0: jnp.ndarray,
    upper_bound,
    max_iter: int = 200,
    tol: Optional[float] = 0.0,
):
    """Smallest-m eigenpairs of a symmetric PSD operator via block LOBPCG on
    the shifted operator ``upper_bound*I - A`` (jax.experimental.sparse.linalg).

    Unlike single-vector Lanczos (``lanczos_eigh``), the block iteration
    resolves degenerate/clustered eigenvalues — exactly the structure of the
    low graph-Laplacian spectrum on product-like manifolds (paired harmonics)
    and multi-component graphs. This is the primary large-N spectral-basis
    solver; ``upper_bound`` is any bound on the largest eigenvalue (use
    ``gershgorin_bound``).

    Args:
      x0: [N, m] start block (randomized by the caller).
      upper_bound: scalar >= lambda_max(A).
      tol: lobpcg_standard residual tolerance. Default 0.0 = always run
        max_iter iterations: the library measures convergence relative to
        the SHIFTED eigenvalues (upper_bound - lambda ~ upper_bound), which
        declares the smallest-lambda modes converged ~1000x too early —
        measured at N=10k the default-tol basis was off by 25x on the low
        spectrum while tol=0.0 matches an f64 ARPACK oracle.
    Returns: (eigval [m] ascending, eigvec [N, m]).
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    c = jnp.reshape(upper_bound, ())

    def shifted(v):
        return c * v - matvec(v)

    theta, u, _ = lobpcg_standard(shifted, x0, m=max_iter, tol=tol)
    vals = c - theta
    order = jnp.argsort(vals)
    return vals[order], u[:, order]
