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


def _whiten(x):
    """Gram-eigh orthonormalization (twice for fp32 stability): the Gram
    reduction is one [m, m] psum-able einsum, so the same code runs on
    row-sharded blocks (tall-skinny Householder QR does not shard). eigh
    whitening, unlike Cholesky-QR, survives the numerically rank-deficient
    Grams a strong Chebyshev filter produces (all columns collapse toward
    the dominant band): near-null directions are clamped, not fatal."""
    for _ in range(2):
        g = jnp.einsum("ni,nj->ij", x, x, precision=_HIGHEST)
        lam, q = jnp.linalg.eigh((g + g.T) / 2.0)
        lam = jnp.maximum(lam, 1e-12 * jnp.max(lam))
        x = jnp.matmul(
            x, q / jnp.sqrt(lam)[None, :], precision=_HIGHEST
        )
    return x


def host_f64_smallest(graph, graphbandwidth, num_modes: int,
                      self_loops: bool = True):
    """Exact float64 low eigenpairs of the SYMMETRIC diffusion-maps Laplacian
    on the host (scipy shift-invert Lanczos over a sparse LU factorization).

    Why it exists (round 5): the 262k 1-D-curve campaign's lowest spectral
    band sits many orders of magnitude below lambda_max. Any f32 path —
    LOBPCG, ChebFSI, even dense eigh — assembles diag and off-diagonals with
    INDEPENDENT f32 rounding, so the diag-minus-adjacency cancellation that
    defines the low quadratic form carries ~1e-7*lambda_max of absolute
    noise, swamping bands below that floor regardless of solver quality
    (measured: campaign posterior RMSE 0.68 vs a 0.13 noise floor). This
    path recomputes the full coefficient pipeline
    (``ops.laplacian.laplacian_coeffs``, reference
    ``operators/graph_laplacian_operator.py:52-106``) in f64 from the stored
    exact edge sqdists, assembles the sparse f64 L_sym, and asks ARPACK for
    the smallest ``num_modes`` pairs via shift-invert — O(nnz) memory, one
    sparse factorization (RCM-bandable kNN graphs factor in seconds at
    262k). The analogue of the reference's own host-side dense
    ``torch.linalg.eigh`` basis route (``kernels/riemann_kernel.py:121-124``)
    at the scale and precision that route cannot reach.

    Returns (eigval [m] f64 ascending, eigvec [N, m] f64 SYMMETRIC-form,
    deg [N] f64) — caller applies the reference's randomwalk recovery.
    """
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    eps2 = float(graphbandwidth) ** 2
    rows = np.asarray(graph.rows)
    cols = np.asarray(graph.cols)
    sqd = np.asarray(graph.sqdist, np.float64)
    mask = np.asarray(graph.mask, np.float64)
    n = int(graph.num_nodes)
    m = int(min(num_modes, n))

    w = np.exp(-sqd / (4.0 * eps2)) * mask
    base = 1.0 if self_loops else 0.0
    q = np.full(n, base)
    np.add.at(q, rows, w)
    np.add.at(q, cols, w)
    adj = w / (q[rows] * q[cols])
    deg = q**-2.0 if self_loops else np.zeros(n)
    np.add.at(deg, rows, adj)
    np.add.at(deg, cols, adj)
    if self_loops:
        diag = (1.0 - q**-2.0 / deg) / eps2
    else:
        diag = np.full(n, 1.0 / eps2)
    dsq = np.sqrt(deg)
    triu = adj / (dsq[rows] * dsq[cols]) / eps2

    lap = (
        sp.coo_matrix((diag, (np.arange(n), np.arange(n))), (n, n))
        + sp.coo_matrix((-triu, (rows, cols)), (n, n))
        + sp.coo_matrix((-triu, (cols, rows)), (n, n))
    ).tocsc()

    if m >= n - 1:
        vals, vecs = np.linalg.eigh(lap.toarray())
        return vals[:m], vecs[:, :m], deg
    # Shift-invert at a sigma slightly BELOW the spectrum: L_sym is PSD with
    # smallest eigenvalue ~0 (exactly 0 up to roundoff for a connected
    # graph), so sigma=0 risks a numerically singular factorization; a tiny
    # negative shift keeps (L - sigma I) safely PD while (lambda - sigma)^-1
    # still separates the low band by orders of magnitude. v0 fixed for
    # determinism (same-key cache reruns must be bitwise identical).
    scale = float(np.max(diag))
    v0 = np.full(n, 1.0 / np.sqrt(n))
    last_err = None
    for sigma_frac in (1e-10, 1e-6, 1e-3):
        try:
            vals, vecs = spla.eigsh(
                lap, k=m, sigma=-sigma_frac * scale, which="LM",
                mode="normal", v0=v0,
            )
            order = np.argsort(vals)
            return vals[order], vecs[:, order], deg
        except Exception as e:  # singular factorization: back off the shift
            last_err = e
    raise RuntimeError(f"host_f64 shift-invert eigsh failed: {last_err}")


def chebyshev_filtered_smallest(
    matvec: Callable,
    x0: jnp.ndarray,
    upper_bound,
    num_modes: Optional[int] = None,
    degree: int = 256,
    num_iters: int = 6,
    cut_init_frac: float = 1e-2,
):
    """Smallest-m eigenpairs by Chebyshev-filtered subspace iteration
    (ChebFSI / ChASE-style) — the large-N solver for NEAR-DEGENERATE low
    clusters where (LO)BPCG stalls.

    Why it exists (round 5): on a 262k-node curve graph the lowest 50
    Laplacian eigenvalues span [5e-5, 1.1e-4] against lambda_max ~ 4 —
    unpreconditioned LOBPCG converges that band at ~(1 - lambda/lambda_max)
    per iteration, i.e. ~1e5 iterations; 200 iterations returned an
    arbitrary low-frequency subspace capturing 28% of a smooth target
    (tools/r5 diagnosis). A degree-d Chebyshev polynomial on
    [cut, lambda_max] amplifies the wanted band below ``cut`` by
    ~cosh(d * acosh(1 + 2 cut/lambda_max)) per filter application while
    bounding the rest by 1, so a handful of filtered iterations
    (d * num_iters matvecs total — here ~1.5k, each one fused-SpMV sweep)
    recover the SPAN of the cluster that matters for prediction.

    The filter window's lower edge adapts: it starts at
    ``cut_init_frac * upper_bound`` and after each Rayleigh-Ritz tightens
    toward the current largest wanted Ritz value (never expanding), the
    standard ChebFSI schedule. All shapes static; the matvec may be the
    row-sharded SpMV (the Gram/Rayleigh reductions lower to ICI psums).

    Args:
      x0: [N, mb] start block; oversample mb ~ 1.25x the wanted modes.
      upper_bound: any bound on lambda_max (``gershgorin_bound``).
      num_modes: wanted modes (default: the full block).
    Returns: (eigval [num_modes] ascending, eigvec [N, num_modes]).
    """
    m_block = x0.shape[1]
    m = m_block if num_modes is None else int(num_modes)
    lam_max = jnp.reshape(jnp.asarray(upper_bound, jnp.float32), ())

    # Filter in chunks with a whitening pass between them: one degree-256
    # application collapses every column onto the lowest band (rank-one
    # Gram, fp32-fatal); chunked degree-`chunk` filters with re-whitening
    # apply the same total polynomial power to the SPAN while keeping the
    # block numerically full-rank throughout.
    chunk = 64
    n_chunks = max(1, degree // chunk)

    def filter_block(x, cut):
        e = (lam_max - cut) / 2.0
        c = (lam_max + cut) / 2.0

        def one_chunk(_, x):
            y_prev = x
            y = (matvec(x) - c * x) / e

            def body(_, carry):
                y_prev, y = carry
                y_next = (2.0 / e) * (matvec(y) - c * y) - y_prev
                # consistent pair rescale: T_d grows ~cosh(d acosh) outside
                # the window; scaling BOTH terms preserves the recurrence
                s = jnp.max(jnp.abs(y_next))
                s = jnp.maximum(s, 1e-30)
                return y / s, y_next / s

            _, y = jax.lax.fori_loop(1, chunk, body, (y_prev, y))
            return _whiten(y)

        return jax.lax.fori_loop(0, n_chunks, one_chunk, x)

    def rayleigh_ritz(x):
        x = _whiten(x)
        ax = matvec(x)
        h = jnp.einsum("ni,nj->ij", x, ax, precision=_HIGHEST)
        h = (h + h.T) / 2.0
        vals, w = jnp.linalg.eigh(h)
        return vals, jnp.matmul(x, w, precision=_HIGHEST)

    cut = cut_init_frac * lam_max

    def outer(_, carry):
        x, cut = carry
        x = filter_block(x, cut)
        vals, x = rayleigh_ritz(x)
        # Bidirectional window schedule. The filter amplifies ONLY the
        # modes below ``cut`` (everything inside [cut, lam_max] is
        # suppressed to noise), so the captured Ritz values sit below cut
        # and the uncaptured block directions come back as bulk-scale junk.
        # If the whole block is captured (every Ritz value below the
        # window), tighten toward the block's top value for maximum
        # amplification differential; otherwise WIDEN (x2) — a one-way
        # shrinking schedule permanently loses every wanted mode that
        # happens to start above the initial window (measured: a cut at
        # 1e-2 lam_max held 45 of 62 block modes and the tail stayed 40x
        # wrong at any filter budget).
        captured = jnp.sum(vals < 0.9 * cut)
        cut_new = jnp.where(
            captured >= m_block,
            jnp.clip(1.2 * vals[-1], 1e-12 * lam_max, cut),
            jnp.minimum(2.0 * cut, 0.9 * lam_max),
        )
        return x, cut_new

    x, cut = jax.lax.fori_loop(0, num_iters, outer, (x0, cut))
    vals, x = rayleigh_ritz(x)
    return vals[:m], x[:, :m]
