"""Operator compositions: Matérn precision, scale / noise wrappers, Schur.

Functional equivalents of the reference's matrix-free LinearOperator stack:
  * PrecisionMaternOperator (``operators/precision_matern_operator.py:26-35``):
    Q = (2 nu / l^2 I + L)^nu applied as nu repetitions of
    ``out <- (out + (l^2/2nu) L out) / (l^2/2nu)``; for randomwalk
    normalization the output is post-multiplied by the degree to symmetrize.
  * ScaleWrapperOperator (``operators/scale_wrapper_operator.py:27-28``):
    multiplies (or divides, inverse_scale) the matvec by a scalar. NOTE the
    reference's training path wraps the precision with inverse_scale=False
    (``models/riemann_gp.py:35``) so "outputscale" multiplies the *precision*
    during training — the _average_variance normalization protocol compensates
    (see SURVEY §2.1); we preserve that asymmetry exactly.
  * NoiseWrapperOperator (``operators/noise_wrapper_operator.py:21-22``):
    truncated Neumann series (K + s^2 I)^{-1} ~= Q - s^2 Q^2 + s^4 Q^3,
    evaluated as nested matvecs Q(v - s^2 Q(v - s^2 Q v)).
  * SchurComplementOperator (``operators/schur_complement_operator.py:27-30``):
    labeled-block effective precision Q_xx - Q_xz Q_zz^{-1} Q_zx with an inner
    CG solve on the unlabeled block per outer matvec (nested Krylov). The
    inner solve is differentiable via the implicit-function VJP in ops.cg.

Each builder returns a matvec closure [n, B] -> [n, B]; closures may capture
traced values (handled downstream with jax.closure_convert).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .graph import SparseGraph
from .laplacian import LaplacianCoeffs, laplacian_matvec


def make_matern_precision_matvec(
    graph: SparseGraph,
    coeffs: LaplacianCoeffs,
    nu: int,
    lengthscale,
    normalization: str = "randomwalk",
    dense: Optional[jnp.ndarray] = None,
    block=None,
    permuted_io: bool = False,
    pallas: bool = False,
    grad_space: str = "panel",
) -> Callable:
    """Q = (2 nu / l^2 I + L)^nu (with randomwalk symmetrization).

    ``permuted_io`` (block path): the closure maps padded-RCM-space vectors
    [Np, B] -> [Np, B]; callers hoist the permutation to the solve boundary
    (see ops.block_sparse.permute_in/out).

    ``grad_space`` (block-ELL path): "panel" (default) or "edge" — see
    ``config.InferenceConfig.solve_cotangent``. Edge mode bounds the solve
    VJPs' backward memory at one transient panel buffer by contracting each
    cotangent to the [M]+[N] coefficient vectors immediately
    (ops.pallas_spmv.make_matvec_edge_ad).
    """
    diag = jnp.square(jnp.reshape(lengthscale, ())) / (2.0 * nu)
    deg_full = coeffs.deg
    if permuted_io:
        deg_full = deg_full[block[0].perm]

    if block is not None and grad_space == "edge":
        import jax

        from .block_sparse import BlockLayout
        from .pallas_spmv import make_matvec_edge_ad
        from .sparse_formats import assemble, permute_in, permute_out

        layout, blocks = block
        if not isinstance(layout, BlockLayout):
            raise ValueError(
                "solve_cotangent='edge' requires the block-ELL layout "
                "(DIA bands assemble per-diagonal, not per-panel)"
            )
        if normalization not in ("randomwalk", "symmetric"):
            raise ValueError(
                "normalization must be 'randomwalk' or 'symmetric', got "
                f"{normalization!r}"
            )
        if blocks is None or isinstance(blocks, jnp.ndarray):
            panel_dtype = None if blocks is None else (
                "float32x3" if blocks.ndim == 4 else blocks.dtype
            )
        else:
            panel_dtype = blocks
        shift = 2.0 * nu / jnp.square(jnp.reshape(lengthscale, ()))
        diag_s = coeffs.diag + shift
        # Assembled ONCE per coefficient set; stop_gradient so every solve's
        # panel cotangent is dead (the edge-space VJP carries the gradient).
        qblocks = jax.lax.stop_gradient(
            assemble(layout, diag_s, coeffs.triu, dtype=panel_dtype)
        )
        mv_edge = make_matvec_edge_ad(layout, use_pallas=pallas)
        dsq_p = jnp.sqrt(deg_full if permuted_io else coeffs.deg[layout.perm])

        def matvec(v):
            squeeze = v.ndim == 1
            out = v[:, None] if squeeze else v
            if not permuted_io:
                out = permute_in(layout, out)
            if normalization == "randomwalk":
                out = out * dsq_p[:, None]
            for _ in range(nu):
                out = mv_edge(qblocks, diag_s, coeffs.triu, out)
            if normalization == "randomwalk":
                out = out * dsq_p[:, None]
            if not permuted_io:
                out = permute_out(layout, out)
            return out[:, 0] if squeeze else out

        return matvec

    if block is not None:
        # Fused block path. The nu-fold affine recursion
        #   out <- (out + a L out)/a,  a = l^2/(2 nu)
        # telescopes: for randomwalk (L_rw = D^{-1/2} L_sym D^{1/2}, final
        # *deg symmetrization) the whole operator collapses to
        #   Q = D^{1/2} (I/a + L_sym)^nu D^{1/2},
        # and for symmetric to (I/a + L_sym)^nu. Scattering the 1/a shift
        # into the panel diagonal once per step turns every Q matvec into nu
        # bare block matvecs with two boundary row-scalings — no per-matvec
        # affine or D^{+-1/2} conjugation passes over [N, B] in the hot loop
        # (matern_precision_operands / make_matern_precision_matvec_operand
        # below are that telescoped form; this closure composes them and
        # adds the permutation boundary).
        # ``block`` may carry either sparse layout (block-ELL panels or DIA
        # bands); sparse_formats dispatches on the layout type.
        from .sparse_formats import permute_in, permute_out

        layout, blocks = block
        # ``blocks`` is either None (f32 panels), a dtype (pin the panel
        # dtype without pre-assembling a buffer — the cheap calling
        # convention), or a real panel buffer whose dtype is reused.
        if blocks is None:
            panel_dtype = None
        elif isinstance(blocks, jnp.ndarray):
            # x3-split buffers are stacked [2, ...] bf16 — re-assembling the
            # SHIFTED panels must reproduce the split, not plain bf16
            panel_dtype = (
                "float32x3" if blocks.ndim == 4 else blocks.dtype
            )
        else:
            panel_dtype = blocks  # a dtype (or the "float32x3" tag)
        qblocks, dsq_p = matern_precision_operands(
            layout, coeffs, nu, lengthscale, dtype=panel_dtype
        )
        inner = make_matern_precision_matvec_operand(
            layout, nu, normalization, pallas=pallas
        )

        def matvec(v):
            squeeze = v.ndim == 1
            out = v[:, None] if squeeze else v
            if not permuted_io:
                out = permute_in(layout, out)
            out = inner(qblocks, dsq_p, out)
            if not permuted_io:
                out = permute_out(layout, out)
            return out[:, 0] if squeeze else out

        return matvec

    def matvec(v):
        out = v
        for _ in range(nu):
            lv = laplacian_matvec(
                graph,
                coeffs,
                out,
                normalization,
                dense=dense,
                block=block,
                permuted_io=permuted_io,
            )
            out = (out + diag * lv) / diag
        if normalization == "randomwalk":
            deg = deg_full if out.ndim == 1 else deg_full[:, None]
            out = out * deg
        return out

    return matvec


def matern_precision_operands(layout, coeffs, nu: int, lengthscale, dtype=None):
    """Assemble the per-coeffs operands of the fused single-chip Matérn
    matvec: the shift-folded panel buffer and the permuted sqrt-degree
    vector. The single-chip twin of
    ``parallel.block_spmv.sharded_matern_precision_operands`` — exposed so
    eager callers (benchmarks, repeated solves at fixed hyperparameters) can
    assemble ONCE outside the timed/jitted region and pass both as jit
    arguments (round-3 ADVICE item 1: the single-device bench re-assembled
    per call while the sharded bench assembled eagerly — not like-for-like).
    """
    from .sparse_formats import assemble

    shift = 2.0 * nu / jnp.square(jnp.reshape(lengthscale, ()))
    qblocks = assemble(layout, coeffs.diag + shift, coeffs.triu, dtype=dtype)
    dsq_p = jnp.sqrt(coeffs.deg[layout.perm])
    return qblocks, dsq_p


def make_matern_precision_matvec_operand(
    layout, nu: int, normalization: str = "randomwalk", pallas: bool = False
):
    """Operand-explicit fused Matérn matvec: ``matvec(qblocks, dsq_p, pv)``
    over permuted padded-RCM vectors, with operands from
    :func:`matern_precision_operands`. Same telescoped form as
    ``make_matern_precision_matvec``'s block path."""
    if normalization not in ("randomwalk", "symmetric"):
        raise ValueError(
            "normalization must be 'randomwalk' or 'symmetric', got "
            f"{normalization!r}"
        )
    from .sparse_formats import matvec_permuted

    if pallas:
        from .sparse_formats import make_matvec_ad

        mv_fn = make_matvec_ad(layout)
    else:
        mv_fn = lambda blk, pv: matvec_permuted(layout, blk, pv)  # noqa: E731

    def matvec(qblocks, dsq_p, v):
        squeeze = v.ndim == 1
        out = v[:, None] if squeeze else v
        if normalization == "randomwalk":
            out = out * dsq_p[:, None]
        for _ in range(nu):
            out = mv_fn(qblocks, out)
        if normalization == "randomwalk":
            out = out * dsq_p[:, None]
        return out[:, 0] if squeeze else out

    return matvec


def matern_precision_diag(
    graph: SparseGraph,
    coeffs: LaplacianCoeffs,
    nu: int,
    lengthscale,
    normalization: str = "randomwalk",
) -> jnp.ndarray:
    """(Approximate) diagonal of Q = (2 nu/l^2 I + L)^nu for Jacobi PCG.

    With A = shift*I + L_sym the diagonals are
      nu=1: diag(A)            (exact)
      nu=2: diag(A^2) = diag(A)^2 + rowsum(offdiag^2)   (exact)
      nu>2: diag(A^2)^{nu/2}   (positive surrogate; a preconditioner only
            needs a spectrally-reasonable SPD scaling, not exactness)
    and the randomwalk symmetrization multiplies by the degree
    (Q_rw = D^{1/2} A^nu D^{1/2} has diag = deg * diag(A^nu)).

    GPyTorch's mBCG preconditions every solve by default (pivoted Cholesky
    of the *covariance*, ``utils/train_model.py:68`` context); in precision
    form the operator diagonal is directly computable, so Jacobi is the
    natural equivalent.
    """
    shift = 2.0 * nu / jnp.square(jnp.reshape(lengthscale, ()))
    diag_a = coeffs.diag + shift
    if nu == 1:
        d = diag_a
    else:
        off2 = (
            jnp.zeros_like(coeffs.diag)
            .at[graph.rows]
            .add(jnp.square(coeffs.triu))
            .at[graph.cols]
            .add(jnp.square(coeffs.triu))
        )
        diag_a2 = jnp.square(diag_a) + off2
        d = diag_a2 if nu == 2 else jnp.power(diag_a2, 0.5 * nu)
    if normalization == "randomwalk":
        d = d * coeffs.deg
    return d


def noisy_scaled_diag(diag_q: jnp.ndarray, scale=None, noise=None) -> jnp.ndarray:
    """Push a Q-diagonal estimate through the Scale and truncated-Neumann
    Noise wrappers (diagonal part only): q -> s*q -> q(1 - s2 q (1 - s2 q)).
    Clamped away from zero so the Jacobi preconditioner stays SPD even where
    the Neumann truncation would cross zero."""
    d = diag_q
    if scale is not None:
        d = d * jnp.reshape(scale, ())
    if noise is not None:
        s2 = jnp.reshape(noise, ())
        d = d * (1.0 - s2 * d * (1.0 - s2 * d))
    return jnp.maximum(d, 1e-12 * jnp.max(jnp.abs(diag_q)))


def make_jacobi_precond(diag: jnp.ndarray) -> Callable:
    """M^{-1} v = v / diag, broadcasting over the RHS batch."""

    def apply(v):
        d = diag if v.ndim == 1 else diag[:, None]
        return v / d

    return apply


def make_scaled_matvec(matvec: Callable, scale, inverse_scale: bool = False) -> Callable:
    s = jnp.reshape(scale, ())
    if inverse_scale:
        return lambda v: matvec(v) / s
    return lambda v: matvec(v) * s


def make_noisy_matvec(matvec: Callable, noise) -> Callable:
    """Truncated-Neumann noisy precision Q - s2 Q^2 + s2^2 Q^3."""
    s2 = jnp.reshape(noise, ())

    def mv(v):
        return matvec(v - s2 * matvec(v - s2 * matvec(v)))

    return mv


def make_schur_matvec(
    base_matvec: Callable,
    labeled_idx: np.ndarray,
    unlabeled_idx: np.ndarray,
    n: int,
    cg_tol: float = 1e-2,
    cg_max_iter: int = 1000,
    precond_diag: Optional[jnp.ndarray] = None,
) -> Callable:
    """Effective labeled-block precision via an inner CG on the unlabeled
    block. ``labeled_idx`` / ``unlabeled_idx`` are static index arrays.
    ``precond_diag``: optional [n] diagonal of the base operator — the inner
    CG then runs Jacobi-preconditioned on its unlabeled restriction."""
    from .cg import cg_solve

    labeled_idx = jnp.asarray(np.asarray(labeled_idx, np.int32))
    unlabeled_idx = jnp.asarray(np.asarray(unlabeled_idx, np.int32))
    inner_precond = None
    if precond_diag is not None:
        inner_precond = make_jacobi_precond(precond_diag[unlabeled_idx])

    def mv(v):
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        b = vv.shape[1]
        full = jnp.zeros((n, b), vv.dtype).at[labeled_idx].set(vv)
        t = base_matvec(full)

        def inner(u):
            fu = jnp.zeros((n, u.shape[1]), u.dtype).at[unlabeled_idx].set(u)
            return base_matvec(fu)[unlabeled_idx]

        sol = cg_solve(
            inner, t[unlabeled_idx], tol=cg_tol, max_iter=cg_max_iter,
            precond=inner_precond,
        )
        fs = jnp.zeros((n, b), vv.dtype).at[unlabeled_idx].set(sol)
        out = t[labeled_idx] - base_matvec(fs)[labeled_idx]
        return out[:, 0] if squeeze else out

    return mv


def make_schur_matvec_masked(
    base_matvec: Callable,
    mask_labeled: jnp.ndarray,
    mask_unlabeled: jnp.ndarray,
    cg_tol: float = 1e-2,
    cg_max_iter: int = 1000,
    precond_diag: Optional[jnp.ndarray] = None,
) -> Callable:
    """Full-space masked Schur complement — the shard-friendly formulation.

    Operates on full-length vectors supported on the labeled rows (instead of
    compacted [n_labeled] vectors): with M_l / M_u the 0/1 row masks,

        S v = M_l (Q v - Q M_u sol),   (M_u Q M_u + (I - M_u)) sol = M_u Q v

    which equals the labeled-block Schur complement Q_ll - Q_lu Q_uu^{-1}
    Q_ul embedded at the labeled rows (the identity on the complement keeps
    the inner operator SPD and the solution supported on the unlabeled
    rows). No index gathers/scatters — every op is an elementwise mask, so
    under a row-sharded mesh the whole nested-CG composition stays sharded
    (index-compacted embeddings would force GSPMD all-to-alls). Semantics
    match ``make_schur_matvec`` / reference
    ``operators/schur_complement_operator.py:27-30``.
    """
    from .cg import cg_solve

    ml = mask_labeled[:, None]
    mu = mask_unlabeled[:, None]
    inner_precond = None
    if precond_diag is not None:
        d = jnp.where(mask_unlabeled > 0, precond_diag, 1.0)
        inner_precond = make_jacobi_precond(d)

    def inner(u):
        return mu * base_matvec(mu * u) + (1.0 - mu) * u

    def mv(v):
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        t = base_matvec(ml * vv)
        sol = cg_solve(
            inner, mu * t, tol=cg_tol, max_iter=cg_max_iter,
            precond=inner_precond,
        )
        out = ml * (t - base_matvec(mu * sol))
        return out[:, 0] if squeeze else out

    return mv


def labeled_split(labeled_mask: np.ndarray):
    """Boolean mask [N] -> (labeled_idx, unlabeled_idx) static index arrays."""
    mask = np.asarray(labeled_mask, bool)
    return np.flatnonzero(mask), np.flatnonzero(~mask)
