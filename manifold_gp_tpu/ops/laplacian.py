"""Matrix-free diffusion-maps-normalized graph Laplacian.

Functional re-design of the reference ``GraphLaplacianOperator``
(``manifold_gp/operators/graph_laplacian_operator.py:24-157``). The cached
derived quantities become one pure function ``laplacian_coeffs(graph, eps)``
— everything downstream of the learnable graph bandwidth ``eps`` is traced
and differentiated under jit (the reference rebuilds the operator per step
for the same reason, ``kernels/riemann_kernel.py:114-115``).

Pipeline (alpha=1 diffusion-maps density correction, self-loops on by
default, matching reference defaults):

  w_e      = exp(-d_e^2 / (4 eps^2))                      (:56)
  q_i      = [1] + sum_{e inc i} w_e                      (:60-69; the 1 is
                                                           the self-loop)
  w~_e     = w_e / (q_row q_col)                          (:75)
  d_i      = [q_i^-2] + sum_{e inc i} w~_e                (:79-88)
  diag_i   = (1 - q_i^-2 / d_i) / eps^2                   (:92-97)
  triu_e   = w~_e / (sqrt(d_row) sqrt(d_col) eps^2)       (:103-106)

Symmetric matvec: L v = diag * v - A_sym v with A_sym assembled from the
triu values in both directions; randomwalk normalization conjugates by
D^{+-1/2} exactly as reference :108-124 (transpose swaps the scaling,
:129-130).

Two execution paths with identical numerics:
  * dense: assemble L_sym once per step and matvec on the MXU — the fast
    path for small graphs (N <= cfg.dense_operator_max_size);
  * sparse ELL: gather-based SpMV scanning over the fixed-degree dimension
    (the torch_sparse.spmm replacement; Pallas block-sparse kernel hooks in
    here for large N).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .graph import SparseGraph

_HIGHEST = jax.lax.Precision.HIGHEST


class LaplacianCoeffs(NamedTuple):
    """Differentiable per-edge/per-node Laplacian coefficients."""

    diag: jnp.ndarray  # [N] Laplacian diagonal
    triu: jnp.ndarray  # [M] symmetric off-diagonal values (upper tri)
    deg: jnp.ndarray  # [N] density-corrected degree d_i
    deg_unnorm: jnp.ndarray  # [N] unnormalized degree q_i
    weights: jnp.ndarray  # [M] unnormalized edge weights w_e


def laplacian_coeffs(
    graph: SparseGraph, graphbandwidth, self_loops: bool = True
) -> LaplacianCoeffs:
    eps2 = jnp.square(jnp.reshape(graphbandwidth, ()))
    w = jnp.exp(-graph.sqdist / (4.0 * eps2)) * graph.mask
    base = 1.0 if self_loops else 0.0
    deg_unnorm = (
        jnp.full((graph.num_nodes,), base, w.dtype)
        .at[graph.rows]
        .add(w)
        .at[graph.cols]
        .add(w)
    )
    adj = w / (deg_unnorm[graph.rows] * deg_unnorm[graph.cols])
    deg0 = deg_unnorm**-2 if self_loops else jnp.zeros_like(deg_unnorm)
    deg = deg0.at[graph.rows].add(adj).at[graph.cols].add(adj)
    if self_loops:
        diag = (1.0 - deg_unnorm**-2 / deg) / eps2
    else:
        diag = jnp.full((graph.num_nodes,), 1.0, w.dtype) / eps2
    dsq = jnp.sqrt(deg)
    triu = adj / (dsq[graph.rows] * dsq[graph.cols]) / eps2
    return LaplacianCoeffs(diag=diag, triu=triu, deg=deg, deg_unnorm=deg_unnorm, weights=w)


# ---------------------------------------------------------------------------
# Sparse adjacency matvec (ELL gather path)
# ---------------------------------------------------------------------------


def adjacency_matvec_ell(graph: SparseGraph, triu: jnp.ndarray, v: jnp.ndarray):
    """A_sym @ v using the padded ELL layout. v: [N, B] -> [N, B].

    Scans over the (static, small) degree dimension: each step is one gather
    of rows of ``v`` plus a fused multiply-add, keeping transient memory at
    O(N*B) instead of O(N*D*B).
    """
    ev = triu[graph.ell_edge] * graph.ell_mask  # [N, D]

    def step(acc, args):
        ecol, eval_ = args  # [N], [N]
        return acc + eval_[:, None] * v[ecol], None

    init = jnp.zeros_like(v)
    out, _ = jax.lax.scan(step, init, (graph.ell_col.T, ev.T))
    return out


def adjacency_matvec_coo(graph: SparseGraph, triu: jnp.ndarray, v: jnp.ndarray):
    """A_sym @ v via two scatter-add passes over the COO triu list
    (the reference's 2x spmm structure, graph_laplacian_operator.py:118-119).
    Reference implementation used for testing the ELL path."""
    out = jnp.zeros_like(v)
    out = out.at[graph.rows].add(triu[:, None] * v[graph.cols])
    out = out.at[graph.cols].add(triu[:, None] * v[graph.rows])
    return out


def gershgorin_bound(graph: SparseGraph, coeffs: LaplacianCoeffs):
    """Upper bound on lambda_max(L_sym): max_i (diag_i + sum_j |offdiag_ij|).
    Used as the spectral shift for the LOBPCG smallest-eigenpair solver."""
    rowsum = (
        jnp.zeros_like(coeffs.diag)
        .at[graph.rows]
        .add(jnp.abs(coeffs.triu))
        .at[graph.cols]
        .add(jnp.abs(coeffs.triu))
    )
    return jnp.max(coeffs.diag + rowsum) * 1.01


# ---------------------------------------------------------------------------
# Dense assembly (small-N MXU path; also the eigh input)
# ---------------------------------------------------------------------------


def laplacian_dense(graph: SparseGraph, coeffs: LaplacianCoeffs):
    """Assemble the symmetric Laplacian L_sym as a dense [N, N] matrix."""
    n = graph.num_nodes
    a = (
        jnp.zeros((n, n), coeffs.triu.dtype)
        .at[graph.rows, graph.cols]
        .add(coeffs.triu)
        .at[graph.cols, graph.rows]
        .add(coeffs.triu)
    )
    return jnp.diag(coeffs.diag) - a


# ---------------------------------------------------------------------------
# Full Laplacian matvec
# ---------------------------------------------------------------------------


def laplacian_matvec(
    graph: SparseGraph,
    coeffs: LaplacianCoeffs,
    v: jnp.ndarray,
    normalization: str = "randomwalk",
    transposed: bool = False,
    dense: Optional[jnp.ndarray] = None,
    block=None,
    permuted_io: bool = False,
    pallas: bool = False,
):
    """Apply L to v ([N] or [N, B]).

    normalization='symmetric': L_sym v.
    normalization='randomwalk': D^{-1/2} L_sym D^{1/2} v (transpose swaps the
    scalings), matching reference :108-124, :129-130.
    Execution paths (identical numerics): ``dense`` (a pre-assembled L_sym)
    uses the small-N MXU path; ``block`` (a (BlockLayout, blocks) pair from
    ops.block_sparse) uses the RCM block-ELL MXU path; default is the ELL
    gather scan.

    ``permuted_io`` (block path only): v is already in padded RCM order
    [Np, B] with zero padding rows — callers hoist the permute_in/out pair
    to the boundary of a whole operator composition or Krylov solve so the
    hot loop does no per-matvec row gathers.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    if normalization == "randomwalk":
        deg = coeffs.deg
        if permuted_io:
            deg = deg[block[0].perm]  # [N]-sized gather, not [N, B]
        dsq = jnp.sqrt(deg)[:, None]
        vec = v / dsq if transposed else v * dsq
    else:
        vec = v
    if permuted_io:
        if pallas:
            from .sparse_formats import make_matvec_ad

            out = make_matvec_ad(block[0])(block[1], vec)
        else:
            from .sparse_formats import matvec_permuted

            out = matvec_permuted(block[0], block[1], vec)
    elif dense is not None:
        out = jnp.matmul(dense, vec, precision=_HIGHEST)
    elif block is not None:
        if pallas:
            from .sparse_formats import make_matvec_ad, permute_in, permute_out

            out = permute_out(
                block[0], make_matvec_ad(block[0])(block[1], permute_in(block[0], vec))
            )
        else:
            from .sparse_formats import matvec as fused_matvec

            out = fused_matvec(block[0], block[1], vec)
    else:
        out = coeffs.diag[:, None] * vec - adjacency_matvec_ell(graph, coeffs.triu, vec)
    if normalization == "randomwalk":
        out = out * dsq if transposed else out / dsq
    return out[:, 0] if squeeze else out


def out_of_sample(
    graph: SparseGraph,
    coeffs: LaplacianCoeffs,
    eigvec: jnp.ndarray,
    edge_sqdist: jnp.ndarray,
    edge_idx: jnp.ndarray,
    graphbandwidth,
    normalization: str = "randomwalk",
):
    """Nystrom out-of-sample extension row for test points.

    Mirrors reference ``graph_laplacian_operator.py:146-157``: exp kernel from
    each test point to its kNN training points, density-corrected by the
    training unnormalized degree and the test degree, then symmetric /
    randomwalk normalization, finally a weighted sum of training eigenvector
    entries.

    Args:
      eigvec: [N, m] training eigenvectors.
      edge_sqdist: [Nt, k] squared distances test -> nearest training points.
      edge_idx: [Nt, k] indices of those training points.
    Returns: [Nt, m] extended eigenvector rows.
    """
    eps2 = jnp.square(jnp.reshape(graphbandwidth, ()))
    out = jnp.exp(-edge_sqdist / (4.0 * eps2))
    degree_test = out.sum(axis=1)
    out = out / (coeffs.deg_unnorm[edge_idx] * degree_test[:, None])
    if normalization == "symmetric":
        out = out / (
            jnp.sqrt(coeffs.deg)[edge_idx] * jnp.sqrt(out.sum(axis=1))[:, None]
        )
    elif normalization == "randomwalk":
        out = out / out.sum(axis=1)[:, None]
    return jnp.einsum(
        "tk,tkm->tm", out, eigvec[edge_idx], precision=_HIGHEST
    )
