"""Dense reference implementations used as test oracles.

Same validation strategy as the reference test suite
(``test/_dense_operators.py``): build each operator as an explicit dense
matrix from first principles (adjacency -> degrees -> Laplacian ->
matrix_power Matérn precision -> Schur/scale/Neumann-noise compositions) and
check the matrix-free operators against it. Written directly from the IMGP
math in numpy/jnp.
"""

import numpy as np


def dense_graph_laplacian(rows, cols, sqdist, eps, n, normalization="unnormalized",
                          self_loops=True):
    """Returns (laplacian, adjacency_unnorm, degree_unnorm, adjacency, degree)."""
    w = np.zeros((n, n))
    w[rows, cols] = np.exp(-np.asarray(sqdist) / (4 * eps**2))
    w = w + w.T
    if self_loops:
        w = w + np.eye(n)
    q = w.sum(axis=1)
    a = w / np.outer(q, q)
    d = a.sum(axis=1)
    if normalization == "symmetric":
        lap = (np.eye(n) - a / np.outer(np.sqrt(d), np.sqrt(d))) / eps**2
    elif normalization == "randomwalk":
        lap = (np.eye(n) - a / d[:, None]) / eps**2
    else:
        lap = (np.diag(d) - a) / eps**2
    return lap, w, q, a, d


def dense_matern_precision(lap, nu, lengthscale, degree=None):
    n = lap.shape[0]
    base = np.eye(n) * 2 * nu / lengthscale**2 + lap
    prec = np.linalg.matrix_power(base, nu)
    if degree is not None:
        prec = np.diag(degree) @ prec
    return prec


def dense_schur_labeled(prec, labeled_mask):
    m = np.asarray(labeled_mask, bool)
    pxx = prec[np.ix_(m, m)]
    pxz = prec[np.ix_(m, ~m)]
    pzz = prec[np.ix_(~m, ~m)]
    pzx = prec[np.ix_(~m, m)]
    return pxx - pxz @ np.linalg.solve(pzz, pzx)


def dense_scaled(prec, outputscale):
    return prec * outputscale


def dense_noisy(prec, noise):
    p2 = prec @ prec
    return prec - noise * p2 + noise**2 * (p2 @ prec)
