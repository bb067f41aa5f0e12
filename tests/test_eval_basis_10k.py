"""Spectral basis at SRMNIST scale (N=10,010, the config that actually takes
the LOBPCG route) vs an f64 ARPACK oracle, and the row-sharded mesh basis.

Round-1 VERDICT item 5: the LOBPCG basis was validated only at N=600; the
SRMNIST configuration (eigh_max_size=8192 < 10,010) had no oracle test, and
eval_basis had no mesh path at all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel


def test_lobpcg_basis_srmnist_scale_matches_arpack():
    """N=10,010 clustered cloud (SRMNIST shape), k=50: eval_basis takes the
    matrix-free LOBPCG route; oracle = scipy ARPACK shift-invert eigsh on the
    f64 sparse symmetric Laplacian."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs

    rng = np.random.default_rng(7)
    n, d, k, m = 10010, 64, 50, 20
    centers = rng.standard_normal((10, d)).astype(np.float32) * 2.0
    x = centers[rng.integers(0, 10, n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)

    cfg = InferenceConfig(eigensolver_max_iter=120)
    kernel = RiemannMaternKernel(
        nu=2, x=x, nearest_neighbors=k,
        laplacian_normalization="randomwalk", num_modes=m, cfg=cfg,
    )
    assert kernel.graph.num_nodes > cfg.eigh_max_size, "must take LOBPCG route"
    params = kernel.init_params(graphbandwidth=0.5, lengthscale=1.0)
    val, vec = kernel.eval_basis(params)
    val, vec = np.asarray(val), np.asarray(vec)

    # f64 oracle on the same symmetric Laplacian
    c = laplacian_coeffs(kernel.graph, 0.5)
    rows = np.asarray(kernel.graph.rows)
    cols = np.asarray(kernel.graph.cols)
    triu = np.asarray(c.triu, np.float64)
    diag = np.asarray(c.diag, np.float64)
    a = sp.coo_matrix(
        (np.concatenate([triu, triu]),
         (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
        shape=(n, n),
    ).tocsc()
    lap = sp.diags(diag) - a
    ov, ovec = spl.eigsh(lap, k=m, sigma=-1e-3, which="LM")
    order = np.argsort(ov)
    ov, ovec = ov[order], ovec[:, order]

    # Eigenvalues: ours has eigval[0] forced to 0 like the reference; compare
    # the rest to the oracle at LOBPCG accuracy.
    np.testing.assert_allclose(val[1:], ov[1:], rtol=2e-2, atol=1e-4)

    # Eigenvectors: ours are randomwalk-recovered (D^{-1/2}) + normalized;
    # apply the same recovery to the oracle and compare per-mode alignment
    # away from clustered eigenvalues.
    deg = np.asarray(c.deg, np.float64)
    orec = ovec / np.sqrt(deg)[:, None]
    orec = orec / np.linalg.norm(orec, axis=0, keepdims=True)
    checked = 0
    for j in range(1, m - 1):
        gap = min(ov[j] - ov[j - 1], ov[j + 1] - ov[j])
        # Gap measured against the spectrum scale: the ~10 cluster modes are
        # a numerically-degenerate near-zero group where any basis rotation
        # is a valid eigenbasis. 5e-3 cutoff: pairs with absolute gaps ~1e-5
        # (modes 17/18 here) sit below what 120-iteration f32 LOBPCG
        # resolves — their mutual rotation flips with mere summation-order
        # changes in the SpMV panel layout.
        if gap < 5e-3 * ov[-1]:
            continue
        dot = abs(float(vec[:, j] @ orec[:, j]))
        assert dot > 0.95, (j, dot, gap)
        checked += 1
    assert checked >= 3, "need some well-separated modes to make this real"


@pytest.mark.parametrize("fused", [True, False])
def test_mesh_eval_basis_matches_single_device(fused):
    """Row-sharded LOBPCG basis (mesh kernel, fused block-ELL and ELL-scan
    SpMV paths) vs the single-device dense-eigh basis on the same graph."""
    from manifold_gp_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    n, m = 1024, 8
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    x += 0.01 * rng.standard_normal(x.shape).astype(np.float32)

    def build(mesh_arg):
        kernel = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=6,
            laplacian_normalization="randomwalk", num_modes=m,
            cfg=InferenceConfig(
                eigensolver_max_iter=300, use_block_sparse=fused
            ),
            mesh=mesh_arg,
        )
        return kernel, kernel.init_params(graphbandwidth=0.4, lengthscale=1.0)

    k_ref, p_ref = build(None)
    val_ref, vec_ref = k_ref.eval_basis(p_ref)  # dense-eigh route (n < 8192)
    k_sh, p_sh = build(mesh)
    assert (k_sh._mesh_fused is not None) == fused
    val_sh, vec_sh = k_sh.eval_basis(p_sh)  # row-sharded LOBPCG route
    assert vec_sh.shape == (n, m)

    np.testing.assert_allclose(
        np.asarray(val_sh), np.asarray(val_ref), rtol=1e-2, atol=1e-5
    )
    vals = np.asarray(val_ref)
    for j in range(m - 1):
        gap = min(
            vals[j] - vals[j - 1] if j > 0 else 1.0, vals[j + 1] - vals[j]
        )
        if gap < 1e-3:
            continue
        dot = abs(float(np.asarray(vec_sh)[:, j] @ np.asarray(vec_ref)[:, j]))
        assert dot > 0.98, (j, dot)
