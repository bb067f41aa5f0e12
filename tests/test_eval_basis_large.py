"""eval_basis large-N route (Lanczos + block-sparse SpMV), forced via tiny
config thresholds, vs the dense-eigh route on the same graph."""

import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel


@pytest.mark.parametrize("spmv_dtype", ["float32", "bfloat16"])
def test_lanczos_block_basis_matches_dense(spmv_dtype):
    # Connected 1-D manifold (noisy ring): single-vector Lanczos resolves
    # only one vector per eigenspace, so (like the reference's
    # linear_operator diagonalization path) it requires simple eigenvalues —
    # i.e. a connected graph. Disconnected graphs need the dense route.
    # Own fixed-seed rng (NOT the shared session fixture): the eigengap
    # structure this test asserts on is sensitive to the noise draw, and the
    # shared stateful rng makes the draw depend on test execution order.
    rng = np.random.default_rng(20240817)
    t = np.sort(rng.uniform(0, 2 * np.pi, 600))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    x += 0.01 * rng.standard_normal(x.shape).astype(np.float32)

    def make(cfg):
        k = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=8,
            laplacian_normalization="randomwalk", num_modes=8, cfg=cfg,
        )
        return k, k.init_params(graphbandwidth=0.5, lengthscale=1.0)

    k_dense, p = make(InferenceConfig())
    val_d, vec_d = k_dense.eval_basis(p)

    k_lan, p2 = make(
        InferenceConfig(eigh_max_size=0, dense_operator_max_size=0,
                        spmv_dtype=spmv_dtype)
    )
    assert k_lan.block_layout is not None
    val_l, vec_l = k_lan.eval_basis(p2)

    # Both dtypes should give f32-quality bases: the eval_basis route always
    # assembles f32 blocks for the eigensolve regardless of spmv_dtype.
    tol = 5e-3
    np.testing.assert_allclose(
        np.asarray(val_l), np.asarray(val_d), rtol=tol, atol=tol * 0.1
    )
    # eigenvector agreement up to sign, away from degenerate pairs
    vals = np.asarray(val_d)
    for j in range(6):
        gap = min(
            abs(vals[j] - vals[j - 1]) if j > 0 else 1.0,
            abs(vals[j + 1] - vals[j]),
        )
        if gap < 1e-3:
            continue  # degenerate pair: any basis rotation is valid
        dot = abs(float(np.asarray(vec_l)[:, j] @ np.asarray(vec_d)[:, j]))
        assert dot > 0.98, (j, dot)
