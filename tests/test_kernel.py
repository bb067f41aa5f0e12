"""Spectral basis, features, out-of-sample extension (reference
test/_test_functions.py:107-163 model)."""

import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.ops.bump import bump_function
from manifold_gp_tpu.ops.knn import knn_search
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs, out_of_sample

from _dense_oracles import dense_graph_laplacian, dense_matern_precision

EPS = 0.35


@pytest.fixture(scope="module")
def kernel(small_cloud):
    x, _ = small_cloud
    return RiemannMaternKernel(
        nu=2,
        x=x,
        nearest_neighbors=6,
        laplacian_normalization="randomwalk",
        num_modes=20,
        bump_scale=10.0,
        bump_decay=1.0,
    )


@pytest.fixture(scope="module")
def params(kernel):
    return kernel.init_params(graphbandwidth=EPS, lengthscale=1.3)


def test_eigh_matches_dense_oracle(kernel, params):
    """Eigenvalues of the symmetric Laplacian + randomwalk eigvec recovery."""
    basis = kernel.eval_basis(params)
    eigval = np.asarray(basis[0])
    lap_sym = dense_graph_laplacian(
        np.asarray(kernel.graph.rows),
        np.asarray(kernel.graph.cols),
        np.asarray(kernel.graph.sqdist),
        EPS,
        kernel.graph.num_nodes,
        normalization="symmetric",
    )[0]
    dense_eval = np.linalg.eigvalsh(lap_sym)[: kernel.num_modes]
    assert eigval[0] == 0.0
    np.testing.assert_allclose(eigval[1:], dense_eval[1:], rtol=1e-3, atol=1e-4)
    # randomwalk eigenvectors are eigenvectors of the randomwalk Laplacian
    lap_rw = dense_graph_laplacian(
        np.asarray(kernel.graph.rows),
        np.asarray(kernel.graph.cols),
        np.asarray(kernel.graph.sqdist),
        EPS,
        kernel.graph.num_nodes,
        normalization="randomwalk",
    )[0]
    evec = np.asarray(basis[1])
    for j in [1, 3, 7]:
        lhs = lap_rw @ evec[:, j]
        rhs = dense_eval[j] * evec[:, j]
        np.testing.assert_allclose(lhs, rhs, atol=5e-3)
    # columns are unit norm
    np.testing.assert_allclose(np.linalg.norm(evec, axis=0), 1.0, rtol=1e-5)


def test_features_train_covariance(kernel, params):
    """In-sample features: Z Z' is the truncated Mercer expansion with the
    sum-normalized Matérn spectral density (riemann_kernel.py:132-136)."""
    basis = kernel.eval_basis(params)
    z = np.asarray(kernel.features_train(params, basis))
    eigval = np.asarray(basis[0])
    dens = (2 * kernel.nu / 1.3**2 + eigval) ** (-kernel.nu)
    dens = dens / dens.sum() * kernel.graph.num_nodes
    evec = np.asarray(basis[1])
    expected = (evec * dens) @ evec.T
    np.testing.assert_allclose(z @ z.T, expected, rtol=1e-3, atol=5e-5)


def test_out_of_sample_matches_dense_extension(kernel, params, small_cloud):
    """Nystrom extension vs explicitly assembled extension matrix
    (reference test/_test_functions.py:134-163)."""
    x, _ = small_cloud
    rng = np.random.default_rng(7)
    test_x = x[:25] + 0.01 * rng.standard_normal((25, 2)).astype(np.float32)
    basis = kernel.eval_basis(params)
    c = laplacian_coeffs(kernel.graph, EPS)
    sqd, idx = knn_search(kernel.x, jnp.asarray(test_x), kernel.nearest_neighbors)
    ext = np.asarray(
        out_of_sample(kernel.graph, c, basis[1], sqd, idx, EPS, "randomwalk")
    )
    # dense oracle: full extension matrix from the adjacency pipeline
    n = kernel.graph.num_nodes
    q = np.asarray(c.deg_unnorm)
    w_ext = np.zeros((25, n))
    rowsi = np.repeat(np.arange(25), kernel.nearest_neighbors)
    w_ext[rowsi, np.asarray(idx).ravel()] = np.exp(
        -np.asarray(sqd).ravel() / (4 * EPS**2)
    )
    deg_test = w_ext.sum(axis=1)
    a_ext = w_ext / deg_test[:, None] / q[None, :]
    ext_mat = a_ext / a_ext.sum(axis=1)[:, None]
    expected = ext_mat @ np.asarray(basis[1])
    np.testing.assert_allclose(ext, expected, rtol=1e-3, atol=1e-5)


def test_features_test_support_mask(kernel, params, small_cloud):
    """Points far from the manifold get exactly-zero features."""
    x, _ = small_cloud
    basis = kernel.eval_basis(params)
    far = jnp.asarray(np.full((3, 2), 50.0, np.float32))
    feats = kernel.features_test(params, basis, far)
    np.testing.assert_array_equal(np.asarray(feats), 0.0)
    assert not np.any(np.isnan(np.asarray(feats)))


def test_bump_function_properties():
    x = jnp.asarray(np.linspace(-2, 2, 101).astype(np.float32))
    y = np.asarray(bump_function(x, 1.0, 0.5))
    assert np.all(y[np.abs(np.asarray(x)) >= 1.0] == 0)
    np.testing.assert_allclose(y[50], 1.0, rtol=1e-6)  # bump(0) = 1
    assert np.all(y >= 0) and np.all(y <= 1.0 + 1e-6)


def test_precision_matvec_dispatch(kernel, params, rng):
    """Kernel-level precision matvec equals the dense oracle."""
    mv = kernel.precision_matvec(params)
    lap, _, _, _, deg = dense_graph_laplacian(
        np.asarray(kernel.graph.rows),
        np.asarray(kernel.graph.cols),
        np.asarray(kernel.graph.sqdist),
        EPS,
        kernel.graph.num_nodes,
        normalization="randomwalk",
    )
    dense = dense_matern_precision(lap, kernel.nu, 1.3, degree=deg)
    v = rng.standard_normal((kernel.graph.num_nodes, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mv(jnp.asarray(v))), dense @ v, rtol=5e-3, atol=5e-4
    )


def test_kernel_accepts_prebuilt_graph():
    """RiemannKernel(graph=...) skips the constructor kNN build — needed for
    million-node procedurally-built graphs (benchmark/bench_large_scale.py)
    and external ANN indexes."""
    import numpy as np

    from manifold_gp_tpu.kernels import RiemannMaternKernel
    from manifold_gp_tpu.ops.graph import build_graph

    rng = np.random.default_rng(5)
    x = rng.standard_normal((120, 3)).astype(np.float32)
    g = build_graph(x, 5)
    k = RiemannMaternKernel(
        nu=1, x=x, nearest_neighbors=5,
        laplacian_normalization="randomwalk", num_modes=6, graph=g,
    )
    assert k.graph is g
    p = k.init_params(graphbandwidth=0.5, lengthscale=1.0)
    val, vec = k.eval_basis(p)
    assert vec.shape == (120, 6)
