"""Matrix-free Lanczos eigensolver vs dense eigh oracle (the reference's
Lanczos `diagonalization` path, graph_laplacian_operator.py:132-144)."""

import jax
import jax.numpy as jnp
import numpy as np

from manifold_gp_tpu.ops.eigen import lanczos_eigh
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs, laplacian_matvec


def test_lanczos_matches_dense_eigh_on_spd_matrix(rng):
    n, m = 120, 10
    a = rng.standard_normal((n, n)).astype(np.float32)
    spd = a @ a.T / n + np.diag(np.linspace(0.1, 3.0, n)).astype(np.float32)
    spd = 0.5 * (spd + spd.T)
    dense_val, dense_vec = np.linalg.eigh(spd)

    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    val, vec = jax.jit(
        lambda v0: lanczos_eigh(
            lambda v: jnp.asarray(spd) @ v, v0, num_modes=m, num_steps=3 * m + 60
        )
    )(v0)
    val, vec = np.asarray(val), np.asarray(vec)
    np.testing.assert_allclose(val, dense_val[:m], rtol=2e-3, atol=2e-4)
    # eigenvectors match up to sign
    for j in range(m):
        dot = abs(float(vec[:, j] @ dense_vec[:, j]))
        assert dot > 0.99, (j, dot)


def test_lanczos_on_graph_laplacian(small_cloud):
    """Smallest Laplacian eigenpairs from the sparse SpMV path (the large-N
    eval_basis route) agree with dense eigh."""
    x, _ = small_cloud
    graph = build_graph(x, 6)
    c = laplacian_coeffs(graph, 0.35)
    mv = lambda v: laplacian_matvec(graph, c, v, "symmetric")
    n = graph.num_nodes
    dense = np.asarray(mv(jnp.eye(n)))
    dense_val = np.linalg.eigvalsh(0.5 * (dense + dense.T))

    m = 12
    v0 = jnp.asarray(np.random.default_rng(3).standard_normal(n).astype(np.float32))
    val, vec = lanczos_eigh(mv, v0, num_modes=m, num_steps=120)
    val, vec = np.asarray(val), np.asarray(vec)
    np.testing.assert_allclose(val, dense_val[:m], rtol=5e-3, atol=1e-4)
    # residual check: ||L v - lambda v|| small
    for j in range(m):
        r = np.asarray(mv(jnp.asarray(vec[:, j]))) - val[j] * vec[:, j]
        assert np.linalg.norm(r) < 5e-3, (j, np.linalg.norm(r))
    # orthonormal basis
    np.testing.assert_allclose(vec.T @ vec, np.eye(m), atol=1e-4)


def test_lanczos_breakdown_rank_deficient():
    """Krylov exhaustion (operator with tiny invariant subspace) doesn't
    produce spurious zero eigenvalues."""
    n = 64
    # rank-3 + identity: eigenvalues {1 (x61), 2, 3, 4}
    rng = np.random.default_rng(0)
    u, _ = np.linalg.qr(rng.standard_normal((n, 3)))
    spd = np.eye(n) + (u * np.array([1.0, 2.0, 3.0])) @ u.T
    spd = spd.astype(np.float32)
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    val, _ = lanczos_eigh(lambda v: jnp.asarray(spd) @ v, v0, num_modes=4, num_steps=30)
    val = np.asarray(val)
    np.testing.assert_allclose(val[0], 1.0, rtol=1e-4)
    assert np.all(val >= 0.5), val
