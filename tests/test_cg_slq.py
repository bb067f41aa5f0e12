"""Iterative-inference engine: CG, implicit differentiation, Lanczos, SLQ."""

import jax
import jax.numpy as jnp
import numpy as np

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.ops import engine
from manifold_gp_tpu.ops.cg import cg_raw, cg_solve
from manifold_gp_tpu.ops.slq import lanczos_batched, rademacher_probes, slq_logdet


def _spd(rng, n, cond=50.0):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.linspace(1.0, cond, n)
    return (q * evals) @ q.T


def test_cg_solves_spd(rng):
    n = 60
    a = _spd(rng, n).astype(np.float32)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    x = cg_raw(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), tol=1e-6, max_iter=500)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-3, atol=1e-3)


def test_cg_single_vector_shape(rng):
    n = 30
    a = _spd(rng, n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x = cg_raw(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), tol=1e-6, max_iter=200)
    assert x.shape == (n,)


def test_cg_solve_gradient_matches_dense(rng):
    """Implicit VJP vs differentiating an explicit dense solve."""
    n = 25
    a = _spd(rng, n, cond=10).astype(np.float32)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def f_cg(theta):
        mv = lambda v: jnp.asarray(a) @ v + theta * v
        return jnp.dot(w, cg_solve(mv, b, tol=1e-8, max_iter=500))

    def f_dense(theta):
        return jnp.dot(w, jnp.linalg.solve(jnp.asarray(a) + theta * jnp.eye(n), b))

    g1 = jax.grad(f_cg)(jnp.float32(0.5))
    g2 = jax.grad(f_dense)(jnp.float32(0.5))
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-3)


def test_lanczos_tridiagonalizes(rng):
    n = 40
    a = _spd(rng, n, cond=20).astype(np.float32)
    q0 = rng.standard_normal((n, 1)).astype(np.float32)
    q0 /= np.linalg.norm(q0)
    alphas, betas, valid = lanczos_batched(
        lambda v: jnp.asarray(a) @ v, jnp.asarray(q0), n
    )
    t = np.diag(np.asarray(alphas)[:, 0]) + np.diag(np.asarray(betas)[:-1, 0], 1) + np.diag(
        np.asarray(betas)[:-1, 0], -1
    )
    # Without reorthogonalization the interior Ritz values drift in f32, but
    # the extreme eigenvalues (what Gauss quadrature weights most) converge.
    ritz = np.sort(np.linalg.eigvalsh(t))
    exact = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(ritz[0], exact[0], rtol=1e-2)
    np.testing.assert_allclose(ritz[-1], exact[-1], rtol=1e-2)


def test_slq_logdet_value(rng):
    n = 300
    a = _spd(rng, n, cond=30).astype(np.float32)
    exact = float(np.linalg.slogdet(a)[1])
    probes = rademacher_probes(jax.random.PRNGKey(0), n, 64)
    est = slq_logdet(lambda v: jnp.asarray(a) @ v, probes, num_steps=40)
    assert abs(float(est) - exact) / abs(exact) < 0.05


def test_slq_logdet_gradient(rng):
    """Hutchinson gradient vs exact d/d(theta) logdet(A + theta I) = tr(inv)."""
    n = 120
    a = _spd(rng, n, cond=10).astype(np.float32)
    probes = rademacher_probes(jax.random.PRNGKey(1), n, 256)

    def f(theta):
        return slq_logdet(
            lambda v: jnp.asarray(a) @ v + theta * v,
            probes,
            num_steps=50,
            cg_tol=1e-6,
            cg_max_iter=500,
        )

    g = jax.grad(f)(jnp.float32(0.3))
    exact = np.trace(np.linalg.inv(a + 0.3 * np.eye(n)))
    np.testing.assert_allclose(float(g), exact, rtol=0.05)


def test_engine_dense_dispatch(rng):
    n = 50
    a = _spd(rng, n, cond=8).astype(np.float32)
    cfg = InferenceConfig(max_cholesky=100)
    mv = lambda v: jnp.asarray(a) @ v
    ld = engine.logdet(mv, n, cfg)
    np.testing.assert_allclose(float(ld), np.linalg.slogdet(a)[1], rtol=1e-4)
    b = rng.standard_normal(n).astype(np.float32)
    x = engine.solve(mv, jnp.asarray(b), n, cfg)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-3, atol=1e-3)


def test_engine_average_variance_exact(rng):
    n = 30
    a = _spd(rng, n, cond=5).astype(np.float32)
    cfg = InferenceConfig(max_cholesky=100)
    av = engine.average_variance(lambda v: jnp.asarray(a) @ v, n, 100, cfg)
    np.testing.assert_allclose(
        float(av), np.diagonal(np.linalg.inv(a)).mean(), rtol=1e-4
    )
