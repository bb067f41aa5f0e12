"""Model-level multi-chip path: RiemannGP on a row-sharded mesh.

VERDICT round 1 item 2: the training loss itself (quad + SLQ logdet, and the
semisupervised Schur inner CG) must run on the row-sharded SpMV from
parallel/spmv.py and match the single-device values and gradients. All on
the 8-virtual-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP
from manifold_gp_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def medium_cloud():
    """N=2048 noisy circle — large enough that the mesh path's padding and
    sharding are exercised across all 8 devices."""
    rng = np.random.default_rng(99)
    n = 2048
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    y = np.sin(3 * t)
    return x.astype(np.float32), y.astype(np.float32)


def _build(x, y, cfg, mesh=None, labeled=None):
    kernel = RiemannMaternKernel(
        nu=2, x=x, nearest_neighbors=6,
        laplacian_normalization="randomwalk", num_modes=10, cfg=cfg,
        mesh=mesh,
    )
    ty = y if labeled is None else y[labeled]
    model = RiemannGP(x[labeled] if labeled is not None else x, ty, kernel,
                      labeled=labeled, cfg=cfg)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.35, lengthscale=1.0
    )
    return model, params


def test_sharded_supervised_mll_matches_single_device(medium_cloud, mesh):
    """Sharded mll_loss (quad + SLQ with support-embedded probes) vs the
    single-device loss at N=2048 — same key draws the same probes, so values
    agree to matvec-roundoff, and the custom-VJP gradients follow."""
    x, y = medium_cloud
    cfg = InferenceConfig(
        max_cholesky=0, num_probes=16, lanczos_max_iter=30,
        cg_tolerance=1e-4, cg_max_iter=400, dense_operator_max_size=4096,
        use_block_sparse=False,
    )
    key = jax.random.PRNGKey(3)

    m_ref, p_ref = _build(x, y, cfg)
    loss_ref, g_ref = jax.jit(jax.value_and_grad(m_ref.mll_loss))(p_ref, key)

    m_sh, p_sh = _build(x, y, cfg, mesh=mesh)
    loss_sh, g_sh = jax.jit(jax.value_and_grad(m_sh.mll_loss))(p_sh, key)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-3)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sh[k]), np.asarray(g_ref[k]), rtol=3e-2, atol=1e-4
        )


def test_sharded_semisup_mll_matches_single_device(small_cloud, mesh):
    """Masked-Schur semisupervised loss on the mesh vs the index-compacted
    single-device Schur — exact dense-Cholesky logdet regime, so the match
    is tight."""
    x, y = small_cloud
    labeled = np.zeros(len(y), bool)
    labeled[::8] = True
    cfg = InferenceConfig(
        max_cholesky=800, cg_tolerance=1e-6, cg_max_iter=800,
        dense_operator_max_size=4096, use_block_sparse=False,
    )

    m_ref, p_ref = _build(x, y, cfg, labeled=labeled)
    loss_ref, g_ref = jax.jit(jax.value_and_grad(m_ref.mll_loss))(p_ref)

    m_sh, p_sh = _build(x, y, cfg, mesh=mesh, labeled=labeled)
    loss_sh, g_sh = jax.jit(jax.value_and_grad(m_sh.mll_loss))(p_sh)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sh[k]), np.asarray(g_ref[k]), rtol=1e-2, atol=1e-5
        )


def test_sharded_supervised_mll_fused_mesh(medium_cloud, mesh):
    """Round-2 VERDICT item 1: the mesh model must dispatch to the FUSED
    block-ELL SpMV (not the gather scan) and still match the single-device
    loss + gradients. Reference = single-device dense-operator path."""
    x, y = medium_cloud
    key = jax.random.PRNGKey(3)
    cfg_ref = InferenceConfig(
        max_cholesky=0, num_probes=16, lanczos_max_iter=30,
        cg_tolerance=1e-4, cg_max_iter=400, dense_operator_max_size=4096,
        use_block_sparse=False,
    )
    m_ref, p_ref = _build(x, y, cfg_ref)
    loss_ref, g_ref = jax.jit(jax.value_and_grad(m_ref.mll_loss))(p_ref, key)

    cfg_sh = cfg_ref.replace(use_block_sparse=True)
    m_sh, p_sh = _build(x, y, cfg_sh, mesh=mesh)
    assert m_sh.kernel._mesh_fused is not None, "fused mesh layout must build"
    loss_sh, g_sh = jax.jit(jax.value_and_grad(m_sh.mll_loss))(p_sh, key)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-3)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sh[k]), np.asarray(g_ref[k]), rtol=3e-2, atol=1e-4
        )


def test_sharded_semisup_mll_fused_mesh(small_cloud, mesh):
    """Fused-mesh masked Schur + permuted-row embeddings (y, masks, support)
    vs the single-device Schur in the exact dense-Cholesky logdet regime."""
    x, y = small_cloud
    labeled = np.zeros(len(y), bool)
    labeled[::8] = True
    cfg_ref = InferenceConfig(
        max_cholesky=800, cg_tolerance=1e-6, cg_max_iter=800,
        dense_operator_max_size=4096, use_block_sparse=False,
    )
    m_ref, p_ref = _build(x, y, cfg_ref, labeled=labeled)
    loss_ref, g_ref = jax.jit(jax.value_and_grad(m_ref.mll_loss))(p_ref)

    cfg_sh = cfg_ref.replace(use_block_sparse=True)
    m_sh, p_sh = _build(x, y, cfg_sh, mesh=mesh, labeled=labeled)
    assert m_sh.kernel._mesh_fused is not None
    loss_sh, g_sh = jax.jit(jax.value_and_grad(m_sh.mll_loss))(p_sh)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sh[k]), np.asarray(g_ref[k]), rtol=1e-2, atol=1e-5
        )


def test_fused_mesh_chunked_dense_logdet_matches_batched(small_cloud, mesh):
    """The lax.map column-chunked support-block densification (guarding the
    multi-GB embedded identity at large Np) equals the single-batch dense
    block it replaces."""
    x, y = small_cloud
    labeled = np.zeros(len(y), bool)
    labeled[::2] = True  # 80 labeled -> exact-Cholesky regime
    cfg = InferenceConfig(
        max_cholesky=800, cg_tolerance=1e-6, cg_max_iter=800,
        use_block_sparse=True,
    )
    m_sh, p_sh = _build(x, y, cfg, mesh=mesh, labeled=labeled)
    n = m_sh.num_data
    npad = m_sh.kernel.n_padded
    mv = m_sh._precision_matvec_sharded(p_sh, noise=True)
    support = m_sh._support_pad
    chunk = 128
    nch = -(-n // chunk)
    pad = nch * chunk - n
    rows = jnp.concatenate(
        [support, jnp.zeros((pad,), support.dtype)]
    ).reshape(nch, chunk)
    valid = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    ).reshape(nch, chunk)

    def one_chunk(args):
        r, w = args
        rhs = (
            jnp.zeros((npad, chunk), jnp.float32)
            .at[r, jnp.arange(chunk)]
            .set(w)
        )
        return mv(rhs)[support]

    cols = jax.lax.map(one_chunk, (rows, valid))
    dense_chunked = jnp.moveaxis(cols, 0, 1).reshape(n, nch * chunk)[:, :n]
    eye_emb = (
        jnp.zeros((npad, n), jnp.float32).at[support, jnp.arange(n)].set(1.0)
    )
    dense_batched = mv(eye_emb)[support]
    np.testing.assert_allclose(
        np.asarray(dense_chunked), np.asarray(dense_batched), atol=1e-5
    )


def test_sharded_slq_logdet_matches_dense(medium_cloud, mesh, rng):
    """SLQ on the row-sharded matvec (padded probes + true trace dimension)
    vs the dense logdet oracle — the sharded-SLQ test VERDICT asked for."""
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.ops.matern import make_matern_precision_matvec
    from manifold_gp_tpu.ops.slq import rademacher_probes, slq_logdet
    from manifold_gp_tpu.parallel import make_sharded_matern_precision_matvec

    x, _ = medium_cloud
    x = x[:512]
    graph = build_graph(x, 6)
    n = graph.num_nodes
    c = laplacian_coeffs(graph, 0.35)
    nu, ls = 2, 1.0

    dense = make_matern_precision_matvec(graph, c, nu, ls, "randomwalk")(
        jnp.eye(n, dtype=jnp.float32)
    )
    ld_exact = 2.0 * float(
        jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(dense))))
    )

    mv, n_pad = make_sharded_matern_precision_matvec(
        graph, mesh, c, nu, ls, "randomwalk"
    )
    z = rademacher_probes(jax.random.PRNGKey(11), n, 64)
    probes = jnp.zeros((n_pad, 64), jnp.float32).at[jnp.arange(n)].set(z)
    ld_sh = float(
        jax.jit(
            lambda p: slq_logdet(mv, p, num_steps=40, cg_tol=1e-4,
                                 cg_max_iter=400, num_nodes=n)
        )(probes)
    )
    # Monte-Carlo tolerance: 64 probes, 40 Lanczos steps.
    assert abs(ld_sh - ld_exact) / abs(ld_exact) < 0.05, (ld_sh, ld_exact)


def test_sharded_training_step_runs(medium_cloud, mesh):
    """One jitted Adam step over the sharded loss compiles and produces
    finite updates (the dryrun_multichip shape, as a unit test)."""
    import optax

    x, y = medium_cloud
    cfg = InferenceConfig(
        max_cholesky=0, num_probes=8, lanczos_max_iter=20,
        cg_tolerance=1e-3, cg_max_iter=100, use_block_sparse=False,
    )
    model, params = _build(x, y, cfg, mesh=mesh)
    opt = optax.adam(1e-1)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        loss, grads = jax.value_and_grad(model.mll_loss)(params, key)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    params2, _, loss = step(params, state, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for k in params2:
        assert np.all(np.isfinite(np.asarray(params2[k])))


def test_sharded_manifold_informed_train(medium_cloud, mesh):
    """The full training utility (chunked lax.scan epochs, plateau scheduler,
    outputscale renormalization) drives a mesh model end to end."""
    from manifold_gp_tpu.utils import ReduceLROnPlateau, manifold_informed_train

    x, y = medium_cloud
    cfg = InferenceConfig(
        max_cholesky=0, num_probes=8, lanczos_max_iter=20,
        cg_tolerance=1e-3, cg_max_iter=150, use_block_sparse=False,
    )
    model, params = _build(x, y, cfg, mesh=mesh)
    params, loss, _ = manifold_informed_train(
        model, params, lr=5e-2, max_iter=4, tolerance=0.0,
        update_norm=None, num_rand_vec=32,
        scheduler=ReduceLROnPlateau(factor=0.5, patience=50, threshold=1e-3),
        verbose=False,
    )
    assert np.isfinite(float(loss))
    for k, v in params.items():
        assert np.all(np.isfinite(np.asarray(v))), k


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "scan"])
def test_mesh_predict_cycle_matches_single_device(medium_cloud, mesh, fused):
    """Round-4 VERDICT item 4: the full mesh train->eval->posterior cycle.

    Train a few Adam steps ON the mesh model (fused block-ELL and ELL-scan
    layouts), then run the prediction chain on the SAME mesh-trained params:
    eval() -> eval_basis (sharded LOBPCG over the mesh SpMV) -> features ->
    Woodbury posterior, for in-sample and out-of-sample queries. The
    reference posterior is a single-device model evaluated at identical
    params ON THE SAME BASIS (injected): this isolates the mesh GLUE —
    features on the gathered eigvec, Woodbury cache, modulation — which is
    the part round-3 VERDICT flagged as untested. Basis-level agreement of
    the sharded LOBPCG itself is covered by tests/test_eval_basis_10k.py;
    comparing posteriors across DIFFERENT eigensolvers is ill-posed here
    because the circle graph's low spectrum is a near-degenerate cluster
    whose internal basis is arbitrary (the reference has the same property
    between LAPACK builds).

    Where each stage runs: the basis extraction is the sharded LOBPCG on the
    row-sharded operator (multi-chip); the m x m Woodbury cache and the
    [n*, m] feature products are replicated dense work (m = num_modes), by
    design — they are tiny next to the basis solve.
    """
    import optax

    x, y = medium_cloud
    cfg = InferenceConfig(
        max_cholesky=0, num_probes=8, lanczos_max_iter=20,
        cg_tolerance=1e-3, cg_max_iter=150, use_block_sparse=fused,
    )
    model, params = _build(x, y, cfg, mesh=mesh)
    if fused:
        assert model.kernel._mesh_fused is not None
    else:
        assert model.kernel._sharded_tables is not None

    # a short real mesh training run, so the evaluated params are
    # mesh-trained rather than hand-initialized
    opt = optax.adam(5e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        loss, grads = jax.value_and_grad(model.mll_loss)(params, key)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    for i in range(3):
        params, state, loss = step(params, state, jax.random.PRNGKey(i))
    assert np.isfinite(float(loss))

    xs = (x[::31] + 0.02).astype(np.float32)
    model.eval(params)
    basis_mesh = model._cache["basis"]
    assert np.all(np.isfinite(np.asarray(basis_mesh[1])))
    post_tr_sh = model.posterior(params, model.kernel.x, is_train=True)
    post_te_sh = model.posterior(params, xs)

    m_ref, _ = _build(x, y, cfg.replace(use_block_sparse=False))
    m_ref.kernel.eval_basis = lambda p: basis_mesh  # inject the mesh basis
    m_ref.eval(params)
    post_tr_1 = m_ref.posterior(params, m_ref.kernel.x, is_train=True)
    post_te_1 = m_ref.posterior(params, xs)

    # identical basis + identical params -> the padded/gathered mesh glue
    # must reproduce the single-device posterior to matvec roundoff
    for a, b in [(post_tr_sh, post_tr_1), (post_te_sh, post_te_1)]:
        np.testing.assert_allclose(
            np.asarray(a.mean), np.asarray(b.mean), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(a.stddev), np.asarray(b.stddev), atol=1e-4
        )
