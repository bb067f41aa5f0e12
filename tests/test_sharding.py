"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(what the reference entirely lacks; SURVEY §2.3/§4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import adjacency_matvec_ell, laplacian_coeffs
from manifold_gp_tpu.parallel import (
    make_mesh,
    shard_graph_rows,
    sharded_adjacency_matvec,
    use_mesh,
)

EPS = 0.35


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_spmv_matches_single_device(small_cloud, mesh, rng):
    x, _ = small_cloud
    graph = build_graph(x, 6)
    c = laplacian_coeffs(graph, EPS)
    v = rng.standard_normal((graph.num_nodes, 4)).astype(np.float32)
    expected = np.asarray(adjacency_matvec_ell(graph, c.triu, jnp.asarray(v)))

    ell_edge, ell_col, ell_mask, n_pad = shard_graph_rows(graph, mesh)
    v_pad = np.zeros((n_pad, 4), np.float32)
    v_pad[: graph.num_nodes] = v
    out = sharded_adjacency_matvec(
        ell_edge, ell_col, ell_mask, c.triu, jnp.asarray(v_pad), mesh
    )
    np.testing.assert_allclose(
        np.asarray(out)[: graph.num_nodes], expected, rtol=1e-4, atol=1e-5
    )


def test_ring_spmv_matches_gather(small_cloud, mesh, rng):
    """ppermute ring operand exchange (engaged above the per-chip gather
    budget — VERDICT r2 item 6) vs the all-gather schedule and the
    single-device ELL matvec."""
    x, _ = small_cloud
    graph = build_graph(x, 6)
    c = laplacian_coeffs(graph, EPS)
    v = rng.standard_normal((graph.num_nodes, 4)).astype(np.float32)
    expected = np.asarray(adjacency_matvec_ell(graph, c.triu, jnp.asarray(v)))

    ell_edge, ell_col, ell_mask, n_pad = shard_graph_rows(graph, mesh)
    v_pad = np.zeros((n_pad, 4), np.float32)
    v_pad[: graph.num_nodes] = v
    out_ring = sharded_adjacency_matvec(
        ell_edge, ell_col, ell_mask, c.triu, jnp.asarray(v_pad), mesh,
        ring=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_ring)[: graph.num_nodes], expected, rtol=1e-4, atol=1e-5
    )
    out_gather = sharded_adjacency_matvec(
        ell_edge, ell_col, ell_mask, c.triu, jnp.asarray(v_pad), mesh,
        ring=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_gather), rtol=1e-5, atol=1e-6
    )

    # the automatic dispatch rule: ring engages above the byte budget
    from manifold_gp_tpu.parallel import spmv as spmv_mod

    assert n_pad * 4 * 4 <= spmv_mod._OPERAND_GATHER_BUDGET  # this test: gather
    big = spmv_mod._OPERAND_GATHER_BUDGET // (4 * n_pad) + 1
    assert n_pad * big * 4 > spmv_mod._OPERAND_GATHER_BUDGET  # would ring


def test_training_step_under_mesh(small_cloud, mesh):
    """A full (SLQ-path) training step compiles and runs with GSPMD sharding
    hints active; values match the unsharded run."""
    from manifold_gp_tpu.kernels import RiemannMaternKernel
    from manifold_gp_tpu.models import RiemannGP

    x, y = small_cloud
    cfg = InferenceConfig(
        max_cholesky=0, num_probes=16, lanczos_max_iter=30,
        cg_tolerance=1e-3, cg_max_iter=200, dense_operator_max_size=0,
    )
    kernel = RiemannMaternKernel(
        nu=1, x=x, nearest_neighbors=6, laplacian_normalization="randomwalk",
        num_modes=10, cfg=cfg,
    )
    model = RiemannGP(x, y, kernel, cfg=cfg)
    params = model.init_params(noise=1e-2, outputscale=1.0, graphbandwidth=EPS,
                               lengthscale=1.0)
    key = jax.random.PRNGKey(0)

    loss_ref, grads_ref = jax.value_and_grad(model.mll_loss)(params, key)
    with use_mesh(mesh):
        loss_sh, grads_sh = jax.jit(jax.value_and_grad(model.mll_loss))(params, key)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-3)
    for k in grads_ref:
        np.testing.assert_allclose(
            np.asarray(grads_sh[k]), np.asarray(grads_ref[k]), rtol=2e-2, atol=1e-5
        )


def test_graft_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_matern_precision_matches_dense_oracle(small_cloud, mesh, rng):
    """Row-sharded Q matvec + sharded CG solve match the single-device
    fused path and the dense oracle (multi-host CG building block)."""
    from manifold_gp_tpu.ops.cg import cg_raw, cg_solve
    from manifold_gp_tpu.ops.matern import make_matern_precision_matvec
    from manifold_gp_tpu.parallel import (
        make_sharded_matern_precision_matvec,
        pad_nodes,
    )

    x, _ = small_cloud
    graph = build_graph(x, 6)
    c = laplacian_coeffs(graph, EPS)
    nu, ls = 2, 1.3
    n = graph.num_nodes
    v = rng.standard_normal((n, 4)).astype(np.float32)

    ref_mv = make_matern_precision_matvec(graph, c, nu, ls, "randomwalk")
    expected = np.asarray(ref_mv(jnp.asarray(v)))

    mv, n_pad = make_sharded_matern_precision_matvec(
        graph, mesh, c, nu, ls, "randomwalk"
    )
    v_pad = np.zeros((n_pad, 4), np.float32)
    v_pad[:n] = v
    out = mv(pad_nodes(v_pad, n_pad, mesh))
    np.testing.assert_allclose(np.asarray(out)[:n], expected, rtol=1e-4, atol=1e-5)

    # Sharded CG (psum'd dot products under GSPMD) vs single-device CG.
    sol_sharded = jax.jit(lambda b: cg_raw(mv, b, tol=1e-8, max_iter=400))(
        pad_nodes(v_pad, n_pad, mesh)
    )
    sol_ref = cg_solve(ref_mv, jnp.asarray(v), tol=1e-8, max_iter=400)
    np.testing.assert_allclose(
        np.asarray(sol_sharded)[:n], np.asarray(sol_ref), rtol=1e-3, atol=1e-4
    )
