"""Edge-space solve cotangents (cfg.solve_cotangent="edge").

The panel-space VJP (ops.pallas_spmv.make_matvec_ad) accumulates solve
cotangents as [nrb, 128, S*128] buffers — at a 2-D 262k graph's S=22 a
training step keeps ~8 of them live (33 GB f32). The edge-space VJP
(make_matvec_edge_ad) contracts each one to the [M]+[N] coefficient vectors
inside the solve backward. These tests pin that the two paths compute the
SAME gradients (the contraction is exactly the transpose of ``assemble``'s
scatter), from the raw matvec up through the full training loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP
from manifold_gp_tpu.ops.block_sparse import build_block_layout
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
from manifold_gp_tpu.ops.matern import make_matern_precision_matvec
from manifold_gp_tpu.ops.pallas_spmv import make_matvec_edge_ad
from manifold_gp_tpu.ops.sparse_formats import assemble, permute_in


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 2 * np.pi, 900))
    x = np.stack([np.cos(t), np.sin(t), 0.3 * np.sin(2 * t)], 1).astype(
        np.float32
    )
    x += 0.01 * rng.standard_normal(x.shape).astype(np.float32)
    y = np.sin(3 * t).astype(np.float32)
    return x, y


def test_edge_ad_matches_autodiff_through_assemble(cloud):
    """Raw matvec: d/d(diag, triu, v) of the edge-AD wrapper equals plain
    JAX autodiff through assemble + the einsum matvec."""
    x, _ = cloud
    g = build_graph(x, 8, knn_backend="host")
    layout = build_block_layout(g)
    assert layout is not None
    c = laplacian_coeffs(g, 0.4)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((layout.num_padded, 4)), jnp.float32)
    pv = v
    cot = jnp.asarray(
        rng.standard_normal((layout.num_padded, 4)), jnp.float32
    )

    mv_edge = make_matvec_edge_ad(layout, use_pallas=False)

    def f_edge(diag, triu, pv):
        qb = jax.lax.stop_gradient(assemble(layout, diag, triu))
        return jnp.vdot(mv_edge(qb, diag, triu, pv), cot)

    def f_ref(diag, triu, pv):
        from manifold_gp_tpu.ops.block_sparse import matvec_permuted

        return jnp.vdot(matvec_permuted(layout, assemble(layout, diag, triu), pv), cot)

    # primal equality
    np.testing.assert_allclose(
        float(f_edge(c.diag, c.triu, pv)), float(f_ref(c.diag, c.triu, pv)),
        rtol=1e-6,
    )
    ge = jax.grad(f_edge, argnums=(0, 1, 2))(c.diag, c.triu, pv)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(c.diag, c.triu, pv)
    for a, b, name in zip(ge, gr, ("diag", "triu", "v")):
        # bar_v: the symmetric-reuse adjoint contracts in a different order
        # than autodiff's transpose — pure f32 roundoff (atol ~1e-6).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-6, err_msg=name
        )


@pytest.mark.parametrize("normalization", ["randomwalk", "symmetric"])
@pytest.mark.parametrize("nu", [1, 3])
def test_matern_edge_grad_matches_panel(cloud, normalization, nu):
    """Matérn precision closure: loss-like scalar value + gradient w.r.t.
    (graphbandwidth-dependent coeffs, lengthscale) agree between grad
    spaces."""
    x, _ = cloud
    g = build_graph(x, 8, knn_backend="host")
    layout = build_block_layout(g)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((g.num_nodes, 3)), jnp.float32)

    def scalar(gb, ls, grad_space):
        c = laplacian_coeffs(g, gb)
        mv = make_matern_precision_matvec(
            g, c, nu, ls, normalization,
            block=(layout, None), permuted_io=False, pallas=False,
            grad_space=grad_space,
        )
        return jnp.sum(v * mv(v))

    args = (jnp.float32(0.4), jnp.float32(1.3))
    vp, gp = jax.value_and_grad(scalar, argnums=(0, 1))(*args, "panel")
    ve, ge = jax.value_and_grad(scalar, argnums=(0, 1))(*args, "edge")
    np.testing.assert_allclose(float(ve), float(vp), rtol=1e-6)
    for a, b in zip(ge, gp):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-4)


def test_model_loss_grad_edge_vs_panel(cloud):
    """Full supervised training loss (quad + SLQ + noise/scale wrappers +
    pivchol preconditioner): value and every parameter gradient agree."""
    x, y = cloud
    base_cfg = InferenceConfig(
        max_cholesky=0,
        dense_operator_max_size=0,
        use_dia=False,  # force the block-ELL layout (edge mode's home)
        num_probes=16,
        lanczos_max_iter=16,
        cg_tolerance=1e-4,
        cg_max_iter=400,
        spmv_kernel="einsum",
        precond_type="pivchol",
        precond_rank=4,
    )
    losses, grads = {}, {}
    for space in ("panel", "edge"):
        cfg = base_cfg.replace(solve_cotangent=space)
        kernel = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=8,
            laplacian_normalization="randomwalk", num_modes=16, cfg=cfg,
        )
        model = RiemannGP(x, jnp.asarray(y), kernel, cfg=cfg)
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=0.4, lengthscale=1.0
        )
        val, gr = jax.value_and_grad(model.mll_loss)(
            params, key=jax.random.PRNGKey(0)
        )
        losses[space] = float(val)
        grads[space] = jax.device_get(gr)
    np.testing.assert_allclose(losses["edge"], losses["panel"], rtol=1e-5)
    for k in grads["panel"]:
        np.testing.assert_allclose(
            grads["edge"][k], grads["panel"][k], rtol=5e-4, atol=1e-6,
            err_msg=k,
        )


def test_edge_mode_rejects_dia_layout(cloud):
    x, _ = cloud
    g = build_graph(x, 8, knn_backend="host")
    from manifold_gp_tpu.ops.sparse_formats import build_layout
    from manifold_gp_tpu.ops.dia import DiaLayout

    layout = build_layout(g, use_dia=True)
    if not isinstance(layout, DiaLayout):
        pytest.skip("fixture not banded enough for DIA")
    c = laplacian_coeffs(g, 0.4)
    with pytest.raises(ValueError, match="block-ELL"):
        make_matern_precision_matvec(
            g, c, 2, 1.0, "randomwalk", block=(layout, None),
            grad_space="edge",
        )


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from manifold_gp_tpu.parallel import make_mesh

    return make_mesh(8)


def test_sharded_edge_grad_matches_panel(cloud, mesh8):
    """Mesh fused Matérn matvec (parallel.block_spmv): a loss-like scalar's
    value + (graphbandwidth, lengthscale) gradients agree between
    grad_space='edge' (make_sharded_block_matvec_edge_ad) and the default
    panel-space VJP, on the 8-device virtual mesh."""
    from manifold_gp_tpu.parallel.block_spmv import (
        build_mesh_block_tables,
        make_sharded_matern_precision_matvec_fused,
    )

    x, _ = cloud
    g = build_graph(x, 8, knn_backend="host")
    tables = build_mesh_block_tables(g, mesh8)
    assert tables is not None
    rng = np.random.default_rng(3)
    v_nodes = rng.standard_normal((g.num_nodes, 3)).astype(np.float32)
    v = jnp.asarray(tables.embed_rows(v_nodes))

    def scalar(gb, ls, grad_space):
        c = laplacian_coeffs(g, gb)
        mv = make_sharded_matern_precision_matvec_fused(
            tables, c, 2, ls, "randomwalk", grad_space=grad_space
        )
        return jnp.sum(v * mv(v))

    args = (jnp.float32(0.4), jnp.float32(1.3))
    vp, gp = jax.value_and_grad(scalar, argnums=(0, 1))(*args, "panel")
    ve, ge = jax.value_and_grad(scalar, argnums=(0, 1))(*args, "edge")
    np.testing.assert_allclose(float(ve), float(vp), rtol=1e-6)
    for a, b in zip(ge, gp):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-4)


def test_sharded_model_loss_edge_vs_panel(cloud, mesh8):
    """Full mesh training loss through RiemannGP(mesh=...): value and every
    parameter gradient agree between cotangent spaces."""
    x, y = cloud
    base_cfg = InferenceConfig(
        max_cholesky=0,
        dense_operator_max_size=0,
        use_dia=False,
        num_probes=16,
        lanczos_max_iter=12,
        cg_tolerance=1e-4,
        cg_max_iter=300,
        spmv_kernel="einsum",
    )
    from manifold_gp_tpu.parallel import make_mesh  # noqa: F401

    res = {}
    for space in ("panel", "edge"):
        cfg = base_cfg.replace(solve_cotangent=space)
        kernel = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=8,
            laplacian_normalization="randomwalk", num_modes=16, cfg=cfg,
            mesh=mesh8,
        )
        assert kernel._mesh_fused is not None
        model = RiemannGP(x, jnp.asarray(y), kernel, cfg=cfg)
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=0.4, lengthscale=1.0
        )
        val, gr = jax.value_and_grad(model.mll_loss)(
            params, key=jax.random.PRNGKey(0)
        )
        res[space] = (float(val), jax.device_get(gr))
    np.testing.assert_allclose(res["edge"][0], res["panel"][0], rtol=1e-5)
    for k in res["panel"][1]:
        np.testing.assert_allclose(
            res["edge"][1][k], res["panel"][1][k], rtol=5e-4, atol=1e-6,
            err_msg=k,
        )
