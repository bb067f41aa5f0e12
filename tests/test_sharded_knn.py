"""Row-sharded kNN search + graph build (parallel/knn.py).

Round-4 VERDICT item 1: SURVEY §2.2 row 1 names "rows sharded across chips
with shard_map" as part of the FAISS equivalent; until this round no sharded
build existed. Both schedules (replicated database, ppermute ring) must
reproduce the single-device exact search and builder bit-for-bit on
tie-free data. All on the 8-virtual-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def assert_topk_equal(d_sh, i_sh, d_ref, i_ref):
    """Top-k equality up to f32 tiling noise: the sharded panels contract
    the distance matmul in different tile orders than the single pass (last-
    ulp distance differences), and exactly/near-tied candidates may swap."""
    d_sh, i_sh = np.asarray(d_sh), np.asarray(i_sh)
    d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
    np.testing.assert_allclose(d_sh, d_ref, rtol=5e-5, atol=1e-6)
    mism = i_sh != i_ref
    if mism.any():
        # every index mismatch must sit on a (near-)tied distance
        np.testing.assert_allclose(
            d_sh[mism], d_ref[mism], rtol=5e-5, atol=1e-6
        )
        assert mism.mean() < 2e-3, f"{mism.sum()} mismatches"

from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.knn import knn_search
from manifold_gp_tpu.parallel import (
    build_graph_sharded,
    make_mesh,
    sharded_knn_search,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(42)
    n = 2048
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t), 0.3 * np.sin(2 * t)], 1)
    x += 0.01 * rng.standard_normal(x.shape)
    return x.astype(np.float32)


@pytest.mark.parametrize("schedule", ["replicated", "ring"])
def test_sharded_search_matches_single_device(cloud, mesh, schedule):
    """Self-query search: distances and indices equal the single-device
    exact search (random data — no exact distance ties)."""
    k = 9
    d_ref, i_ref = knn_search(cloud, cloud, k, self_query=True)
    d_sh, i_sh = sharded_knn_search(
        cloud, cloud, k, mesh, self_query=True, schedule=schedule,
        block_size=128,
    )
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)


@pytest.mark.parametrize("schedule", ["replicated", "ring"])
def test_sharded_search_out_of_sample(cloud, mesh, schedule):
    """Plain (non-self) queries, query count NOT divisible by the mesh."""
    k = 5
    q = (cloud[: 777] + 0.02).astype(np.float32)
    d_ref, i_ref = knn_search(cloud, q, k)
    d_sh, i_sh = sharded_knn_search(
        cloud, q, k, mesh, schedule=schedule, block_size=64
    )
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)


def test_ring_search_uneven_database(mesh):
    """Database row count not divisible by the mesh: padded rows must never
    appear as neighbors."""
    rng = np.random.default_rng(3)
    db = rng.standard_normal((1003, 4)).astype(np.float32)
    q = rng.standard_normal((130, 4)).astype(np.float32)
    k = 7
    d_ref, i_ref = knn_search(db, q, k)
    d_sh, i_sh = sharded_knn_search(db, q, k, mesh, schedule="ring",
                                    block_size=32)
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)
    assert np.asarray(i_sh).max() < 1003


@pytest.mark.parametrize("schedule", ["replicated", "ring"])
def test_sharded_graph_build_matches_single_device(cloud, mesh, schedule):
    """Full builder equality: edge list, values, ELL tables — the round-4
    VERDICT done-bar ('medium-N sharded-build equality test vs
    build_graph')."""
    g_ref = build_graph(cloud, 8)
    g_sh = build_graph_sharded(cloud, 8, mesh, schedule=schedule)
    assert g_sh.num_nodes == g_ref.num_nodes
    assert g_sh.num_edges == g_ref.num_edges
    np.testing.assert_array_equal(np.asarray(g_sh.rows), np.asarray(g_ref.rows))
    np.testing.assert_array_equal(np.asarray(g_sh.cols), np.asarray(g_ref.cols))
    np.testing.assert_allclose(
        np.asarray(g_sh.sqdist), np.asarray(g_ref.sqdist), rtol=1e-6, atol=1e-7
    )
    assert g_sh.max_degree == g_ref.max_degree
    np.testing.assert_array_equal(
        np.asarray(g_sh.ell_col), np.asarray(g_ref.ell_col)
    )


def test_sharded_build_feeds_kernel(cloud, mesh):
    """The sharded-built graph drops into the kernel/model stack through the
    (now demoted-to-escape-hatch) graph= injection point and produces the
    same loss as the internally built graph."""
    from manifold_gp_tpu.config import InferenceConfig
    from manifold_gp_tpu.kernels import RiemannMaternKernel
    from manifold_gp_tpu.models import RiemannGP

    x = cloud
    y = np.sin(3 * np.arctan2(x[:, 1], x[:, 0])).astype(np.float32)
    cfg = InferenceConfig(max_cholesky=0, num_probes=8, lanczos_max_iter=20,
                          cg_tolerance=1e-3, cg_max_iter=100)
    g_sh = build_graph_sharded(x, 6, mesh)

    def loss_with(graph):
        kernel = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=6,
            laplacian_normalization="randomwalk", num_modes=10, cfg=cfg,
            graph=graph,
        )
        model = RiemannGP(x, y, kernel, cfg=cfg)
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=0.3, lengthscale=1.0
        )
        return float(model.mll_loss(params, key=jax.random.PRNGKey(0)))

    l_sh = loss_with(g_sh)
    l_ref = loss_with(None)
    np.testing.assert_allclose(l_sh, l_ref, rtol=1e-5)


def test_nearest_neighbors_wrapper_mesh(cloud, mesh):
    """The NearestNeighbors class surface (reference utils/nearest_neighbors
    parity) dispatches to the sharded search/build when given a mesh."""
    from manifold_gp_tpu.ops.knn import NearestNeighbors

    nn_m = NearestNeighbors(cloud, mesh=mesh)
    nn_1 = NearestNeighbors(cloud)
    d_m, i_m = nn_m.search(nn_m.x, 6)
    d_1, i_1 = nn_1.search(nn_1.x, 6)
    assert_topk_equal(d_m, i_m, d_1, i_1)
    g_m = nn_m.graph(6)
    g_1 = nn_1.graph(6)
    np.testing.assert_array_equal(np.asarray(g_m.rows), np.asarray(g_1.rows))
    np.testing.assert_allclose(
        np.asarray(g_m.sqdist), np.asarray(g_1.sqdist), rtol=1e-6, atol=1e-7
    )


def test_kernel_oos_features_through_injected_index(cloud, mesh):
    """A kernel constructed with a mesh-sharded NearestNeighbors index
    produces the same out-of-sample features and modulation as the default
    exact index (round-4: features_test/modulation route through the
    configurable knn index instead of hardcoded brute force)."""
    from manifold_gp_tpu.config import InferenceConfig
    from manifold_gp_tpu.kernels import RiemannMaternKernel
    from manifold_gp_tpu.models import RiemannGP
    from manifold_gp_tpu.ops.knn import NearestNeighbors

    x = cloud[:512]
    y = np.sin(3 * np.arctan2(x[:, 1], x[:, 0])).astype(np.float32)
    xs = (x[::13] + 0.01).astype(np.float32)
    cfg = InferenceConfig()

    def posterior_with(knn_index):
        kernel = RiemannMaternKernel(
            nu=2, x=x, nearest_neighbors=6,
            laplacian_normalization="randomwalk", num_modes=8, cfg=cfg,
            knn_index=knn_index,
        )
        model = RiemannGP(x, y, kernel, cfg=cfg)
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=0.3, lengthscale=1.0
        )
        model.eval(params)
        return model.posterior(params, xs)

    p_mesh = posterior_with(NearestNeighbors(jnp.asarray(x), mesh=mesh))
    p_ref = posterior_with(None)
    np.testing.assert_allclose(
        np.asarray(p_mesh.mean), np.asarray(p_ref.mean), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_mesh.stddev), np.asarray(p_ref.stddev), atol=1e-5
    )


def test_ring_search_k_exceeds_shard(mesh):
    """Ring schedule with k larger than the per-device database shard: the
    per-step top-k is clamped and padded, the cross-step merge still
    produces the exact global top-k."""
    rng = np.random.default_rng(9)
    db = rng.standard_normal((350, 3)).astype(np.float32)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    k = 50  # > ceil(350/8) = 44 rows per device
    d_ref, i_ref = knn_search(db, q, k)
    d_sh, i_sh = sharded_knn_search(db, q, k, mesh, schedule="ring",
                                    block_size=32)
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)


def test_nearest_neighbors_ivf_graph_uses_index(cloud):
    """NearestNeighbors(use_ivf=True).graph() must route through the
    already-built IVF index (review finding: it silently fell back to the
    exact O(N^2) build, discarding the index and its tuning)."""
    from manifold_gp_tpu.ops.knn import NearestNeighbors

    nn = NearestNeighbors(cloud, use_ivf=True, nlist=32, nprobe=32)
    g_ivf = nn.graph(6)
    g_exact = build_graph(cloud, 6)
    # full-probe IVF over a smooth cloud reproduces the exact graph
    assert g_ivf.num_nodes == g_exact.num_nodes
    overlap = len(
        set(zip(np.asarray(g_ivf.rows).tolist(), np.asarray(g_ivf.cols).tolist()))
        & set(zip(np.asarray(g_exact.rows).tolist(), np.asarray(g_exact.cols).tolist()))
    ) / g_exact.num_edges
    assert overlap > 0.98, overlap


def test_sharded_ivf_matches_single_device(cloud, mesh):
    """Query-row-sharded IVF over the SAME index reproduces the
    single-device IVF search exactly (identical candidate ordering; round-4
    VERDICT item 5)."""
    from manifold_gp_tpu.ops.knn import ivf_build, ivf_search
    from manifold_gp_tpu.parallel.knn import sharded_ivf_search

    index = ivf_build(cloud, nlist=32)
    k, nprobe = 9, 8
    d_ref, i_ref = ivf_search(index, cloud, k, nprobe=nprobe, self_query=True)
    d_sh, i_sh = sharded_ivf_search(
        index, cloud, k, mesh, nprobe=nprobe, self_query=True, block_size=64
    )
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)
    # out-of-sample queries, count NOT divisible by the mesh
    rng = np.random.default_rng(3)
    q = cloud[: 333] + 0.01 * rng.standard_normal((333, 3)).astype(np.float32)
    d_ref, i_ref = ivf_search(index, q, k, nprobe=nprobe)
    d_sh, i_sh = sharded_ivf_search(index, q, k, mesh, nprobe=nprobe,
                                    block_size=64)
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)


def test_sharded_ivf_chunked_dispatch(cloud, mesh):
    """Host-level chunking composes with the sharded dispatch (chunk
    boundaries preserve global self-match row ids)."""
    from manifold_gp_tpu.ops.knn import ivf_build, ivf_search
    from manifold_gp_tpu.parallel.knn import sharded_ivf_search

    index = ivf_build(cloud, nlist=32)
    k, nprobe = 7, 8
    d_ref, i_ref = ivf_search(index, cloud, k, nprobe=nprobe, self_query=True)
    d_sh, i_sh = sharded_ivf_search(
        index, cloud, k, mesh, nprobe=nprobe, self_query=True, block_size=64,
        queries_per_dispatch=512,
    )
    assert_topk_equal(d_sh, i_sh, d_ref, i_ref)
    # self-match must sit in column 0 for every query in every chunk
    assert np.array_equal(np.asarray(i_sh)[:, 0], np.arange(cloud.shape[0]))


def test_nearest_neighbors_mesh_ivf_compose(cloud, mesh):
    """NearestNeighbors(mesh=..., use_ivf=True) — formerly asserted mutually
    exclusive — searches and builds through the sharded IVF path with
    near-exact recall at full probing."""
    from manifold_gp_tpu.ops.knn import NearestNeighbors

    nn = NearestNeighbors(cloud, use_ivf=True, nlist=32, nprobe=32, mesh=mesh)
    d, i = nn.search(cloud, 6, self_query=True)
    d_ref, i_ref = knn_search(cloud, cloud, 6, self_query=True)
    assert_topk_equal(d, i, d_ref, i_ref)
    g_ivf = nn.graph(6)
    g_exact = build_graph(cloud, 6)
    overlap = len(
        set(zip(np.asarray(g_ivf.rows).tolist(), np.asarray(g_ivf.cols).tolist()))
        & set(zip(np.asarray(g_exact.rows).tolist(), np.asarray(g_exact.cols).tolist()))
    ) / g_exact.num_edges
    assert overlap > 0.98, overlap
