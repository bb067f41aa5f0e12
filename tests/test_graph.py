"""kNN search + graph construction semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops.graph import build_graph, coalesce_mean
from manifold_gp_tpu.ops.knn import knn_search


def test_knn_exact_small(rng):
    x = rng.standard_normal((50, 3)).astype(np.float32)
    q = rng.standard_normal((7, 3)).astype(np.float32)
    d, i = knn_search(x, q, 5)
    # numpy oracle
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    oi = np.argsort(full, axis=1)[:, :5]
    od = np.take_along_axis(full, oi, axis=1)
    np.testing.assert_allclose(np.asarray(d), od, rtol=1e-4, atol=1e-4)
    assert np.array_equal(np.asarray(i), oi)


def test_knn_self_query_pins_diagonal(rng):
    x = rng.standard_normal((40, 4)).astype(np.float32)
    d, i = knn_search(x, x, 4, self_query=True)
    assert np.array_equal(np.asarray(i[:, 0]), np.arange(40))
    np.testing.assert_allclose(np.asarray(d[:, 0]), 0.0, atol=1e-5)


def test_knn_blocking_matches_unblocked(rng):
    x = rng.standard_normal((300, 5)).astype(np.float32)
    d1, i1 = knn_search(x, x, 6, self_query=True, block_size=64)
    d2, i2 = knn_search(x, x, 6, self_query=True, block_size=512)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    assert np.array_equal(np.asarray(i1), np.asarray(i2))


def test_coalesce_mean():
    rows = [0, 0, 1, 0]
    cols = [1, 2, 2, 1]
    vals = [1.0, 4.0, 5.0, 3.0]
    r, c, v = coalesce_mean(rows, cols, vals, 3)
    assert list(r) == [0, 0, 1]
    assert list(c) == [1, 2, 2]
    np.testing.assert_allclose(v, [2.0, 4.0, 5.0])


def test_build_graph_structure(small_cloud):
    x, _ = small_cloud
    k = 6
    g = build_graph(x, k)
    rows, cols = np.asarray(g.rows), np.asarray(g.cols)
    # upper-triangular orientation
    assert np.all(rows <= cols)
    # no duplicate pairs
    keys = rows.astype(np.int64) * g.num_nodes + cols
    assert np.unique(keys).shape[0] == keys.shape[0]
    # every node has at least k-1 incident edges
    deg = np.bincount(rows, minlength=g.num_nodes) + np.bincount(
        cols, minlength=g.num_nodes
    )
    assert deg.min() >= k - 1
    # ELL table is consistent with the COO list
    ell_edge = np.asarray(g.ell_edge)
    ell_col = np.asarray(g.ell_col)
    ell_mask = np.asarray(g.ell_mask)
    for node in [0, 5, g.num_nodes - 1]:
        for s in range(g.max_degree):
            if ell_mask[node, s]:
                e = ell_edge[node, s]
                assert {rows[e], cols[e]} == {node, ell_col[node, s]} or (
                    rows[e] == cols[e] == node
                )


def test_graph_edge_values_are_sq_distances(small_cloud):
    x, _ = small_cloud
    g = build_graph(x, 5)
    rows, cols = np.asarray(g.rows), np.asarray(g.cols)
    expected = ((x[rows] - x[cols]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(g.sqdist), expected, rtol=1e-3, atol=1e-5)


class TestIVF:
    """Inverted-file approximate kNN (the reference's IndexIVFFlat regime)."""

    @pytest.fixture(scope="class")
    def clustered(self):
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((16, 8)).astype(np.float32) * 4
        x = centers[rng.integers(0, 16, 4000)] + 0.3 * rng.standard_normal(
            (4000, 8)
        ).astype(np.float32)
        return x

    def test_recall_vs_exact(self, clustered):
        from manifold_gp_tpu.ops.knn import ivf_build, ivf_search, knn_search

        k = 10
        exact_d, exact_i = knn_search(clustered, clustered, k, self_query=True)
        index = ivf_build(clustered, nlist=64)
        approx_d, approx_i = ivf_search(
            index, clustered, k, nprobe=16, self_query=True
        )
        hits = 0
        ei = np.asarray(exact_i)
        ai = np.asarray(approx_i)
        for r in range(ei.shape[0]):
            hits += len(set(ei[r]) & set(ai[r]))
        recall = hits / ei.size
        assert recall > 0.95, recall
        # self-match pinned to column 0 with zero distance
        np.testing.assert_array_equal(ai[:, 0], np.arange(ei.shape[0]))
        np.testing.assert_allclose(np.asarray(approx_d)[:, 0], 0.0)

    def test_ivf_graph_build(self, clustered):
        graph = build_graph(clustered, 8, knn_backend="ivf")
        assert graph.num_nodes == clustered.shape[0]
        r = np.asarray(graph.rows)
        c = np.asarray(graph.cols)
        assert (r <= c).all()
        # approximate search: every node keeps at least a few neighbors and
        # the average degree stays near the symmetrized-kNN expectation
        deg = np.bincount(np.concatenate([r, c]), minlength=graph.num_nodes)
        assert deg.min() >= 3
        assert deg.mean() > 7

    def test_nearest_neighbors_ivf_wrapper(self, clustered):
        from manifold_gp_tpu.ops.knn import NearestNeighbors, knn_search

        nn = NearestNeighbors(clustered, use_ivf=True, nlist=64, nprobe=32)
        d, i = nn.search(clustered[:100], 5)
        ed, ei = knn_search(clustered, clustered[:100], 5)
        overlap = np.mean([
            len(set(np.asarray(ei)[r]) & set(np.asarray(i)[r])) / 5
            for r in range(100)
        ])
        assert overlap > 0.9, overlap


def test_knn_ranking_survives_catastrophic_density(rng):
    """Round-5 regression (VERDICT item 6 root cause): at million-point
    manifold density the expanded-form |q|^2-2qx+|x|^2 distances quantize
    to noise (true spacing^2 ~ 1e-11 vs norms ~ 1, f32 eps 1e-7) and the
    single-stage top-k returned essentially random local candidates
    (measured recall 0.33 at the 1M operating point). The two-stage exact
    re-rank must reproduce the f64 oracle neighbor sets in exactly that
    regime, reproduced here at small N by shrinking the curve spacing."""
    import jax.numpy as jnp

    from manifold_gp_tpu.ops.knn import ivf_build, ivf_search, knn_search

    n, k = 2048, 8
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    # curve of radius ~1 sampled so adjacent spacing ~ 3e-6 of arc: scale
    # the parameter span down while keeping coordinates O(1)
    tt = t * 1e-3
    x = np.stack(
        [np.cos(tt) + 1.0, np.sin(tt) + 1.0, 0.3 * np.sin(2 * tt)], 1
    ).astype(np.float32)
    # f64 oracle
    d64 = ((x[:, None, :].astype(np.float64) - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d64, -1.0)
    oracle = np.argsort(d64, axis=1)[:, : k + 1]
    got_d, got_i = knn_search(x, x, k + 1, self_query=True)
    got_i = np.asarray(got_i)
    # neighbor SETS must match the oracle almost everywhere (boundary ties
    # at the (k+1)-th distance may legitimately swap)
    agree = np.mean([
        len(set(oracle[i].tolist()) & set(got_i[i].tolist())) / (k + 1)
        for i in range(n)
    ])
    assert agree > 0.995, agree
    # distances are the exact coordinate-differenced values, not the
    # cancelled ones (adjacent spacing^2 ~ (1e-3 * 2pi/2048)^2 ~ 9e-12)
    adj = np.asarray(got_d)[:, 1]
    assert np.all(adj > 0), "cancellation quantized distances to zero"
    np.testing.assert_allclose(
        adj, np.sort(d64 + np.eye(n))[:, 1][: n], rtol=2e-2, atol=1e-14
    )
    # IVF path: same regime, full probing
    index = ivf_build(jnp.asarray(x), nlist=16)
    _, iv_i = ivf_search(index, jnp.asarray(x), k + 1, nprobe=16,
                         self_query=True)
    iv_i = np.asarray(iv_i)
    agree_iv = np.mean([
        len(set(oracle[i].tolist()) & set(iv_i[i].tolist())) / (k + 1)
        for i in range(n)
    ])
    assert agree_iv > 0.995, agree_iv
