"""On-disk graph/basis cache (utils/cache.py) — round-4 VERDICT item 9.

Hit test (second call loads without rebuilding), eviction-on-mismatch test
(different k / bandwidth / data -> rebuild), corrupt-entry eviction, and
numerical equality of cached vs fresh artifacts.
"""

import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.utils.cache import (
    cached_eval_basis,
    cached_graph,
    clear_cache,
    graph_cache_key,
)


@pytest.fixture()
def cloud(rng):
    n = 300
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1)
    x += 0.01 * rng.standard_normal(x.shape)
    return x.astype(np.float32)


def test_graph_cache_hit_and_equality(cloud, tmp_path):
    calls = []

    def builder():
        calls.append(1)
        return build_graph(cloud, 8)

    g1, hit1 = cached_graph(cloud, 8, str(tmp_path), builder=builder)
    g2, hit2 = cached_graph(cloud, 8, str(tmp_path), builder=builder)
    assert (hit1, hit2) == (False, True)
    assert len(calls) == 1, "second call must load, not rebuild"
    np.testing.assert_array_equal(np.asarray(g1.rows), np.asarray(g2.rows))
    np.testing.assert_array_equal(np.asarray(g1.cols), np.asarray(g2.cols))
    np.testing.assert_array_equal(np.asarray(g1.sqdist), np.asarray(g2.sqdist))
    np.testing.assert_array_equal(
        np.asarray(g1.ell_col), np.asarray(g2.ell_col)
    )
    assert g1.max_degree == g2.max_degree


def test_graph_cache_evicts_on_mismatch(cloud, tmp_path):
    g1, _ = cached_graph(cloud, 8, str(tmp_path))
    # different k -> different key -> rebuild
    g2, hit = cached_graph(cloud, 6, str(tmp_path))
    assert not hit
    assert g2.num_edges != g1.num_edges
    # different data -> different key -> rebuild
    _, hit = cached_graph(cloud + 0.5, 8, str(tmp_path))
    assert not hit
    # original still hits
    _, hit = cached_graph(cloud, 8, str(tmp_path))
    assert hit
    assert clear_cache(str(tmp_path)) == 3
    _, hit = cached_graph(cloud, 8, str(tmp_path))
    assert not hit


def test_graph_cache_corrupt_entry_evicted(cloud, tmp_path):
    cached_graph(cloud, 8, str(tmp_path))
    key = graph_cache_key(cloud, 8, "device")
    p = tmp_path / f"graph_{key}.npz"
    p.write_bytes(b"garbage")
    g, hit = cached_graph(cloud, 8, str(tmp_path))
    assert not hit  # corrupt entry silently evicted + rebuilt
    g2, hit = cached_graph(cloud, 8, str(tmp_path))
    assert hit
    np.testing.assert_array_equal(np.asarray(g.rows), np.asarray(g2.rows))


def test_basis_cache_hit_and_bandwidth_eviction(cloud, tmp_path):
    cfg = InferenceConfig()
    kernel = RiemannMaternKernel(
        nu=2, x=cloud, nearest_neighbors=6,
        laplacian_normalization="randomwalk", num_modes=8, cfg=cfg,
    )
    params = kernel.init_params(graphbandwidth=0.3, lengthscale=1.0)
    (val1, vec1), hit1 = cached_eval_basis(kernel, params, str(tmp_path))
    (val2, vec2), hit2 = cached_eval_basis(kernel, params, str(tmp_path))
    assert (hit1, hit2) == (False, True)
    np.testing.assert_array_equal(np.asarray(val1), np.asarray(val2))
    np.testing.assert_array_equal(np.asarray(vec1), np.asarray(vec2))
    # the cached basis equals a fresh eval
    fval, fvec = kernel.eval_basis(params)
    np.testing.assert_allclose(np.asarray(val2), np.asarray(fval), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vec2), np.asarray(fvec), atol=1e-6)
    # a moved bandwidth is a different Laplacian -> key miss
    params2 = kernel.init_params(graphbandwidth=0.4, lengthscale=1.0)
    (_, _), hit3 = cached_eval_basis(kernel, params2, str(tmp_path))
    assert not hit3
