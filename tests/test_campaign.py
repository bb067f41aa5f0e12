"""Driver-safe variant of the sustained training campaign (round-4 VERDICT
item 2): examples/run_large.py's full cycle — cached real graph build,
precond_refresh training with checkpoint-every-k, cached spectral basis,
posterior RMSE against the synthetic curve's known ground truth — at test
scale on CPU. The full-scale (262k/1M) rows live in PARITY.md; this pins
the protocol itself: cache keys round-trip, resume is seamless, and the
posterior actually recovers the ground truth through the whole pipeline.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "examples"))

from run_large import run_campaign  # noqa: E402


@pytest.fixture(scope="module")
def campaign_results(tmp_path_factory):
    cache_dir = str(tmp_path_factory.mktemp("campaign_cache"))
    kw = dict(
        # curve manifold: at n=1024 the 1-D spectrum is well-posed (the
        # curve's f32 degeneracy is a LARGE-n phenomenon) and 16 exact-eigh
        # modes represent the target; the torus default needs ~10x the
        # modes at this coarse sampling (discrete modes mix) — the torus
        # path is pinned at real scale by the PARITY campaign rows and by
        # tests/test_eigen.py's solver checks
        n=1024, k=8, epochs=2, num_test=64, num_modes=16,
        cache_dir=cache_dir, checkpoint_every=1, precond_refresh=1,
        seed=0, verbose=False, manifold="curve",
    )
    first, params, model = run_campaign(**kw)
    second, _, _ = run_campaign(**kw)
    return first, second


def test_campaign_recovers_ground_truth(campaign_results):
    first, _ = campaign_results
    # the posterior mean must beat the per-label noise floor by averaging
    # noise over neighbors (the labels carry noise_floor_rmse of pure noise)
    assert first["value"] < first["noise_floor_rmse"]
    assert np.isfinite(first["final_loss"])
    assert np.isfinite(first["nll_noisy_test"])


def test_campaign_caches_hit_on_rerun(campaign_results):
    first, second = campaign_results
    assert not first["graph_cache_hit"]
    assert not first["basis_cache_hit"]
    # second invocation: graph cache keyed by (data, k, backend) hits; the
    # basis cache hits because seed-fixed training lands on the same
    # bandwidth; the result is identical
    assert second["graph_cache_hit"]
    assert second["basis_cache_hit"]
    assert second["value"] == first["value"]


def test_campaign_cg_iter_accounting(campaign_results):
    first, _ = campaign_results
    assert first["cg_iters_initial"] >= 1
    assert first["cg_iters_trained"] >= 1
