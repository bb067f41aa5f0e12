"""Regression tests codifying round-1 forensics and protocol guarantees.

  * determinism: the jitted loss/grad pipeline is bitwise-reproducible for a
    fixed seed and topology (SURVEY §5 asks for this; XLA on a fixed backend
    is deterministic — this guards against accidentally introducing
    nondeterministic collectives or host-order dependence);
  * graph-bandwidth collapse (PARITY.md caveat 1): under the reference 1D
    notebook initialization (eps = 1.0, no hyperprior) the current reference
    objective (learnable bandwidth, ``train_model.py:85``) drives eps toward
    0 and degenerates the graph; under the data-driven Gamma prior of
    notebook cell "74cd3ae2" with a stable-basin init it converges near the
    median-kNN-distance scale;
  * checkpoint/resume with ``update_norm`` set: the callback PRNG chain is
    checkpointed, so a resumed run reproduces the uninterrupted outputscale
    renormalization trajectory exactly (ADVICE r1 item 2).
"""

import math

import jax
import numpy as np
import pytest

from manifold_gp_tpu.config import InferenceConfig
from manifold_gp_tpu.kernels import RiemannMaternKernel
from manifold_gp_tpu.models import RiemannGP
from manifold_gp_tpu.parameters import GreaterThan
from manifold_gp_tpu.utils.train import manifold_informed_train


def _make_model(x, y, cfg=None, **kernel_kw):
    kernel = RiemannMaternKernel(
        nu=2,
        x=x,
        nearest_neighbors=6,
        laplacian_normalization="randomwalk",
        num_modes=20,
        bump_scale=10.0,
        bump_decay=1.0,
        cfg=cfg or InferenceConfig(max_cholesky=800),
        **kernel_kw,
    )
    return RiemannGP(
        x, y, kernel, noise_constraint=GreaterThan(1e-8),
        cfg=cfg or InferenceConfig(max_cholesky=800),
    )


def test_loss_and_grads_bitwise_deterministic(small_cloud):
    """Same seed + same topology => bitwise-identical jitted loss and grads
    (two independently jitted closures over the same pure function)."""
    x, y = small_cloud
    model = _make_model(x, y)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.35, lengthscale=1.0
    )
    key = jax.random.PRNGKey(42)

    def loss_fn(p, k):
        return model.mll_loss(p, key=k)

    f1 = jax.jit(jax.value_and_grad(loss_fn))
    f2 = jax.jit(jax.value_and_grad(loss_fn))
    l1, g1 = f1(params, key)
    l2, g2 = f2(params, key)
    assert np.asarray(l1).tobytes() == np.asarray(l2).tobytes()
    for k in g1:
        assert np.asarray(g1[k]).tobytes() == np.asarray(g2[k]).tobytes(), k
    # and across repeated calls of the same executable
    l3, _ = f1(params, key)
    assert np.asarray(l1).tobytes() == np.asarray(l3).tobytes()


@pytest.fixture(scope="module")
def dumbbell_half():
    from manifold_gp_tpu.utils.datasets import manifold_1D_dataset

    x, y, _ = manifold_1D_dataset()
    sub = np.arange(0, x.shape[0], 2)  # every other node: same manifold, 2x spacing
    x, y = x[sub], y[sub]
    rng = np.random.default_rng(1337)
    y = y + 0.01 * rng.standard_normal(y.shape[0]).astype(np.float32)
    y = (y - y.mean()) / y.std()
    return x, y


def _median_knn_distance(x):
    from manifold_gp_tpu.ops.knn import knn_search

    ev = np.asarray(knn_search(x, x, 10, self_query=True)[0])[:, 1:]
    gb_min = math.sqrt(float(ev[:, 0].max()) / (-4.0 * math.log(1e-4)))
    mean_knn = np.sort(np.sqrt(ev).mean(axis=1))
    median = float(mean_knn[int(round(ev.shape[0] * 0.5))])
    return median, gb_min


def _train_1d(x, y, gb_prior, gb_init, epochs=40):
    cfg = InferenceConfig(max_cholesky=2000)
    kernel = RiemannMaternKernel(
        nu=1,
        x=x,
        nearest_neighbors=10,
        laplacian_normalization="randomwalk",
        num_modes=50,
        bump_scale=10.0,
        bump_decay=1.0,
        graphbandwidth_prior=gb_prior,
        cfg=cfg,
    )
    model = RiemannGP(x, y, kernel, noise_constraint=GreaterThan(1e-8), cfg=cfg)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=gb_init, lengthscale=1.0
    )
    params, _, _ = manifold_informed_train(
        model, params, lr=1e-1, max_iter=epochs, tolerance=1e-2, num_rand_vec=100
    )
    return float(kernel.graphbandwidth(params))


def test_graphbandwidth_collapse_without_prior(dumbbell_half):
    """Notebook init (eps=1.0, no prior): the learnable-bandwidth objective
    collapses eps far below the median kNN distance (the graph's natural
    length scale) — the forensic basis for run_1d's modified protocol."""
    x, y = dumbbell_half
    median, gb_min = _median_knn_distance(x)
    gb = _train_1d(x, y, gb_prior=None, gb_init=1.0)
    assert gb < 0.75 * median, (gb, median)  # fell through the natural scale
    assert gb < 0.025 * 1.0  # >40x collapse from the notebook init


def test_graphbandwidth_stable_with_data_driven_prior(dumbbell_half):
    """The reference's own data-driven Gamma prior (cell "74cd3ae2") with a
    stable-basin init keeps eps at the median-kNN-distance scale."""
    from manifold_gp_tpu.priors import GammaPrior

    x, y = dumbbell_half
    median, gb_min = _median_knn_distance(x)
    rate = 4.0 * median / (median - gb_min) ** 2
    gb_prior = GammaPrior(rate * median + 1.0, rate)
    gb = _train_1d(x, y, gb_prior=gb_prior, gb_init=3.5 * median)
    assert 0.75 * median < gb < 10.0 * median, (gb, median)


def test_resume_with_update_norm_reproduces_exactly(small_cloud, tmp_path):
    """With update_norm set, the outputscale renormalization callback
    consumes PRNG randomness; the checkpoint carries that chain, so a
    crash+resume run must land bitwise-where the uninterrupted run lands."""
    x, y = small_cloud
    ck = str(tmp_path / "state.pkl")
    kw = dict(
        lr=1e-1, max_iter=8, tolerance=1e-2,
        update_norm=2, num_rand_vec=20, verbose=False,
    )

    def fresh():
        model = _make_model(x, y)
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=0.35, lengthscale=1.0
        )
        return model, params

    model, params = fresh()
    p_full, loss_full, _ = manifold_informed_train(model, params, **kw)

    model2, params2 = fresh()
    # "crash" after epoch 7 (checkpoint_every=3 cuts at 3 and 6; the epoch-6
    # checkpoint is written after the epoch-6 renormalization callback, and
    # the run dies before reaching the next one — same totals as the real
    # run so boundary-callback scheduling matches)
    manifold_informed_train(
        model2, params2, **{**kw, "max_iter": 7},
        checkpoint_path=ck, checkpoint_every=3,
    )
    model3, params3 = fresh()
    p_res, loss_res, _ = manifold_informed_train(
        model3, params3, **kw, checkpoint_path=ck, checkpoint_every=3,
    )
    assert float(loss_res) == float(loss_full)
    for k in p_full:
        np.testing.assert_array_equal(np.asarray(p_res[k]), np.asarray(p_full[k]))


def test_ivf_bounded_list_width_on_skewed_data(rng):
    """One dense cluster + a sparse halo: the padded posting-list width must
    stay bounded by the re-split cap instead of tracking the biggest cluster
    (ADVICE r1 item 5)."""
    from manifold_gp_tpu.ops.knn import ivf_build, ivf_search, knn_search

    dense = 0.01 * rng.standard_normal((1600, 8)).astype(np.float32)
    halo = rng.standard_normal((400, 8)).astype(np.float32) + 5.0
    x = np.concatenate([dense, halo]).astype(np.float32)
    index = ivf_build(x, nlist=16)
    n, nlist = x.shape[0], index.nlist
    cap = max(int(4.0 * n / 16), 8)  # cap computed from the *requested* nlist
    assert index.lists.shape[1] <= cap, (index.lists.shape, cap)
    assert nlist >= 16  # splitting only ever adds centroids
    # every database point appears in exactly one posting list
    ids = np.asarray(index.lists)[np.asarray(index.list_mask) > 0]
    assert np.array_equal(np.sort(ids), np.arange(n))
    # recall stays reasonable on the skewed data
    sq, idx = ivf_search(index, x[:200], 5, nprobe=8, self_query=True)
    sq_ex, idx_ex = knn_search(x, x[:200], 5, self_query=True)
    recall = np.mean([
        len(set(map(int, a)) & set(map(int, b))) / 5.0
        for a, b in zip(np.asarray(idx), np.asarray(idx_ex))
    ])
    assert recall > 0.8, recall


def test_training_debug_flag_raises_on_nonfinite(small_cloud):
    """debug=True fails fast on a poisoned objective instead of training
    through NaNs (check_finite wired into the loop, SURVEY §5)."""
    x, y = small_cloud
    model = _make_model(x, np.where(np.arange(len(y)) == 0, np.nan, y).astype(np.float32))
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=0.35, lengthscale=1.0
    )
    with pytest.raises(FloatingPointError):
        manifold_informed_train(model, params, lr=1e-1, max_iter=3, debug=True)
