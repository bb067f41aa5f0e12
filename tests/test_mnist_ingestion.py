"""Real-MNIST ingestion path (utils/datasets.py `_load_mnist_train` /
`rmnist_dataset`) exercised end-to-end with a synthetic keras-layout npz.

Round-2 VERDICT item 5: the surrogate fallback is tested elsewhere, but the
MNIST_NPZ branch had no test proving it would work if real data appeared —
this pins shapes, pixel scaling, rotation targets and the reference's fixed
SRMNIST digit-index selection (reference load_dataset.py:36-77)."""

import numpy as np
import pytest

from manifold_gp_tpu.utils import datasets


@pytest.fixture()
def fake_mnist_npz(tmp_path, monkeypatch):
    """Keras-layout mnist.npz with 25 recognizable uint8 images."""
    rng = np.random.default_rng(42)
    n = 25  # > max(_SRMNIST_DIGIT_IDX) = 18
    x = rng.integers(0, 256, size=(n, 28, 28), dtype=np.uint8)
    # stamp each image with a unique corner value for identification
    for i in range(n):
        x[i, 0, 0] = i * 10
    y = rng.integers(0, 10, size=(n,)).astype(np.int64)
    path = tmp_path / "mnist.npz"
    np.savez(path, x_train=x, y_train=y, x_test=x[:5], y_test=y[:5])
    monkeypatch.setenv("MNIST_NPZ", str(path))
    return path, x, y


def test_load_mnist_train_reads_npz(fake_mnist_npz):
    path, x, y = fake_mnist_npz
    loaded = datasets._load_mnist_train()
    assert loaded is not None, "MNIST_NPZ branch must engage"
    lx, ly = loaded
    np.testing.assert_array_equal(lx, x)
    np.testing.assert_array_equal(ly, y)


def test_srmnist_real_branch_end_to_end(fake_mnist_npz, tmp_path):
    path, x, y = fake_mnist_npz
    rtr, rte = 4, 2
    out = datasets.rmnist_dataset(
        scaling=True, single_digit=True, cache_dir=tmp_path / "cache",
        rots_train=rtr, rots_test=rte,
    )
    tx, ty, tl, ex, ey, el = out

    # SRMNIST structure: 10 digits x (rots + original), flattened 28x28
    assert tx.shape == (10 * (rtr + 1), 784)
    assert ex.shape == (10 * (rte + 1), 784)
    assert ty.shape == (10 * (rtr + 1),)

    # the real branch must select the reference's FIXED digit indices
    sel = datasets._SRMNIST_DIGIT_IDX
    per = rtr + 1
    for slot, idx in enumerate(sel):
        # angle-0 row = the original image under (x - 127.5)/255 scaling
        expected = ((x[idx].astype(np.float64) - 127.5) / 255.0).reshape(-1)
        np.testing.assert_allclose(
            tx[slot * per], expected.astype(np.float32), atol=1e-6
        )
        assert ty[slot * per] == 0.0  # original: rotation target 0
        assert tl[slot * per] == y[idx]  # label carried through

    # rotated rows: targets inside [-45, 45], not all zero
    rot_targets = np.delete(ty, np.arange(0, len(ty), per))
    assert np.all(np.abs(rot_targets) <= 45.0)
    assert np.count_nonzero(rot_targets) == rot_targets.size

    # pixel scaling bounds for uint8 input under (x - 127.5)/255
    assert tx.min() >= -0.5 and tx.max() <= 0.5


def test_srmnist_cache_roundtrip(fake_mnist_npz, tmp_path):
    """Second call must serve the cached npz with identical content."""
    cache = tmp_path / "cache2"
    a = datasets.rmnist_dataset(
        single_digit=True, cache_dir=cache, rots_train=3, rots_test=1
    )
    assert (cache / "srmnist_cache.npz").exists()
    b = datasets.rmnist_dataset(
        single_digit=True, cache_dir=cache, rots_train=3, rots_test=1
    )
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)
