"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/multi-chip behavior is
exercised without TPU hardware (the reference has no distributed tests at
all; see SURVEY §4 for why we add them). Matmul precision is pinned to
HIGHEST — TPU default bf16 matmuls would break CG convergence parity.
"""

import os

# Force CPU: the ambient environment may point JAX at a (single, tunneled)
# TPU; tests want the 8-virtual-device CPU backend for sharding coverage and
# fast iteration.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU plugin and forces
# jax_platforms via jax.config — override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1337)


@pytest.fixture(scope="session")
def small_cloud(rng):
    """Small 2D noisy-circle point cloud (a 1D manifold in 2D)."""
    n = 160
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], axis=1)
    x += 0.01 * rng.standard_normal(x.shape)
    y = np.sin(3 * t)
    return x.astype(np.float32), y.astype(np.float32)


@pytest.fixture(scope="session")
def dumbbell():
    from manifold_gp_tpu.utils.datasets import manifold_1D_dataset

    return manifold_1D_dataset()
