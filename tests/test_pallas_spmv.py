"""Fused Pallas block-ELL SpMV (interpret mode on CPU) vs the einsum path."""

import jax.numpy as jnp
import numpy as np
import pytest

from manifold_gp_tpu.ops import block_sparse
from manifold_gp_tpu.ops.graph import build_graph
from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
from manifold_gp_tpu.ops.pallas_spmv import matvec as pallas_matvec


def test_pallas_matches_einsum(rng):
    centers = rng.standard_normal((4, 8)).astype(np.float32) * 3
    x = centers[rng.integers(0, 4, 600)] + 0.2 * rng.standard_normal(
        (600, 8)
    ).astype(np.float32)
    graph = build_graph(x, 8)
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = block_sparse.build_block_layout(graph)
    assert layout is not None
    blocks = block_sparse.assemble(layout, coeffs.diag, coeffs.triu)
    v = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))
    expected = block_sparse.matvec(layout, blocks, v)
    got = pallas_matvec(layout, blocks, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
