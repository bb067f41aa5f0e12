#!/usr/bin/env python3
"""Compare the Laplacian matvec execution paths on the current backend.

Working replacement for the reference's stale ``benchmark/bench_sparse_laplacian.py``
/ ``bench_dense_laplacian.py`` (which import symbols that no longer exist;
SURVEY §6). Measures device-side throughput of:

  * ELL gather-scan SpMV   (the scalable sparse path)
  * COO scatter-add SpMV   (testing/reference path)
  * dense MXU matvec       (small-N fast path)

Usage: python benchmark/bench_matvec_paths.py [N] [k] [batch]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10010
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.ops.laplacian import (
        adjacency_matvec_coo,
        adjacency_matvec_ell,
        laplacian_coeffs,
        laplacian_dense,
    )

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((10, 64)).astype(np.float32) * 2.0
    x = centers[rng.integers(0, 10, n)] + 0.3 * rng.standard_normal(
        (n, 64)
    ).astype(np.float32)

    t0 = time.perf_counter()
    graph = build_graph(x, k)
    print(f"graph build: {time.perf_counter()-t0:.2f}s  "
          f"(N={graph.num_nodes}, M={graph.num_edges}, D={graph.max_degree})")
    coeffs = laplacian_coeffs(graph, 0.5)
    v = jnp.asarray(rng.standard_normal((n, batch)).astype(np.float32))

    iters = 30

    def timed(name, fn, *args):
        @jax.jit
        def chain(*a):
            def body(_, vec):
                out = fn(*a[:-1], vec)
                return out / jnp.linalg.norm(out[:, :1])

            return jax.lax.fori_loop(0, iters, body, a[-1])

        out = chain(*args)
        out.block_until_ready()
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = chain(*args)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        rate = reps * iters * batch / dt
        print(f"{name:>14}: {rate:12.1f} matvec/s  ({dt/reps/iters*1e6:8.1f} us/iter)")
        return rate

    timed("ELL scan", lambda t, vec: adjacency_matvec_ell(graph, t, vec), coeffs.triu, v)
    timed("COO scatter", lambda t, vec: adjacency_matvec_coo(graph, t, vec), coeffs.triu, v)
    if n <= 16384:
        dense = laplacian_dense(graph, coeffs)
        timed(
            "dense MXU",
            lambda d, vec: jnp.matmul(d, vec, precision=jax.lax.Precision.HIGHEST),
            dense,
            v,
        )


if __name__ == "__main__":
    main()
