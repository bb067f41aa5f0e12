#!/usr/bin/env python3
"""Compare Laplacian SpMV execution paths on the real chip.

Variants, all chained ``iters`` times inside one jitted program (per-dispatch
tunnel latency excluded), batch B columns:

  einsum        block-ELL einsum with per-matvec permute in/out (bench.py's
                current path)
  einsum-perm   block-ELL einsum entirely in permuted space
  pallas        fused Pallas kernel, permuted space, f32 panels
  pallas-bf16   fused Pallas kernel, permuted space, bf16 panels
  ell-gather    per-edge gather scan (the non-block fallback)

Usage: python benchmark/bench_spmv_variants.py [n] [k] [batch]
"""

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10010
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = 40

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    sys.path.insert(0, ".")
    from bench import build_inputs
    from manifold_gp_tpu.ops.block_sparse import (
        assemble,
        build_block_layout,
        matvec_permuted,
        permute_in,
    )
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs, laplacian_matvec
    from manifold_gp_tpu.ops.pallas_spmv import block_matvec_pallas

    x = build_inputs(n=n, k=k)
    graph = build_graph(x, k, knn_backend="host")
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = build_block_layout(graph)
    assert layout is not None
    print(
        f"N={graph.num_nodes} Np={layout.num_padded} nrb={layout.num_row_blocks} "
        f"S={layout.max_blocks} batch={batch} "
        f"panel_MB={layout.num_padded * layout.max_blocks * 128 * 4 / 1e6:.1f}",
        file=sys.stderr,
    )

    v = jnp.asarray(
        np.random.default_rng(1).standard_normal((graph.num_nodes, batch)).astype(
            np.float32
        )
    )

    def timeit(fn, *args):
        # block_until_ready does NOT block on the tunneled axon backend; a
        # scalar device->host read is the only reliable completion fence.
        # One fence amortized over reps*iters matvecs keeps the tunnel RTT
        # out of the per-matvec number.
        float(fn(*args)[0, 0])
        reps = 3
        t0 = time.perf_counter()
        out = args[-1]
        for _ in range(reps):
            out = fn(*args[:-1], out)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        return reps * iters * batch / dt

    blocks = assemble(layout, coeffs.diag, coeffs.triu)
    blocks16 = assemble(layout, coeffs.diag, coeffs.triu, dtype=jnp.bfloat16)

    @jax.jit
    def chain_einsum(blocks, v):
        def body(_, vec):
            out = laplacian_matvec(graph, coeffs, vec, "randomwalk",
                                   block=(layout, blocks))
            return out / jnp.linalg.norm(out[:, :1])

        return jax.lax.fori_loop(0, iters, body, v)

    pdsq = jnp.sqrt(coeffs.deg[layout.perm])[:, None]
    row_ids = jnp.arange(layout.num_padded)[:, None]
    pdsq = jnp.where(row_ids < layout.num_nodes, pdsq, 1.0)

    @jax.jit
    def chain_einsum_perm(blocks, v):
        pv = permute_in(layout, v)

        def body(_, vec):
            out = matvec_permuted(layout, blocks, vec * pdsq) / pdsq
            return out / jnp.linalg.norm(out[:128, :1])

        return jax.lax.fori_loop(0, iters, body, pv)[layout.unperm]

    def make_chain_pallas(blk):
        @jax.jit
        def chain(v):
            pv = permute_in(layout, v)

            def body(_, vec):
                out = block_matvec_pallas(layout, blk, vec * pdsq) / pdsq
                return out / jnp.linalg.norm(out[:128, :1])

            return jax.lax.fori_loop(0, iters, body, pv)[layout.unperm]

        return chain

    @jax.jit
    def chain_ell(v):
        def body(_, vec):
            out = laplacian_matvec(graph, coeffs, vec, "randomwalk")
            return out / jnp.linalg.norm(out[:, :1])

        return jax.lax.fori_loop(0, iters, body, v)

    variants = [
        ("einsum", lambda: timeit(chain_einsum, blocks, v)),
        ("einsum-perm", lambda: timeit(chain_einsum_perm, blocks, v)),
        ("pallas", lambda: timeit(make_chain_pallas(blocks), v)),
        ("pallas-bf16", lambda: timeit(make_chain_pallas(blocks16), v)),
        ("ell-gather", lambda: timeit(chain_ell, v)),
    ]
    for name, run in variants:
        try:
            val = run()
        except Exception as e:  # noqa: BLE001 — report and keep going
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            continue
        us = 1e6 / (val / batch)
        print(f"{name:12s} {val:12.1f} matvec/s   ({us:8.1f} us / batched matvec)")


if __name__ == "__main__":
    main()
