#!/usr/bin/env python3
"""Jacobi-PCG vs plain CG on an ill-conditioned Matérn precision
(VERDICT round-1 item 3's bench row).

Clustered data (SRMNIST shape: non-uniform sampling density) makes the
density-corrected degree — and hence diag(Q) — spread over orders of
magnitude; Jacobi flattens exactly that. Uniform-density manifolds have a
near-constant diagonal and see no benefit (the conditioning there is purely
spectral); see tests/test_precondition.py.

Usage: python benchmark/bench_precond.py [--n 10010] [--nu 3] [--eps 0.15]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10010)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--nu", type=int, default=3)
    ap.add_argument("--eps", type=float, default=None,
                    help="graph bandwidth (default: 0.5x median kNN distance — small enough to expose the density spread)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--logdet", action="store_true",
                    help="instead of CG iterations: SLQ logdet accuracy vs "
                         "an f64 oracle — plain quadrature vs the mBCG "
                         "preconditioned quadrature (caps --n at 2000 for "
                         "the dense oracle)")
    ap.add_argument("--construction", action="store_true",
                    help="instead of CG iterations: time the pivoted-"
                         "Cholesky preconditioner CONSTRUCTION (rank "
                         "sequential [n,1] matvecs — ~rank HBM panel sweeps "
                         "on the streaming path; round-4 VERDICT item 7) on "
                         "the 1M-bench synthetic-curve operator")
    ap.add_argument("--rank", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.cg import cg_raw
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.ops.matern import (
        make_jacobi_precond,
        make_matern_precision_matvec,
        matern_precision_diag,
    )
    from manifold_gp_tpu.ops.sparse_formats import build_layout, permute_in

    if args.logdet:
        return bench_logdet(args)
    if args.construction:
        return bench_construction(args)

    rng = np.random.default_rng(0)
    # Mixed-density clusters (per-cluster noise scales 0.1..0.8): sampling
    # density varies ~10x between cluster cores, so the density-corrected
    # degree — and diag(Q) = O(deg^..nu) — spreads over orders of magnitude.
    centers = rng.standard_normal((10, 8)).astype(np.float32) * 4.0
    scales = np.geomspace(0.1, 0.8, 10).astype(np.float32)
    cid = rng.integers(0, 10, args.n)
    x = centers[cid] + scales[cid, None] * rng.standard_normal(
        (args.n, 8)
    ).astype(np.float32)
    graph = build_graph(x, args.k, knn_backend="host")
    eps = args.eps
    if eps is None:
        eps = 0.5 * float(np.sqrt(np.median(np.asarray(graph.sqdist))))
    coeffs = laplacian_coeffs(graph, eps)
    layout = build_layout(graph)
    pallas = layout is not None and jax.devices()[0].platform == "tpu"
    diag = matern_precision_diag(graph, coeffs, args.nu, 1.0, "randomwalk")
    print(
        f"# N={args.n} nu={args.nu} eps={eps:.4f} "
        f"diag spread {float(diag.max() / diag.min()):.1e} pallas={pallas}",
        file=sys.stderr,
    )

    mv = make_matern_precision_matvec(
        graph, coeffs, args.nu, 1.0, "randomwalk",
        block=(layout, None) if layout is not None else None,
        permuted_io=layout is not None, pallas=pallas,
    )
    b = jnp.asarray(
        rng.standard_normal((args.n, args.batch)).astype(np.float32)
    )
    if layout is not None:
        b = permute_in(layout, b)
        from manifold_gp_tpu.ops import sparse_formats

        dperm = diag[layout.perm]
    else:
        dperm = diag
    # padding rows: any positive value works (residuals there are zero)
    dperm = jnp.maximum(dperm, 1e-12)

    results = {}
    for name, pc in (("plain", None), ("jacobi", make_jacobi_precond(dperm))):
        run = jax.jit(
            lambda b, pc=pc: cg_raw(
                mv, b, args.tol, 20000, precond=pc, with_info=True
            )
        )
        xsol, iters = run(b)
        float(xsol[0, 0])
        t0 = time.perf_counter()
        xsol, iters = run(b)
        float(xsol[0, 0])
        dt = time.perf_counter() - t0
        results[name] = (int(iters), dt)
        print(f"# {name}: {int(iters)} iters, {dt:.2f}s", file=sys.stderr)

    (ip, tp), (ij, tj) = results["plain"], results["jacobi"]
    print(
        json.dumps(
            {
                "metric": "pcg_iteration_reduction",
                "value": round(ip / max(ij, 1), 3),
                "unit": "x fewer CG iterations (jacobi vs plain)",
                "iters_plain": ip,
                "iters_jacobi": ij,
                "speedup_time": round(tp / tj, 3),
            }
        )
    )


def bench_logdet(args):
    """SLQ logdet accuracy at the default Lanczos depth on an ill-conditioned
    noisy Matérn precision (1D chain, small eps, nu=3 — VERDICT r2 item 7's
    regime): plain Hutchinson+Lanczos quadrature vs the mBCG preconditioned
    quadrature (probes from M, PCG-coefficient T, logdet(M) correction)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.ops.matern import (
        make_matern_precision_matvec,
        make_noisy_matvec,
        matern_precision_diag,
        noisy_scaled_diag,
    )
    from manifold_gp_tpu.ops.pivchol import DiagPrecond, make_pivchol_precond
    from manifold_gp_tpu.ops.slq import (
        rademacher_probes,
        slq_logdet,
        slq_logdet_mbcg,
    )

    n = min(args.n, 2000)  # f64 dense-oracle budget
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 2 * np.pi, n))
    x = np.stack([np.cos(t), np.sin(t)], 1).astype(np.float32)
    graph = build_graph(x, 6)
    eps = args.eps if args.eps is not None else 0.02
    nu, s2 = args.nu, 1e-2
    c = laplacian_coeffs(graph, eps)
    mv = make_noisy_matvec(
        make_matern_precision_matvec(graph, c, nu, 1.0, "randomwalk"), s2
    )
    d = noisy_scaled_diag(
        matern_precision_diag(graph, c, nu, 1.0, "randomwalk"), noise=s2
    )

    # f64 oracle from the same coefficients
    rows, cols = np.asarray(graph.rows), np.asarray(graph.cols)
    a = np.zeros((n, n))
    a[rows, cols] = np.asarray(c.triu, np.float64)
    a[cols, rows] = np.asarray(c.triu, np.float64)
    lap = np.diag(np.asarray(c.diag, np.float64)) - a
    b = (2.0 * nu) * np.eye(n) + lap
    q = b
    for _ in range(nu - 1):
        q = q @ b
    d12 = np.sqrt(np.asarray(c.deg, np.float64))
    q = d12[:, None] * q * d12[None, :]
    dense = q - s2 * q @ q + s2 * s2 * q @ q @ q
    _, ld_exact = np.linalg.slogdet(dense)
    cond = np.linalg.cond(dense)
    print(f"# N={n} eps={eps} nu={nu} cond={cond:.2e} logdet={ld_exact:.1f}",
          file=sys.stderr)

    key = jax.random.PRNGKey(5)
    probes, steps = 64, 96
    z = rademacher_probes(key, n, probes)
    ld_plain = float(slq_logdet(mv, z, steps, cg_tol=1e-2, cg_max_iter=2000))
    ld_jac = float(slq_logdet_mbcg(mv, DiagPrecond(d=d), key, probes, steps))
    pp = make_pivchol_precond(mv, d, 15)
    ld_piv = float(slq_logdet_mbcg(mv, pp, key, probes, steps))

    def rel(v):
        return abs(v - ld_exact) / abs(ld_exact) if np.isfinite(v) else None

    for name, v in (("plain", ld_plain), ("mbcg-jacobi", ld_jac),
                    ("mbcg-pivchol", ld_piv)):
        r = rel(v)
        print(f"# {name}: logdet {v:.1f} rel-err "
              f"{'nan' if r is None else f'{r:.2e}'}", file=sys.stderr)
    print(json.dumps({
        "metric": "slq_logdet_rel_error",
        "value": rel(ld_jac),
        "unit": "relative error (mbcg-jacobi quadrature)",
        "rel_err_plain": rel(ld_plain),
        "rel_err_mbcg_pivchol": rel(ld_piv),
        "condition_number": float(cond),
        "n": n, "eps": eps, "nu": nu,
        "probes": probes, "lanczos_steps": steps,
    }))




def bench_construction(args):
    """Wall-clock of make_pivchol_precond on the large-scale curve operator
    (same graph family as bench_large_scale): rank sequential full-operator
    matvecs. The row that motivates cfg-level amortization
    (manifold_informed_train's precond_refresh)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, "benchmark")
    from bench_large_scale import synthetic_manifold_graph
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.ops.matern import (
        make_matern_precision_matvec,
        make_noisy_matvec,
        matern_precision_diag,
        noisy_scaled_diag,
    )
    from manifold_gp_tpu.ops.pivchol import make_pivchol_precond
    from manifold_gp_tpu.ops.sparse_formats import build_layout

    graph, x = synthetic_manifold_graph(args.n, args.k)
    eps = 2.0 * float(np.sqrt(np.median(np.asarray(graph.sqdist))))
    import dataclasses

    graph = dataclasses.replace(graph, sqdist=graph.sqdist / jnp.float32(eps) ** 2)
    eps = 1.0
    coeffs = laplacian_coeffs(graph, eps)
    layout = build_layout(graph)
    pallas = layout is not None and jax.devices()[0].platform == "tpu"
    print(f"# construction: N={args.n} rank={args.rank} "
          f"layout={type(layout).__name__} pallas={pallas}", file=sys.stderr)

    # Operands assembled EAGERLY and passed as jit ARGUMENTS (the tunneled
    # backend's compile request rejects multi-GB closure constants —
    # bench_large_scale's convention). The construction runs in permuted
    # row space, so the pivoting diagonal is permuted to match.
    from manifold_gp_tpu.ops.matern import (
        make_matern_precision_matvec_operand,
        matern_precision_operands,
    )

    if layout is not None:
        qb, dsq = matern_precision_operands(layout, coeffs, args.nu, 1.0)
        mv_op = make_matern_precision_matvec_operand(
            layout, args.nu, "randomwalk", pallas=pallas
        )
        d0 = noisy_scaled_diag(
            matern_precision_diag(graph, coeffs, args.nu, 1.0, "randomwalk"),
            noise=1e-2,
        )[layout.perm]

        @jax.jit
        def build(qb_, dsq_, d_):
            mv = make_noisy_matvec(lambda v: mv_op(qb_, dsq_, v), 1e-2)
            p = make_pivchol_precond(mv, d_, args.rank)
            return p.chol_c

        run = lambda: build(qb, dsq, d0)  # noqa: E731
    else:

        @jax.jit
        def build(c):
            mv = make_noisy_matvec(
                make_matern_precision_matvec(graph, c, args.nu, 1.0, "randomwalk"),
                1e-2,
            )
            d = noisy_scaled_diag(
                matern_precision_diag(graph, c, args.nu, 1.0, "randomwalk"),
                noise=1e-2,
            )
            p = make_pivchol_precond(mv, d, args.rank)
            return p.chol_c

        run = lambda: build(coeffs)  # noqa: E731

    out = run()
    float(out[0, 0])  # fence
    t0 = time.perf_counter()
    out = run()
    float(out[0, 0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "pivchol_construction_seconds", "value": round(dt, 3),
        "unit": "s", "n": args.n, "rank": args.rank, "nu": args.nu,
    }))


if __name__ == "__main__":
    main()
