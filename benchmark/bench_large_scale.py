#!/usr/bin/env python3
"""Large-scale synthetic-manifold benchmark (BASELINE.json config 5:
"Row-sharded synthetic 1M-point manifold, multi-host CG").

A 1M-point noisy closed curve in R^3 with a procedurally banded kNN edge
list (the bench measures SpMV/CG throughput; the one-time kNN build is
benchmarked separately by bench.py's graph build and tools/). Two paths:

  * single-device: the fused block-sparse Matérn-precision CG hot loop
    (Pallas kernel on TPU, einsum elsewhere), fixed CG iteration count,
    reporting Laplacian-equivalent matvecs/s;
  * row-sharded (--mesh N): the shard_map SpMV + GSPMD CG over an N-device
    mesh — on this host a virtual CPU mesh (validates the multi-chip
    program: ICI all-gather per matvec, psum'd dot products); on a pod
    slice the same code runs over real ICI.

Usage:
  python benchmark/bench_large_scale.py                  # 1M, single device
  python benchmark/bench_large_scale.py --n 100000
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmark/bench_large_scale.py --n 131072 --mesh 8 --batch 16
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def curve_points(n: int, seed: int = 0):
    """Noisy closed 3D curve, densely sampled (the 1M synthetic manifold)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    x = np.stack(
        [np.cos(t), np.sin(t), 0.3 * np.sin(2 * t)], axis=1
    ).astype(np.float32)
    x += (0.1 / n) * rng.standard_normal(x.shape).astype(np.float32)
    return x


def synthetic_manifold_graph(n: int, k: int = 16, seed: int = 0):
    """ESCAPE HATCH: procedurally banded kNN edge list over the curve.

    Node i connects to i+1 .. i+k/2 (mod n) with true squared point
    distances — the band structure an exact kNN search recovers on a densely
    sampled curve, built in O(nk) host time. Since round 4 the DEFAULT bench
    path builds the graph with a real search (``real_manifold_graph``); this
    remains only for isolating SpMV/CG timing from build cost
    (``--graph procedural``).
    """
    from manifold_gp_tpu.ops.graph import graph_from_edges

    x = curve_points(n, seed)
    half = max(1, k // 2)
    rows = np.repeat(np.arange(n, dtype=np.int64), half)
    offs = np.tile(np.arange(1, half + 1, dtype=np.int64), n)
    cols = (rows + offs) % n
    d = x[rows] - x[cols]
    sqd = np.einsum("ij,ij->i", d, d).astype(np.float32)
    r2 = np.minimum(rows, cols)
    c2 = np.maximum(rows, cols)
    return graph_from_edges(r2, c2, sqd, n), x


def real_manifold_graph(n: int, k: int = 16, seed: int = 0,
                        backend: str = None):
    """The REAL build over the same curve points: exact MXU brute force below
    200k nodes, device IVF above (nlist ~ 4 sqrt(N), nprobe 16, 5 kmeans
    iterations — 0.99 recall at half the sweep cost of nprobe 32, measured
    at 100k vs exact) — the one step no large-N user can skip (round-3
    VERDICT item 1). Returns (graph, x, build_seconds, backend)."""
    from manifold_gp_tpu.ops.graph import build_graph

    x = curve_points(n, seed)
    if backend is None:
        backend = "ivf" if n > 200_000 else "device"
    t0 = time.perf_counter()
    if backend == "ivf":
        nlist = 2 ** int(round(np.log2(4.0 * np.sqrt(n))))
        graph = build_graph(x, k, knn_backend="ivf", ivf_nlist=nlist,
                            ivf_nprobe=16, ivf_kmeans_iters=5)
    else:
        graph = build_graph(x, k, knn_backend=backend)
    return graph, x, time.perf_counter() - t0, backend


def _timed_reps(run, b, reps, cg_iters, nu, batch):
    """Median-of-``reps`` independently timed CG chains with recorded spread
    (round-4 VERDICT item 3: single-shot rows swung 7% run-to-run — a row
    that noisy cannot police a 5% regression). Returns (median_rate, extra
    JSON fields)."""
    rates = []
    out = b
    total_iters = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        out, iters = run(out)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        rates.append(int(iters) * nu * batch / dt)
        total_iters += int(iters)
    out_head = np.asarray(out[:4096])
    assert np.all(np.isfinite(out_head)) and np.abs(out_head).max() > 0, (
        "degenerate CG output (NaN mid-chain collapses later reps to the "
        "zero initial guess): operator scale overflow — see main()'s "
        "unit-bandwidth rescaling"
    )
    if total_iters < reps * cg_iters:
        print(f"# note: CG converged early ({total_iters} of "
              f"{reps * cg_iters} iters ran)", file=sys.stderr)
    rates = np.sort(rates)
    median = float(np.median(rates))
    spread = float((rates[-1] - rates[0]) / median) if median else 0.0
    return median, {
        "reps": reps,
        "rate_spread": round(spread, 3),
        "rate_min": round(float(rates[0]), 1),
        "rate_max": round(float(rates[-1]), 1),
    }


def bench_single_device(graph, eps, nu, ls, batch, cg_iters, dtype="float32",
                        reps=3):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.cg import cg_raw
    from manifold_gp_tpu.ops.dia import DiaLayout
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.ops.matern import (
        make_matern_precision_matvec,
        make_matern_precision_matvec_operand,
        matern_precision_operands,
    )
    from manifold_gp_tpu.ops.sparse_formats import build_layout, permute_in

    coeffs = laplacian_coeffs(graph, eps)
    layout = build_layout(graph)
    pallas = layout is not None and jax.devices()[0].platform == "tpu"
    n = graph.num_nodes
    if layout is None:
        desc = "ell-gather"
    elif isinstance(layout, DiaLayout):
        desc = (
            f"dia(D={layout.num_offsets}, band="
            f"{layout.num_padded * layout.num_offsets * 4 / 1e9:.3f} GB)"
        )
    else:
        desc = (
            f"block(S={layout.max_blocks}, panel="
            f"{layout.num_padded * layout.max_blocks * 128 * 4 / 1e9:.2f} GB)"
        )
    print(f"# single-device: N={n} layout={desc} pallas={pallas}", file=sys.stderr)

    # Every large array (graph, layout, coefficients) is a jit ARGUMENT, not
    # a closure constant — the tunneled backend ships program constants with
    # the compile request, which has a hard size limit. The panels are
    # assembled EAGERLY outside the timed region and passed as jit arguments,
    # exactly like the sharded bench path (round-3 ADVICE item 1: the ratio
    # table must compare equal work).
    panel_dtype = {"bfloat16": jnp.bfloat16, "float32x3": "float32x3"}.get(dtype)

    if layout is not None:
        qblocks, dsq_p = matern_precision_operands(
            layout, coeffs, nu, ls, dtype=panel_dtype
        )
        mv_op = make_matern_precision_matvec_operand(
            layout, nu, "randomwalk", pallas=pallas
        )

        @jax.jit
        def run_cg(qblocks_, dsq_p_, b):
            # tol=0 forces exactly cg_iters iterations -> deterministic count
            return cg_raw(
                lambda v: mv_op(qblocks_, dsq_p_, v), b, tol=0.0,
                max_iter=cg_iters, with_info=True,
            )

        run = lambda b: run_cg(qblocks, dsq_p, b)  # noqa: E731
    else:

        @jax.jit
        def run_cg(graph_, c, b):
            mv = make_matern_precision_matvec(graph_, c, nu, ls, "randomwalk")
            return cg_raw(mv, b, tol=0.0, max_iter=cg_iters, with_info=True)

        run = lambda b: run_cg(graph, coeffs, b)  # noqa: E731

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, batch)).astype(np.float32))
    if layout is not None:
        b = permute_in(layout, b)
    x, it0 = run(b)
    float(x[0, 0])  # completion fence (block_until_ready unreliable on tunnel)
    assert np.all(np.isfinite(np.asarray(x[:4096]))), (
        "non-finite warmup CG output: operator scale overflow"
    )
    # NaN early-exit guard rationale lives in _timed_reps (a NaN CG iterate
    # EXITS the while_loop immediately — res > tol is False for NaN — which
    # silently inflated the first real-IVF 1M row 15x).
    rate, extra = _timed_reps(run, b, reps, cg_iters, nu, batch)
    from manifold_gp_tpu.utils.roofline import roofline_fields

    if layout is not None:
        extra.update(roofline_fields(
            layout, batch, nu, rate,
            buf_dtype_bytes=2 if dtype == "bfloat16" else 4,
        ))
    return rate, extra


def bench_sharded(graph, eps, nu, ls, batch, cg_iters, mesh_size,
                  dtype="float32", force_scan=False, schedule="auto",
                  reps=3):
    """Row-sharded CG throughput. Rides the fused block-ELL mesh path
    (parallel/block_spmv: sharded panels + Pallas kernel / block einsum on
    the all-gathered operand) whenever the layout builds; ``force_scan``
    pins the round-2 per-column gather scan for comparison."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.cg import cg_raw
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.parallel import (
        make_mesh,
        make_sharded_matern_precision_matvec,
        pad_nodes,
    )
    from manifold_gp_tpu.parallel.block_spmv import (
        build_mesh_block_tables,
        make_sharded_matern_precision_matvec_operand,
        sharded_matern_precision_operands,
    )

    devices = jax.devices()
    if len(devices) < mesh_size:
        devices = jax.devices("cpu")
    assert len(devices) >= mesh_size, f"need {mesh_size} devices"
    mesh = make_mesh(mesh_size, devices=devices)
    coeffs = laplacian_coeffs(graph, eps)
    rng = np.random.default_rng(1)
    b_host = rng.standard_normal((graph.num_nodes, batch)).astype(np.float32)

    tables = None if force_scan else build_mesh_block_tables(graph, mesh)
    if tables is not None:
        impl = "pallas" if devices[0].platform == "tpu" else "einsum"
        panel_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
        # operands assembled EAGERLY and passed as jit arguments below —
        # the tunneled backend ships closure constants with the compile
        # request (hard size limit; the panel buffer is multi-GB at 1M).
        qblocks, dsq_p = sharded_matern_precision_operands(
            tables, coeffs, nu, ls, dtype=panel_dtype
        )
        mv_op = make_sharded_matern_precision_matvec_operand(
            tables, nu, "randomwalk", impl=impl, schedule=schedule
        )
        mv = None
        n_pad = tables.rows
        b = tables.embed_rows(b_host)
        desc = (f"fused(S={tables.s_max}, impl={impl}, dtype={dtype}, "
                f"schedule={schedule})")
    else:
        mv, n_pad = make_sharded_matern_precision_matvec(
            graph, mesh, coeffs, nu, ls, "randomwalk"
        )
        b = pad_nodes(
            np.concatenate(
                [b_host, np.zeros((n_pad - graph.num_nodes, batch), np.float32)]
            ),
            n_pad,
            mesh,
        )
        desc = "ell-scan(float32)"
    print(
        f"# sharded: N={graph.num_nodes} padded={n_pad} mesh={mesh_size}x"
        f"{devices[0].platform} path={desc}",
        file=sys.stderr,
    )

    if tables is not None:

        @jax.jit
        def run_cg(qblocks_, dsq_p_, b_):
            return cg_raw(
                lambda v: mv_op(qblocks_, dsq_p_, v), b_, tol=0.0,
                max_iter=cg_iters, with_info=True,
            )

        run = lambda b_: run_cg(qblocks, dsq_p, b_)
    else:

        @jax.jit
        def run_cg(b_):
            return cg_raw(mv, b_, tol=0.0, max_iter=cg_iters, with_info=True)

        run = run_cg

    x, it0 = run(b)
    float(x[0, 0])
    assert np.all(np.isfinite(np.asarray(x[:4096]))), (
        "non-finite warmup CG output: operator scale overflow"
    )
    rate, extra = _timed_reps(run, b, reps, cg_iters, nu, batch)
    if tables is not None:
        from manifold_gp_tpu.utils.roofline import roofline_fields

        extra.update(roofline_fields(
            tables, batch, nu, rate,
            buf_dtype_bytes=2 if dtype == "bfloat16" else 4,
        ))
    return rate, extra


def bench_matvec_only(graph, eps, batch, iters=50, reps=5, dtype="float32"):
    """Pure fused-SpMV chain — no CG, no Matérn composition: the strict
    kernel speed-of-light measurement (round-4 VERDICT item 1). Chain of
    ``iters`` bare kernel applies in permuted space with one normalization
    pass per apply (to keep values finite); bytes per apply are the kernel's
    exact cost-estimate traffic + ~2 vector passes for the normalization, so
    achieved GB/s here is measured, not modeled."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.laplacian import laplacian_coeffs
    from manifold_gp_tpu.ops.sparse_formats import (
        assemble,
        build_layout,
        make_matvec_ad,
        matvec_permuted,
        permute_in,
    )
    from manifold_gp_tpu.utils.roofline import (
        hbm_peak_bytes_per_s,
        matvec_bytes,
        normalize_spec,
    )

    coeffs = laplacian_coeffs(graph, eps)
    layout = build_layout(graph)
    assert layout is not None, "matvec-only mode needs a fused layout"
    pallas = jax.devices()[0].platform == "tpu"
    buf_dtype = {"bfloat16": jnp.bfloat16, "float32x3": "float32x3"}.get(dtype)
    blocks = jax.jit(lambda d, t: assemble(layout, d, t, dtype=buf_dtype))(
        coeffs.diag, coeffs.triu
    )
    mv_fn = (
        make_matvec_ad(layout)
        if pallas
        else lambda blk, pv: matvec_permuted(layout, blk, pv)
    )
    spec = normalize_spec(layout)
    print(f"# matvec-only: N={graph.num_nodes} spec={spec} pallas={pallas} "
          f"dtype={dtype}", file=sys.stderr)

    @jax.jit
    def chain(blocks_, pv):
        def body(_, t):
            t = mv_fn(blocks_, t)
            return t / jnp.linalg.norm(t[:, :1])

        return jax.lax.fori_loop(0, iters, body, pv)

    rng = np.random.default_rng(1)
    v = permute_in(
        layout,
        jnp.asarray(rng.standard_normal((graph.num_nodes, batch)).astype(
            np.float32))
    )
    out = chain(blocks, v)
    float(out[0, 0])
    assert np.all(np.isfinite(np.asarray(out[:4096])))
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(blocks, out)
        float(out[0, 0])
        rates.append(iters * batch / (time.perf_counter() - t0))
    rates = np.sort(rates)
    rate = float(np.median(rates))
    # x3 stores hi+lo bf16 = 4 bytes per entry, same stream as f32
    mv = matvec_bytes(layout, batch,
                      buf_dtype_bytes=2 if dtype == "bfloat16" else 4)
    per_mv = (mv["total"] + 2 * spec["num_padded"] * batch * 4) / batch
    extra = {
        "reps": reps,
        "rate_spread": round(float((rates[-1] - rates[0]) / rate), 3),
        "spmv_format": mv["format"],
        "bytes_per_matvec": round(per_mv, 1),
        "operator_bytes_per_apply": mv["operator"],
        "achieved_gbps": round(rate * per_mv / 1e9, 1),
    }
    peak = hbm_peak_bytes_per_s()
    if peak:
        extra["hbm_peak_gbps"] = round(peak / 1e9, 1)
        extra["pct_of_hbm_peak"] = round(100.0 * rate * per_mv / peak, 1)
    return rate, extra


def bench_ivf_recall(x, k, graph, build_s, num_samples=10000, seed=3):
    """IVF recall at the OPERATING point (round-4 VERDICT item 6): the
    round-4 0.99-recall figure was measured at 100k and extrapolated to the
    1M build. Here: per-query recall@k of the shipped IVF configuration on
    ``num_samples`` sampled database points against the EXACT search of
    those same queries (exact full search at 1M is infeasible per query
    budget; sampled is not — 10k x 1M distance tiles are ~20 s of MXU), plus
    the built graph's edge count vs the k*N/2-ish expectation."""
    import jax.numpy as jnp

    from manifold_gp_tpu.ops.knn import ivf_build, ivf_search, knn_search

    n = x.shape[0]
    rng = np.random.default_rng(seed)
    sample = np.sort(rng.choice(n, size=min(num_samples, n), replace=False))
    xq = jnp.asarray(x[sample])
    xd = jnp.asarray(x)
    t0 = time.perf_counter()
    # exact ground truth for the sampled queries (small blocks: a [B, N]
    # f32 tile at 1M is 2 GB at B=512 — use 128)
    d_ex, i_ex = knn_search(xd, xq, k + 1, block_size=128)
    i_ex = np.asarray(i_ex)
    exact_s = time.perf_counter() - t0
    # the shipped IVF configuration (same sizing as real_manifold_graph)
    nlist = 2 ** int(round(np.log2(4.0 * np.sqrt(n))))
    t0 = time.perf_counter()
    index = ivf_build(xd, nlist=nlist, kmeans_iters=5)
    d_iv, i_iv = ivf_search(index, xq, k + 1, nprobe=16)
    ivf_s = time.perf_counter() - t0
    i_iv = np.asarray(i_iv)
    # drop the self column (queries are database points)
    recalls = []
    for row in range(i_ex.shape[0]):
        true = set(i_ex[row].tolist()) - {int(sample[row])}
        got = set(i_iv[row].tolist()) - {int(sample[row])}
        recalls.append(len(true & got) / max(len(true), 1))
    return {
        "metric": "ivf_recall_at_operating_point",
        "value": round(float(np.mean(recalls)), 4),
        "unit": "recall@k",
        "n": n,
        "k": k,
        "num_samples": int(len(recalls)),
        "recall_p05": round(float(np.percentile(recalls, 5)), 4),
        "nlist": nlist,
        "nprobe": 16,
        "graph_edges": int(graph.num_edges),
        # perfect symmetric coalesced graph of a k-NN search has between
        # k*N/2 (fully mutual) and k*N (no mutual pairs) edges
        "edges_per_node": round(graph.num_edges / n, 2),
        "graph_build_s": round(build_s, 2),
        "sampled_exact_s": round(exact_s, 1),
        "sampled_ivf_s": round(ivf_s, 1),
    }


def bench_basis(graph, eps, num_modes, max_iter):
    """Spectral-basis extraction (block LOBPCG over the fused SpMV) — the
    prediction-side cost the reference pays with dense O(N^3) eigh."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.eigen import lobpcg_smallest
    from manifold_gp_tpu.ops.laplacian import (
        gershgorin_bound,
        laplacian_coeffs,
        laplacian_matvec,
    )
    from manifold_gp_tpu.ops.sparse_formats import assemble, build_layout

    coeffs = laplacian_coeffs(graph, eps)
    layout = build_layout(graph)
    pallas = layout is not None and jax.devices()[0].platform == "tpu"
    n = graph.num_nodes
    print(f"# basis: N={n} m={num_modes} iters={max_iter} pallas={pallas}",
          file=sys.stderr)

    @jax.jit
    def run(graph_, layout_, c):
        block = (
            (layout_, assemble(layout_, c.diag, c.triu))
            if layout_ is not None
            else None
        )
        mv = lambda v: laplacian_matvec(  # noqa: E731
            graph_, c, v, "symmetric", block=block,
            pallas=pallas and block is not None,
        )
        x0 = jax.random.normal(jax.random.PRNGKey(0), (n, num_modes),
                               jnp.float32)
        return lobpcg_smallest(mv, x0, gershgorin_bound(graph_, c),
                               max_iter=max_iter)

    val, vec = run(graph, layout, coeffs)
    float(val[0])
    t0 = time.perf_counter()
    val, vec = run(graph, layout, coeffs)
    float(val[0])
    return time.perf_counter() - t0


def bench_train_step(graph, x, eps, nu, num_probes, dtype="float32"):
    """Full model-level training step (value_and_grad of the precision-form
    MLL: quad + SLQ logdet + Jacobi-PCG gradient solves) at scale — the
    BASELINE config-5 'flagship training' cost on one chip."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.config import InferenceConfig
    from manifold_gp_tpu.kernels import RiemannMaternKernel
    from manifold_gp_tpu.models import RiemannGP

    n = graph.num_nodes
    # (unit-bandwidth coordinate scaling now happens once in main() for all
    # bench modes; eps arrives as 1.0 with sqdist pre-scaled)
    x = x / eps
    eps = 1.0
    rng = np.random.default_rng(0)
    y = np.sin(np.arange(n) * 7.1 / n).astype(np.float32)
    cfg = InferenceConfig(
        max_cholesky=0, dense_operator_max_size=0,
        num_probes=num_probes, lanczos_max_iter=32,
        cg_tolerance=1e-2, cg_max_iter=200,
        spmv_dtype=dtype,
    )
    kernel = RiemannMaternKernel(
        nu=nu, x=x, nearest_neighbors=16,
        laplacian_normalization="randomwalk", num_modes=50, cfg=cfg,
        graph=graph,
    )
    model = RiemannGP(x, jnp.asarray(y), kernel, cfg=cfg)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=eps, lengthscale=1.0
    )
    print(
        f"# train-step: N={n} probes={num_probes} layout="
        f"{type(kernel.block_layout).__name__} pallas={kernel.use_pallas}",
        file=sys.stderr,
    )

    step = jax.jit(jax.value_and_grad(model.mll_loss))
    loss, grads = step(params, jax.random.PRNGKey(0))
    float(loss)
    t0 = time.perf_counter()
    loss, grads = step(params, jax.random.PRNGKey(1))
    float(loss)
    dt = time.perf_counter() - t0
    print(f"# loss {float(loss):.4f}", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cg-iters", type=int, default=20)
    ap.add_argument("--nu", type=int, default=2)
    ap.add_argument("--eps", type=float, default=None,
                    help="graph bandwidth (default: 2x median edge length)")
    ap.add_argument("--ls", type=float, default=1.0)
    ap.add_argument("--mesh", type=int, default=0,
                    help="row-shard over this many devices (0 = single)")
    ap.add_argument("--mesh-scan", action="store_true",
                    help="with --mesh: force the round-2 per-column gather "
                         "scan instead of the fused block-ELL mesh path")
    ap.add_argument("--mesh-schedule",
                    choices=["auto", "resident", "streaming"],
                    default="auto",
                    help="with --mesh (pallas impl): force the local-matvec "
                         "kernel schedule instead of the byte-count dispatch "
                         "— the round-4 measurement hook for pinning the 1M "
                         "mesh residual")
    ap.add_argument("--reps", type=int, default=3,
                    help="independently timed CG chains per row (median + "
                         "spread recorded — round-4 VERDICT item 3)")
    ap.add_argument("--matvec-only", action="store_true",
                    help="instead of CG: time a bare fused-SpMV chain (the "
                         "strict kernel speed-of-light row; exact bytes)")

    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed rep "
                         "into DIR (roofline attribution)")
    ap.add_argument("--ivf-recall", type=int, default=0, metavar="SAMPLES",
                    help="instead of CG: measure IVF recall@k on this many "
                         "sampled queries vs exact search at the operating "
                         "point (use with --graph real/ivf)")
    ap.add_argument("--basis", type=int, default=0,
                    help="instead of CG: time LOBPCG basis extraction of "
                         "this many modes")
    ap.add_argument("--basis-iters", type=int, default=100)
    ap.add_argument("--train-step", action="store_true",
                    help="instead of CG: time one full model training step "
                         "(value_and_grad of the SLQ marginal likelihood)")
    ap.add_argument("--probes", type=int, default=128)
    ap.add_argument("--dtype", choices=["float32", "bfloat16", "float32x3"],
                    default="float32",
                    help="SpMV panel dtype: bfloat16 halves the HBM panel "
                         "stream (accuracy bounds in tests/test_bf16_solve.py); "
                         "float32x3 keeps f32 bytes but runs the 3-pass "
                         "bf16x3 MXU scheme (~2^-15 rel error, half the MXU "
                         "cost of f32-HIGHEST; single-device paths only)")
    ap.add_argument("--graph", choices=["real", "procedural", "exact", "ivf"],
                    default="real",
                    help="graph source: 'real' runs an actual kNN build "
                         "(exact brute force <=200k, device IVF above) and "
                         "reports its seconds; 'exact'/'ivf' force a "
                         "backend; 'procedural' is the escape hatch that "
                         "injects the banded edge list without a search "
                         "(isolates SpMV timing from build cost)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    if args.graph == "procedural":
        graph, x = synthetic_manifold_graph(args.n, args.k)
        build_s, build_backend = time.perf_counter() - t0, "procedural"
    else:
        backend = {"real": None, "exact": "device", "ivf": "ivf"}[args.graph]
        graph, x, build_s, build_backend = real_manifold_graph(
            args.n, args.k, backend=backend
        )
    print(f"# graph build[{build_backend}]: {build_s:.1f}s, "
          f"M={graph.num_edges}, max_degree={graph.max_degree}",
          file=sys.stderr)
    eps = args.eps
    if eps is None:
        eps = 2.0 * float(np.sqrt(np.median(np.asarray(graph.sqdist))))
    # Unit-bandwidth coordinate scaling, once, for every mode: at 1M points
    # on a unit curve eps ~ 1e-5, so diag(L) ~ 1/eps^2 ~ 1e10 and a nu=2
    # noisy apply overflows f32 — and a NaN CG iterate EXITS the while_loop
    # early (res > tol is False for NaN), silently inflating measured rates
    # (this bit the first real-IVF 1M row). Same conditioning practice as
    # the reference's operator stack needs (PARITY.md dragon note); pure
    # rescaling, zero effect on sparsity or kernel throughput.
    import dataclasses as _dc

    graph = _dc.replace(
        graph, sqdist=graph.sqdist / np.float32(eps) ** 2
    )
    x = x / eps
    eps = 1.0

    if args.ivf_recall:
        import json

        # x was unit-bandwidth rescaled above — a pure units change that
        # leaves every neighbor set (and hence recall) invariant
        row = bench_ivf_recall(x, args.k, graph, build_s,
                               num_samples=args.ivf_recall)
        print(json.dumps(row))
        return
    if args.train_step:
        import json

        dt = bench_train_step(graph, x, eps, args.nu, args.probes, args.dtype)
        print(json.dumps({
            "metric": "train_step_seconds", "value": round(dt, 2),
            "unit": "s/step", "n": args.n, "probes": args.probes,
            "dtype": args.dtype, "graph": build_backend,
            "graph_build_s": round(build_s, 2),
        }))
        return
    if args.basis:
        import json

        dt = bench_basis(graph, eps, args.basis, args.basis_iters)
        print(json.dumps({
            "metric": "lobpcg_basis_seconds", "value": round(dt, 2),
            "unit": "s", "n": args.n, "modes": args.basis,
            "iters": args.basis_iters, "graph": build_backend,
            "graph_build_s": round(build_s, 2),
        }))
        return
    import contextlib
    import json

    prof = contextlib.nullcontext()
    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)
    with prof:
        if args.matvec_only:
            rate, extra = bench_matvec_only(
                graph, eps, args.batch, dtype=args.dtype, reps=args.reps,
            )
            label = "spmv_matvecs_per_s_1chip"
        elif args.mesh:
            rate, extra = bench_sharded(
                graph, eps, args.nu, args.ls, args.batch, args.cg_iters,
                args.mesh, dtype=args.dtype, force_scan=args.mesh_scan,
                schedule=args.mesh_schedule, reps=args.reps,
            )
            label = f"sharded_cg_matvecs_per_s_mesh{args.mesh}"
        else:
            rate, extra = bench_single_device(
                graph, eps, args.nu, args.ls, args.batch, args.cg_iters,
                args.dtype, reps=args.reps,
            )
            label = "cg_matvecs_per_s_1chip"

    row = {
        "metric": label, "value": round(rate, 1), "unit": "matvec/s",
        "n": args.n, "k": args.k, "batch": args.batch, "dtype": args.dtype,
        "graph": build_backend, "graph_build_s": round(build_s, 2),
    }
    row.update(extra)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
