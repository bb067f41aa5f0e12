#!/usr/bin/env python3
"""Headline benchmark: sparse graph-Laplacian matvec throughput.

The matrix-free Laplacian matvec is the hot loop of IMGP training (every CG
iteration inside the marginal-likelihood evaluation is one of these; see
SURVEY §3.2). We measure batched matvecs/s on an SRMNIST-scale kNN graph
(N=10,010, k=50 — the reference's largest configuration) on one chip, and
compare against the reference's computational substrate (torch sparse COO
spmm, CPU build of torch in this image) on the same graph.

Prints exactly one JSON line:
  {"metric": "laplacian_matvecs_per_s", "value": ..., "unit": "matvec/s",
   "vs_baseline": ...}
"""

import json
import sys
import time

import numpy as np


def build_inputs(n=10010, d=64, k=50, seed=0):
    # Clustered synthetic data so the kNN graph has realistic manifold
    # structure (10 clusters ~ 10 digits).
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((10, d)).astype(np.float32) * 2.0
    x = centers[rng.integers(0, 10, n)] + 0.3 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    return x


def bench_jax(x, k, batch, iters=40):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.ops.laplacian import (
        adjacency_matvec_ell,
        laplacian_coeffs,
        laplacian_matvec,
    )

    from manifold_gp_tpu.ops.block_sparse import assemble, build_block_layout

    # Host-side graph build: the one-time kNN construction should not ride a
    # (potentially high-latency) accelerator link; training does the same.
    graph = build_graph(x, k, knn_backend="host")
    coeffs = laplacian_coeffs(graph, 0.5)
    layout = build_block_layout(graph)

    # The fused Pallas kernel needs a real TPU; CPU runs keep the einsum path.
    pallas = layout is not None and jax.devices()[0].platform == "tpu"

    # Chain the matvecs inside ONE jitted program: training runs the matvec
    # inside a jitted CG loop, so device throughput (not per-dispatch tunnel
    # latency) is the relevant number.
    #
    # Like the training solves, the whole chain runs in padded-RCM space with
    # the permutation and the randomwalk D^{+-1/2} conjugation hoisted to the
    # chain boundary (consecutive D^{-1/2} / D^{1/2} factors telescope); each
    # iteration is one bare kernel call plus the normalization scalar — the
    # same per-iteration work a CG step's matvec does. The panel assembly is
    # hoisted out of the timed region: training assembles once per step and
    # amortizes it over the full CG/SLQ solve (hundreds of matvecs), so
    # folding one assembly into a 40-matvec chain would overstate its share.
    if layout is not None:
        from manifold_gp_tpu.ops.block_sparse import (
            matvec_permuted,
            permute_in,
            permute_out,
        )
        from manifold_gp_tpu.ops.pallas_spmv import make_matvec_ad

        blocks = jax.jit(lambda d, t: assemble(layout, d, t))(
            coeffs.diag, coeffs.triu
        )
        mv_fn = (
            make_matvec_ad(layout)
            if pallas
            else lambda blk, pv: matvec_permuted(layout, blk, pv)
        )
        dsq_host = jnp.sqrt(coeffs.deg[layout.perm])[:, None]

        @jax.jit
        def mv_chain(blocks, dsq, v, n_iters):
            def body(_, pw):
                t = mv_fn(blocks, pw)
                # Normalize by the original-space first column, exactly like
                # the unpermuted chain: ||(D^{-1/2} t)[:, 0]||.
                return t / jnp.linalg.norm(t[:, :1] / dsq)

            pw = permute_in(layout, v) * dsq
            pw = jax.lax.fori_loop(0, n_iters, body, pw)
            return permute_out(layout, pw / dsq)

        chain = lambda v, n: mv_chain(blocks, dsq_host, v, n)  # noqa: E731
    else:

        @jax.jit
        def mv_chain(triu, diag, deg, v, n_iters):
            c = coeffs._replace(triu=triu, diag=diag, deg=deg)

            def body(_, vec):
                out = laplacian_matvec(graph, c, vec, "randomwalk")
                # Normalize to keep values finite over the chain.
                return out / jnp.linalg.norm(out[:, :1])

            return jax.lax.fori_loop(0, n_iters, body, v)

        chain = lambda v, n: mv_chain(  # noqa: E731
            coeffs.triu, coeffs.diag, coeffs.deg, v, n
        )

    v = jnp.asarray(
        np.random.default_rng(1).standard_normal((graph.num_nodes, batch)).astype(
            np.float32
        )
    )
    # Completion fence: block_until_ready does NOT reliably block on the
    # tunneled TPU backend; a scalar device->host read does. At 10k nodes a
    # 40-iter chain runs in ~15 ms — the same order as one tunnel round
    # trip — so ANY absolute (chain + fence) timing carries a large additive
    # RTT bias that varies with tunnel conditions (this, not a kernel
    # change, is what moved the r03 -> r04 headline; round-4 VERDICT item
    # 3). SLOPE timing removes it: time a short and a long chain and take
    # rate = delta(iters) * batch / delta(t) — the fixed dispatch + fence
    # cost cancels, leaving pure device throughput (the quantity
    # "matvecs/s/chip" names). Median of 5 slope pairs, spread recorded.
    lo, hi = iters, 8 * iters
    out = chain(v, hi)  # compile + warm
    float(out[0, 0])
    reps = 5
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(out, lo)
        float(out[0, 0])
        t1 = time.perf_counter()
        out = chain(out, hi)
        float(out[0, 0])
        t2 = time.perf_counter()
        rates.append((hi - lo) * batch / ((t2 - t1) - (t1 - t0)))
    rates = np.sort(rates)
    median = float(np.median(rates))
    spread = float((rates[-1] - rates[0]) / median)
    info = {"layout": layout, "rate_spread": round(spread, 3),
            "rate_min": round(float(rates[0]), 1),
            "rate_max": round(float(rates[-1]), 1)}
    return median, graph, info


def bench_torch_baseline(graph, batch, iters=10, reps=5):
    """The reference's substrate: torch_sparse-style COO spmm (2 passes for
    the symmetric triu layout) + diagonal, on the torch build in this image.

    Median of ``reps`` timed repetitions with seed-fixed values: round-3
    VERDICT item 5 — a single 10-iteration CPU timing with fresh random
    values swung the headline vs_baseline ratio 2x round-over-round while
    the numerator improved."""
    try:
        import torch
    except Exception:
        return None
    torch.manual_seed(1337)
    rows = torch.as_tensor(np.asarray(graph.rows), dtype=torch.long)
    cols = torch.as_tensor(np.asarray(graph.cols), dtype=torch.long)
    n = graph.num_nodes
    vals = torch.rand(rows.shape[0])
    diag = torch.rand(n)
    a = torch.sparse_coo_tensor(torch.stack([rows, cols]), vals, (n, n)).coalesce()
    at = torch.sparse_coo_tensor(torch.stack([cols, rows]), vals, (n, n)).coalesce()
    v0 = torch.randn(n, batch)

    def mv(v):
        return diag.unsqueeze(1) * v - torch.sparse.mm(a, v) - torch.sparse.mm(at, v)

    mv(v0)
    rates = []
    for _ in range(reps):
        v = v0
        t0 = time.perf_counter()
        for _ in range(iters):
            v = mv(v)
        dt = time.perf_counter() - t0
        rates.append(iters * batch / dt)
    return float(np.median(rates))


def bench_mesh_continuity_rows():
    """Round-3 VERDICT item 10: carry the real-TPU mesh=1 SpMV rows (262k
    k=50 — the round-3 PARITY config — and 1M k=16, batch 128, 50 CG iters,
    f32, procedural graph so the row isolates SpMV regression from build
    noise) into every round's bench JSON. The 1M row runs k=16 rather than
    round-3's k=50: the 25M-edge mesh-table build costs ~25 min of host
    time, which would dominate the driver's bench budget; the k=16 band is
    the same kernel/schedule at a driver-safe cost (mesh=1 parity vs
    single-chip at k=50 is pinned in PARITY.md instead). Returns a dict of
    extra fields (None values when a row fails)."""
    import subprocess

    out = {}
    for label, n, k in (("mesh1_262k_matvecs_per_s", 262144, 50),
                        ("mesh1_1m_matvecs_per_s", 1000000, 16)):
        val = None
        try:
            r = subprocess.run(
                [sys.executable, "benchmark/bench_large_scale.py",
                 "--n", str(n), "--k", str(k), "--batch", "128",
                 "--cg-iters", "50", "--mesh", "1", "--graph", "procedural",
                 "--reps", "3"],
                capture_output=True, text=True, timeout=1800,
            )
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    row = json.loads(line)
                    val = row.get("value")
                    # carry the sub-row's spread + speed-of-light fields
                    # (round-4 VERDICT items 1 & 3)
                    for f in ("rate_spread", "achieved_gbps",
                              "pct_of_hbm_peak", "pct_of_sol_kernel"):
                        if row.get(f) is not None:
                            out[f"{label}_{f}"] = row[f]
                    break
                except json.JSONDecodeError:
                    continue
        except Exception:
            pass
        out[label] = val
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10010
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    # 128 matches the training configuration (num_probes=128 SLQ probes ride
    # every CG/Lanczos matvec as one [N, 128] batch) and the MXU/lane width.
    batch = 128
    x = build_inputs(n=n, k=k)
    ours, graph, info = bench_jax(x, k, batch)
    base = bench_torch_baseline(graph, batch)
    vs = (ours / base) if base else None
    # batch-64 continuity row: the round-1 headline ran batch 64; keeping
    # both keeps driver numbers apples-to-apples across rounds (round-2
    # ADVICE item 4 / VERDICT weak-point 3).
    ours64, _, _ = bench_jax(x, k, 64)
    record = {
        "metric": "laplacian_matvecs_per_s",
        "value": round(ours, 1),
        "unit": "matvec/s",
        "vs_baseline": round(vs, 2) if vs else None,
        # absolute torch-CPU baseline (median of 5): recorded so the ratio
        # is auditable round-over-round (round-3 VERDICT item 5)
        "baseline_value": round(base, 1) if base else None,
        "batch": batch,
        # median-of-5 spread (round-4 VERDICT item 3): (max-min)/median of
        # the 5 timed chains behind `value`
        "rate_spread": info["rate_spread"],
        "value_batch64": round(ours64, 1),
        "n": n,
        "k": k,
        "dtype": "float32",
        "kernel": "fused-pallas-or-einsum (auto)",
    }
    # Speed-of-light accounting (round-4 VERDICT item 1): the chain is the
    # bare fused matvec + one normalization pass per iteration, so its
    # minimum HBM traffic is the kernel's exact bytes plus ~2 vector passes.
    if info["layout"] is not None:
        from manifold_gp_tpu.utils.roofline import (
            block_matvec_flops,
            hbm_peak_bytes_per_s,
            matvec_bytes,
            mxu_peak_flops_per_s,
        )

        mv = matvec_bytes(info["layout"], batch)
        npd = info["layout"].num_padded
        per_mv = (mv["total"] + 2 * npd * batch * 4) / batch
        record["spmv_format"] = mv["format"]
        record["bytes_per_matvec"] = round(per_mv, 1)
        record["achieved_gbps"] = round(ours * per_mv / 1e9, 1)
        peak = hbm_peak_bytes_per_s()
        if peak:
            record["pct_of_hbm_peak"] = round(100.0 * ours * per_mv / peak, 1)
        # Block panels also burn MXU FLOPs (f32 HIGHEST = 6-pass emulation);
        # whichever ceiling is lower names the binding resource.
        flops = block_matvec_flops(info["layout"], batch)
        mxu = mxu_peak_flops_per_s()
        if flops and mxu:
            mxu_sol = mxu / (flops / batch)
            record["mxu_bound_matvecs_per_s"] = round(mxu_sol, 1)
            record["pct_of_mxu_bound"] = round(100.0 * ours / mxu_sol, 1)
    # real-TPU mesh continuity rows (round-3 VERDICT item 10); skipped on
    # CPU runs where the virtual mesh would measure nothing meaningful, and
    # skippable for quick verification runs (MGP_BENCH_NO_MESH_ROWS=1).
    import os

    import jax

    if jax.devices()[0].platform == "tpu" and not os.environ.get(
        "MGP_BENCH_NO_MESH_ROWS"
    ):
        record.update(bench_mesh_continuity_rows())
    print(json.dumps(record))


if __name__ == "__main__":
    main()
