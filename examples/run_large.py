#!/usr/bin/env python3
"""Sustained large-N training campaign on a synthetic known-truth manifold.

The reference's full-protocol runs (its notebooks: build graph -> train
hyperparameters -> eval basis -> posterior metrics, SURVEY §3.2/§3.3) exist
in this repo at reference scale as ``examples/run_*.py``; this entry point
runs the SAME protocol at the scale the reference cannot reach (round-4
VERDICT item 2): a 262k-node (default) torus sample in R^3 (--manifold
curve selects the BASELINE config-5 1-D curve instead — see torus_points
for why the torus is the default), tens of epochs of precision-form MLL
training end to end, with

  * a REAL kNN graph build (device IVF above 200k) through the keyed on-disk
    cache (``utils.cache.cached_graph`` — its first production caller: the
    second invocation of this script skips the build and prints the seconds
    saved);
  * epoch-amortized preconditioning (``precond_refresh``) and
    checkpoint-every-k with resume;
  * spectral-basis eval through ``cached_eval_basis`` (LOBPCG above
    ``eigh_max_size``), posterior RMSE/NLL at held-out points against the
    curve's KNOWN ground truth, and CG iteration counts at the initial vs
    trained hyperparameters.

Ground truth: y_true = sin(2u) + 0.5 cos(3u) sin(2v) in the torus angles
(curve: sin(3t) + 0.5 sin(7t)) — a function of the manifold coordinates,
exactly the regime the geometry-aware kernel exists for.
Labels are y_true + 0.1 N(0,1), normalized by train statistics (the
reference's y-noise + normalize_y protocol, e.g. 1D notebook cell
"af216c23").

Usage:
  python examples/run_large.py                       # 262k, 50 epochs (TPU)
  python examples/run_large.py --n 1000000 --epochs 20
  python examples/run_large.py --n 8192 --epochs 5 --cpu   # smoke
"""

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def curve_points(n: int, seed: int = 0):
    """Noisy closed 3D curve (same generator as benchmark/bench_large_scale
    — duplicated so the example stays importable on its own)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    x = np.stack(
        [np.cos(t), np.sin(t), 0.3 * np.sin(2 * t)], axis=1
    ).astype(np.float32)
    x += (0.1 / n) * rng.standard_normal(x.shape).astype(np.float32)
    return x, t


def torus_points(n: int, seed: int = 0, big_r: float = 1.0, small_r: float = 0.4):
    """n quasi-uniform samples on a torus in R^3, with the (u, v) angles.

    The campaign's DEFAULT manifold (round 5): a 1-D curve at 262k+ nodes
    is spectrally pathological — its lowest Laplacian band sits at
    lambda/lambda_max ~ 1e-9 ((h/L)^2 with h ~ 1/n), beyond what ANY
    iterative eigensolver resolves in f32 at reasonable cost, and unlike
    every regime the reference targets (images/meshes are d >= 2, where
    the ratio scales as h^2 ~ 1/n, e.g. ~3e-3 here). The torus keeps the
    known-ground-truth property with a well-posed spectrum."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(0.0, 2 * np.pi, n).astype(np.float32)
    # v sampled from the torus area element (1 + (r/R) cos v) via rejection
    # so the point density is uniform on the SURFACE (not in angle space)
    v = np.empty(n, np.float32)
    filled = 0
    while filled < n:
        cand = rng.uniform(0.0, 2 * np.pi, 2 * (n - filled))
        acc = rng.uniform(0.0, 1.0, cand.shape[0]) < (
            (1.0 + (small_r / big_r) * np.cos(cand)) / (1.0 + small_r / big_r)
        )
        take = cand[acc][: n - filled]
        v[filled : filled + take.shape[0]] = take
        filled += take.shape[0]
    x = np.stack(
        [
            (big_r + small_r * np.cos(v)) * np.cos(u),
            (big_r + small_r * np.cos(v)) * np.sin(u),
            small_r * np.sin(v),
        ],
        axis=1,
    ).astype(np.float32)
    return x, u, v


def run_campaign(
    n: int = 262_144,
    k: int = 16,
    epochs: int = 50,
    num_test: int = 2048,
    num_modes: int = 100,
    cache_dir: str = ".mgp_cache",
    checkpoint_every: int = 10,
    precond_refresh: int = 10,
    lr: float = 1e-1,
    seed: int = 0,
    verbose: bool = False,
    resume: bool = True,
    nu: int = 2,
    metrics_path=None,
    manifold: str = "torus",
    chunk_size: int = 50,
):
    """Full train->eval->posterior cycle at scale; returns a result dict.

    ``manifold``: "torus" (default — well-posed spectrum at scale, see
    ``torus_points``) or "curve" (the BASELINE config-5 1-D curve; its low
    spectral band sits below the f32 assembly noise floor past ~100k nodes,
    so its basis routes through the host f64 sparse shift-invert solver —
    see the cfg below)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu import InferenceConfig, RiemannGP, RiemannMaternKernel
    from manifold_gp_tpu.ops.cg import cg_raw
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.utils import manifold_informed_train, test_model
    from manifold_gp_tpu.utils.cache import cached_eval_basis, cached_graph
    from manifold_gp_tpu.utils.metrics import MetricsRecorder

    timings = {}
    rng = np.random.default_rng(seed)
    if manifold == "torus":
        x_all, u_all, v_all = torus_points(n, seed=seed)
        # multi-harmonic in BOTH torus angles: needs genuinely 2-D geometry
        y_true = np.sin(2 * u_all) + 0.5 * np.cos(3 * u_all) * np.sin(2 * v_all)
    else:
        x_all, t_all = curve_points(n, seed=seed)
        y_true = np.sin(3 * t_all) + 0.5 * np.sin(7 * t_all)
    y_noisy = (y_true + 0.1 * rng.standard_normal(n)).astype(np.float32)

    perm = rng.permutation(n)
    test_idx = perm[:num_test]
    train_idx = np.sort(perm[num_test:])
    train_x, test_x = x_all[train_idx], x_all[test_idx]
    mu_y, std_y = y_noisy[train_idx].mean(), y_noisy[train_idx].std(ddof=1)
    train_y = (y_noisy[train_idx] - mu_y) / std_y
    test_y = (y_noisy[test_idx] - mu_y) / std_y
    test_y_true = (y_true[test_idx] - mu_y) / std_y

    # REAL graph build through the keyed cache (first production caller —
    # round-4 VERDICT item 8). Cached UNSCALED; the unit-bandwidth rescale
    # below is a pure units change applied after load.
    n_tr = train_x.shape[0]
    if n_tr > 200_000:
        nlist = 2 ** int(round(np.log2(4.0 * np.sqrt(n_tr))))
        backend_key = f"ivf-nlist{nlist}-nprobe16-it5"
        builder = lambda: build_graph(  # noqa: E731
            train_x, k, knn_backend="ivf", ivf_nlist=nlist, ivf_nprobe=16,
            ivf_kmeans_iters=5,
        )
    else:
        backend_key = "device" if jax.devices()[0].platform == "tpu" else "host"
        builder = lambda: build_graph(train_x, k, knn_backend=backend_key)  # noqa: E731
    t0 = time.perf_counter()
    graph, hit = cached_graph(
        train_x, k, cache_dir, knn_backend=backend_key, builder=builder
    )
    timings["graph_build_s"] = round(time.perf_counter() - t0, 2)
    timings["graph_cache_hit"] = hit
    print(f"# graph[{backend_key}]: {timings['graph_build_s']}s "
          f"cache_hit={hit} M={graph.num_edges}", file=sys.stderr)

    # Unit-bandwidth coordinate scaling (same conditioning practice as
    # benchmark/bench_large_scale.py main(): eps ~ 1e-5 at this density
    # would overflow a nu=2 noisy f32 apply).
    import dataclasses as _dc

    eps = 2.0 * float(np.sqrt(np.median(np.asarray(graph.sqdist))))
    graph = _dc.replace(graph, sqdist=graph.sqdist / np.float32(eps) ** 2)
    train_x_s = train_x / eps
    test_x_s = test_x / eps

    # 2-D manifolds at scale have RCM band ~ sqrt(n): the 262k torus panels
    # are S=22 column blocks wide (2.7 GB f32), and under panel-space solve
    # VJPs one training step kept ~8 panel-cotangent instances live — 33 GB
    # in f32, OOM on a 16 GB chip (round-5 initial finding; 229k was the
    # ceiling even with bf16 panels). solve_cotangent="edge" contracts every
    # solve cotangent to the [M]+[N] coefficient vectors inside the VJP
    # (config.InferenceConfig.solve_cotangent), bounding backward memory at
    # ONE transient panel buffer — 2-D manifolds now train at full scale.
    # bf16 panels (solve-level accuracy pinned by tests/test_bf16_solve.py)
    # still halve the forward panel stream. 1-D graphs (curve) are S=3 and
    # run f32.
    two_d = manifold == "torus"
    cfg = InferenceConfig(
        max_cholesky=0,
        dense_operator_max_size=0,
        num_probes=48 if two_d else 128,
        lanczos_max_iter=24 if two_d else 32,
        cg_tolerance=1e-2,
        cg_max_iter=200,
        precond_type="pivchol",
        spmv_dtype="bfloat16" if two_d else "float32",
        solve_cotangent="edge" if two_d else "panel",
        # edge cotangents require the block-ELL layout; 2-D RCM bands are
        # never DIA-narrow at scale, but pin it so smoke-scale runs cannot
        # drift onto the band format
        use_dia=not two_d,
        # Torus (2-D): the low band is well-separated — the on-device
        # Chebyshev-filtered solver resolves it in f32. Curve (1-D): the low
        # band sits BELOW the f32 assembly noise floor (~1e-7 lambda_max)
        # past ~100k nodes, where no f32 solver can see it (LOBPCG-200
        # captured 28% of a smooth target; ChebFSI captures the span but the
        # assembly noise itself scrambles it at 262k) — use the host f64
        # sparse shift-invert basis (ops.eigen.host_f64_smallest), the exact
        # analogue of the reference's host-side dense eigh at a scale/
        # precision that route cannot reach.
        eigensolver="chebyshev" if two_d else "host_f64",
    )
    # The reference's data-driven bandwidth floor (identical cell in every
    # notebook, e.g. 1D supervised nb "74cd3ae2"; see examples/run_1d.py):
    # eps_min = max over nodes of its 1-NN distance / sqrt(-4 ln 1e-4) keeps
    # every node's nearest edge weight above 1e-4 — without it, 50 epochs of
    # unconstrained Adam shrank the bandwidth below the bump support radius
    # and ZEROED every held-out feature row (posterior collapsed to the
    # mean; the round-5 campaign's first failure mode).
    from manifold_gp_tpu.parameters import GreaterThan

    rows_np = np.asarray(graph.rows)
    cols_np = np.asarray(graph.cols)
    sq_np = np.asarray(graph.sqdist)
    min_edge = np.full(n_tr, np.inf, np.float32)
    np.minimum.at(min_edge, rows_np, sq_np)
    np.minimum.at(min_edge, cols_np, sq_np)
    gb_min = float(np.sqrt(min_edge.max() / (4.0 * np.log(1e4))))
    kernel = RiemannMaternKernel(
        nu=nu,
        x=train_x_s,
        nearest_neighbors=k,
        laplacian_normalization="randomwalk",
        num_modes=num_modes,
        bump_scale=10.0,
        cfg=cfg,
        graph=graph,
        graphbandwidth_constraint=GreaterThan(gb_min),
    )
    model = RiemannGP(train_x_s, jnp.asarray(train_y), kernel, cfg=cfg)
    params = model.init_params(
        noise=1e-2, outputscale=1.0, graphbandwidth=1.0, lengthscale=1.0
    )

    # CG iteration count at the INITIAL hyperparameters (preconditioned the
    # way training solves are), for the staleness/conditioning record.
    def cg_iters(p):
        mv = model.precision_matvec(p)
        _, it = cg_raw(
            mv, jnp.asarray(train_y), tol=cfg.cg_tolerance,
            max_iter=cfg.cg_max_iter, with_info=True,
        )
        return int(it)

    timings["cg_iters_initial"] = cg_iters(params)

    metrics = MetricsRecorder(path=metrics_path, verbose=False)
    # v2: the bandwidth-floor constraint changed the raw-parameter transform,
    # so v1 checkpoints are not resumable. Keyed by manifold too — a 262k
    # curve and a 262k torus run must not share a resume file.
    ckpt = os.path.join(
        cache_dir, f"campaign_{manifold}_{n}_{k}_{seed}_v2.ckpt.npz"
    )
    t0 = time.perf_counter()
    params, loss, history = manifold_informed_train(
        model,
        params,
        lr=lr,
        weight_decay=0.0,
        max_iter=epochs - 1,  # reference loop is epoch <= max_iter
        tolerance=1e-2,
        num_rand_vec=100,
        verbose=verbose,
        seed=seed,
        metrics=metrics,
        checkpoint_path=ckpt,
        checkpoint_every=checkpoint_every,
        resume=resume,
        precond_refresh=precond_refresh,
        chunk_size=chunk_size,
    )
    train_s = time.perf_counter() - t0
    timings["train_s"] = round(train_s, 1)
    timings["s_per_epoch"] = round(train_s / max(epochs, 1), 2)
    timings["cg_iters_trained"] = cg_iters(params)
    print(f"# trained {epochs} epochs in {train_s:.1f}s "
          f"({timings['s_per_epoch']}s/epoch), final loss {loss:.4f}",
          file=sys.stderr)

    # Spectral basis through the keyed cache (second production caller);
    # inject so model.eval()/test_model reuse it instead of re-solving.
    t0 = time.perf_counter()
    basis, bhit = cached_eval_basis(kernel, params, cache_dir)
    timings["basis_s"] = round(time.perf_counter() - t0, 2)
    timings["basis_cache_hit"] = bhit
    kernel.eval_basis = lambda p: basis
    print(f"# basis: {timings['basis_s']}s cache_hit={bhit}", file=sys.stderr)

    t0 = time.perf_counter()
    rmse, nll = test_model(model, params, test_x_s, test_y, noisy_test=True)
    timings["eval_s"] = round(time.perf_counter() - t0, 2)
    post = model.posterior(params, test_x_s, noisy_posterior=False)
    rmse_true = float(np.sqrt(np.mean(
        (np.asarray(post.mean) - test_y_true) ** 2
    )))

    result = {
        "metric": "campaign_rmse_vs_ground_truth",
        "value": round(rmse_true, 4),
        "manifold": manifold,
        "n": n,
        "k": k,
        "epochs": epochs,
        "num_modes": num_modes,
        "final_loss": round(float(loss), 4),
        "graphbandwidth_trained": round(
            float(kernel.graphbandwidth(params)), 4
        ),
        "graphbandwidth_floor": round(gb_min, 4),
        "lengthscale_trained": round(
            float(kernel.lengthscale(params)), 4
        ),
        "noise_trained": round(float(model.noise(params)), 6),
        "rmse_noisy_test": round(rmse, 4),
        "nll_noisy_test": round(nll, 4),
        # normalized noise floor: labels carry 0.1/std_y of irreducible noise
        "noise_floor_rmse": round(float(0.1 / std_y), 4),
        **timings,
    }
    return result, params, model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--manifold", choices=["torus", "curve"], default="torus")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--num-modes", type=int, default=100)
    ap.add_argument("--num-test", type=int, default=2048)
    ap.add_argument("--cache-dir", default=".mgp_cache")
    ap.add_argument("--no-cache", action="store_true",
                    help="use a throwaway cache dir (forces rebuilds)")
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument("--precond-refresh", type=int, default=10)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--metrics", default=None,
                    help="JSONL per-epoch metrics path")
    ap.add_argument("--chunk-size", type=int, default=50,
                    help="epochs per lax.scan dispatch; lower for heavy "
                         "per-epoch configs on tunneled TPU runtimes (a "
                         "60s+ single dispatch is liable to be killed by "
                         "the tunnel — the 262k torus needs ~5)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache_dir = args.cache_dir
    if args.no_cache:
        import tempfile

        cache_dir = tempfile.mkdtemp(prefix="mgp_nocache_")

    result, _, _ = run_campaign(
        n=args.n,
        k=args.k,
        epochs=args.epochs,
        num_test=args.num_test,
        num_modes=args.num_modes,
        cache_dir=cache_dir,
        checkpoint_every=args.checkpoint_every,
        precond_refresh=args.precond_refresh,
        lr=args.lr,
        seed=args.seed,
        verbose=args.verbose,
        resume=not args.no_resume,
        metrics_path=args.metrics,
        manifold=args.manifold,
        chunk_size=args.chunk_size,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
