#!/usr/bin/env python3
"""Basis-quality probe at 262k: target-projection residual vs Chebyshev
filter strength and bandwidth (no training — graph from cache)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from run_large import curve_points

    from manifold_gp_tpu import InferenceConfig, RiemannMaternKernel
    from manifold_gp_tpu.ops.graph import build_graph
    from manifold_gp_tpu.utils.cache import cached_graph

    n = 262_144
    rng = np.random.default_rng(0)
    x_all, t_all = curve_points(n, seed=0)
    y_true = np.sin(3 * t_all) + 0.5 * np.sin(7 * t_all)
    perm = rng.permutation(n)
    train_idx = np.sort(perm[2048:])
    train_x = x_all[train_idx]
    n_tr = train_x.shape[0]
    nlist = 2 ** int(round(np.log2(4.0 * np.sqrt(n_tr))))
    graph, hit = cached_graph(
        train_x, 16, ".mgp_cache",
        knn_backend=f"ivf-nlist{nlist}-nprobe16-it5",
        builder=lambda: build_graph(train_x, 16, knn_backend="ivf",
                                    ivf_nlist=nlist, ivf_nprobe=16,
                                    ivf_kmeans_iters=5),
    )
    print(f"# graph hit={hit}", file=sys.stderr)
    import dataclasses as dc

    eps = 2.0 * float(np.sqrt(np.median(np.asarray(graph.sqdist))))
    graph = dc.replace(graph, sqdist=graph.sqdist / np.float32(eps) ** 2)
    x_s = train_x / eps
    yt = y_true[train_idx]
    yt = (yt - yt.mean()) / yt.std()

    for gb in (1.0, 0.2325):
        for deg, iters in ((256, 6), (384, 8), (512, 10)):
            cfg = InferenceConfig(
                max_cholesky=0, dense_operator_max_size=0,
                eigensolver="chebyshev", cheb_degree=deg, cheb_iters=iters,
            )
            kernel = RiemannMaternKernel(
                nu=2, x=x_s, nearest_neighbors=16,
                laplacian_normalization="randomwalk", num_modes=50,
                cfg=cfg, graph=graph,
            )
            p = kernel.init_params(graphbandwidth=gb, lengthscale=1.0)
            t0 = time.perf_counter()
            eigval, eigvec = kernel.eval_basis(p)
            dt = time.perf_counter() - t0
            v = np.asarray(eigvec)
            coef, *_ = np.linalg.lstsq(v, yt, rcond=None)
            resid = float(np.sqrt(np.mean((yt - v @ coef) ** 2)))
            print(f"gb={gb} deg={deg} iters={iters}: resid={resid:.4f} "
                  f"({dt:.1f}s) eigval[1]={float(eigval[1]):.3e} "
                  f"eigval[-1]={float(eigval[-1]):.3e}", flush=True)


if __name__ == "__main__":
    main()
