#!/usr/bin/env python3
"""Diagnose the 262k campaign posterior collapse: is the LOBPCG basis
capturing the target? Projects the known ground truth onto the cached
basis, and checks the in-sample vs out-of-sample posterior separately."""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from run_large import run_campaign

    # 1-epoch campaign at the same scale: reuses the cached graph, trains
    # one epoch (hyperparameters ~ init), computes the basis at that point.
    result, params, model = run_campaign(
        n=262_144, epochs=1, cache_dir=".mgp_cache", verbose=False,
        resume=False, metrics_path=None,
        num_modes=int(sys.argv[1]) if len(sys.argv) > 1 else 50,
    )
    print("# 1-epoch result:", result, file=sys.stderr)
    kernel = model.kernel
    basis = kernel.eval_basis(params)
    eigval, eigvec = basis
    print("# eigvals[:8]:", np.asarray(eigval)[:8], file=sys.stderr)
    print("# eigvals[-4:]:", np.asarray(eigval)[-4:], file=sys.stderr)

    # ground truth on the TRAIN nodes (the campaign's construction)
    from run_large import curve_points

    n = 262_144
    rng = np.random.default_rng(0)
    x_all, t_all = curve_points(n, seed=0)
    y_true = np.sin(3 * t_all) + 0.5 * np.sin(7 * t_all)
    perm = rng.permutation(n)
    test_idx = perm[:2048]
    train_idx = np.sort(perm[2048:])
    y_noisy = (y_true + 0.1 * rng.standard_normal(n)).astype(np.float32)
    mu_y, std_y = y_noisy[train_idx].mean(), y_noisy[train_idx].std(ddof=1)
    yt = ((y_true[train_idx] - mu_y) / std_y).astype(np.float32)

    v = np.asarray(eigvec)
    # least-squares projection (eigvec columns may not be orthonormal after
    # the randomwalk recovery)
    coef, *_ = np.linalg.lstsq(v, yt, rcond=None)
    resid = float(np.sqrt(np.mean((yt - v @ coef) ** 2)))
    print(f"# basis lstsq residual: {resid:.4f} of target std {yt.std():.3f}")

    # in-sample posterior MEAN at all train nodes (direct from the eval
    # cache — the full dense covar is infeasible at 260k)
    model.eval(params)
    cache = model._cache
    z = kernel.features_train(params, basis)
    mean_in = np.asarray(
        cache["mu"] + jnp.matmul(z, cache["w"][:, None])[:, 0]
    )
    rmse_in = float(np.sqrt(np.mean((mean_in - yt) ** 2)))
    print(f"# in-sample posterior-mean RMSE vs truth: {rmse_in:.4f}")
    # out-of-sample (Nystrom) at 2048 graph nodes re-presented as new arrays
    sub = np.sort(rng.choice(train_idx.size, 2048, replace=False))
    post_oos = model.posterior(params, np.asarray(model.train_x)[sub])
    rmse_oos = float(np.sqrt(np.mean(
        (np.asarray(post_oos.mean) - yt[sub]) ** 2
    )))
    print(f"# out-of-sample (Nystrom at graph nodes) RMSE: {rmse_oos:.4f}")


if __name__ == "__main__":
    main()
