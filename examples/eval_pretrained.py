#!/usr/bin/env python3
"""Prediction-stack parity check against the reference's shipped pretrained
hyperparameters (``/root/reference/models/*.pth``, converted to
``manifold_gp_tpu/pretrained/*.npz`` by tools/convert_reference_states.py).

Builds the 1D semisupervised configuration exactly as the reference notebook
(``examples/1D_semisupervised_learning.ipynb``: graph over all 1,556 dumbbell
nodes, 10 labeled via the seed-1337 torch split, y normalized on the labeled
subset), loads the reference's trained hypers, and evaluates. Targets
(reference notebook stored outputs): IMGP RMSE 0.3881 / NLL -3.2100,
vanilla RMSE 0.9982 / NLL -3.0384.

This isolates the *prediction* stack (spectral basis, Nystrom features,
feature-space posterior, NLL metric) from training dynamics.

Usage: python examples/eval_pretrained.py [--cpu]
"""

import argparse
import pathlib
import sys

import numpy as np

_sys_path_root = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_sys_path_root))

PRETRAINED = _sys_path_root / "manifold_gp_tpu" / "pretrained"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import torch  # torch (CPU) only for the exact reference RNG split

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from manifold_gp_tpu import (
        GreaterThan,
        InferenceConfig,
        RBFKernel,
        RiemannGP,
        RiemannMaternKernel,
        VanillaGP,
    )
    from manifold_gp_tpu.utils import manifold_1D_dataset, test_model

    sampled_x, sampled_y, _ = manifold_1D_dataset()
    n = sampled_x.shape[0]
    torch.manual_seed(1337)
    train_idx = (
        torch.zeros(n).scatter_(0, torch.randperm(n)[:10], 1).bool().numpy()
    )
    train_x, train_y = sampled_x[train_idx], sampled_y[train_idx]
    test_x, test_y = sampled_x[~train_idx], sampled_y[~train_idx]
    train_y = train_y + 0.01 * torch.randn(train_y.shape[0]).numpy()
    mu_y, std_y = train_y.mean(), train_y.std(ddof=1)
    train_y = (train_y - mu_y) / std_y
    test_y = (test_y - mu_y) / std_y

    cfg = InferenceConfig(max_cholesky=2000)
    kernel = RiemannMaternKernel(
        nu=1,
        x=sampled_x,
        nearest_neighbors=10,
        laplacian_normalization="randomwalk",
        num_modes=50,
        bump_scale=10.0,
        bump_decay=1.0,
        cfg=cfg,
    )
    model = RiemannGP(
        train_x, train_y, kernel, labeled=train_idx,
        noise_constraint=GreaterThan(1e-8), cfg=cfg,
    )
    h = {k: float(v) for k, v in
         np.load(PRETRAINED / "1D_manifold_semisupervised.npz").items()}
    params = model.init_params(
        noise=h["noise"], outputscale=h["outputscale"],
        graphbandwidth=h["graphbandwidth"], lengthscale=h["lengthscale"],
        mean_constant=h["mean_constant"],
    )
    rmse, nll = test_model(model, params, test_x, test_y, noisy_test=True)
    print(f"RMSE Geometric: {rmse:.4f}   (reference 0.3881)")
    print(f"NLL Geometric (exact): {nll:.4f}   (reference -3.2100)")

    # Adjudicate the NLL-target gap: the reference's stored -3.21 was
    # computed by GPyTorch mBCG's *stochastic* inv_quad_logdet on the
    # 1546x1546 posterior covariance (test block > max_cholesky_size=800;
    # utils/test_model.py:23-24), i.e. SLQ with 10 probes / 20 Lanczos steps
    # at cg_tolerance=1e-2 — not an exact quantity. Reproduce that metric
    # over several seeds to show where its estimates land.
    samples = []
    for seed in range(8):
        _, nll_s = test_model(
            model, params, test_x, test_y, noisy_test=True,
            metric="reference", key=jax.random.PRNGKey(seed),
        )
        samples.append(nll_s)
    samples = np.asarray(samples)
    print(
        f"NLL Geometric (reference stochastic metric, 8 seeds): "
        f"{samples.mean():.4f} +/- {samples.std(ddof=1):.4f} "
        f"[min {samples.min():.4f}, max {samples.max():.4f}]"
    )

    # LOVE-mode variances (fast_pred_var analogue) at GPyTorch's default
    # max_root_decomposition_size=100: with 10 train points the Krylov space
    # is exhausted, so LOVE itself is exact here — the variance path is NOT
    # the source of the -3.04 vs -3.21 delta.
    model.eval(params, love_rank=100)
    post = model.posterior(
        params, test_x, noisy_posterior=True, is_train=False
    )
    import jax.numpy as jnp

    from manifold_gp_tpu.utils.evaluate import gaussian_nll

    err = jnp.asarray(test_y, jnp.float32) - post.mean
    nll_love = float(gaussian_nll(err, post.covar))
    print(f"NLL Geometric (LOVE rank-100 variances, exact metric): {nll_love:.4f}")

    hv = {k: float(v) for k, v in
          np.load(PRETRAINED / "1D_vanilla_semisupervised.npz").items()}
    vmodel = VanillaGP(
        train_x, train_y, RBFKernel(),
        noise_constraint=GreaterThan(1e-4), cfg=cfg,
    )
    vparams = vmodel.init_params(
        noise=hv["noise"], outputscale=hv["outputscale"],
        lengthscale=hv["lengthscale"], mean_constant=hv["mean_constant"],
    )
    vrmse, vnll = test_model(vmodel, vparams, test_x, test_y, noisy_test=True)
    print(f"RMSE Vanilla: {vrmse:.4f}   (reference 0.9982)")
    print(f"NLL Vanilla: {vnll:.4f}   (reference -3.0384)")


if __name__ == "__main__":
    main()
