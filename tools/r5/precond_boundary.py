#!/usr/bin/env python3
"""Measured preconditioner-family boundary on randomwalk configs (round-4
VERDICT item 9): CG iteration counts to a fixed tolerance for
none / jacobi / pivchol / (supervised only) degree-conjugated deflation, on

  * a supervised randomwalk SRMNIST-shape config (n=10,010, k=50, nu=2) —
    where deflation is now REACHABLE via ops.pivchol.ConjugatedPrecond;
  * the SRMNIST-shape SEMISUPERVISED config (1,001 labeled) — where
    deflation stays excluded by design (the Schur complement's eigenvectors
    are not L's) and the row records what the available family achieves.

Prints one JSON line per row.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from manifold_gp_tpu import GreaterThan, InferenceConfig, RiemannGP, RiemannMaternKernel
    from manifold_gp_tpu.ops.cg import cg_raw

    rng = np.random.default_rng(0)
    n = 10_010
    centers = rng.standard_normal((10, 64)).astype(np.float32) * 2.0
    x = centers[rng.integers(0, 10, n)] + 0.3 * rng.standard_normal(
        (n, 64)
    ).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)

    def measure(labeled, precond_type, use_deflation=False, tol=1e-6,
                nu=2, ls=1.0, gb=0.6):
        cfg = InferenceConfig(
            max_cholesky=0, dense_operator_max_size=0,
            cg_tolerance=tol, cg_max_iter=3000,
            precond_type=precond_type,
        )
        kernel = RiemannMaternKernel(
            nu=nu, x=x, nearest_neighbors=50,
            laplacian_normalization="randomwalk", num_modes=100, cfg=cfg,
        )
        yy = y[labeled] if labeled is not None else y
        model = RiemannGP(
            x[labeled] if labeled is not None else x,
            jnp.asarray(yy), kernel, labeled=labeled,
            noise_constraint=GreaterThan(1e-8), cfg=cfg,
        )
        params = model.init_params(
            noise=1e-2, outputscale=1.0, graphbandwidth=gb, lengthscale=ls
        )
        mv = model.precision_matvec(params)
        nb = int(np.sum(labeled)) if labeled is not None else n
        b = jnp.asarray(rng.standard_normal((nb, 8)).astype(np.float32))
        if use_deflation:
            pobj = model.deflation_precond(params)
        else:
            c = kernel.coeffs(params)
            pobj = model.precision_precond_obj(
                params, coeffs=c,
                matvec=mv if precond_type == "pivchol" else None,
            )
        _, it = cg_raw(
            mv, b, tol=tol, max_iter=3000,
            precond=None if pobj is None else pobj.apply,
            with_info=True,
        )
        return int(it)

    labeled = np.zeros(n, bool)
    labeled[rng.choice(n, 1001, replace=False)] = True

    rows = []
    # Two regimes: the SRMNIST-shape trained point (mild conditioning — the
    # boundary row showing there is little to precondition there), and the
    # small-bandwidth / long-lengthscale regime where the family is
    # load-bearing (same shape bench_precond measures).
    for regime, kw in (("srmnist_shape", {}),
                       ("ill_conditioned", dict(nu=3, ls=10.0, gb=0.35))):
        for name, lab, ptype, defl in (
            ("supervised_none", None, "none", False),
            ("supervised_jacobi", None, "jacobi", False),
            ("supervised_pivchol", None, "pivchol", False),
            ("supervised_deflation_rw", None, "none", True),
            ("semisup_none", labeled, "none", False),
            ("semisup_jacobi", labeled, "jacobi", False),
            ("semisup_pivchol", labeled, "pivchol", False),
        ):
            it = measure(lab, ptype, use_deflation=defl, **kw)
            rows.append(
                {"regime": regime, "config": name, "cg_iters_to_1e-6": it}
            )
            print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
