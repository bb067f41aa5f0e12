"""Vanilla (Euclidean) exact GP baseline.

Equivalent of the reference ``VanillaGP`` (``manifold_gp/models/vanilla_gp.py:7-36``)
with GPyTorch's ScaleKernel + GaussianLikelihood folded in: constant mean,
outputscale, noise, dense-Cholesky exact marginal likelihood and posterior.
The default noise constraint mirrors GPyTorch's GaussianLikelihood default
(GreaterThan(1e-4)).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, InferenceConfig
from ..parameters import ConstrainedParam, GreaterThan, Positive
from .riemann_gp import Posterior

_HIGHEST = jax.lax.Precision.HIGHEST


class VanillaGP:
    def __init__(
        self,
        train_x,
        train_y,
        kernel,
        noise_constraint=None,
        cfg: InferenceConfig = DEFAULT_CONFIG,
    ):
        self.train_x = jnp.asarray(train_x, jnp.float32)
        self.train_y = jnp.asarray(train_y, jnp.float32)
        self.kernel = kernel
        self.cfg = cfg
        self._noise_decl = ConstrainedParam(
            "noise",
            noise_constraint if noise_constraint is not None else GreaterThan(1e-4),
        )
        self._outputscale_decl = ConstrainedParam("outputscale", Positive())

    def init_params(
        self,
        noise: float = None,
        outputscale: float = None,
        lengthscale: float = None,
        mean_constant: float = 0.0,
    ) -> dict:
        params = self.kernel.init_params(lengthscale=lengthscale)
        params["raw_noise"] = self._noise_decl.init_raw(noise)
        params["raw_outputscale"] = self._outputscale_decl.init_raw(outputscale)
        params["mean_constant"] = jnp.asarray(mean_constant, jnp.float32)
        return params

    def noise(self, params):
        return self._noise_decl.value(params)

    def outputscale(self, params):
        return self._outputscale_decl.value(params)

    @property
    def num_data(self) -> int:
        return int(self.train_y.shape[0])

    def _train_covar(self, params):
        s = jnp.reshape(self.outputscale(params), ())
        k = s * self.kernel.gram(params, self.train_x)
        return k + jnp.reshape(self.noise(params), ()) * jnp.eye(
            k.shape[0], dtype=k.dtype
        )

    def _covar_matvec_and_diag(self, params):
        """(matvec, diag) of K + sigma^2 I for the iterative regime: a dense
        one-time gram up to cfg.dense_gram_max_size, the tiled on-the-fly
        gram_matvec above it (O(block * n) memory — the regime where the
        [n, n] gram no longer fits)."""
        n = self.num_data
        s = jnp.reshape(self.outputscale(params), ())
        sigma2 = jnp.reshape(self.noise(params), ())
        if n <= self.cfg.dense_gram_max_size:
            kmat = self._train_covar(params)

            def mv(v):
                return jnp.matmul(kmat, v, precision=_HIGHEST)

            return mv, jnp.diagonal(kmat)

        def mv(v):
            return (
                s * self.kernel.gram_matvec(params, self.train_x, v)
                + sigma2 * v
            )

        # stationary kernels: k(0) = 1, so diag(K + sigma^2 I) = s + sigma^2
        return mv, jnp.full((n,), 1.0, jnp.float32) * s + sigma2

    def mll_loss(self, params, key=None):
        """Negative exact marginal log likelihood / n (the quantity
        ``vanilla_train`` minimizes via gpytorch's ExactMarginalLogLikelihood,
        reference ``utils/train_model.py:13-22``).

        Two regimes, exactly like gpytorch: dense Cholesky up to
        ``cfg.max_cholesky``; above it, BBMM — CG for the quad term and the
        mBCG preconditioned Lanczos quadrature for the logdet, both under the
        rank-r pivoted-Cholesky preconditioner of the AddedDiag covariance
        (K = s·ZZ-ish gram + sigma^2 I is pivchol's native territory: the
        top spectrum is low-rank, so r=15 deflates it; see
        tests/test_mbcg.py::test_pivchol_precond_on_covariance_operator).
        """
        n = self.num_data
        resid = self.train_y - params["mean_constant"]
        if n <= self.cfg.max_cholesky:
            kmat = self._train_covar(params)
            chol = jnp.linalg.cholesky(kmat)
            alpha = jax.scipy.linalg.cho_solve((chol, True), resid[:, None])[:, 0]
            quad = jnp.dot(resid, alpha, precision=_HIGHEST)
            ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        else:
            assert key is not None, "stochastic logdet needs a PRNG key"
            from ..ops.cg import cg_solve
            from ..ops.pivchol import make_pivchol_precond
            from ..ops.slq import slq_logdet_mbcg

            mv, d0 = self._covar_matvec_and_diag(params)
            pobj = make_pivchol_precond(mv, d0, self.cfg.precond_rank)
            # 2-D RHS: cg_solve's closure_convert specializes the matvec /
            # preconditioner to the RHS aval, and CG runs on [n, B] columns.
            alpha = cg_solve(
                mv, resid[:, None], tol=self.cfg.cg_tolerance,
                max_iter=self.cfg.cg_max_iter, precond=pobj.apply,
            )[:, 0]
            quad = jnp.dot(resid, alpha, precision=_HIGHEST)
            ld = slq_logdet_mbcg(
                mv, pobj, key, self.cfg.num_probes, self.cfg.lanczos_max_iter,
                cg_tol=self.cfg.cg_tolerance, cg_max_iter=self.cfg.cg_max_iter,
            )
        return 0.5 * (quad + ld + n * jnp.log(2.0 * jnp.pi)) / n

    def eval(self, params, love_rank: int = 100, love_key=None):
        """Precompute the posterior cache. Two regimes, like the mll:

          * n <= cfg.max_cholesky — dense Cholesky (exact, as before);
          * n > cfg.max_cholesky — the BBMM prediction regime the reference
            evaluates its vanilla baselines under
            (``utils/test_model.py:11``: gpytorch's exact prediction
            strategy + ``fast_pred_var``): the mean cache alpha =
            (K + sigma^2 I)^{-1} (y - mu) from preconditioned CG (rank-r
            pivoted-Cholesky preconditioner, GPyTorch's AddedDiag default),
            and predictive variances through a rank-``love_rank`` LOVE /
            Lanczos root of the train covariance instead of a dense
            factorization. ``love_rank >= n`` exhausts the Krylov space and
            reproduces the exact variances (GPyTorch's
            max_root_decomposition_size semantics; its fast_pred_var default
            is 100).
        """
        n = self.num_data
        resid = self.train_y - params["mean_constant"]
        if n <= self.cfg.max_cholesky:
            kmat = self._train_covar(params)
            chol = jnp.linalg.cholesky(kmat)
            alpha = jax.scipy.linalg.cho_solve((chol, True), resid[:, None])[:, 0]
            self._cache = dict(chol=chol, alpha=alpha)
            return self
        from ..ops.cg import cg_solve
        from ..ops.eigen import lanczos_eigh
        from ..ops.pivchol import make_pivchol_precond

        mv, d0 = self._covar_matvec_and_diag(params)
        pobj = make_pivchol_precond(mv, d0, self.cfg.precond_rank)
        alpha = cg_solve(
            mv, resid[:, None], tol=self.cfg.cg_tolerance,
            max_iter=self.cfg.cg_max_iter, precond=pobj.apply,
        )[:, 0]
        rank = int(min(love_rank, n))
        if love_key is None:
            love_key = jax.random.PRNGKey(0)
        v0 = jax.random.normal(love_key, (n,), jnp.float32)
        lam, vecs = lanczos_eigh(mv, v0, rank, rank)
        # Post-Krylov-breakdown Ritz pairs come back as +inf values with NaN
        # vectors (see RiemannGP.eval's LOVE path) — zero-weight them.
        finite = jnp.isfinite(lam)
        inv_lam = jnp.where(finite, 1.0 / jnp.where(finite, lam, 1.0), 0.0)
        vecs = jnp.where(finite[None, :], jnp.nan_to_num(vecs), 0.0)
        self._cache = dict(alpha=alpha, love=(inv_lam, vecs))
        return self

    def posterior(self, params, x, noisy_posterior: bool = False) -> Posterior:
        x = jnp.asarray(x, jnp.float32)
        cache = self._cache
        s = jnp.reshape(self.outputscale(params), ())
        k_star = s * self.kernel.gram(params, self.train_x, x)  # [n_train, n*]
        mean = params["mean_constant"] + jnp.matmul(
            k_star.T, cache["alpha"][:, None], precision=_HIGHEST
        )[:, 0]
        k_ss = s * self.kernel.gram(params, x)
        if "love" in cache:
            # LOVE covariance: K** - K*t (V diag(1/lam) V') Kt* on the
            # rank-r Lanczos Ritz pairs of the train covariance.
            inv_lam, vecs = cache["love"]
            wv = jnp.matmul(k_star.T, vecs, precision=_HIGHEST)
            covar = k_ss - jnp.matmul(
                wv * inv_lam[None, :], wv.T, precision=_HIGHEST
            )
        else:
            v = jax.scipy.linalg.solve_triangular(
                cache["chol"], k_star, lower=True
            )
            covar = k_ss - jnp.matmul(v.T, v, precision=_HIGHEST)
        if noisy_posterior:
            covar = covar + jnp.reshape(self.noise(params), ()) * jnp.eye(
                covar.shape[0], dtype=covar.dtype
            )
        stddev = jnp.sqrt(jnp.maximum(jnp.diagonal(covar), 0.0))
        return Posterior(mean=mean, covar=covar, stddev=stddev)
