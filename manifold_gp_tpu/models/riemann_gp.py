"""Implicit-manifold GP regression model (IMGP).

TPU-native equivalent of the reference ``RiemannGP``
(``manifold_gp/models/riemann_gp.py:11-75``): constant mean + Riemann kernel,
optional semisupervised labeled mask, precision-operator composition for
training and a low-rank spectral posterior for prediction.

Design notes:
  * All learnable state is a flat params dict; every numerical method is a
    pure function of (params, ...) suitable for jit/grad.
  * ``precision_matvec`` composes Schur (semisup) -> Scale -> Noise exactly
    like ``RiemannGP.precision`` (reference :32-39), including the
    inverse_scale asymmetry documented in ops.matern.
  * Prediction uses the exact feature-space (Woodbury) posterior: with
    K = s Z Z' + sigma^2 I and C = (sigma^2/s) I_m + Z'Z,
        mean_* = mu + Z_* C^{-1} Z'(y - mu)
        cov_** = sigma^2 Z_* C^{-1} Z_*'  (+ sigma^2 I when noisy)
    — algebraically identical to the reference's GPyTorch exact-GP strategy
    on its LowRankRoot covariance, but exact where LOVE approximates, and
    only m x m dense work (m = num_modes).
  * The hybrid geometric/vanilla blend reproduces reference :45-75:
    base_scale = 1 - bump(dist to nearest train point); means add,
    covariances add outer(base_scale)-weighted, stddevs add scaled.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, InferenceConfig
from ..parameters import ConstrainedParam, GreaterThan, Positive
from ..ops import engine
from ..ops.bump import bump_function
from ..ops.matern import (
    labeled_split,
    make_jacobi_precond,
    make_noisy_matvec,
    make_scaled_matvec,
    make_schur_matvec,
    noisy_scaled_diag,
)

_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass
class Posterior:
    """Evaluated posterior at a set of query points."""

    mean: jnp.ndarray  # [n]
    covar: jnp.ndarray  # [n, n]
    stddev: jnp.ndarray  # [n] (reference's additive hybrid stddev semantics)


class RiemannGP:
    def __init__(
        self,
        train_x,
        train_y,
        kernel,
        labeled: Optional[np.ndarray] = None,
        noise_constraint=None,
        use_outputscale: bool = True,
        cfg: InferenceConfig = DEFAULT_CONFIG,
    ):
        self.train_x = jnp.asarray(train_x, jnp.float32)
        self.train_y = jnp.asarray(train_y, jnp.float32)
        self.kernel = kernel
        self.cfg = cfg
        self.use_outputscale = use_outputscale
        self.labeled = None if labeled is None else np.asarray(labeled, bool)
        if self.labeled is not None:
            self._labeled_idx, self._unlabeled_idx = labeled_split(self.labeled)
        self._noise_decl = ConstrainedParam(
            "noise",
            noise_constraint if noise_constraint is not None else GreaterThan(1e-8),
        )
        self._outputscale_decl = ConstrainedParam("outputscale", Positive())
        # Does train_x coincide with the kernel's graph nodes? Governs the
        # in-sample vs Nystrom feature path, like the reference's
        # torch.equal(x, knn.x) check. One host-side compare at construction
        # (never per prediction call).
        self.train_is_graph = self.train_x.shape == kernel.x.shape and bool(
            np.array_equal(np.asarray(self.train_x), np.asarray(kernel.x))
        )
        # Mesh kernels: the training loss runs in the padded row-sharded
        # vector space (kernel.n_padded rows, zero padding; RCM-permuted on
        # the fused path — kernel.mesh_rows_np maps node id -> row).
        # Precompute the static embeddings: y at its support rows, 0/1
        # labeled/unlabeled masks.
        self.mesh = getattr(kernel, "mesh", None)
        if self.mesh is not None:
            npad = kernel.n_padded
            n_nodes = kernel.graph.num_nodes
            rows_of = kernel.mesh_rows_np
            support = (
                np.flatnonzero(self.labeled)
                if self.labeled is not None
                else np.arange(n_nodes)
            )
            self._support_pad = jnp.asarray(rows_of[support], jnp.int32)
            y_pad = np.zeros(npad, np.float32)
            y_pad[rows_of[support]] = np.asarray(self.train_y)
            mask_l = np.zeros(npad, np.float32)
            mask_l[rows_of[support]] = 1.0
            mask_u = np.zeros(npad, np.float32)
            if self.labeled is not None:
                mask_u[rows_of[np.flatnonzero(~self.labeled)]] = 1.0
            from ..parallel.spmv import pad_nodes

            self._y_pad = pad_nodes(y_pad, npad, self.mesh)
            self._mask_l = pad_nodes(mask_l, npad, self.mesh)
            self._mask_u = pad_nodes(mask_u, npad, self.mesh)

    # -- parameters --------------------------------------------------------
    def init_params(
        self,
        noise: float = None,
        outputscale: float = None,
        graphbandwidth: float = None,
        lengthscale: float = None,
        mean_constant: float = 0.0,
    ) -> dict:
        params = self.kernel.init_params(
            graphbandwidth=graphbandwidth, lengthscale=lengthscale
        )
        params["raw_noise"] = self._noise_decl.init_raw(noise)
        if self.use_outputscale:
            params["raw_outputscale"] = self._outputscale_decl.init_raw(outputscale)
        params["mean_constant"] = jnp.asarray(mean_constant, jnp.float32)
        return params

    def noise(self, params):
        return self._noise_decl.value(params)

    def outputscale(self, params):
        return self._outputscale_decl.value(params)

    def set_outputscale(self, params: dict, value) -> dict:
        out = dict(params)
        out["raw_outputscale"] = self._outputscale_decl.constraint.inverse_transform(
            jnp.asarray(value, jnp.float32)
        )
        return out

    @property
    def num_data(self) -> int:
        return int(self.train_y.shape[0])

    # -- precision operator stack -----------------------------------------
    def precision_matvec(self, params, noise: bool = True, coeffs=None):
        """Compose Schur (if semisup) -> Scale -> Noise, reference :32-39.

        On the block-sparse path (supervised, large N) the whole composition
        runs in padded-RCM space: the scalar Scale/Noise wrappers commute
        with the permutation, so one permute_in/out pair at the boundary
        replaces per-Laplacian-matvec row gathers (a noisy nu=2 apply does
        6 of them)."""
        if self.mesh is not None:
            return self._precision_matvec_sharded(params, noise=noise, coeffs=coeffs)
        permuted = self.labeled is None and self.kernel.block_layout is not None
        mv = self.kernel.precision_matvec(params, coeffs=coeffs, permuted_io=permuted)
        if self.labeled is not None:
            mv = make_schur_matvec(
                mv,
                self._labeled_idx,
                self._unlabeled_idx,
                self.kernel.graph.num_nodes,
                cg_tol=self.cfg.cg_tolerance,
                cg_max_iter=self.cfg.cg_max_iter,
                precond_diag=(
                    self.kernel.precision_diag(params, coeffs=coeffs)
                    if self.cfg.cg_precondition
                    else None
                ),
            )
        if self.use_outputscale:
            mv = make_scaled_matvec(mv, self.outputscale(params))
        if noise:
            mv = make_noisy_matvec(mv, self.noise(params))
        if permuted:
            from ..ops.sparse_formats import permute_in, permute_out

            layout = self.kernel.block_layout
            inner = mv

            def mv(v):
                squeeze = v.ndim == 1
                vv = v[:, None] if squeeze else v
                out = permute_out(layout, inner(permute_in(layout, vv)))
                return out[:, 0] if squeeze else out

        return mv

    def _precision_matvec_sharded(self, params, noise: bool = True, coeffs=None):
        """Row-sharded composition over padded [Np, B] vectors: the kernel's
        shard_map Matérn matvec -> masked Schur (semisup) -> Scale -> Noise.
        The scalar wrappers are elementwise so the whole stack stays sharded;
        the result equals the single-device ``precision_matvec`` embedded at
        the support rows."""
        from ..ops.matern import make_schur_matvec_masked

        mv = self.kernel.precision_matvec(params, coeffs=coeffs)
        if self.labeled is not None:
            pd = None
            if self.cfg.cg_precondition:
                pd = self._padded_precision_diag(params, coeffs=coeffs)
            mv = make_schur_matvec_masked(
                mv,
                self._mask_l,
                self._mask_u,
                cg_tol=self.cfg.cg_tolerance,
                cg_max_iter=self.cfg.cg_max_iter,
                precond_diag=pd,
            )
        if self.use_outputscale:
            mv = make_scaled_matvec(mv, self.outputscale(params))
        if noise:
            mv = make_noisy_matvec(mv, self.noise(params))
        return mv

    def _padded_precision_diag(self, params, coeffs=None):
        """diag(Q) embedded in the padded row-sharded space (1.0 padding so
        Jacobi division is a no-op off the true rows)."""
        d = self.kernel.precision_diag(params, coeffs=coeffs)
        return self.kernel.embed_mesh_coeff(d, fill=1.0)

    def _precond_obj_sharded(self, params, matvec=None):
        """Masked preconditioner OBJECT for the padded composed operator, per
        cfg.precond_type — the mesh counterpart of ``precision_precond_obj``:

          * "jacobi": MaskedDiagPrecond on the padded noisy-scaled diagonal;
          * "pivchol": rank-r MaskedLowRankDiagPrecond built from the padded
            composed matvec itself (support-restricted pivoting).

        None when cfg.cg_precondition is off or precond_type == "none".
        """
        cfg = self.cfg
        if not cfg.cg_precondition or cfg.precond_type == "none":
            return None
        from ..ops.pivchol import MaskedDiagPrecond, make_pivchol_precond_masked

        mask = self._mask_l
        d_noisy = noisy_scaled_diag(
            self._padded_precision_diag(params),
            scale=self.outputscale(params) if self.use_outputscale else None,
            noise=self.noise(params),
        )
        d_noisy = jnp.where(mask > 0, d_noisy, 1.0)
        if cfg.precond_type == "pivchol" and matvec is not None:
            return make_pivchol_precond_masked(
                matvec, d_noisy, mask, cfg.precond_rank
            )
        return MaskedDiagPrecond(d=d_noisy, mask=mask)

    def _mll_loss_sharded(self, params, key=None, precond_override=None):
        """Precision-form MLL on the row-sharded mesh path. Identical math to
        ``mll_loss`` (same probes for the same key), evaluated on padded
        vectors: quad via the embedded y, logdet via dense Cholesky of the
        support block (small n) or SLQ with support-embedded probes and the
        true trace dimension (ops/slq.py num_nodes). ``precond_override``
        takes a masked preconditioner object (ops.pivchol Masked*) and
        replaces the config-selected one, exactly as on the single-device
        path."""
        from ..ops.slq import rademacher_probes, slq_logdet

        n = self.num_data
        cfg = self.cfg
        mv = self._precision_matvec_sharded(params, noise=True)
        y_pad = self._y_pad
        quad = jnp.sum(y_pad * mv(y_pad[:, None])[:, 0])
        support = self._support_pad
        if n <= cfg.max_cholesky:
            npad = self.kernel.n_padded
            # Densify the support block in column chunks: a single embedded
            # [npad, n] identity is 3.2 GB at npad=1M / n=800, while chunks
            # are sequenced by lax.map so only one [npad, 128] one-hot batch
            # is live at a time. Single batch when it is small anyway.
            chunk = 128
            if npad * n * 4 <= 2**28 or n <= chunk:
                eye_emb = (
                    jnp.zeros((npad, n), jnp.float32)
                    .at[support, jnp.arange(n)]
                    .set(1.0)
                )
                dense = mv(eye_emb)[support]
            else:
                nch = -(-n // chunk)
                pad = nch * chunk - n
                rows = jnp.concatenate(
                    [support, jnp.zeros((pad,), support.dtype)]
                ).reshape(nch, chunk)
                valid = jnp.concatenate(
                    [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
                ).reshape(nch, chunk)

                def one_chunk(args):
                    r, w = args
                    rhs = (
                        jnp.zeros((npad, chunk), jnp.float32)
                        .at[r, jnp.arange(chunk)]
                        .set(w)
                    )
                    return mv(rhs)[support]

                cols = jax.lax.map(one_chunk, (rows, valid))  # [nch, n, chunk]
                dense = jnp.moveaxis(cols, 0, 1).reshape(n, nch * chunk)[:, :n]
            ld = 2.0 * jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(dense))))
        else:
            assert key is not None, "stochastic logdet needs a PRNG key"
            npad = self.kernel.n_padded
            pobj = (
                precond_override
                if precond_override is not None
                else self._precond_obj_sharded(params, matvec=mv)
            )
            if cfg.slq_precond_quadrature and pobj is not None:
                # mesh mBCG: support-masked probes from M, PCG quadrature +
                # masked logdet(M) correction (ops/pivchol Masked* family)
                from ..ops.slq import slq_logdet_mbcg

                ld = slq_logdet_mbcg(
                    mv,
                    pobj,
                    key,
                    cfg.num_probes,
                    cfg.lanczos_max_iter,
                    cg_tol=cfg.cg_tolerance,
                    cg_max_iter=cfg.cg_max_iter,
                )
            else:
                z = rademacher_probes(key, n, cfg.num_probes)
                probes = (
                    jnp.zeros((npad, cfg.num_probes), jnp.float32)
                    .at[support]
                    .set(z)
                )
                ld = slq_logdet(
                    mv,
                    probes,
                    num_steps=cfg.lanczos_max_iter,
                    cg_tol=cfg.cg_tolerance,
                    cg_max_iter=cfg.cg_max_iter,
                    precond=None if pobj is None else pobj.apply,
                    num_nodes=n,
                )
        loss = 0.5 * (quad - ld + n * jnp.log(2.0 * jnp.pi))
        for _, prior, value_fn in self.kernel.priors():
            loss = loss - jnp.sum(prior.log_prob(value_fn(params)))
        return loss / n

    def precision_precond_obj(
        self, params, noise: bool = True, coeffs=None, matvec=None
    ):
        """Preconditioner OBJECT (ops.pivchol protocol: apply / sample /
        logdet) for the composed precision operator, per cfg.precond_type:

          * "jacobi": diag(Q) pushed through the Scale/Noise wrappers
            ((approximate) Schur: labeled-block restriction);
          * "pivchol": rank-r partial pivoted Cholesky of the composed
            operator itself (requires ``matvec``), residual-diagonal form —
            GPyTorch's AddedDiag preconditioner semantics.

        None when cfg.cg_precondition is off or precond_type == "none".
        """
        cfg = self.cfg
        if not cfg.cg_precondition or cfg.precond_type == "none":
            return None
        from ..ops.pivchol import DiagPrecond, make_pivchol_precond

        d = self.kernel.precision_diag(params, coeffs=coeffs)
        if self.labeled is not None:
            d = d[jnp.asarray(self._labeled_idx)]
        d = noisy_scaled_diag(
            d,
            scale=self.outputscale(params) if self.use_outputscale else None,
            noise=self.noise(params) if noise else None,
        )
        if cfg.precond_type == "pivchol" and matvec is not None:
            return make_pivchol_precond(matvec, d, cfg.precond_rank)
        return DiagPrecond(d=d)

    def precision_precond(self, params, noise: bool = True, coeffs=None,
                          matvec=None):
        """M^{-1} apply-closure view of ``precision_precond_obj`` (the CG
        hook). None when preconditioning is off."""
        obj = self.precision_precond_obj(
            params, noise=noise, coeffs=coeffs, matvec=matvec
        )
        return None if obj is None else obj.apply

    def build_precond(self, params):
        """Freshly built config-selected preconditioner OBJECT for the
        composed noisy precision (mesh or single-device form) — the
        cacheable unit for ``precond_refresh`` training
        (utils.train.manifold_informed_train): pivchol construction costs
        ``precond_rank`` sequential full-operator matvecs (~15 HBM panel
        sweeps at 1M nodes), and since the object is stop_gradient-ed,
        rebuilding it every k epochs instead of every loss eval changes only
        iteration counts / estimator concentration, never gradients."""
        if self.mesh is not None:
            mv = self._precision_matvec_sharded(params, noise=True)
            return self._precond_obj_sharded(params, matvec=mv)
        c = self.kernel.coeffs(params)
        mv = self.precision_matvec(params, noise=True, coeffs=c)
        return self.precision_precond_obj(params, noise=True, coeffs=c, matvec=mv)

    def deflation_precond(self, params, basis=None):
        """Spectral-deflation preconditioner for the composed noisy-scaled
        precision operator, built from the kernel's spectral basis (the
        sharded LOBPCG one on mesh kernels — already maintained for eval).
        Pass the result as ``precond_override`` to :meth:`mll_loss`.

        Supervised only (the Schur complement's eigenvectors are not L's).
        Symmetric normalization: the symmetric-Laplacian eigenvectors are
        orthonormal and are eigenvectors of the whole composed stack (a
        polynomial in L), with eigenvalues
        noise(scale * (2 nu / l^2 + lambda)^nu) — EXACT deflation.
        Randomwalk (round-4 VERDICT item 9): the telescoped stack is
        Q_rw = D^{1/2} (shift I + L_sym)^nu D^{1/2}, so the symmetric
        deflation extends by degree conjugation (ops.pivchol
        ConjugatedPrecond) — APPROXIMATE for the noisy composition (the
        Neumann terms interleave with D; the noise eigenvalue uses
        sigma^2 * mean(deg) as the effective scale), measured in
        tests/test_precondition.py to still cut CG iterations vs Jacobi.
        The bulk scale tau is the composed value at the geometric mean of
        the undeflated spectrum window [lambda_m, Gershgorin bound].
        """
        assert self.labeled is None, "deflation needs the unmarginalized stack"
        randomwalk = self.kernel.laplacian_normalization == "randomwalk"
        from ..ops.laplacian import gershgorin_bound
        from ..ops.pivchol import ConjugatedPrecond, make_deflation_precond

        if basis is None:
            basis = self.kernel.eval_basis(params)
        eigval, eigvec = basis
        c = self.kernel.coeffs(params)
        # Undo eval_basis's unconditional D^{-1/2} recovery + renormalize:
        # restores the orthonormal symmetric eigenvectors exactly (the
        # post-processing is an entrywise scale + column scale,
        # kernels/riemann.py _eval_basis_jit tail).
        v = eigvec * jnp.sqrt(c.deg)[:, None]
        v = v / jnp.linalg.norm(v, axis=0, keepdims=True)

        nu = self.kernel.nu
        ls2 = jnp.square(jnp.reshape(self.kernel.lengthscale(params), ()))
        s2 = jnp.reshape(self.noise(params), ())
        if randomwalk:
            # noise terms see Q_rw ~ deg * Q_sym in scale: fold the mean
            # degree into the effective noise for the conjugated core
            s2 = s2 * jnp.mean(c.deg)

        def composed_eig(lam):
            q = jnp.power(2.0 * nu / ls2 + lam, float(nu))
            if self.use_outputscale:
                q = q * jnp.reshape(self.outputscale(params), ())
            return q * (1.0 - s2 * q * (1.0 - s2 * q))

        q = composed_eig(eigval)
        q = jnp.maximum(q, 1e-12 * jnp.max(q))
        lam_hi = gershgorin_bound(self.kernel.graph, c)
        lam_mid = jnp.sqrt(jnp.maximum(eigval[-1], 1e-12) * lam_hi)
        tau = jnp.maximum(composed_eig(lam_mid), 1e-12 * jnp.max(q))
        if self.mesh is None:
            core = make_deflation_precond(v, q, tau)
            if randomwalk:
                dsq = jnp.sqrt(jax.lax.stop_gradient(c.deg))
                return ConjugatedPrecond(d=dsq, inner=core)
            return core
        rows = self.kernel.mesh_rows
        v_pad = (
            jnp.zeros((self.kernel.n_padded, v.shape[1]), jnp.float32)
            .at[rows]
            .set(v)
        )
        core = make_deflation_precond(v_pad, q, tau, mask=self._mask_l)
        if randomwalk:
            dsq_pad = self.kernel.embed_mesh_coeff(
                jnp.sqrt(jax.lax.stop_gradient(c.deg)), fill=1.0
            )
            return ConjugatedPrecond(d=dsq_pad, inner=core)
        return core

    # -- training loss -----------------------------------------------------
    def mll_loss(self, params, key=None, precond_override=None):
        """Precision-form negative log marginal likelihood
        (reference ``utils/train_model.py:66-76``):
            0.5 [ y' Q y - logdet Q + n log 2pi ] - sum log p(priors), all / n.
        Exact (dense Cholesky) when n <= cfg.max_cholesky, else SLQ (with
        preconditioned gradient solves when cfg.cg_precondition, and the
        full mBCG preconditioned quadrature when
        cfg.slq_precond_quadrature).

        ``precond_override``: an ops.pivchol preconditioner object to use in
        place of the config-selected one — e.g. a DeflationPrecond built
        once from the spectral basis for small-bandwidth/nu=3 runs where
        diagonal preconditioners are inert. On mesh models pass the masked
        form (Masked* classes, padded row space) — see
        ``deflation_precond`` for the basis-built one on either path.
        """
        if self.mesh is not None:
            return self._mll_loss_sharded(
                params, key=key, precond_override=precond_override
            )
        n = self.num_data
        y = self.train_y
        # One coefficient computation shared by the operator and the
        # preconditioner (XLA would CSE the duplicates under jit, but eager
        # callers should not pay the scatter pipeline twice).
        c = self.kernel.coeffs(params)
        mv = self.precision_matvec(params, noise=True, coeffs=c)
        quad = jnp.dot(y, mv(y[:, None])[:, 0], precision=_HIGHEST)
        pobj = (
            precond_override
            if precond_override is not None
            else self.precision_precond_obj(
                params, noise=True, coeffs=c, matvec=mv
            )
        )
        if (
            self.cfg.slq_precond_quadrature
            and pobj is not None
            and n > self.cfg.max_cholesky
        ):
            # Full mBCG semantics: probes from M, PCG-coefficient quadrature
            # on M^{-1/2} Q M^{-1/2}, + logdet(M) correction (ops/slq.py).
            assert key is not None, "stochastic logdet needs a PRNG key"
            from ..ops.slq import slq_logdet_mbcg

            ld = slq_logdet_mbcg(
                mv,
                pobj,
                key,
                self.cfg.num_probes,
                self.cfg.lanczos_max_iter,
                cg_tol=self.cfg.cg_tolerance,
                cg_max_iter=self.cfg.cg_max_iter,
            )
        else:
            ld = engine.logdet(
                mv, n, self.cfg, key=key,
                precond=None if pobj is None else pobj.apply,
            )
        loss = 0.5 * (quad - ld + n * jnp.log(2.0 * jnp.pi))
        for _, prior, value_fn in self.kernel.priors():
            loss = loss - jnp.sum(prior.log_prob(value_fn(params)))
        return loss / n

    def average_variance(self, params, num_rand_vec: int = 100, key=None):
        """Mean diagonal of the *unscaled* kernel-precision inverse
        (reference ``train_model.py:53-55``: uses base_kernel.precision())."""
        mv = self.kernel.precision_matvec(params)
        nn = self.kernel.graph.num_nodes
        if self.mesh is not None:
            from ..ops.cg import cg_solve

            cfg = self.cfg
            npad = self.kernel.n_padded
            if num_rand_vec >= nn:
                idx, denom = jnp.arange(nn), nn
            else:
                assert key is not None
                idx = jax.random.randint(key, (num_rand_vec,), 0, nn)
                denom = num_rand_vec
            rows = self.kernel.mesh_rows[idx]  # node id -> padded row
            rhs = (
                jnp.zeros((npad, idx.shape[0]), jnp.float32)
                .at[rows, jnp.arange(idx.shape[0])]
                .set(1.0)
            )
            precond = (
                make_jacobi_precond(self._padded_precision_diag(params))
                if cfg.cg_precondition
                else None
            )
            x = cg_solve(
                mv, rhs, tol=cfg.cg_tolerance, max_iter=cfg.cg_max_iter,
                precond=precond,
            )
            return jnp.sum(rhs * x) / denom
        precond = (
            make_jacobi_precond(self.kernel.precision_diag(params))
            if self.cfg.cg_precondition
            else None
        )
        return engine.average_variance(
            mv, nn, num_rand_vec, self.cfg, key=key, precond=precond
        )

    # -- prediction --------------------------------------------------------
    def eval(self, params, love_rank: Optional[int] = None, love_key=None):
        """Precompute the spectral basis + feature-space posterior cache.

        ``love_rank``: opt-in LOVE-mode predictive variances — the analogue
        of GPyTorch ``fast_pred_var`` (reference eval context,
        ``utils/test_model.py:11``): a rank-r Lanczos root-inverse of the
        train covariance K = s Z Z' + sigma^2 I replaces the exact Woodbury
        cache in the predictive *covariance* (the predictive mean stays
        exact, as in GPyTorch, whose mean cache is a CG solve). With
        love_rank >= n_train the Krylov space is exhausted and LOVE
        reproduces the exact variances; smaller ranks reproduce LOVE's
        approximation error.
        """
        basis = self.kernel.eval_basis(params)
        if self.train_is_graph:
            z = self.kernel.features_train(params, basis)
        else:
            z = self.kernel.features_test(params, basis, self.train_x)
        s = jnp.reshape(self.outputscale(params), ()) if self.use_outputscale else jnp.float32(1.0)
        sigma2 = jnp.reshape(self.noise(params), ())
        mu = params["mean_constant"]
        g = jnp.matmul(z.T, z, precision=_HIGHEST)
        m = g.shape[0]
        c = (sigma2 / s) * jnp.eye(m, dtype=g.dtype) + g
        chol_c = jnp.linalg.cholesky(c)
        resid = self.train_y - mu
        u = jnp.matmul(z.T, resid[:, None], precision=_HIGHEST)
        w = jax.scipy.linalg.cho_solve((chol_c, True), u)[:, 0]
        self._cache = dict(basis=basis, chol_c=chol_c, w=w, s=s, sigma2=sigma2, mu=mu)
        if love_rank is not None:
            from ..ops.eigen import lanczos_eigh

            n_tr = z.shape[0]
            rank = int(min(love_rank, n_tr))

            def khat_mv(v):
                vv = v[:, None] if v.ndim == 1 else v
                out = s * jnp.matmul(
                    z, jnp.matmul(z.T, vv, precision=_HIGHEST), precision=_HIGHEST
                ) + sigma2 * vv
                return out[:, 0] if v.ndim == 1 else out

            if love_key is None:
                love_key = jax.random.PRNGKey(0)
            v0 = jax.random.normal(love_key, (n_tr,), jnp.float32)
            lam, vecs = lanczos_eigh(khat_mv, v0, rank, rank)
            # Lanczos breaks down once the Krylov space is exhausted (K has
            # rank num_modes + noise); spurious post-breakdown Ritz pairs
            # come back as +inf values with NaN vectors — drop them by
            # zero-weighting (the exactness argument needs only that the
            # Krylov space contains col-span(Z), which it does at breakdown).
            finite = jnp.isfinite(lam)
            inv_lam = jnp.where(finite, 1.0 / jnp.where(finite, lam, 1.0), 0.0)
            vecs = jnp.where(finite[None, :], jnp.nan_to_num(vecs), 0.0)
            self._cache["love"] = (inv_lam, vecs, z)
        return self

    def modulation(self, params, x):
        """bump(distance to nearest training graph point), reference :41-43.
        Runs through the kernel's knn index (exact / IVF / mesh-sharded)."""
        d, _ = self.kernel.knn.search(
            jnp.asarray(x, jnp.float32), 1, self_query=False
        )
        gb = jnp.reshape(self.kernel.graphbandwidth(params), ())
        return bump_function(
            jnp.sqrt(d[:, 0]), self.kernel.bump_scale * gb, self.kernel.bump_decay
        )

    def posterior(
        self,
        params,
        x,
        noisy_posterior: bool = False,
        base_model=None,
        base_params=None,
        is_train: Optional[bool] = None,
    ) -> Posterior:
        """Geometric posterior, optionally blended with a vanilla GP far from
        the manifold (reference :45-75). ``is_train=True`` forces the
        in-sample feature path (queries are the graph nodes); by default the
        dispatch is by object identity against the kernel's stored ``x``."""
        cache = self._cache
        zs = self.kernel.features(params, cache["basis"], x, is_train=is_train)
        mean = cache["mu"] + jnp.matmul(zs, cache["w"][:, None], precision=_HIGHEST)[:, 0]
        if "love" in cache:
            # LOVE covariance: K** - K*t (V diag(1/lam) V') Kt* with the
            # rank-r Lanczos Ritz pairs of the train covariance (eval()).
            inv_lam, vecs, z_tr = cache["love"]
            s = cache["s"]
            k_star_t = s * jnp.matmul(zs, z_tr.T, precision=_HIGHEST)
            wv = jnp.matmul(k_star_t, vecs, precision=_HIGHEST)
            covar = s * jnp.matmul(zs, zs.T, precision=_HIGHEST) - jnp.matmul(
                wv * inv_lam[None, :], wv.T, precision=_HIGHEST
            )
        else:
            half = jax.scipy.linalg.solve_triangular(
                cache["chol_c"], zs.T, lower=True
            )
            covar = cache["sigma2"] * jnp.matmul(half.T, half, precision=_HIGHEST)
        if noisy_posterior:
            covar = covar + cache["sigma2"] * jnp.eye(covar.shape[0], dtype=covar.dtype)
        var = jnp.maximum(jnp.diagonal(covar), 0.0)
        stddev = jnp.sqrt(var)

        if base_model is not None:
            base_post = base_model.posterior(base_params, x, noisy_posterior)
            base_scale = 1.0 - self.modulation(params, x)
            mean = mean + base_scale * base_post.mean
            covar = covar + jnp.outer(base_scale, base_scale) * base_post.covar
            stddev = stddev + base_scale * base_post.stddev
        return Posterior(mean=mean, covar=covar, stddev=stddev)

    def posterior_samples(
        self,
        params,
        x,
        key,
        num_samples: int,
        noisy_posterior: bool = False,
        is_train: Optional[bool] = None,
    ):
        """Pathwise joint posterior samples at ``x``: [num_samples, n*].

        Feature-space sampling in O(m^2 + n* m) per draw (never the n*^3
        Cholesky of the dense covariance): with C = L L' from eval()'s cache,
        cov = sigma^2 Z* C^{-1} Z*' and

            f = mean + sigma * Z* L^{-T} xi,   xi ~ N(0, I_m)
            (+ sigma * eta per point when noisy_posterior)

        has exactly the posterior's first two moments. The reference obtains
        samples through GPyTorch's MultivariateNormal.rsample on the LOVE
        cache; this is the exact low-rank equivalent.
        """
        cache = self._cache
        zs = self.kernel.features(params, cache["basis"], x, is_train=is_train)
        mean = (
            cache["mu"]
            + jnp.matmul(zs, cache["w"][:, None], precision=_HIGHEST)[:, 0]
        )
        m = cache["chol_c"].shape[0]
        key, k_xi, k_eta = jax.random.split(key, 3)
        xi = jax.random.normal(k_xi, (m, num_samples), jnp.float32)
        half = jax.scipy.linalg.solve_triangular(
            cache["chol_c"].T, xi, lower=False
        )  # [m, S] with cov(L^{-T} xi) = C^{-1}
        sigma = jnp.sqrt(cache["sigma2"])
        f = mean[None, :] + sigma * jnp.matmul(
            zs, half, precision=_HIGHEST
        ).T
        if noisy_posterior:
            f = f + sigma * jax.random.normal(k_eta, f.shape, jnp.float32)
        return f
