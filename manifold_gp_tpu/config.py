"""Inference configuration.

The reference drives its iterative-inference engine through GPyTorch context
managers (``gpytorch.settings.max_cholesky_size / cg_tolerance /
max_cg_iterations / fast_pred_var``; see reference
``manifold_gp/utils/train_model.py:21,66`` and ``utils/test_model.py:11``).
Here those implicit, dynamically-scoped settings become one explicit, hashable
dataclass that is threaded through every solver entry point — which also makes
it a static jit argument, so changing tolerances recompiles instead of
silently retracing.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Settings for the matrix-free inference engine.

    Attributes:
      max_cholesky: operators of size <= this are densified (via batched
        matvecs on the identity) and handled with exact Cholesky
        factorizations; larger operators use CG + stochastic Lanczos
        quadrature. Mirrors ``gpytorch.settings.max_cholesky_size``.
      cg_tolerance: relative residual tolerance for CG termination.
      cg_max_iter: hard iteration cap for CG (static under jit).
      num_probes: number of Rademacher probe vectors for SLQ / Hutchinson
        estimators (the stochastic log-det path).
      lanczos_max_iter: Lanczos steps per probe in SLQ.
      eigh_max_size: graphs up to this many nodes use dense ``jnp.linalg.eigh``
        for the spectral basis; beyond it, the matrix-free Lanczos eigensolver.
      dense_operator_max_size: graphs up to this many nodes run the Laplacian
        matvec through an assembled dense matrix on the MXU instead of the
        sparse gather path (small-N fast path; identical numerics).
    """

    max_cholesky: int = 800
    cg_tolerance: float = 1e-2
    cg_max_iter: int = 1000
    num_probes: int = 64
    lanczos_max_iter: int = 96
    # XLA's dense eigh needs ~40x N^2 f32 workspace; 8192 keeps it inside a
    # single v5e's 16 GB HBM. Larger graphs use the matrix-free LOBPCG route.
    eigh_max_size: int = 8192
    # LOBPCG iteration cap for the large-N spectral-basis solver.
    eigensolver_max_iter: int = 200
    # Large-N basis solver: "lobpcg" (default; fine when the wanted modes
    # are separated relative to lambda_max) or "chebyshev"
    # (ops.eigen.chebyshev_filtered_smallest — filtered subspace iteration;
    # REQUIRED when the wanted band is a near-degenerate cluster far below
    # lambda_max, e.g. the lowest 50 modes of a 262k-node curve graph at
    # ~1e-5 lambda_max, where LOBPCG's per-iteration contraction
    # 1 - O(lambda/lambda_max) would need ~1e5 iterations; measured span
    # capture 0.28 for LOBPCG-200 vs >0.999999 for chebyshev).
    eigensolver: str = "lobpcg"
    # Chebyshev filter polynomial degree per application and number of
    # filtered iterations (total matvecs ~ degree * iters).
    cheb_degree: int = 256
    cheb_iters: int = 6
    dense_operator_max_size: int = 4096
    # Above dense_operator_max_size, try a fused RCM-reordered SpMV layout
    # (ops.sparse_formats); falls back to the ELL gather scan when the
    # reordered graph is not block-sparse enough.
    use_block_sparse: bool = True
    # Prefer the DIA band format when the RCM reordering has at most
    # dia_max_offsets distinct diagonals. DIA stores one float per
    # (row, diagonal) vs 128-wide panel columns, but each diagonal costs an
    # unaligned sublane-shifted VPU slice (a VMEM relayout), so wide bands
    # lose to the MXU panel kernel despite streaming fewer HBM bytes.
    # Measured on v5e @ 1M nodes, batch 128: D=23 -> DIA 109 applies/s vs
    # block-streaming 104; D=61 -> DIA 52 vs block 104. Threshold set where
    # DIA still wins.
    use_dia: bool = True
    dia_max_offsets: int = 24
    # Storage/matmul dtype for the block-sparse panel buffer: "float32"
    # (exact, 6-pass MXU emulation), "bfloat16" (native MXU throughput,
    # f32 accumulation; ~1e-3 relative matvec error — safe at the
    # reference's 1e-2 CG tolerance. Measured CG-solution relative error:
    # 4e-4 on the SRMNIST-shape graph, 3.8e-3 on a small-bandwidth clustered
    # graph; trained-hyperparameter drift <2% over 10 epochs — pinned by
    # tests/test_bf16_solve.py), or "float32x3" (panels split hi/lo bf16 and
    # the kernel issues the 3-pass bf16x3 scheme: same HBM bytes as f32,
    # HALF the MXU cost, ~2^-15 relative error — the middle rung between
    # f32 parity and bf16 throughput; see ops.pallas_spmv).
    spmv_dtype: str = "float32"
    # Precondition every CG solve (the Schur inner solve, engine solves, and
    # the SLQ gradient solves) with the composed operator's preconditioner.
    # Never changes solutions, only iteration counts.
    cg_precondition: bool = True
    # Preconditioner family (ops.pivchol): "jacobi" = diag(Q) (the natural
    # precision-form default — diagonals are cheaply computable), "pivchol" =
    # rank-r partial pivoted Cholesky M = L L' + diag(residual) (GPyTorch's
    # AddedDiag preconditioner, built from r one-hot matvecs per step),
    # "none".
    precond_type: str = "jacobi"
    # pivchol rank; GPyTorch settings.max_preconditioner_size default.
    precond_rank: int = 15
    # Full mBCG logdet semantics: draw SLQ probes from the preconditioner
    # (E[zz'] = M), run the PCG-coefficient quadrature on M^{-1/2} Q M^{-1/2}
    # and add the logdet(M) correction (ops.slq.slq_logdet_mbcg). GPyTorch
    # does this whenever a preconditioner exists; off reproduces the plain
    # Hutchinson+Lanczos path (which is what the reference's own *training*
    # operator gets — its custom LinearOperator stack has no preconditioner).
    slq_precond_quadrature: bool = False
    # Block-SpMV kernel implementation: "pallas" (fused Mosaic kernel, VMEM
    # -resident operand, differentiable via ops.pallas_spmv.make_matvec_ad),
    # "einsum" (portable XLA path, identical numerics), or "auto" (pallas on
    # TPU backends, einsum elsewhere — resolved at kernel construction).
    spmv_kernel: str = "auto"
    # Cotangent space for the fused-SpMV solve VJPs (block-ELL path only):
    # "panel" (default) accumulates solve cotangents in panel space
    # ([nrb, 128, S*128] per live instance — fine for 1-D graphs where
    # S~3); "edge" contracts each solve's panel cotangent to edge space
    # ([M]+[N], ~30 MB at 262k) inside the VJP
    # (ops.pallas_spmv.make_matvec_edge_ad), bounding peak backward memory
    # at ONE transient panel buffer. REQUIRED for 2-D manifolds at scale:
    # a 262k torus graph has S=22 (2.7 GB f32 panels) and a training step
    # keeps ~8 panel cotangents live under "panel" — 33 GB, OOM on a
    # 16 GB chip. Gradients agree with "panel" to f32 roundoff
    # (tests/test_edge_cotangent.py).
    solve_cotangent: str = "panel"
    # VanillaGP (Euclidean BBMM regime): up to this many training points the
    # iterative solves materialize the dense [n, n] covariance once per loss
    # eval (one big MXU gram; 1.6 GB f32 at n=20k); above it the matvecs
    # regenerate kernel tiles on the fly (EuclideanKernel.gram_matvec) —
    # O(block * n) memory, same MXU FLOPs per matvec.
    dense_gram_max_size: int = 20000

    def replace(self, **kw) -> "InferenceConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = InferenceConfig()
