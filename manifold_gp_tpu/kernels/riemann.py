"""Riemann (graph-spectral) kernels.

TPU-native re-design of the reference kernel layer
(``manifold_gp/kernels/riemann_kernel.py:25-149`` and
``riemann_matern_kernel.py:10-25``). The kernel object holds only *static*
structure — the data, the kNN graph, normalization flags, constraint/prior
declarations. All learnable state lives in a flat params dict
({'raw_graphbandwidth', 'raw_lengthscale'}) so that every method is a pure
function of (params, inputs), jit- and grad-compatible.

Key behaviors preserved from the reference:
  * the kNN edge list is built once in the constructor; only edge *weights*
    depend on the learnable graph bandwidth (``riemann_kernel.py:40-42``);
  * ``eval_basis``: dense symmetric eigendecomposition, truncate to
    num_modes, force eigval[0] = 0, recover randomwalk eigenvectors via
    D^{-1/2} then column-L2-normalize — applied unconditionally, exactly as
    the reference does in eval() (``riemann_kernel.py:117-130``);
  * in-sample features sqrt(density * N) * eigvec with the spectral density
    normalized to sum 1 (``riemann_kernel.py:132-136``);
  * out-of-sample features: kNN search to training points, support mask
    dist < bump_scale * eps, Nystrom-corrected density divided by
    (1 - eps^2 lambda)^2, bump-windowed extension rows
    (``riemann_kernel.py:138-147``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, InferenceConfig
from ..parameters import ConstrainedParam, GreaterThan, Positive
from ..ops.bump import bump_function
from ..ops.graph import build_graph
from ..ops.knn import NearestNeighbors
from ..ops.eigen import chebyshev_filtered_smallest, lobpcg_smallest
from ..ops.laplacian import (
    gershgorin_bound,
    laplacian_coeffs,
    laplacian_dense,
    laplacian_matvec,
    out_of_sample,
)
from ..ops.matern import make_matern_precision_matvec

_HIGHEST = jax.lax.Precision.HIGHEST




def _matrix_free_smallest(cfg, matvec, n_rows, m, bound, mask=None):
    """cfg-dispatched large-N basis solver (LOBPCG vs Chebyshev-filtered
    subspace iteration — see config.eigensolver). The Chebyshev path
    oversamples the block by ~25% and slices back: filtered iteration
    resolves the SPAN of a cluster best with a margin of extra vectors."""
    if cfg.eigensolver == "chebyshev":
        mb = m + max(8, m // 4)
        mb = min(mb, n_rows)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (n_rows, mb), jnp.float32)
        if mask is not None:
            x0 = x0 * mask
        return chebyshev_filtered_smallest(
            matvec, x0, bound, num_modes=m,
            degree=cfg.cheb_degree, num_iters=cfg.cheb_iters,
        )
    x0 = jax.random.normal(jax.random.PRNGKey(0), (n_rows, m), jnp.float32)
    if mask is not None:
        x0 = x0 * mask
    return lobpcg_smallest(matvec, x0, bound, max_iter=cfg.eigensolver_max_iter)


def _panel_dtype_of(cfg):
    """cfg.spmv_dtype -> assemble() dtype: bf16, the "float32x3" split
    (3-pass bf16x3 MXU scheme, ops.pallas_spmv), or None (exact f32)."""
    import jax.numpy as _jnp

    return {"bfloat16": _jnp.bfloat16, "float32x3": "float32x3"}.get(
        cfg.spmv_dtype
    )


class RiemannKernel:
    """Abstract graph-spectral kernel over an implicit manifold."""

    has_lengthscale = True

    def __init__(
        self,
        x,
        nearest_neighbors: int = 10,
        laplacian_normalization: str = "symmetric",
        num_modes: int = 100,
        bump_scale: float = 1.0,
        bump_decay: float = 0.01,
        graphbandwidth_prior=None,
        graphbandwidth_constraint=None,
        cfg: InferenceConfig = DEFAULT_CONFIG,
        mesh=None,
        graph=None,
        knn_index=None,
    ):
        self.x = jnp.asarray(x, jnp.float32)
        # ``knn_index``: an ops.knn.NearestNeighbors over the SAME points to
        # serve the kernel's out-of-sample searches (features_test,
        # modulation) — e.g. NearestNeighbors(x, use_ivf=True) at large N
        # (brute force per prediction call is the scalability cliff there)
        # or NearestNeighbors(x, mesh=mesh) for the row-sharded search.
        # Default: exact single-device search.
        if knn_index is not None:
            # One-time host content compare: a same-shape index over OTHER
            # points would silently gather out-of-sample features into the
            # wrong eigvec rows.
            import numpy as _np

            if knn_index.x.shape != self.x.shape or not bool(
                _np.array_equal(_np.asarray(knn_index.x), _np.asarray(self.x))
            ):
                raise ValueError(
                    "knn_index must be built over the kernel's own points"
                )
            self.knn = knn_index
        else:
            self.knn = NearestNeighbors(self.x)
        self.nearest_neighbors = int(nearest_neighbors)
        # ``graph``: ESCAPE HATCH — inject a prebuilt SparseGraph instead of
        # the constructor's exact kNN build. The supported large-N builders
        # are real searches: ops.graph.build_graph(knn_backend="ivf", ...)
        # (measured at 1M nodes on one chip), parallel.knn.build_graph_sharded
        # (row-sharded exact search over the mesh), and utils.cache.cached_graph
        # (keyed on-disk reuse). Synthetic injection (e.g. the benchmark's
        # procedural band) is for isolating SpMV timing from build cost only.
        self.graph = (
            graph if graph is not None else build_graph(self.x, self.nearest_neighbors)
        )
        self.laplacian_normalization = laplacian_normalization
        self.num_modes = int(num_modes)
        self.bump_scale = float(bump_scale)
        self.bump_decay = float(bump_decay)
        self.graphbandwidth_prior = graphbandwidth_prior
        self.cfg = cfg
        self._param_decls = [
            ConstrainedParam(
                "graphbandwidth",
                graphbandwidth_constraint
                if graphbandwidth_constraint is not None
                else Positive(),
            ),
            ConstrainedParam("lengthscale", Positive()),
        ]
        # Laplacian matvec execution path: dense MXU for small graphs; for
        # large graphs an RCM-reordered fused layout — DIA bands when the
        # reordering is banded enough, 128x128 block-ELL panels otherwise
        # (see ops.sparse_formats) — falling back to the ELL gather scan.
        self.use_dense_operator = self.graph.num_nodes <= cfg.dense_operator_max_size
        self.block_layout = None
        # (mesh kernels build their own row-block-sharded fused layout below
        # — skip the single-chip RCM/layout build.)
        if not self.use_dense_operator and cfg.use_block_sparse and mesh is None:
            from ..ops.sparse_formats import build_layout

            self.block_layout = build_layout(
                self.graph,
                dia_max_offsets=cfg.dia_max_offsets,
                use_dia=cfg.use_dia,
            )
        # Resolve the SpMV kernel implementation once, at construction: the
        # fused Pallas kernel needs a real TPU backend (Mosaic); "auto" keeps
        # the portable einsum path on CPU meshes and in tests.
        if cfg.spmv_kernel == "auto":
            import jax as _jax

            self.use_pallas = _jax.devices()[0].platform == "tpu"
        else:
            self.use_pallas = cfg.spmv_kernel == "pallas"
        # Multi-chip: the preferred path row-block-shards the FUSED RCM
        # block-ELL layout over the mesh (parallel/block_spmv.py) so every
        # mesh matvec runs the same Pallas kernel / block einsum as one chip;
        # graphs that are not block-sparse enough fall back to the row-sharded
        # ELL gather scan (parallel/spmv.py). Either way the whole training
        # loss lives in a padded row-sharded vector space whose node->row map
        # the model reads through mesh_rows_np / embed_mesh_coeff
        # (models/riemann_gp.py handles the padded quad/SLQ/Schur forms).
        self.mesh = mesh
        self._sharded_tables = None
        self._mesh_fused = None
        if mesh is not None:
            if cfg.use_block_sparse:
                from ..parallel.block_spmv import build_mesh_block_tables

                self._mesh_fused = build_mesh_block_tables(self.graph, mesh)
            if self._mesh_fused is None:
                from ..parallel.spmv import shard_graph_rows

                self._sharded_tables = shard_graph_rows(self.graph, mesh)

    @property
    def n_padded(self) -> int:
        """Padded row count of the row-sharded vector space (mesh kernels)."""
        if self.mesh is None:
            return self.graph.num_nodes
        if self._mesh_fused is not None:
            return self._mesh_fused.rows
        return self._sharded_tables[3]

    @property
    def mesh_rows_np(self):
        """Host map node id -> padded row index of the mesh vector space
        (RCM position on the fused path; identity on the scan path)."""
        import numpy as _np

        if self._mesh_fused is not None:
            return self._mesh_fused.row_of_node_np
        return _np.arange(self.graph.num_nodes)

    @property
    def mesh_rows(self):
        """Device copy of ``mesh_rows_np`` (for traced node indices)."""
        if self._mesh_fused is not None:
            return self._mesh_fused.row_of_node
        return jnp.arange(self.graph.num_nodes, dtype=jnp.int32)

    def embed_mesh_coeff(self, d, fill: float = 0.0):
        """[N] per-node coefficient -> [n_padded] mesh vector-space embedding
        (``fill`` on padding rows)."""
        if self._mesh_fused is not None:
            return self._mesh_fused.gather_coeff(d, fill=fill)
        pad = self.n_padded - d.shape[0]
        return jnp.pad(d, (0, pad), constant_values=fill)

    # -- parameters --------------------------------------------------------
    def init_params(self, graphbandwidth=None, lengthscale=None) -> dict:
        vals = {"graphbandwidth": graphbandwidth, "lengthscale": lengthscale}
        return {
            d.raw_name: d.init_raw(vals.get(d.name)) for d in self._param_decls
        }

    def _decl(self, name) -> ConstrainedParam:
        return next(d for d in self._param_decls if d.name == name)

    def graphbandwidth(self, params):
        return self._decl("graphbandwidth").value(params)

    def lengthscale(self, params):
        return self._decl("lengthscale").value(params)

    def priors(self):
        """(name, prior, value_fn) triples for the training loss
        (reference registers the bandwidth prior at riemann_kernel.py:57-60)."""
        out = []
        if self.graphbandwidth_prior is not None:
            out.append(
                ("graphbandwidth_prior", self.graphbandwidth_prior, self.graphbandwidth)
            )
        return out

    # -- Laplacian ---------------------------------------------------------
    def coeffs(self, params, self_loops: bool = True):
        return laplacian_coeffs(self.graph, self.graphbandwidth(params), self_loops)

    def _operator_state(self, c):
        """(dense, block) execution-path state for the current coefficients."""
        if self.use_dense_operator:
            return laplacian_dense(self.graph, c), None
        if self.block_layout is not None:
            import jax.numpy as _jnp

            from ..ops.sparse_formats import assemble

            dtype = _panel_dtype_of(self.cfg)
            blocks = assemble(self.block_layout, c.diag, c.triu, dtype=dtype)
            return None, (self.block_layout, blocks)
        return None, None

    def laplacian_matvec(self, params, v, transposed: bool = False):
        c = self.coeffs(params)
        dense, block = self._operator_state(c)
        return laplacian_matvec(
            self.graph,
            c,
            v,
            self.laplacian_normalization,
            transposed,
            dense=dense,
            block=block,
            pallas=self.use_pallas and block is not None,
        )

    # -- spectral basis ----------------------------------------------------
    def eval_basis(self, params):
        """(eigval [m], eigvec [N, m]) of the graph Laplacian, with the
        reference's truncation and randomwalk-recovery post-processing."""
        if self.cfg.eigensolver == "host_f64" and self.mesh is None:
            return _eval_basis_host_f64(self, params)
        return _eval_basis_jit(self, params)

    # -- spectral features -------------------------------------------------
    def _normalized_density(self, params, eigval, nystrom_correction: bool):
        density = self.spectral_density(params, eigval)
        if nystrom_correction:
            gb2 = jnp.square(jnp.reshape(self.graphbandwidth(params), ()))
            density = density / jnp.square(1.0 - gb2 * eigval)
        return density / jnp.sum(density)

    def features_train(self, params, basis):
        """In-sample spectral features for the graph nodes themselves."""
        eigval, eigvec = basis
        density = self._normalized_density(params, eigval, nystrom_correction=False)
        return jnp.sqrt(density * eigvec.shape[0])[None, :] * eigvec

    def features_test(self, params, basis, x):
        """Out-of-sample features via the Nystrom extension + bump window.
        The train-point search runs through the kernel's ``knn`` index
        (exact by default; IVF or row-sharded when constructed with one)."""
        x = jnp.asarray(x, jnp.float32)
        eigval, eigvec = basis
        edge_sqdist, edge_idx = self.knn.search(
            x, self.nearest_neighbors, self_query=False
        )
        return self._features_oos(params, basis, edge_sqdist, edge_idx)

    def _features_oos(self, params, basis, edge_sqdist, edge_idx):
        eigval, eigvec = basis
        gb = jnp.reshape(self.graphbandwidth(params), ())
        dist0 = jnp.sqrt(edge_sqdist[:, 0])
        within = dist0 < self.bump_scale * gb
        density = self._normalized_density(params, eigval, nystrom_correction=True)
        density = density * eigvec.shape[0]
        c = self.coeffs(params)
        ext = out_of_sample(
            self.graph,
            c,
            eigvec,
            edge_sqdist,
            edge_idx,
            gb,
            self.laplacian_normalization,
        )
        window = bump_function(dist0, self.bump_scale * gb, self.bump_decay)
        feats = jnp.sqrt(density)[None, :] * ext * window[:, None]
        return jnp.where(within[:, None], feats, 0.0)

    def features(self, params, basis, x, is_train: Optional[bool] = None):
        """In-sample vs out-of-sample feature dispatch (the reference's
        ``torch.equal(x, self.knn.x)`` check, riemann_kernel.py:132-138).

        ``is_train`` makes the dispatch explicit; when None the check is by
        *object identity* only (``x is self.x``) — never a device-synced
        full-array compare, which at 1M nodes would stall the prediction path
        on an O(N*D) host round trip per call. Pass the kernel's own ``x``
        (or ``is_train=True``) to get in-sample features for the graph nodes.
        """
        if is_train is None:
            is_train = x is self.x
        if is_train:
            return self.features_train(params, basis)
        return self.features_test(params, basis, jnp.asarray(x, jnp.float32))

    def gram(self, params, basis, x1, x2=None, is_train1=None, is_train2=None):
        """Covariance k(x1, x2) from spectral features (no outputscale)."""
        z1 = self.features(params, basis, x1, is_train=is_train1)
        z2 = z1 if x2 is None else self.features(params, basis, x2, is_train=is_train2)
        return jnp.matmul(z1, z2.T, precision=_HIGHEST)

    # -- abstract ----------------------------------------------------------
    def spectral_density(self, params, eigval):
        raise NotImplementedError

    def precision_matvec(self, params):
        raise NotImplementedError


@functools.partial(jax.jit, static_argnames=("kernel",))
def _eval_basis_jit(kernel: RiemannKernel, params):
    c = kernel.coeffs(params)
    n = kernel.graph.num_nodes
    m = min(kernel.num_modes, n)
    if kernel.mesh is not None:
        # Row-sharded spectral basis: block LOBPCG over the sharded SpMV —
        # the fused row-block-sharded panel kernel when the layout exists,
        # the ELL gather scan otherwise. The padded rows are pinned at the
        # Gershgorin bound (the top of the shifted spectrum), so they can
        # never displace the smallest-m true eigenpairs; every [m, m]
        # reduction inside lobpcg_standard psum's across the mesh under
        # GSPMD. Replaces the reference's single-device ``diagonalization``
        # (graph_laplacian_operator.py:132-144) at multi-chip scale.
        bound = gershgorin_bound(kernel.graph, c)
        if kernel._mesh_fused is not None:
            from ..parallel.block_spmv import (
                assemble_sharded,
                make_sharded_block_matvec_ad,
            )

            tables = kernel._mesh_fused
            npad = tables.rows
            mask = tables.row_mask  # [rows, 1]
            # f32 panels regardless of spmv_dtype: resolving eigenvalues
            # clustered near zero needs full matvec precision, and the basis
            # solve runs once per eval (same policy as the single-chip path
            # below).
            blocks = assemble_sharded(tables, c.diag, c.triu)
            mv = make_sharded_block_matvec_ad(
                tables, impl="pallas" if kernel.use_pallas else "einsum"
            )

            def lap_mv_pad(v):
                return mask * mv(blocks, v) + bound * (1.0 - mask) * v

            unpermute_rows = tables.row_of_node
        else:
            from ..parallel.spmv import sharded_adjacency_matvec

            tables = kernel._sharded_tables
            npad = tables[3]
            pad = npad - n
            diag_p = jnp.pad(c.diag, (0, pad))
            mask = jnp.pad(jnp.ones((n,), jnp.float32), (0, pad))[:, None]

            def lap_mv_pad(v):
                av = sharded_adjacency_matvec(
                    tables[0], tables[1], tables[2], c.triu, v, kernel.mesh
                )
                lv = diag_p[:, None] * v - av
                return mask * lv + bound * (1.0 - mask) * v

            unpermute_rows = None

        eigval, eigvec = _matrix_free_smallest(
            kernel.cfg, lap_mv_pad, npad, m, bound, mask=mask
        )
        # back to node order: gather the true rows (identity prefix on the
        # scan path; RCM positions on the fused path)
        eigvec = eigvec[:n] if unpermute_rows is None else eigvec[unpermute_rows]
    elif n <= kernel.cfg.eigh_max_size:
        # Small-N exact path: dense symmetric eigh, like reference eval()
        # (riemann_kernel.py:121-124).
        lap = laplacian_dense(kernel.graph, c)
        eigval, eigvec = jnp.linalg.eigh(lap)
        eigval, eigvec = eigval[:m], eigvec[:, :m]
    else:
        # Large-N matrix-free path: block LOBPCG on the sparse SpMV (shifted
        # by a Gershgorin bound). A block solver is required here — the low
        # Laplacian spectrum has clustered/degenerate eigenvalues (paired
        # harmonics, graph components) that single-vector Lanczos (the
        # reference's linear_operator diagonalization route,
        # graph_laplacian_operator.py:132-144) cannot resolve.
        # Always f32 blocks here: resolving eigenvalues clustered near zero
        # (relative to lambda_max) needs more matvec precision than bf16
        # offers, and the basis solve runs once per eval, not per CG step.
        if kernel.block_layout is not None:
            from ..ops.sparse_formats import assemble

            block = (kernel.block_layout, assemble(kernel.block_layout, c.diag, c.triu))
        else:
            block = None
        eigval, eigvec = _matrix_free_smallest(
            kernel.cfg,
            lambda v: laplacian_matvec(
                kernel.graph,
                c,
                v,
                "symmetric",
                block=block,
                pallas=kernel.use_pallas and block is not None,
            ),
            n,
            m,
            gershgorin_bound(kernel.graph, c),
        )
    eigval = eigval.at[0].set(0.0)
    # Unconditional D^{-1/2} recovery + column L2 normalization, matching
    # reference eval() (riemann_kernel.py:127-128).
    eigvec = eigvec * jax.lax.rsqrt(c.deg)[:, None]
    eigvec = eigvec / jnp.linalg.norm(eigvec, axis=0, keepdims=True)
    return eigval, eigvec


def _eval_basis_host_f64(kernel: RiemannKernel, params):
    """cfg.eigensolver="host_f64": exact f64 sparse shift-invert basis on the
    host (ops.eigen.host_f64_smallest) for spectral bands below the f32
    assembly noise floor; identical post-processing to the jit path, done in
    f64 before the single f32 cast. Eval-time only (one host sync for the
    bandwidth value), single-device kernels."""
    import numpy as np

    from ..ops.eigen import host_f64_smallest

    gb = float(jax.device_get(kernel.graphbandwidth(params)))
    m = min(kernel.num_modes, kernel.graph.num_nodes)
    eigval, eigvec, deg = host_f64_smallest(kernel.graph, gb, m)
    eigval = np.asarray(eigval).copy()
    eigval[0] = 0.0
    eigvec = np.asarray(eigvec) / np.sqrt(deg)[:, None]
    eigvec = eigvec / np.linalg.norm(eigvec, axis=0, keepdims=True)
    return (
        jnp.asarray(eigval, jnp.float32),
        jnp.asarray(eigvec, jnp.float32),
    )


class RiemannMaternKernel(RiemannKernel):
    """Matérn kernel through the graph-Laplacian precision operator
    (reference ``kernels/riemann_matern_kernel.py:10-25``)."""

    def __init__(self, nu: int = 2, **kwargs):
        super().__init__(**kwargs)
        self.nu = int(nu)

    def spectral_density(self, params, eigval):
        ls2 = jnp.square(jnp.reshape(self.lengthscale(params), ()))
        return jnp.power(2.0 * self.nu / ls2 + eigval, -float(self.nu))

    def precision_diag(self, params, coeffs=None):
        """(Approximate) diag(Q) for Jacobi PCG (ops.matern.matern_precision_diag)."""
        from ..ops.matern import matern_precision_diag

        c = self.coeffs(params) if coeffs is None else coeffs
        return matern_precision_diag(
            self.graph, c, self.nu, self.lengthscale(params),
            self.laplacian_normalization,
        )

    def precision_matvec(self, params, coeffs=None, permuted_io: bool = False):
        """Matvec closure for Q = (2 nu / l^2 I + L)^nu.

        With ``permuted_io=True`` (block path only) the closure works on
        padded-RCM-space vectors so compositions/solves built on top do no
        per-matvec permutation gathers.

        On a mesh kernel the closure is the row-sharded shard_map SpMV over
        padded vectors [n_padded, B] (zero padding rows; node order
        unchanged)."""
        c = self.coeffs(params) if coeffs is None else coeffs
        if self.mesh is not None:
            if self._mesh_fused is not None:
                from ..parallel.block_spmv import (
                    make_sharded_matern_precision_matvec_fused,
                )

                return make_sharded_matern_precision_matvec_fused(
                    self._mesh_fused,
                    c,
                    self.nu,
                    self.lengthscale(params),
                    self.laplacian_normalization,
                    dtype=(
                        jnp.bfloat16 if self.cfg.spmv_dtype == "bfloat16" else None
                    ),
                    impl="pallas" if self.use_pallas else "einsum",
                    grad_space=self.cfg.solve_cotangent,
                )
            from ..parallel.spmv import make_sharded_matern_precision_matvec

            mv, _ = make_sharded_matern_precision_matvec(
                self.graph,
                self.mesh,
                c,
                self.nu,
                self.lengthscale(params),
                self.laplacian_normalization,
                tables=self._sharded_tables,
            )
            return mv
        # Do NOT go through _operator_state here: the fused Matérn block path
        # reassembles *shifted* panels itself, so assembling an unshifted
        # panel buffer first would materialize a second GB-scale buffer per
        # step outside jit (XLA DCE hides it only under jit). Pass the layout
        # plus the desired panel dtype instead.
        dense, block = None, None
        if self.use_dense_operator:
            dense = laplacian_dense(self.graph, c)
        elif self.block_layout is not None:
            panel_dtype = _panel_dtype_of(self.cfg)
            block = (self.block_layout, panel_dtype)
        if block is None:
            permuted_io = False
        return make_matern_precision_matvec(
            self.graph,
            c,
            self.nu,
            self.lengthscale(params),
            self.laplacian_normalization,
            dense=dense,
            block=block,
            permuted_io=permuted_io,
            pallas=self.use_pallas and block is not None,
            grad_space=self.cfg.solve_cotangent,
        )
