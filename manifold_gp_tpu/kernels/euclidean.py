"""Euclidean baseline kernels for the VanillaGP model.

The reference uses GPyTorch's ``ScaleKernel(RBFKernel())`` and
``ScaleKernel(MaternKernel(nu=2.5))`` for its vanilla baselines (notebook
cell "f219323b" in every example). Same math, pure functions, MXU matmuls:

  RBF:     k(r) = exp(-r^2 / (2 l^2))
  Matern52:k(r) = (1 + sqrt(5) r/l + 5 r^2/(3 l^2)) exp(-sqrt(5) r/l)

The outputscale lives on the model side (ScaleKernel equivalent).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..parameters import ConstrainedParam, Positive

_HIGHEST = jax.lax.Precision.HIGHEST


def sq_dists(x1, x2):
    n1 = jnp.sum(x1 * x1, axis=-1)
    n2 = jnp.sum(x2 * x2, axis=-1)
    d = n1[:, None] + n2[None, :] - 2.0 * jnp.dot(x1, x2.T, precision=_HIGHEST)
    return jnp.maximum(d, 0.0)


class EuclideanKernel:
    has_lengthscale = True

    def __init__(self):
        self._param_decls = [ConstrainedParam("lengthscale", Positive())]

    def init_params(self, lengthscale=None) -> dict:
        return {"raw_lengthscale": self._param_decls[0].init_raw(lengthscale)}

    def lengthscale(self, params):
        return self._param_decls[0].value(params)

    def gram(self, params, x1, x2=None):
        raise NotImplementedError

    def gram_matvec(self, params, x1, v, x2=None, block_size: int = 4096):
        """K(x1, x2) @ v without materializing the full gram matrix.

        Row blocks of the kernel matrix are generated on the fly (one
        [block_size, n2] tile live at a time, ``lax.map``-sequenced) and
        immediately contracted into the output — each matvec regenerates
        the tiles (the O(n1 n2 D) FLOPs stay, and they are MXU matmuls),
        but memory is O(block_size * n2) instead of O(n1 n2). This is the
        KeOps-style schedule the BBMM regime needs once n outgrows dense
        gram materialization (GPyTorch's lazy kernel tensors play the same
        role)."""
        x2 = x1 if x2 is None else x2
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        n1 = x1.shape[0]
        pad = (-n1) % block_size
        x1p = jnp.pad(x1, ((0, pad), (0, 0)))
        blocks = x1p.reshape(-1, block_size, x1.shape[1])

        def one(blk):
            return jnp.matmul(
                self.gram(params, blk, x2), vv, precision=_HIGHEST
            )

        out = jax.lax.map(one, blocks).reshape(-1, vv.shape[1])[:n1]
        return out[:, 0] if squeeze else out


class RBFKernel(EuclideanKernel):
    def gram(self, params, x1, x2=None):
        x2 = x1 if x2 is None else x2
        ls = jnp.reshape(self.lengthscale(params), ())
        return jnp.exp(-sq_dists(x1, x2) / (2.0 * ls * ls))


class MaternKernel(EuclideanKernel):
    """Half-integer Matérn; nu in {0.5, 1.5, 2.5}."""

    def __init__(self, nu: float = 2.5):
        super().__init__()
        assert nu in (0.5, 1.5, 2.5), "only half-integer Matérn supported"
        self.nu = nu

    def gram(self, params, x1, x2=None):
        x2 = x1 if x2 is None else x2
        ls = jnp.reshape(self.lengthscale(params), ())
        r = jnp.sqrt(sq_dists(x1, x2) + 1e-20) / ls
        if self.nu == 0.5:
            return jnp.exp(-r)
        if self.nu == 1.5:
            c = math.sqrt(3.0) * r
            return (1.0 + c) * jnp.exp(-c)
        c = math.sqrt(5.0) * r
        return (1.0 + c + c * c / 3.0) * jnp.exp(-c)
