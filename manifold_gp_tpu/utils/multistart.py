"""Multi-start hyperparameter training (vmapped restarts).

The precision-form marginal likelihood is multi-modal in the (bandwidth,
lengthscale) plane — we measured basins differing by 0.45 nats/datum on the
reference's own 1D semisupervised config (see PARITY.md). The reference has
no answer to this (single Adam trajectory from a hand-picked init,
``utils/train_model.py:49``). On TPU the natural answer is to train R
restarts *simultaneously*: the whole chunked epoch scan is ``jax.vmap``-ed
over a stacked batch of inits, so every matvec/Cholesky in the step becomes
a batched operator apply on the same compiled program — R restarts cost far
less than R sequential runs, and for small-N configs they are nearly free.

Restrictions vs ``manifold_informed_train``: no ``update_norm``
re-normalization callbacks and no per-epoch verbose printing inside the
vmapped scan (final per-restart losses are returned instead).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .train import ReduceLROnPlateau, _sched_update


def random_restarts(
    model,
    key,
    num_restarts: int,
    noise=1e-2,
    outputscale=1.0,
    graphbandwidth_range=(1e-2, 1.0),
    lengthscale_range=(0.3, 10.0),
) -> list:
    """Log-uniform random inits over the (bandwidth, lengthscale) plane."""
    keys = jax.random.split(key, num_restarts)
    inits = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        gb = jnp.exp(
            jax.random.uniform(
                k1,
                (),
                minval=jnp.log(graphbandwidth_range[0]),
                maxval=jnp.log(graphbandwidth_range[1]),
            )
        )
        ls = jnp.exp(
            jax.random.uniform(
                k2,
                (),
                minval=jnp.log(lengthscale_range[0]),
                maxval=jnp.log(lengthscale_range[1]),
            )
        )
        inits.append(
            model.init_params(
                noise=noise,
                outputscale=outputscale,
                graphbandwidth=float(gb),
                lengthscale=float(ls),
            )
        )
    return inits


def multi_start_train(
    model,
    inits: list,
    lr: float = 1e-1,
    weight_decay: float = 0.0,
    max_iter: int = 100,
    scheduler: Optional[ReduceLROnPlateau] = None,
    seed: int = 0,
    return_all: bool = False,
):
    """Train every init in ``inits`` jointly (vmapped) and return the best.

    Returns (best_params, best_loss, losses[R]) — or with
    ``return_all=True``, (stacked_params, losses[R]).
    """
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )
    total = max_iter + 1
    sched_cfg = scheduler

    def train_one(params, key):
        opt_state = tx.init(params)
        sstate = (
            sched_cfg.init_state()
            if sched_cfg is not None
            else (jnp.float32(jnp.inf), jnp.int32(0), jnp.int32(0))
        )

        def body(carry, _):
            params, opt_state, key, lr_c, sstate = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(model.mll_loss)(params, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree.map(lambda u: -lr_c * u, updates)
            )
            if sched_cfg is not None:
                lr_next, sstate = _sched_update(sched_cfg, loss, lr_c, sstate)
            else:
                lr_next = lr_c
            return (params, opt_state, key, lr_next, sstate), loss

        (params, _, _, _, _), losses = jax.lax.scan(
            body,
            (params, opt_state, key, jnp.float32(lr), sstate),
            None,
            length=total,
        )
        return params, losses[-1]

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *inits)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(inits))
    final_params, final_losses = jax.jit(jax.vmap(train_one))(stacked, keys)
    if return_all:
        return final_params, final_losses
    best = int(jnp.argmin(final_losses))
    best_params = jax.tree.map(lambda x: x[best], final_params)
    return best_params, float(final_losses[best]), final_losses
