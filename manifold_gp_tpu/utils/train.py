"""Training loops: precision-form manifold training and the vanilla baseline.

Mirrors reference ``manifold_gp/utils/train_model.py``:
  * ``manifold_informed_train`` (:49-109): pre-loop outputscale normalization
    by the average precision-inverse variance, Adam on the precision-form
    negative MLL, optional periodic re-normalization every ``update_norm``
    epochs, plateau LR scheduling, |delta loss| <= tolerance early stop, and
    the post-loop outputscale de-normalization.
  * ``vanilla_train`` (:10-46): Adam on the exact (Cholesky) negative MLL.

TPU-first execution: epochs run in *chunks* — one ``lax.scan`` over many
(value_and_grad + Adam update + plateau-scheduler) epochs per XLA dispatch —
so the host syncs once per chunk instead of once per epoch. Over a remote
TPU link each host sync is a full round trip; per-epoch syncing (the
reference's Python loop) would make dispatch latency, not device compute,
the training bottleneck. The plateau scheduler is traced inside the scan
with exact torch ``ReduceLROnPlateau(mode='min', threshold_mode='rel')``
semantics, so chunking does not change the numerics; the outputscale
re-normalization protocol cuts chunks at its exact epoch boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class ReduceLROnPlateau:
    """Plateau scheduler config with torch semantics (mode='min',
    threshold_mode='rel'), as configured in the reference notebooks. The
    state update is traced inside the training scan (see ``_sched_update``)."""

    factor: float = 0.5
    patience: int = 200
    threshold: float = 1e-3
    cooldown: int = 0
    min_lr: float = 0.0

    def init_state(self):
        # (best, num_bad, cooldown_counter)
        return (jnp.float32(jnp.inf), jnp.int32(0), jnp.int32(0))


def _sched_update(cfg: ReduceLROnPlateau, loss, lr, state):
    """One torch-exact ReduceLROnPlateau step as traced jnp ops."""
    best, num_bad, cooldown_counter = state
    improved = loss < best * (1.0 - cfg.threshold)
    best = jnp.where(improved, loss, best)
    num_bad = jnp.where(improved, 0, num_bad + 1)
    in_cooldown = cooldown_counter > 0
    cooldown_counter = jnp.where(in_cooldown, cooldown_counter - 1, cooldown_counter)
    num_bad = jnp.where(in_cooldown, 0, num_bad)
    trip = num_bad > cfg.patience
    lr = jnp.where(trip, jnp.maximum(lr * cfg.factor, cfg.min_lr), lr)
    cooldown_counter = jnp.where(trip, cfg.cooldown, cooldown_counter)
    num_bad = jnp.where(trip, 0, num_bad)
    return lr, (best, num_bad, cooldown_counter)


def _train_loop(
    model,
    params,
    loss_fn,
    lr,
    weight_decay,
    max_iter,
    tolerance,
    scheduler,
    verbose,
    seed,
    on_epoch_end=None,
    callback_period: Optional[int] = None,
    metrics=None,
    chunk_size: int = 50,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    resume: bool = True,
    callback_key: Optional[list] = None,
    debug: bool = False,
    aux_fn=None,
    aux_period: Optional[int] = None,
):
    """Chunked training driver.

    Epochs 0..max_iter run in lax.scan chunks (one device dispatch each,
    at most ``chunk_size`` epochs per chunk — bounds the size of the
    compiled program). ``on_epoch_end(epoch, params)`` fires host-side after
    epochs where ``epoch % callback_period == 0`` (with the reference's
    post-increment epoch counter) — chunks are cut exactly at those
    boundaries.

    ``callback_key``: optional single-element list holding the PRNG key the
    ``on_epoch_end`` closure consumes; it is saved in (and restored from)
    checkpoints so resumed runs replay the callback's randomness exactly.

    ``aux_fn(params) -> aux``: optional epoch-scoped auxiliary state rebuilt
    every ``aux_period`` epochs and passed to ``loss_fn(params, key, aux)``
    as a jit ARGUMENT of the chunk (never a baked closure constant — a
    rebuilt aux must actually reach the compiled program). Used for
    preconditioners cached across epochs (cfg ``precond_refresh``): they are
    stop_gradient-ed estimator state, so staleness affects iteration counts
    and estimator concentration, never gradients. Chunks are cut at refresh
    boundaries.
    """
    # torch.optim.Adam semantics: L2 decay added to the gradient *before*
    # the Adam moments, then the lr scaling. lr is a traced scan-carry value
    # so the in-scan scheduler can anneal it without retracing.
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )
    opt_state = tx.init(params)
    sched_cfg = scheduler
    sched_state = (
        sched_cfg.init_state()
        if sched_cfg is not None
        else (jnp.float32(jnp.inf), jnp.int32(0), jnp.int32(0))
    )

    tracked = [
        ("noise", "raw_noise", lambda p: model.noise(p)),
        ("outputscale", "raw_outputscale", lambda p: model.outputscale(p)),
        ("lengthscale", "raw_lengthscale", lambda p: model.kernel.lengthscale(p)),
        (
            "graphbandwidth",
            "raw_graphbandwidth",
            lambda p: model.kernel.graphbandwidth(p),
        ),
    ]
    tracked = [(n, fn) for n, raw, fn in tracked if raw in params]

    def make_epoch_body(aux):
        def epoch_body(carry, _):
            params, opt_state, key, lr_c, sstate = carry
            key, sub = jax.random.split(key)
            if aux_fn is not None:
                loss, grads = jax.value_and_grad(loss_fn)(params, sub, aux)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(
                params, jax.tree.map(lambda u: -lr_c * u, updates)
            )
            out = {"loss": loss, "lr": lr_c}
            for name, fn in tracked:
                out[name] = jnp.reshape(fn(params), ())
            if sched_cfg is not None:
                lr_next, sstate = _sched_update(sched_cfg, loss, lr_c, sstate)
            else:
                lr_next = lr_c
            return (params, opt_state, key, lr_next, sstate), out

        return epoch_body

    import functools

    @functools.partial(jax.jit, static_argnames=("length",))
    def run_chunk(params, opt_state, key, lr_c, sstate, aux, length):
        carry, outs = jax.lax.scan(
            make_epoch_body(aux),
            (params, opt_state, key, lr_c, sstate),
            None,
            length=length,
        )
        return carry, outs

    total = max_iter + 1  # reference loops while epoch <= max_iter
    period = callback_period if (on_epoch_end and callback_period) else total
    key = jax.random.PRNGKey(seed)
    cur_lr = jnp.float32(lr)
    history: list = []
    epoch = 0
    stop = False
    if checkpoint_path and resume:
        from .checkpoint import load_training_state

        ckpt = load_training_state(checkpoint_path)
        if ckpt is not None and ckpt["epoch"] < total:
            params, opt_state = ckpt["params"], ckpt["opt_state"]
            epoch, cur_lr = ckpt["epoch"], jnp.float32(ckpt["lr"])
            sched_state, key = tuple(ckpt["sched_state"]), ckpt["key"]
            if callback_key is not None and ckpt.get("callback_key") is not None:
                callback_key[0] = ckpt["callback_key"]
            if verbose:
                print(f"[resume] epoch {epoch} from {checkpoint_path}")
    next_ckpt = (
        (epoch // checkpoint_every + 1) * checkpoint_every
        if (checkpoint_path and checkpoint_every)
        else None
    )
    aux = None
    aux_next = epoch  # rebuild immediately on entry (incl. after a resume)
    while epoch < total and not stop:
        if aux_fn is not None and epoch >= aux_next:
            aux = aux_fn(params)
            # Next rebuild at the next ABSOLUTE multiple of aux_period, so a
            # resumed run re-joins the uninterrupted run's refresh epochs.
            # (The entry rebuild itself uses the checkpointed params rather
            # than the params from the last pre-crash boundary, so runs with
            # aux_fn replay the SCHEDULE exactly but not the stochastic
            # draws of the interrupted window — aux is stop_gradient-ed
            # estimator state, so only MC noise differs, never estimands.
            # Bitwise resume-exactness holds for aux_fn=None, which the
            # checkpoint tests pin.)
            period_abs = aux_period or total
            aux_next = (epoch // period_abs + 1) * period_abs
        length = min(
            period - (epoch % period) if period else total,
            total - epoch,
            chunk_size,
        )
        if next_ckpt is not None:
            length = min(length, next_ckpt - epoch)
        if aux_fn is not None:
            length = min(length, aux_next - epoch)
        (params, opt_state, key, cur_lr, sched_state), outs = run_chunk(
            params, opt_state, key, cur_lr, sched_state, aux, length=length
        )
        outs = {k: list(map(float, v)) for k, v in outs.items()}
        if debug:
            # NaN guard (SURVEY §5): fail fast with the epoch index instead of
            # silently training on poisoned params for the rest of the run.
            from .debug import check_finite

            for j, lv in enumerate(outs["loss"]):
                if not np.isfinite(lv):
                    raise FloatingPointError(
                        f"non-finite training loss {lv} at epoch {epoch + j}"
                    )
            check_finite(params, name=f"params after epoch {epoch + length - 1}")
        for j in range(length):
            e = epoch + j
            history.append(outs["loss"][j])
            if metrics is not None:
                metrics.record(e, **{k: outs[k][j] for k in outs})
            if verbose:
                msg = [
                    f"Iteration: {e}, Loss: {outs['loss'][j]:0.3f}, "
                    f"Lr: {outs['lr'][j]:g}"
                ]
                label = {
                    "noise": "Noise Variance",
                    "outputscale": "Signal Variance",
                    "lengthscale": "Lengthscale",
                    "graphbandwidth": "Graphbandwidth",
                }
                for name, _ in tracked:
                    msg.append(f"{label[name]}: {outs[name][j]:0.3f}")
                print(",\t".join(msg))
        epoch += length
        # Parity quirk: the reference's early stop compares against a 1e6
        # sentinel that is never updated (train_model.py:59,92-94), so it
        # effectively never fires and training runs all max_iter+1 epochs.
        # Preserved: checked per epoch against the same sentinel.
        if any(abs(lv - 1e6) <= tolerance for lv in outs["loss"]):
            stop = True
        elif on_epoch_end is not None and epoch < total and epoch % period == 0:
            params = on_epoch_end(epoch, params)
        # Checkpoint AFTER the epoch-boundary callback so the saved params
        # (and callback_key) already include its effect — a resumed run must
        # not re-fire (or skip) the boundary callback.
        if next_ckpt is not None and epoch >= next_ckpt:
            from .checkpoint import save_training_state

            save_training_state(
                checkpoint_path, params, opt_state, epoch, float(cur_lr),
                sched_state, key,
                callback_key=None if callback_key is None else callback_key[0],
            )
            next_ckpt = (epoch // checkpoint_every + 1) * checkpoint_every
    return params, history[-1] if history else float("nan"), history


def manifold_informed_train(
    model,
    params,
    lr: float = 1e-1,
    weight_decay: float = 0.0,
    max_iter: int = 100,
    tolerance: float = 1e-2,
    update_norm: Optional[int] = None,
    num_rand_vec: int = 100,
    scheduler: Optional[ReduceLROnPlateau] = None,
    verbose: bool = False,
    seed: int = 0,
    metrics=None,
    checkpoint_path=None,
    checkpoint_every=None,
    resume: bool = True,
    debug: bool = False,
    precond_refresh: Optional[int] = None,
    chunk_size: int = 50,
):
    """IMGP hyperparameter training (reference train_model.py:49-109).

    ``chunk_size``: epochs per lax.scan dispatch. Lower it for heavy
    per-epoch configs (e.g. nested-Krylov semisupervised losses at 10k+
    nodes): a single multi-minute XLA dispatch is liable to be killed by
    remote/tunneled TPU runtimes, and smaller chunks also bound
    time-to-first-verbose-line.

    ``checkpoint_path`` + ``checkpoint_every`` enable resumable training
    (full optimizer/scheduler/PRNG state every k epochs; restart picks up
    where the last checkpoint left off). Returns (params, final_loss,
    history).

    ``precond_refresh``: rebuild the (config-selected) preconditioner every
    this many epochs and reuse it in between, instead of rebuilding inside
    every loss evaluation — the GPyTorch-parity amortization (GPyTorch
    builds its preconditioner once per operator instantiation). Material
    for ``precond_type='pivchol'`` at large N, where construction is
    ``precond_rank`` sequential full-operator matvecs. The cached object is
    stop_gradient-ed, so staleness affects only CG iteration counts and
    quadrature concentration — gradients stay unbiased. Checkpoint/resume:
    the refresh schedule is aligned to absolute epochs, but the
    entry-rebuild after a resume uses the checkpointed params, so the
    interrupted window's MC draws differ from the uninterrupted run's
    (bitwise resume-exactness needs precond_refresh=None).
    """
    # The callback PRNG chain lives in a 1-element holder so _train_loop can
    # checkpoint/restore it (resume then replays renormalization probes
    # exactly, update_norm runs included).
    cb_key = [jax.random.PRNGKey(seed + 7919)]

    def avg_var(p, k):
        return model.average_variance(p, num_rand_vec=num_rand_vec, key=k)

    if model.use_outputscale:
        cb_key[0], sub = jax.random.split(cb_key[0])
        av = avg_var(params, sub)
        params = model.set_outputscale(params, model.outputscale(params) / av)

    def on_epoch_end(epoch, p):
        # Reached only at epoch % (update_norm + 1) == 0 boundaries (the
        # loop cuts scan chunks exactly there), mirroring reference
        # train_model.py:96-100.
        cb_key[0], sub = jax.random.split(cb_key[0])
        if verbose:
            print("Update covariance normalization at epoch: ", epoch)
        return model.set_outputscale(p, 1.0 / avg_var(p, sub))

    if precond_refresh is not None:
        loss_fn = lambda p, k, aux: model.mll_loss(  # noqa: E731
            p, key=k, precond_override=aux
        )
        aux_fn = model.build_precond
    else:
        loss_fn = lambda p, k: model.mll_loss(p, key=k)  # noqa: E731
        aux_fn = None

    params, loss_val, history = _train_loop(
        model,
        params,
        loss_fn,
        lr,
        weight_decay,
        max_iter,
        tolerance,
        scheduler,
        verbose,
        seed,
        on_epoch_end=on_epoch_end if update_norm is not None else None,
        callback_period=(update_norm + 1) if update_norm is not None else None,
        metrics=metrics,
        checkpoint_path=checkpoint_path,
        checkpoint_every=checkpoint_every,
        resume=resume,
        callback_key=cb_key,
        debug=debug,
        aux_fn=aux_fn,
        aux_period=precond_refresh,
        chunk_size=chunk_size,
    )

    if model.use_outputscale:
        cb_key[0], sub = jax.random.split(cb_key[0])
        av = avg_var(params, sub)
        params = model.set_outputscale(params, model.outputscale(params) * av)
    return params, loss_val, history


def vanilla_train(
    model,
    params,
    lr: float = 1e-1,
    weight_decay: float = 0.0,
    max_iter: int = 100,
    tolerance: float = 1e-2,
    scheduler: Optional[ReduceLROnPlateau] = None,
    verbose: bool = False,
    seed: int = 0,
    metrics=None,
    checkpoint_path=None,
    checkpoint_every=None,
    resume: bool = True,
    debug: bool = False,
    chunk_size: int = 50,
):
    """Standard exact-MLL training (reference train_model.py:10-46)."""
    params, loss_val, history = _train_loop(
        model,
        params,
        lambda p, k: model.mll_loss(p, key=k),
        lr,
        weight_decay,
        max_iter,
        tolerance,
        scheduler,
        verbose,
        seed,
        metrics=metrics,
        checkpoint_path=checkpoint_path,
        checkpoint_every=checkpoint_every,
        resume=resume,
        debug=debug,
        chunk_size=chunk_size,
    )
    return params, loss_val, history
