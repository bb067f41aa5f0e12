"""Hyperparameter checkpointing.

The reference checkpoints only the (~15-scalar) hyperparameter state dict via
``torch.save`` (``manifold_gp/utils/torch_utils.py:9-16``; the kNN graph and
eigenbasis are always recomputed). We keep the same contract with a portable
``.npz`` payload, and additionally support caching the expensive derived
structures (edge lists) keyed by a content hash.
"""

from __future__ import annotations

import hashlib
import json
import pathlib

import jax.numpy as jnp
import numpy as np


def save_params(params: dict, path):
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path) -> dict:
    d = np.load(path)
    return {k: jnp.asarray(d[k]) for k in d.files}


def save_training_state(
    path, params, opt_state, epoch: int, lr, sched_state, key, callback_key=None
):
    """Full resumable training state (params + optimizer moments + scheduler
    + PRNG key + epoch). The reference has no resume at all (SURVEY §5:
    restart-from-scratch only); this enables checkpoint-every-k-epochs +
    restart for long runs. Atomic write (tmp + rename).

    ``callback_key`` is the separate PRNG chain driving host-side epoch-end
    callbacks (the outputscale renormalization probes of
    ``manifold_informed_train`` with ``update_norm`` set); checkpointing it
    makes resumed runs reproduce the uninterrupted trajectory exactly even
    when the callback consumes randomness."""
    import pickle

    import jax

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "epoch": int(epoch),
        "lr": float(lr),
        "sched_state": jax.tree.map(np.asarray, sched_state),
        "key": np.asarray(key),
        "callback_key": None if callback_key is None else np.asarray(callback_key),
    }
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    tmp.replace(path)


def load_training_state(path):
    """Returns the dict saved by ``save_training_state`` (arrays as jnp), or
    None when the file does not exist."""
    import pickle

    import jax

    path = pathlib.Path(path)
    if not path.exists():
        return None
    with open(path, "rb") as f:
        state = pickle.load(f)
    return jax.tree.map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, state
    )


def array_fingerprint(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        a = np.asarray(a)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def save_graph_cache(graph, cache_dir, fingerprint: str):
    """Cache the one-time graph build (edge list + ELL layout)."""
    cache_dir = pathlib.Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        cache_dir / f"graph_{fingerprint}.npz",
        rows=np.asarray(graph.rows),
        cols=np.asarray(graph.cols),
        sqdist=np.asarray(graph.sqdist),
        ell_edge=np.asarray(graph.ell_edge),
        ell_col=np.asarray(graph.ell_col),
        ell_mask=np.asarray(graph.ell_mask),
        meta=np.asarray(
            json.dumps({"num_nodes": graph.num_nodes, "max_degree": graph.max_degree})
        ),
    )


def load_graph_cache(cache_dir, fingerprint: str):
    from ..ops.graph import SparseGraph

    path = pathlib.Path(cache_dir) / f"graph_{fingerprint}.npz"
    if not path.exists():
        return None
    d = np.load(path)
    meta = json.loads(str(d["meta"]))
    return SparseGraph(
        rows=jnp.asarray(d["rows"]),
        cols=jnp.asarray(d["cols"]),
        sqdist=jnp.asarray(d["sqdist"]),
        mask=jnp.ones(d["rows"].shape[0], jnp.float32),
        ell_edge=jnp.asarray(d["ell_edge"]),
        ell_col=jnp.asarray(d["ell_col"]),
        ell_mask=jnp.asarray(d["ell_mask"]),
        num_nodes=meta["num_nodes"],
        max_degree=meta["max_degree"],
    )
