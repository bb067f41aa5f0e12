"""Debug helpers (reference ``utils/torch_utils.py:19-35``: grad toggles and
the live-tensor memory dump). In a functional JAX codebase the grad-toggle
equivalent is ``jax.lax.stop_gradient`` / param filtering, so only the
observability pieces live here."""

from __future__ import annotations

import jax
import numpy as np


def live_arrays_report(top: int = 20) -> str:
    """Summary of live device arrays, largest first (the reference's
    ``memory_dump`` equivalent for device HBM)."""
    arrays = jax.live_arrays()
    rows = []
    total = 0
    for a in arrays:
        nbytes = int(np.prod(a.shape)) * a.dtype.itemsize if a.shape else a.dtype.itemsize
        total += nbytes
        rows.append((nbytes, a.shape, str(a.dtype), str(a.sharding)))
    rows.sort(reverse=True)
    lines = [f"{len(arrays)} live arrays, {total/2**20:.1f} MiB total"]
    for nbytes, shape, dtype, sharding in rows[:top]:
        lines.append(f"  {nbytes/2**20:8.2f} MiB  {dtype:>10} {shape} {sharding}")
    return "\n".join(lines)


def device_memory_stats() -> dict:
    """Per-device allocator stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


def check_finite(tree, name: str = "pytree") -> None:
    """Raise if any leaf contains non-finite values (NaN guard for tests and
    training debugging; pairs with jax.config.jax_debug_nans)."""
    import jax.numpy as jnp

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
