"""Device mesh + sharding context.

The reference has no distributed execution at all (SURVEY §2.3: no
torch.distributed / NCCL / MPI anywhere). This module is the TPU-native
parallelism layer designed around XLA's GSPMD model:

  * one 1-D logical mesh with two roles for its axis — row-sharding the
    graph/node dimension N (the "sequence parallel" analogue for GP graphs)
    and sharding the probe/RHS batch dimension P of CG/SLQ (embarrassingly
    parallel "particle" axis);
  * the numerical code stays sharding-agnostic: a dynamically-scoped
    ``ShardingContext`` lets the engine drop ``with_sharding_constraint``
    hints where layouts matter (probe batches, dense row blocks), and GSPMD
    inserts the ICI collectives (psum for CG dot products, all-gather for
    SpMV column access);
  * an explicit ``shard_map`` SpMV for the large-N row-sharded path lives in
    parallel.spmv.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code runs over DCN+ICI.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NODE_AXIS = "nodes"


def init_distributed(**kwargs) -> int:
    """Multi-host rendezvous (DCN). Call once per process before make_mesh;
    no-op when already initialized or single-process. Returns process count."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process env
    return jax.process_count()


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the node/probe axis."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (NODE_AXIS,))


@dataclasses.dataclass(frozen=True)
class ShardingContext:
    mesh: Mesh

    def node_sharding(self, ndim: int = 1):
        spec = [NODE_AXIS] + [None] * (ndim - 1)
        return NamedSharding(self.mesh, P(*spec))

    def probe_sharding(self):
        # [N, P] arrays sharded along the probe axis.
        return NamedSharding(self.mesh, P(None, NODE_AXIS))


_ACTIVE: list[ShardingContext] = []


def active_context() -> Optional[ShardingContext]:
    return _ACTIVE[-1] if _ACTIVE else None


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Activate GSPMD sharding hints for all engine code in scope."""
    ctx = ShardingContext(mesh)
    _ACTIVE.append(ctx)
    try:
        yield ctx
    finally:
        _ACTIVE.pop()


def _divisible(n: int, mesh: Mesh) -> bool:
    return n % mesh.devices.size == 0


def constrain_nodes(x):
    """Hint: shard the leading (node) dimension across the mesh."""
    ctx = active_context()
    if ctx is None or not _divisible(x.shape[0], ctx.mesh):
        return x
    return jax.lax.with_sharding_constraint(x, ctx.node_sharding(x.ndim))


def constrain_probes(x):
    """Hint: shard the trailing (probe/RHS batch) dimension across the mesh."""
    ctx = active_context()
    if ctx is None or x.ndim < 2 or not _divisible(x.shape[1], ctx.mesh):
        return x
    return jax.lax.with_sharding_constraint(x, ctx.probe_sharding())
