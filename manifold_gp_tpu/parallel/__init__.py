from .mesh import (
    ShardingContext,
    init_distributed,
    active_context,
    constrain_nodes,
    constrain_probes,
    make_mesh,
    use_mesh,
)
from .spmv import sharded_adjacency_matvec, shard_graph_rows

__all__ = [
    "ShardingContext",
    "init_distributed",
    "active_context",
    "constrain_nodes",
    "constrain_probes",
    "make_mesh",
    "use_mesh",
    "sharded_adjacency_matvec",
    "shard_graph_rows",
]
