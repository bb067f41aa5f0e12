from .mesh import (
    ShardingContext,
    init_distributed,
    active_context,
    constrain_nodes,
    constrain_probes,
    make_mesh,
    use_mesh,
)
from .spmv import (
    make_sharded_matern_precision_matvec,
    pad_nodes,
    sharded_adjacency_matvec,
    shard_graph_rows,
)
from .knn import build_graph_sharded, sharded_ivf_search, sharded_knn_search

__all__ = [
    "build_graph_sharded",
    "sharded_ivf_search",
    "sharded_knn_search",
    "make_sharded_matern_precision_matvec",
    "pad_nodes",
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
