from .mesh import CORPUS_AXIS, DP_AXIS, batch_sharded, corpus_sharded, make_hybrid_mesh, make_mesh, replicated
from .sharded import (
    ShardedGraph,
    make_sharded_ppr,
    make_sharded_score_topk,
    put_sharded_graph,
    shard_graph,
)

__all__ = [
    "CORPUS_AXIS",
    "DP_AXIS",
    "ShardedGraph",
    "batch_sharded",
    "corpus_sharded",
    "make_hybrid_mesh",
    "make_mesh",
    "make_sharded_ppr",
    "make_sharded_score_topk",
    "put_sharded_graph",
    "replicated",
    "shard_graph",
]
