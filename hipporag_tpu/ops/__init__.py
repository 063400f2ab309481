from .knn import retrieve_knn, streaming_topk_scores
from .pagerank import COOGraph, batched_ppr, ppr_numpy_reference
from .scoring import (
    batched_normalized_scores,
    batched_scores,
    batched_topk,
    min_max_normalize,
    score_and_topk,
)

__all__ = [
    "COOGraph",
    "batched_normalized_scores",
    "batched_ppr",
    "batched_scores",
    "batched_topk",
    "min_max_normalize",
    "ppr_numpy_reference",
    "retrieve_knn",
    "score_and_topk",
    "streaming_topk_scores",
]
