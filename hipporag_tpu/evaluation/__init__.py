from .eval_utils import normalize_answer
from .metrics import BaseMetric, QAExactMatch, QAF1Score, RetrievalRecall

__all__ = [
    "BaseMetric",
    "QAExactMatch",
    "QAF1Score",
    "RetrievalRecall",
    "normalize_answer",
]
