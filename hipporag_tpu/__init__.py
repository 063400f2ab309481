"""hipporag_tpu — a TPU-native graph-based RAG / long-term-memory framework.

Re-designed from scratch for JAX/XLA/Pallas on TPU with the capability
surface of HippoRAG 2: LLM-driven OpenIE indexing into a knowledge graph,
and retrieval via batched fact scoring → recognition-memory filtering →
batched Personalized PageRank over a device-resident graph.
"""

from .config import BaseConfig
from .utils.misc import Chunk, QuerySolution, RetrievalResult

__version__ = "0.3.0"

__all__ = [
    "BaseConfig",
    "Chunk",
    "HippoRAG",
    "QuerySolution",
    "RetrievalResult",
    "StandardRAG",
    "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import hipporag_tpu` light (no JAX init) until the
    # orchestrator is actually used.
    if name == "HippoRAG":
        from .hipporag import HippoRAG

        return HippoRAG
    if name == "StandardRAG":
        from .standard_rag import StandardRAG

        return StandardRAG
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
