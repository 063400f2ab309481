from .retrieval import RetrievalIndex, graph_search_batch, rank_documents

__all__ = ["RetrievalIndex", "graph_search_batch", "rank_documents"]
