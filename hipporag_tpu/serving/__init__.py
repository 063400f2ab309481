"""Online serving layer: micro-batching request coalescer, a thread-safe
service facade over a HippoRAG replica, and a stdlib HTTP front-end.

TPU-native added value — the reference has no serving surface (its
``main.py`` runs one-shot batch experiments). See ``batcher.py`` for the
measured batching economics on the tunneled v5e.
"""

from .batcher import BatcherClosed, BatcherSaturated, MicroBatcher
from .service import RetrievalService

__all__ = ["BatcherClosed", "BatcherSaturated", "MicroBatcher", "RetrievalService"]
