"""Embedding model factory.

Name-prefix routing mirrors the reference factory
(embedding_model/__init__.py:15-30): explicit prefixes select backends,
anything else goes to the OpenAI-compatible client.
"""

from __future__ import annotations

from ..config import BaseConfig
from .base import BaseEmbeddingModel
from .mock import MockEmbeddingModel

__all__ = ["BaseEmbeddingModel", "MockEmbeddingModel", "get_embedding_model"]


def get_embedding_model(config: BaseConfig) -> BaseEmbeddingModel:
    name = config.embedding_model_name
    if name == "mock" or name.startswith("mock/"):
        return MockEmbeddingModel(config)
    if name.startswith("jax/"):
        from .jax_encoder import JaxEncoderEmbeddingModel

        return JaxEncoderEmbeddingModel(config)
    if name.startswith("Transformers/") or name.startswith("st/"):
        from .transformers_embed import TransformersEmbeddingModel

        return TransformersEmbeddingModel(config)
    from .openai_embed import OpenAIEmbeddingModel

    return OpenAIEmbeddingModel(config)
