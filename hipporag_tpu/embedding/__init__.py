"""Embedding model factory.

Name routing mirrors the reference factory (embedding_model/__init__.py:15-30):
model-family substrings (NV-Embed-v2, GritLM, contriever) and explicit
prefixes select backends; anything else goes to the OpenAI-compatible
client. The TPU-native ``jax/`` prefix selects the pure-JAX encoder.
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
    if name == "hashing" or name.startswith("hashing/"):
        from .hashing import HashingNgramEmbeddingModel

        return HashingNgramEmbeddingModel(config)
    if name.startswith("jax/"):
        from .jax_encoder import JaxEncoderEmbeddingModel

        return JaxEncoderEmbeddingModel(config)
    if name.startswith("st/") or name.startswith("Transformers/"):
        from .transformers_embed import TransformersEmbeddingModel

        return TransformersEmbeddingModel(config)
    if name.startswith("VLLM/"):
        from .vllm_embed import VLLMEmbeddingModel

        return VLLMEmbeddingModel(config)
    if "NV-Embed-v2" in name:
        from .nvembed import NVEmbedV2EmbeddingModel

        return NVEmbedV2EmbeddingModel(config)
    if "GritLM" in name:
        from .gritlm_embed import GritLMEmbeddingModel

        return GritLMEmbeddingModel(config)
    if "contriever" in name.lower():
        from .contriever import ContrieverEmbeddingModel

        return ContrieverEmbeddingModel(config)
    if "cohere" in name.lower():
        from .cohere_embed import CohereEmbeddingModel

        return CohereEmbeddingModel(config)
    from .openai_embed import OpenAIEmbeddingModel

    return OpenAIEmbeddingModel(config)
