"""OpenAI-compatible embedding backend (reference: embedding_model/OpenAI.py).

Works against api.openai.com, Azure, or any OpenAI-compatible local server
(``embedding_base_url``). Import of the ``openai`` package is deferred so the
framework loads without it.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from .base import BaseEmbeddingModel


class OpenAIEmbeddingModel(BaseEmbeddingModel):
    def __init__(self, global_config=None):
        super().__init__(global_config)
        from openai import AzureOpenAI, OpenAI  # deferred import

        cfg = self.global_config
        if cfg.azure_embedding_endpoint:
            self.client = AzureOpenAI(
                azure_endpoint=cfg.azure_embedding_endpoint,
                api_version=os.environ.get("AZURE_OPENAI_API_VERSION", "2024-10-21"),
                api_key=os.environ.get("AZURE_OPENAI_API_KEY", "EMPTY"),
            )
        else:
            base_url = cfg.embedding_base_url
            api_key = os.environ.get("OPENAI_API_KEY")
            if api_key is None and base_url and "localhost" in base_url:
                api_key = "EMPTY"
            self.client = OpenAI(base_url=base_url, api_key=api_key)
        self.model = cfg.embedding_model_name.replace("openai/", "", 1)

    def format_with_instruction(self, text: str, instruction: str) -> str:
        # OpenAI embedding endpoints are symmetric; instructions are dropped
        # (same behavior as the reference OpenAI embedder).
        return text

    def _encode_batch(self, texts: List[str]) -> np.ndarray:
        # The API rejects empty strings; substitute a single space.
        texts = [t if t.strip() else " " for t in texts]
        resp = self.client.embeddings.create(model=self.model, input=texts)
        return np.asarray([d.embedding for d in resp.data], dtype=np.float32)
