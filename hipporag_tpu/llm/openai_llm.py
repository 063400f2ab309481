"""OpenAI-compatible chat LLM with durable response cache and retries.

Behavioral parity with the reference's default provider
(llm/openai_gpt.py:26-195): responses cached in SQLite keyed by
(messages, model, seed, temperature); retry with backoff on transient
errors; metadata carries prompt/completion tokens and finish_reason.
Azure endpoints are selected via ``config.azure_endpoint``.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Tuple

from ..storage.kv_cache import SqliteKVCache, hash_key
from ..utils.logging import get_logger
from .base import BaseLLM, TextChatMessage

logger = get_logger(__name__)


class CacheOpenAILLM(BaseLLM):
    def __init__(self, global_config=None, cache_dir: str = None, cache_filename: str = None):
        super().__init__(global_config)
        cfg = self.global_config
        cache_dir = cache_dir or os.path.join(cfg.save_dir, "llm_cache")
        cache_filename = cache_filename or f"{cfg.llm_name.replace('/', '_')}_cache.sqlite"
        self.cache = SqliteKVCache(os.path.join(cache_dir, cache_filename), table="llm")
        self.max_retries = cfg.max_retry_attempts

        from openai import AzureOpenAI, OpenAI  # deferred import

        if cfg.azure_endpoint:
            self.client = AzureOpenAI(
                azure_endpoint=cfg.azure_endpoint,
                api_version=os.environ.get("AZURE_OPENAI_API_VERSION", "2024-10-21"),
                api_key=os.environ.get("AZURE_OPENAI_API_KEY", "EMPTY"),
            )
        else:
            base_url = cfg.llm_base_url
            api_key = os.environ.get("OPENAI_API_KEY")
            if api_key is None and base_url and ("localhost" in base_url or "127.0.0.1" in base_url):
                api_key = "EMPTY"
            self.client = OpenAI(base_url=base_url, api_key=api_key)

    @classmethod
    def from_experiment_config(cls, global_config):
        return cls(global_config)

    def _cache_key(self, messages, gen_kwargs) -> str:
        cfg = self.global_config
        return hash_key("llm", self.llm_name, cfg.seed, cfg.temperature, messages, gen_kwargs)

    def infer(
        self, messages: List[TextChatMessage], **kwargs
    ) -> Tuple[str, Dict[str, Any], bool]:
        cfg = self.global_config
        gen_kwargs = {
            "max_completion_tokens": kwargs.pop("max_completion_tokens", cfg.max_new_tokens),
            "n": cfg.num_gen_choices,
            "seed": cfg.seed,
            "temperature": cfg.temperature,
        }
        model = kwargs.pop("model", self.llm_name)
        if kwargs.get("response_format") is not None or cfg.response_format is not None:
            gen_kwargs["response_format"] = kwargs.pop("response_format", cfg.response_format)
        kwargs.pop("response_format", None)

        key = self._cache_key(messages, gen_kwargs)
        hit = self.cache.get(key)
        if hit is not None:
            return hit[0], hit[1], True

        last_err = None
        for attempt in range(self.max_retries):
            try:
                resp = self.client.chat.completions.create(
                    model=model, messages=messages, **gen_kwargs
                )
                content = resp.choices[0].message.content or ""
                metadata = {
                    "prompt_tokens": getattr(resp.usage, "prompt_tokens", None),
                    "completion_tokens": getattr(resp.usage, "completion_tokens", None),
                    "finish_reason": resp.choices[0].finish_reason,
                }
                self.cache.put(key, content, metadata)
                return content, metadata, False
            except Exception as e:  # noqa: BLE001 — provider errors are opaque
                last_err = e
                wait = min(2**attempt, 30)
                logger.warning("LLM call failed (attempt %d): %s; retrying in %ss", attempt + 1, e, wait)
                time.sleep(wait)
        raise RuntimeError(f"LLM inference failed after {self.max_retries} attempts: {last_err}")
