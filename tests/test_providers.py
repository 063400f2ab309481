"""Provider-layer tests: factories, HTTP clients (mocked transport),
Bedrock backends (injected fake clients), the JAX-native encoder, and
offline batch OpenIE."""

import json
import os

import numpy as np
import pytest

from hipporag_tpu.config import BaseConfig


# ----------------------------------------------------------------------
# Factory routing
# ----------------------------------------------------------------------
def test_embedding_factory_routing(tmp_path):
    from hipporag_tpu.embedding import get_embedding_model
    from hipporag_tpu.embedding.jax_encoder import JaxEncoderEmbeddingModel
    from hipporag_tpu.embedding.mock import MockEmbeddingModel

    cfg = BaseConfig(embedding_model_name="mock", save_dir=str(tmp_path))
    assert isinstance(get_embedding_model(cfg), MockEmbeddingModel)

    cfg = BaseConfig(embedding_model_name="jax/random-128x1", save_dir=str(tmp_path))
    assert isinstance(get_embedding_model(cfg), JaxEncoderEmbeddingModel)


def test_llm_factory_routing(tmp_path):
    from hipporag_tpu.llm import get_llm
    from hipporag_tpu.llm.mock import MockLLM

    cfg = BaseConfig(llm_name="mock", save_dir=str(tmp_path))
    assert isinstance(get_llm(cfg), MockLLM)


# ----------------------------------------------------------------------
# JAX-native encoder
# ----------------------------------------------------------------------
def test_jax_encoder_deterministic_and_normalized(tmp_path):
    from hipporag_tpu.embedding.jax_encoder import JaxEncoderEmbeddingModel

    cfg = BaseConfig(
        embedding_model_name="jax/random-128x2", save_dir=str(tmp_path),
        embedding_model_dtype="float32",
    )
    model = JaxEncoderEmbeddingModel(cfg)
    texts = ["Erik Hort was born in Montebello.", "A different sentence entirely."]
    a = model.batch_encode(texts, norm=True)
    b = model.batch_encode(texts, norm=True)
    assert a.shape == (2, 128)
    np.testing.assert_allclose(a, b, rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)
    # distinct inputs produce distinct embeddings
    assert np.abs(a[0] - a[1]).max() > 1e-3


def test_jax_encoder_bucket_padding_consistency(tmp_path):
    # same text must embed identically regardless of other batch members'
    # lengths (bucketed padding must not leak)
    from hipporag_tpu.embedding.jax_encoder import JaxEncoderEmbeddingModel

    cfg = BaseConfig(
        embedding_model_name="jax/random-64x1", save_dir=str(tmp_path),
        embedding_model_dtype="float32",
    )
    model = JaxEncoderEmbeddingModel(cfg)
    short = "hello world"
    long = "word " * 40
    solo = model.batch_encode([short])
    mixed = model.batch_encode([short, long])
    np.testing.assert_allclose(solo[0], mixed[0], atol=1e-5)


def test_jax_encoder_wire_compression_matches_full_mask(tmp_path):
    # encode_pretokenized ships int16 ids + row lengths (4x fewer H2D
    # bytes over the tunnel); the rebuilt on-device mask must reproduce
    # the full-mask forward exactly, and a non-monotone caller-supplied
    # mask must fall back to the uncompressed path with identical math.
    import jax.numpy as jnp

    from hipporag_tpu.embedding.jax_encoder import (
        JaxEncoderEmbeddingModel, encode_forward,
    )

    cfg = BaseConfig(
        embedding_model_name="jax/random-64x2", save_dir=str(tmp_path),
        embedding_model_dtype="float32",
    )
    model = JaxEncoderEmbeddingModel(cfg)
    ids, mask = model.pretokenize(["hello world one two", "a much longer sentence " * 3])
    assert set(np.unique(mask)) <= {0, 1}
    # wire path (monotone mask -> lengths + int16 ids)
    out_wire = np.asarray(model.encode_pretokenized(ids, mask))
    # ground truth through the uncompressed forward
    out_full = np.asarray(
        encode_forward(model.params, jnp.asarray(ids), jnp.asarray(mask),
                       model.num_heads, model.compute_dtype)
    )
    np.testing.assert_allclose(out_wire, out_full, atol=1e-6)

    # non-monotone mask: punch a hole mid-row; must still match the
    # full-mask forward (fallback path), not the lengths reconstruction
    mask2 = mask.copy()
    mask2[0, 1] = 0
    out_hole = np.asarray(model.encode_pretokenized(ids, mask2))
    out_hole_full = np.asarray(
        encode_forward(model.params, jnp.asarray(ids), jnp.asarray(mask2),
                       model.num_heads, model.compute_dtype)
    )
    np.testing.assert_allclose(out_hole, out_hole_full, atol=1e-6)
    assert np.abs(out_hole[0] - out_wire[0]).max() > 1e-6  # the hole mattered


# ----------------------------------------------------------------------
# OpenAI-compatible HTTP client (mock transport)
# ----------------------------------------------------------------------
def _chat_response(content="hi", status=200):
    import httpx

    def handler(request):
        if status != 200:
            return httpx.Response(status, text="boom")
        return httpx.Response(
            200,
            json={
                "choices": [
                    {"message": {"content": content}, "finish_reason": "stop"}
                ],
                "usage": {"prompt_tokens": 3, "completion_tokens": 2},
            },
        )

    return httpx.MockTransport(handler)


def test_cache_openai_llm_roundtrip_and_cache(tmp_path, monkeypatch):
    import httpx

    from hipporag_tpu.llm.openai_llm import CacheOpenAILLM

    monkeypatch.setenv("OPENAI_API_KEY", "test-key")
    cfg = BaseConfig(llm_name="gpt-test", save_dir=str(tmp_path))
    llm = CacheOpenAILLM(cfg, transport=_chat_response("pong"))

    msgs = [{"role": "user", "content": "ping"}]
    text, meta, hit = llm.infer(msgs)
    assert text == "pong" and hit is False
    assert meta["finish_reason"] == "stop" and meta["prompt_tokens"] == 3

    # second call served from the SQLite cache even with a dead transport
    llm2 = CacheOpenAILLM(cfg, transport=_chat_response(status=500))
    text2, _meta2, hit2 = llm2.infer(msgs)
    assert text2 == "pong" and hit2 is True


def test_reference_replay_cache(tmp_path, monkeypatch):
    """Responses recorded by a REFERENCE run (its SQLite cache format and
    sha256 key derivation, ref llm/openai_gpt.py:44-75) replay through
    CacheOpenAILLM without any network call — pinned parity evals
    (SURVEY §7 'LLM nondeterminism')."""
    import json
    import sqlite3

    from hipporag_tpu.llm.openai_llm import CacheOpenAILLM
    from hipporag_tpu.llm.replay_cache import reference_cache_key

    msgs = [
        {"role": "system", "content": "You extract entities."},
        {"role": "user", "content": "Radio City is in India."},
    ]
    ref_path = str(tmp_path / "ref_cache.sqlite")
    conn = sqlite3.connect(ref_path)
    conn.execute(
        "CREATE TABLE cache (key TEXT PRIMARY KEY, message TEXT, metadata TEXT)"
    )
    # the reference computes the key over the raw message list + model +
    # seed + temperature exactly like this
    key = reference_cache_key(msgs, "gpt-test", None, 0.0)
    conn.execute(
        "INSERT INTO cache VALUES (?, ?, ?)",
        (key, '{"named_entities": ["Radio City", "India"]}',
         json.dumps({"prompt_tokens": 11, "finish_reason": "stop"})),
    )
    conn.commit()
    conn.close()

    monkeypatch.setenv("OPENAI_API_KEY", "test-key")
    cfg = BaseConfig(
        llm_name="gpt-test", save_dir=str(tmp_path),
        llm_replay_cache_path=ref_path,
    )
    # a 500-only transport proves no network call is ever attempted
    llm = CacheOpenAILLM(cfg, transport=_chat_response(status=500))
    text, meta, hit = llm.infer(msgs)
    assert hit is True
    assert json.loads(text)["named_entities"] == ["Radio City", "India"]
    assert meta["prompt_tokens"] == 11

    # the hit was forwarded into the live cache: a second instance WITHOUT
    # the replay file still serves it
    cfg2 = BaseConfig(llm_name="gpt-test", save_dir=str(tmp_path))
    llm2 = CacheOpenAILLM(cfg2, transport=_chat_response(status=500))
    text2, _, hit2 = llm2.infer(msgs)
    assert text2 == text and hit2 is True

    # unknown request: replay misses and the transport error surfaces
    # (bounded by retries), proving the miss path still goes to the API
    cfg3 = BaseConfig(
        llm_name="gpt-test", save_dir=str(tmp_path / "other"),
        llm_replay_cache_path=ref_path, max_retry_attempts=1,
    )
    llm3 = CacheOpenAILLM(cfg3, transport=_chat_response(status=500))
    with pytest.raises(RuntimeError):
        llm3.infer([{"role": "user", "content": "something unrecorded"}])


def test_cache_openai_llm_retries_transient_errors(tmp_path, monkeypatch):
    import httpx

    from hipporag_tpu.llm.openai_llm import CacheOpenAILLM

    monkeypatch.setenv("OPENAI_API_KEY", "test-key")
    calls = {"n": 0}

    def flaky(request):
        calls["n"] += 1
        if calls["n"] < 3:
            return httpx.Response(429, text="rate limited")
        return httpx.Response(
            200,
            json={
                "choices": [{"message": {"content": "ok"}, "finish_reason": "stop"}],
                "usage": {},
            },
        )

    cfg = BaseConfig(llm_name="gpt-test", save_dir=str(tmp_path))
    llm = CacheOpenAILLM(cfg, transport=httpx.MockTransport(flaky))
    import hipporag_tpu.llm.openai_llm as mod

    # no real sleeping in tests
    orig_sleep = mod.time.sleep
    mod.time.sleep = lambda s: None
    try:
        text, _, _ = llm.infer([{"role": "user", "content": "q"}])
    finally:
        mod.time.sleep = orig_sleep
    assert text == "ok" and calls["n"] == 3


# ----------------------------------------------------------------------
# Bedrock backends with injected fakes
# ----------------------------------------------------------------------
class FakeBedrockClient:
    def __init__(self):
        self.calls = []

    def converse(self, **kwargs):
        self.calls.append(kwargs)
        return {
            "output": {"message": {"content": [{"text": "bedrock says hi"}]}},
            "usage": {"inputTokens": 5, "outputTokens": 4},
            "stopReason": "end_turn",
        }


def test_bedrock_llm_converse_and_cache(tmp_path):
    from hipporag_tpu.llm.bedrock_llm import BedrockLLM

    cfg = BaseConfig(llm_name="bedrock/anthropic.claude-x", save_dir=str(tmp_path))
    fake = FakeBedrockClient()
    llm = BedrockLLM(cfg, client=fake)
    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hello"},
    ]
    text, meta, hit = llm.infer(msgs)
    assert text == "bedrock says hi" and not hit
    assert fake.calls[0]["system"] == [{"text": "be brief"}]
    assert fake.calls[0]["messages"][0]["role"] == "user"
    # cached second time
    _, _, hit2 = llm.infer(msgs)
    assert hit2 and len(fake.calls) == 1


class FakeCohereClient:
    def __init__(self):
        self.bodies = []

    def invoke_model(self, modelId, body, contentType):
        self.bodies.append(json.loads(body))
        n = len(self.bodies[-1]["texts"])
        import io

        payload = json.dumps({"embeddings": [[0.1] * 4] * n}).encode()
        return {"body": io.BytesIO(payload)}


def test_cohere_embedder_input_type_switch(tmp_path):
    from hipporag_tpu.embedding.cohere_embed import CohereEmbeddingModel

    cfg = BaseConfig(
        embedding_model_name="bedrock/cohere.embed-english-v3", save_dir=str(tmp_path)
    )
    fake = FakeCohereClient()
    emb = CohereEmbeddingModel(cfg, client=fake)
    emb.batch_encode(["a doc"])  # no instruction -> document
    emb.batch_encode(["a query"], instruction="find facts")  # query
    assert fake.bodies[0]["input_type"] == "search_document"
    assert fake.bodies[1]["input_type"] == "search_query"


# ----------------------------------------------------------------------
# Offline batch OpenIE over the deterministic mock LLM
# ----------------------------------------------------------------------
def test_offline_openie_two_pass(tmp_path):
    from hipporag_tpu.llm.mock import MockLLM
    from hipporag_tpu.openie.openie_offline import OfflineBatchOpenIE

    cfg = BaseConfig(llm_name="mock", save_dir=str(tmp_path))
    ie = OfflineBatchOpenIE(MockLLM(cfg))
    chunks = {
        "c1": {"content": "Erik Hort was born in Montebello."},
        "c2": {"content": "Montebello is in Rockland County."},
    }
    ner, triples = ie.batch_openie(chunks)
    assert set(ner) == {"c1", "c2"} and set(triples) == {"c1", "c2"}
    assert any("Erik Hort" in e for e in ner["c1"].unique_entities)
    assert all(len(t) == 3 for t in triples["c2"].triples)


# ----------------------------------------------------------------------
# Optional external vector stores: constructor gating
# ----------------------------------------------------------------------
@pytest.mark.parametrize("store_type,module", [
    ("qdrant", "qdrant_client"),
    ("chroma", "chromadb"),
    ("milvus", "pymilvus"),
])
def test_external_store_gating(tmp_path, store_type, module):
    import importlib.util

    from hipporag_tpu.embedding.mock import MockEmbeddingModel
    from hipporag_tpu.storage.embedding_store import get_embedding_store

    cfg = BaseConfig(vector_store_type=store_type, save_dir=str(tmp_path))
    model = MockEmbeddingModel(cfg)
    if importlib.util.find_spec(module) is None:
        with pytest.raises(ImportError):
            get_embedding_store(model, str(tmp_path), 8, "chunk", cfg)
    else:  # pragma: no cover - exercised only when optional deps installed
        store = get_embedding_store(model, str(tmp_path), 8, "chunk", cfg)
        store.insert_strings(["alpha", "beta"])
        assert len(store.get_all_ids()) == 2
        store.close()


def test_bedrock_mantle_responses_api(tmp_path, monkeypatch):
    import httpx

    from hipporag_tpu.llm.bedrock_mantle import BedrockMantleLLM

    monkeypatch.setenv("AWS_BEARER_TOKEN_BEDROCK", "test-bearer")
    seen = {}

    def handler(request):
        seen["auth"] = request.headers.get("Authorization")
        seen["url"] = str(request.url)
        return httpx.Response(200, json={
            "status": "completed",
            "output": [{"content": [{"type": "output_text", "text": "mantle says hi"}]}],
            "usage": {"input_tokens": 4, "output_tokens": 3},
        })

    cfg = BaseConfig(llm_name="bedrock-mantle/some-model", save_dir=str(tmp_path))
    llm = BedrockMantleLLM(cfg, transport=httpx.MockTransport(handler))
    text, meta, hit = llm.infer([{"role": "user", "content": "hello"}])
    assert text == "mantle says hi" and not hit
    assert seen["auth"] == "Bearer test-bearer"
    assert seen["url"].endswith("/responses")
    assert meta["prompt_tokens"] == 4
    # cache hit second time
    _, _, hit2 = llm.infer([{"role": "user", "content": "hello"}])
    assert hit2


def test_bedrock_mantle_auth_mode_validation(tmp_path, monkeypatch):
    # reference parity (bedrock_mantle.py:53-64): aws_credentials mode
    # requires bedrock_region; unknown modes are rejected outright
    from hipporag_tpu.llm.bedrock_mantle import BedrockMantleLLM

    monkeypatch.setenv("AWS_BEARER_TOKEN_BEDROCK", "tok")
    with pytest.raises(ValueError, match="bedrock_region is required"):
        BedrockMantleLLM(BaseConfig(
            llm_name="bedrock-mantle/m", save_dir=str(tmp_path),
            bedrock_mantle_auth="aws_credentials",
        ))
    with pytest.raises(ValueError, match="Unsupported Bedrock Mantle auth"):
        BedrockMantleLLM(BaseConfig(
            llm_name="bedrock-mantle/m", save_dir=str(tmp_path),
            bedrock_mantle_auth="oauth",
        ))
    # api_key mode without the bearer env (and no injected transport) raises
    monkeypatch.delenv("AWS_BEARER_TOKEN_BEDROCK")
    with pytest.raises(ValueError, match="AWS_BEARER_TOKEN_BEDROCK"):
        BedrockMantleLLM(BaseConfig(
            llm_name="bedrock-mantle/m", save_dir=str(tmp_path / "b"),
        ))
    # region comes from config when set
    monkeypatch.setenv("AWS_BEARER_TOKEN_BEDROCK", "tok")
    llm = BedrockMantleLLM(BaseConfig(
        llm_name="bedrock-mantle/m", save_dir=str(tmp_path / "c"),
        bedrock_region="eu-west-1",
    ))
    assert llm.region == "eu-west-1"
    assert "eu-west-1" in llm.base_url


def test_azure_chat_url_and_header(tmp_path, monkeypatch):
    import httpx

    from hipporag_tpu.llm.openai_llm import OpenAIChatClient

    monkeypatch.setenv("AZURE_OPENAI_API_KEY", "azkey")
    seen = {}

    def handler(request):
        seen["url"] = str(request.url)
        seen["key"] = request.headers.get("api-key")
        return httpx.Response(200, json={
            "choices": [{"message": {"content": "ok"}, "finish_reason": "stop"}],
            "usage": {},
        })

    client = OpenAIChatClient(
        azure_endpoint="https://res.openai.azure.com",
        transport=httpx.MockTransport(handler),
    )
    client.chat("mydeploy", [{"role": "user", "content": "x"}])
    assert "/openai/deployments/mydeploy/chat/completions" in seen["url"]
    assert "api-version=" in seen["url"]
    assert seen["key"] == "azkey"


def test_missing_key_local_endpoints_allowed(monkeypatch):
    """Auth-less self-hosted endpoints (loopback, RFC1918 LAN, .local) get
    the EMPTY-key convention; missing keys for public endpoints fail fast
    with the EMPTY remedy in the message (review r2)."""
    import pytest as _pytest

    from hipporag_tpu.llm.openai_llm import OpenAIChatClient, _is_local_endpoint

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    for url in (
        "http://localhost:8000/v1",
        "http://127.0.0.1:6578/v1",
        "http://[::1]:8000/v1",
        "http://192.168.1.5:8000/v1",
        "http://10.2.3.4:8000/v1",
        "http://llmbox.local:8000/v1",
    ):
        assert _is_local_endpoint(url), url
        OpenAIChatClient(base_url=url)  # must not raise
    for url in ("https://api.openai.com/v1", "https://llm.example.com/v1"):
        assert not _is_local_endpoint(url), url
        with _pytest.raises(ValueError, match="EMPTY"):
            OpenAIChatClient(base_url=url)


def test_openai_4xx_not_retried(tmp_path, monkeypatch):
    import httpx
    import pytest as _pytest

    from hipporag_tpu.llm.openai_llm import CacheOpenAILLM

    monkeypatch.setenv("OPENAI_API_KEY", "bad")
    calls = {"n": 0}

    def handler(request):
        calls["n"] += 1
        return httpx.Response(401, text="invalid key")

    cfg = BaseConfig(llm_name="gpt-test", save_dir=str(tmp_path))
    llm = CacheOpenAILLM(cfg, transport=httpx.MockTransport(handler))
    with _pytest.raises(httpx.HTTPStatusError):
        llm.infer([{"role": "user", "content": "q"}])
    assert calls["n"] == 1  # deterministic error: exactly one attempt


def test_jax_encoder_multi_device_batch_sharding(tmp_path):
    import jax

    from hipporag_tpu.embedding.jax_encoder import JaxEncoderEmbeddingModel

    n = len(jax.devices())
    cfg = BaseConfig(
        embedding_model_name="jax/random-64x1", save_dir=str(tmp_path),
        embedding_model_dtype="float32", mesh_shape=(1, n),
    )
    sharded = JaxEncoderEmbeddingModel(cfg)
    assert sharded._batch_sharding is not None
    cfg1 = BaseConfig(
        embedding_model_name="jax/random-64x1", save_dir=str(tmp_path),
        embedding_model_dtype="float32",
    )
    single = JaxEncoderEmbeddingModel(cfg1)
    texts = [f"sentence number {i} about topic {i%3}" for i in range(11)]  # odd count
    a = sharded.batch_encode(texts, norm=True)
    b = single.batch_encode(texts, norm=True)
    assert a.shape == b.shape == (11, 64)
    np.testing.assert_allclose(a, b, atol=1e-5)


# ----------------------------------------------------------------------
# OpenAI-compatible embedding REST client (httpx, stubbed transport)
# ----------------------------------------------------------------------
def _openai_embed_transport(record):
    import httpx

    def handler(request):
        body = json.loads(request.content)
        record.append((str(request.url), dict(request.headers), body))
        texts = body["input"]
        # return embeddings deliberately OUT of order: the client must
        # reassemble by the API's index field
        data = [
            {"index": i, "embedding": [float(i + 1)] * 4}
            for i in range(len(texts))
        ][::-1]
        return httpx.Response(200, json={"data": data})

    return httpx.MockTransport(handler)


def test_openai_embedder_contract(tmp_path, monkeypatch):
    import httpx

    from hipporag_tpu.embedding.openai_embed import OpenAIEmbeddingModel

    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    cfg = BaseConfig(
        embedding_model_name="openai/text-embedding-3-small",
        embedding_return_as_normalized=False,
        save_dir=str(tmp_path),
    )
    emb = OpenAIEmbeddingModel(cfg)
    record = []
    emb._client = httpx.Client(
        transport=_openai_embed_transport(record),
        headers=emb._client.headers,
    )
    out = emb.batch_encode(["alpha", "", "gamma"])
    url, headers, body = record[0]
    assert url.endswith("/embeddings")
    assert headers["authorization"] == "Bearer sk-test"
    assert body["model"] == "text-embedding-3-small"
    # empty strings are substituted (the API rejects them)
    assert body["input"][1] == " "
    # out-of-order response data reassembled by index
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[0], 1.0)
    np.testing.assert_allclose(out[2], 3.0)
    # instructions are dropped (symmetric endpoint, reference parity)
    assert emb.format_with_instruction("text", "instr") == "text"


def test_openai_embedder_requires_key_for_remote(tmp_path, monkeypatch):
    from hipporag_tpu.embedding.openai_embed import OpenAIEmbeddingModel

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    cfg = BaseConfig(
        embedding_model_name="openai/text-embedding-3-small",
        save_dir=str(tmp_path),
    )
    with pytest.raises(ValueError, match="OPENAI_API_KEY"):
        OpenAIEmbeddingModel(cfg)
    # auth-less local endpoints get the EMPTY-key convention instead
    cfg2 = BaseConfig(
        embedding_model_name="openai/bge-m3",
        embedding_base_url="http://localhost:8001/v1",
        save_dir=str(tmp_path),
    )
    emb = OpenAIEmbeddingModel(cfg2)
    assert emb._client.headers["authorization"] == "Bearer EMPTY"


def test_azure_embedder_url_and_auth(tmp_path, monkeypatch):
    import httpx

    from hipporag_tpu.embedding.openai_embed import OpenAIEmbeddingModel

    monkeypatch.setenv("AZURE_OPENAI_API_KEY", "az-key")
    cfg = BaseConfig(
        embedding_model_name="openai/text-embedding-3-large",
        azure_embedding_endpoint="https://myres.openai.azure.com",
        save_dir=str(tmp_path),
    )
    emb = OpenAIEmbeddingModel(cfg)
    record = []
    emb._client = httpx.Client(
        transport=_openai_embed_transport(record),
        headers=emb._client.headers,
    )
    emb.batch_encode(["doc"])
    url, headers, body = record[0]
    assert "/openai/deployments/text-embedding-3-large/embeddings" in url
    assert "api-version=" in url
    assert headers["api-key"] == "az-key"
    assert "model" not in body  # azure names the deployment in the URL


# ----------------------------------------------------------------------
# Local HF adapters EXECUTED offline: a tiny randomly-initialized GPT-2
# saved to disk (byte-level vocab, no merges — no network needed) drives
# the real load/generate/encode paths that are otherwise only stub-tested
# in this environment.
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_hf_model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tinylm"))
    from transformers import GPT2Config, GPT2LMHeadModel, GPT2Tokenizer
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    chars = list(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = GPT2Tokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
    )
    tok.pad_token = "<|endoftext|>"
    tok.save_pretrained(d)
    GPT2LMHeadModel(
        GPT2Config(
            vocab_size=len(vocab), n_embd=32, n_layer=2, n_head=2,
            # real prompts (OpenIE few-shot demos) run thousands of byte
            # tokens; the position table must cover them
            n_positions=16384,
        )
    ).save_pretrained(d)
    return d


def test_transformers_llm_executes_and_caches(tmp_path, tiny_hf_model_dir):
    from hipporag_tpu.llm import get_llm
    from hipporag_tpu.llm.transformers_llm import TransformersLLM

    cfg = BaseConfig(
        llm_name=f"Transformers/{tiny_hf_model_dir}",
        save_dir=str(tmp_path),
        temperature=0.0,
        max_new_tokens=4,
    )
    llm = get_llm(cfg)
    assert isinstance(llm, TransformersLLM)
    msgs = [{"role": "user", "content": "hello"}]
    text, meta, cached = llm.infer(msgs)
    assert isinstance(text, str) and not cached
    assert meta["completion_tokens"] <= 4
    text2, _, cached2 = llm.infer(msgs)
    assert cached2 and text2 == text


def test_transformers_embedder_executes(tmp_path, tiny_hf_model_dir):
    from hipporag_tpu.embedding import get_embedding_model
    from hipporag_tpu.embedding.transformers_embed import (
        TransformersEmbeddingModel,
    )

    cfg = BaseConfig(
        embedding_model_name=f"st/{tiny_hf_model_dir}",
        save_dir=str(tmp_path),
        embedding_return_as_normalized=True,
    )
    emb = get_embedding_model(cfg)
    assert isinstance(emb, TransformersEmbeddingModel)
    out = emb.batch_encode(["alpha beta", "gamma"])
    assert out.shape == (2, 32) and out.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    assert emb.embedding_dim == 32


def test_contriever_embedder_executes(tmp_path, tiny_hf_model_dir):
    """Contriever conventions EXECUTED against the tiny local model:
    mask-weighted mean pooling over last_hidden_state (pinned against a
    manual torch derivation, ref Contriever.py:15-18), instructions
    ignored (Contriever is instruction-free), factory routing by name."""
    import shutil

    import torch

    from hipporag_tpu.embedding import get_embedding_model
    from hipporag_tpu.embedding.contriever import (
        ContrieverEmbeddingModel,
        mean_pooling,
    )

    # the factory routes on the substring; give the checkpoint such a path
    model_dir = str(tmp_path / "facebook-contriever-tiny")
    shutil.copytree(tiny_hf_model_dir, model_dir)
    cfg = BaseConfig(
        embedding_model_name=model_dir,
        save_dir=str(tmp_path),
        embedding_return_as_normalized=False,
    )
    emb = get_embedding_model(cfg)
    assert isinstance(emb, ContrieverEmbeddingModel)

    out = emb.batch_encode(["alpha beta gamma", "delta"])
    assert out.shape == (2, 32) and out.dtype == np.float32
    # instruction-free: the same text under an instruction encodes
    # identically (format_with_instruction returns the text unchanged)
    out_instr = emb.batch_encode(
        ["alpha beta gamma", "delta"], instruction="Find the passage"
    )
    np.testing.assert_array_equal(out, out_instr)

    # pooling parity vs a manual derivation on the same model
    inputs = emb._tokenizer(
        ["alpha beta gamma", "delta"], padding=True, return_tensors="pt"
    )
    with torch.no_grad():
        hidden = emb._model(**inputs).last_hidden_state
    mask = inputs["attention_mask"]
    want = (hidden * mask[..., None]).sum(1) / mask.sum(1)[..., None]
    got = mean_pooling(hidden, mask)
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-6)
    np.testing.assert_allclose(out, want.numpy(), rtol=1e-5)


def test_transformers_offline_batch_executes(tmp_path, tiny_hf_model_dir):
    """The offline batch engine's left-padded batched generate + per-row
    token accounting run against the tiny local model (the vLLM variant
    stays import-gated — not installable here)."""
    from hipporag_tpu.llm.offline import TransformersOffline

    cfg = BaseConfig(
        llm_name=f"Transformers/{tiny_hf_model_dir}",
        save_dir=str(tmp_path),
        temperature=0.0,
        max_new_tokens=4,
    )
    llm = TransformersOffline(cfg)
    out = llm.batch_infer(
        [
            [{"role": "user", "content": "one"}],
            [{"role": "user", "content": "a much longer second prompt"}],
        ]
    )
    assert len(out) == 2
    for text, meta, cached in out:
        assert isinstance(text, str) and not cached
        assert meta["completion_tokens"] <= 4
    # left padding: the short row's prompt accounting must not count pads
    assert out[0][1]["prompt_tokens"] < out[1][1]["prompt_tokens"]


def test_transformers_offline_openie_survives_garbage(tmp_path, tiny_hf_model_dir):
    """End-to-end offline OpenIE over the tiny random model: its output is
    garbage, so this pins the graceful-failure contract — JSON repair is
    attempted, invalid triples are filtered, and every chunk still gets a
    (possibly empty) NER/triple record instead of raising."""
    from hipporag_tpu.openie.openie_offline import TransformersOfflineOpenIE

    cfg = BaseConfig(
        llm_name=f"Transformers/{tiny_hf_model_dir}",
        save_dir=str(tmp_path),
        temperature=0.0,
        max_new_tokens=8,
    )
    ie = TransformersOfflineOpenIE(cfg)
    chunks = {
        "c1": {"content": "Erik Hort was born in Montebello."},
        "c2": {"content": "Montebello is in Rockland County."},
    }
    ner, triples = ie.batch_openie(chunks)
    assert set(ner) == {"c1", "c2"} and set(triples) == {"c1", "c2"}
    for cid in chunks:
        assert isinstance(ner[cid].unique_entities, list)
        assert isinstance(triples[cid].triples, list)
        assert all(len(t) == 3 for t in triples[cid].triples)
