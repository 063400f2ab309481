"""Executed coverage for the vLLM-offline family and the GritLM /
NV-Embed-v2 / remote-vLLM embedders.

These providers' real dependency packages (vllm, gritlm, the NV-Embed HF
checkpoint) are not installable here, so — like the remote vector stores
(test_vector_stores.py) — fake modules/clients are injected and the REAL
provider logic runs: TP sizing, guided-JSON passing, batch contracts,
instruction-wrapping conventions, eos handling, and REST parsing.

Reference behaviors pinned: llm/vllm_offline.py:28-101 (TP = local device
count, guided JSON), openie_vllm_offline.py:20-77 (two whole-corpus
passes), GritLM.py:20-96 (embed-instruction template, out-of-band
instruction), NVEmbedV2.py:16-101 (Instruct/Query wrapper + trailing eos),
VLLM.py:10-61 (OpenAI-compatible /embeddings route).
"""

import json
import sys
import types

import numpy as np
import pytest

from hipporag_tpu.config import BaseConfig


# ----------------------------------------------------------------------
# Fake vllm
# ----------------------------------------------------------------------


class _FakeRequestOutput:
    def __init__(self, text, prompt_tokens=7, completion_tokens=5):
        self.prompt_token_ids = list(range(prompt_tokens))
        out = types.SimpleNamespace(
            text=text,
            token_ids=list(range(completion_tokens)),
            finish_reason="stop",
        )
        self.outputs = [out]


def install_fake_vllm(monkeypatch, reply_fn):
    """Install a fake ``vllm`` package. ``reply_fn(prompt, call_idx) -> str``
    produces each completion text; ctor/sampling args are recorded on the
    module for assertions."""
    mod = types.ModuleType("vllm")
    sp_mod = types.ModuleType("vllm.sampling_params")
    state = {"engines": [], "generate_calls": []}

    class SamplingParams:
        def __init__(self, temperature=None, max_tokens=None):
            self.temperature = temperature
            self.max_tokens = max_tokens
            self.guided_decoding = None

    class GuidedDecodingParams:
        def __init__(self, json=None):
            self.json = json

    class LLM:
        def __init__(self, model=None, tensor_parallel_size=None,
                     max_model_len=None, seed=None):
            self.model = model
            self.tensor_parallel_size = tensor_parallel_size
            self.max_model_len = max_model_len
            self.seed = seed
            state["engines"].append(self)

        def generate(self, prompts, params):
            call_idx = len(state["generate_calls"])
            state["generate_calls"].append(
                {"prompts": list(prompts), "params": params}
            )
            return [_FakeRequestOutput(reply_fn(p, call_idx)) for p in prompts]

    mod.LLM = LLM
    mod.SamplingParams = SamplingParams
    sp_mod.GuidedDecodingParams = GuidedDecodingParams
    monkeypatch.setitem(sys.modules, "vllm", mod)
    monkeypatch.setitem(sys.modules, "vllm.sampling_params", sp_mod)
    return state


def test_vllm_offline_tp_sizing_and_guided_json(monkeypatch, tmp_path):
    state = install_fake_vllm(monkeypatch, lambda p, i: '{"answer": "ok"}')
    from hipporag_tpu.llm.offline import VLLMOffline

    cfg = BaseConfig(
        llm_name="vllm/meta-llama/Llama-3.3-70B-Instruct",
        save_dir=str(tmp_path),
        temperature=0.0,
        max_new_tokens=512,
        seed=11,
    )
    llm = VLLMOffline(cfg)

    # ctor contract (ref vllm_offline.py:39-41): model name after the
    # routing prefix, TP = local accelerator count (no CUDA here -> 1)
    eng = state["engines"][0]
    assert eng.model == "meta-llama/Llama-3.3-70B-Instruct"
    assert eng.tensor_parallel_size == 1
    assert eng.max_model_len == 4096
    assert eng.seed == 11

    schema = {"type": "object", "properties": {"answer": {"type": "string"}}}
    msgs = [
        [{"role": "system", "content": "be terse"},
         {"role": "user", "content": "hi"}],
        [{"role": "user", "content": "bye"}],
    ]
    results = llm.batch_infer(msgs, json_schema=schema)

    call = state["generate_calls"][0]
    # guided decoding carries the schema through verbatim
    assert call["params"].guided_decoding is not None
    assert call["params"].guided_decoding.json is schema
    assert call["params"].temperature == 0.0
    assert call["params"].max_tokens == 512
    # role-flattened prompts, one per message list
    assert call["prompts"][0] == "system: be terse\n\nuser: hi"
    assert call["prompts"][1] == "user: bye"
    # batch contract: (text, metadata, cache_hit)
    assert len(results) == 2
    for text, meta, hit in results:
        assert text == '{"answer": "ok"}'
        assert meta["prompt_tokens"] == 7 and meta["completion_tokens"] == 5
        assert meta["finish_reason"] == "stop"
        assert hit is False
    # infer() is the single-message view of the same path
    text, meta, hit = llm.infer([{"role": "user", "content": "x"}])
    assert text == '{"answer": "ok"}' and hit is False


def test_vllm_offline_without_schema_no_guided_decoding(monkeypatch, tmp_path):
    state = install_fake_vllm(monkeypatch, lambda p, i: "plain text")
    from hipporag_tpu.llm.offline import VLLMOffline

    llm = VLLMOffline(BaseConfig(llm_name="vllm/m", save_dir=str(tmp_path)))
    llm.batch_infer([[{"role": "user", "content": "q"}]])
    assert state["generate_calls"][0]["params"].guided_decoding is None


def test_vllm_offline_openie_two_pass(monkeypatch, tmp_path):
    """VLLMOfflineOpenIE: one whole-corpus NER batch, one whole-corpus
    triple batch, guided by the NER/TRIPLES schemas; invalid triples are
    filtered (ref openie_vllm_offline.py:20-77)."""

    def reply(prompt, call_idx):
        if call_idx == 0:  # NER pass
            if "Radio City" in prompt or "radio" in prompt.lower():
                return json.dumps({"named_entities": ["Radio City", "India"]})
            return json.dumps({"named_entities": ["Lake Veyra"]})
        # triple pass: one valid triple + one malformed (length-2) row
        return json.dumps(
            {"triples": [["Radio City", "located in", "India"], ["bad", "row"]]}
        )

    state = install_fake_vllm(monkeypatch, reply)
    from hipporag_tpu.openie.openie_offline import VLLMOfflineOpenIE

    cfg = BaseConfig(llm_name="vllm/extractor", save_dir=str(tmp_path))
    oie = VLLMOfflineOpenIE(cfg)
    chunks = {
        "c1": {"content": "Radio City is India's first private FM station."},
        "c2": {"content": "Lake Veyra freezes in winter."},
    }
    ner, triples = oie.batch_openie(chunks)

    assert len(state["generate_calls"]) == 2  # exactly two engine batches
    from hipporag_tpu.utils.llm_json import PROMPT_JSON_TEMPLATE

    p0, p1 = state["generate_calls"]
    assert p0["params"].guided_decoding.json is PROMPT_JSON_TEMPLATE["ner"]
    assert p1["params"].guided_decoding.json is PROMPT_JSON_TEMPLATE["triples"]
    # pass-2 prompts are conditioned on pass-1 entities
    assert any("Radio City" in p for p in p1["prompts"])

    assert set(ner) == {"c1", "c2"} and set(triples) == {"c1", "c2"}
    assert ner["c1"].unique_entities == ["Radio City", "India"]
    assert triples["c1"].triples == [["Radio City", "located in", "India"]]
    assert ner["c1"].metadata["prompt_tokens"] == 7


def test_vllm_offline_openie_empty_corpus(monkeypatch, tmp_path):
    state = install_fake_vllm(monkeypatch, lambda p, i: "{}")
    from hipporag_tpu.openie.openie_offline import VLLMOfflineOpenIE

    oie = VLLMOfflineOpenIE(BaseConfig(llm_name="vllm/m", save_dir=str(tmp_path)))
    ner, triples = oie.batch_openie({})
    assert ner == {} and triples == {}
    assert state["generate_calls"] == []  # no engine batch for nothing


# ----------------------------------------------------------------------
# Fake gritlm
# ----------------------------------------------------------------------


def install_fake_gritlm(monkeypatch):
    mod = types.ModuleType("gritlm")
    state = {"ctor": None, "encodes": []}

    class GritLM:
        def __init__(self, model_name, torch_dtype=None, device_map=None,
                     mode=None):
            state["ctor"] = {
                "model_name": model_name,
                "mode": mode,
            }

        def encode(self, texts, instruction=None, batch_size=None):
            state["encodes"].append(
                {"texts": list(texts), "instruction": instruction,
                 "batch_size": batch_size}
            )
            # deterministic rows so cache hits are detectable
            return np.stack(
                [np.full(8, float(len(t)), dtype=np.float32) for t in texts]
            )

    mod.GritLM = GritLM
    monkeypatch.setitem(sys.modules, "gritlm", mod)
    return state


def test_gritlm_instruction_template_and_oob_instruction(monkeypatch, tmp_path):
    state = install_fake_gritlm(monkeypatch)
    from hipporag_tpu.embedding import get_embedding_model

    cfg = BaseConfig(
        embedding_model_name="GritLM/GritLM-7B",
        save_dir=str(tmp_path),
        embedding_batch_size=4,
        embedding_return_as_normalized=False,
    )
    model = get_embedding_model(cfg)
    out = model.batch_encode(["hello", "wider text"],
                             instruction="Given a question, retrieve facts")
    assert out.shape == (2, 8)
    assert state["ctor"]["model_name"] == "GritLM/GritLM-7B"
    assert state["ctor"]["mode"] == "embedding"

    enc = state["encodes"][0]
    # instruction travels OUT-OF-BAND in GritLM's template, the text is
    # passed unchanged (ref GritLM.py gritlm_instruction)
    assert enc["instruction"] == (
        "<|user|>\nGiven a question, retrieve facts\n<|embed|>\n"
    )
    assert enc["texts"] == ["hello", "wider text"]
    assert enc["batch_size"] == 4

    # empty instruction -> bare embed header
    model.batch_encode(["doc"], instruction="")
    assert state["encodes"][1]["instruction"] == "<|embed|>\n"


def test_gritlm_cache_key_includes_instruction(monkeypatch, tmp_path):
    """Same text under two instructions must encode twice (regression for
    the out-of-band instruction cache collision fixed in r3)."""
    state = install_fake_gritlm(monkeypatch)
    from hipporag_tpu.embedding import get_embedding_model

    cfg = BaseConfig(embedding_model_name="GritLM/GritLM-7B",
                     save_dir=str(tmp_path))
    model = get_embedding_model(cfg)
    model.attach_cache(str(tmp_path / "emb.sqlite"))
    model.batch_encode(["same text"], instruction="query to fact")
    model.batch_encode(["same text"], instruction="query to passage")
    assert len(state["encodes"]) == 2  # no false cache hit across instructions
    # true cache hit: repeat of the first call encodes nothing new
    model.batch_encode(["same text"], instruction="query to fact")
    assert len(state["encodes"]) == 2


# ----------------------------------------------------------------------
# Fake NV-Embed-v2 (transformers.AutoModel is real; from_pretrained is not
# runnable without the checkpoint -> monkeypatched)
# ----------------------------------------------------------------------


def test_nvembed_eos_and_instruct_wrapper(monkeypatch, tmp_path):
    import torch

    state = {"encodes": [], "ctor": None}

    class FakeNVModel:
        tokenizer = types.SimpleNamespace(eos_token="</s>")

        def encode(self, texts, max_length=None):
            state["encodes"].append({"texts": list(texts),
                                     "max_length": max_length})
            return torch.ones((len(texts), 6), dtype=torch.float32)

    def fake_from_pretrained(name, trust_remote_code=None, device_map=None,
                             torch_dtype=None):
        state["ctor"] = {"name": name, "trust_remote_code": trust_remote_code}
        return FakeNVModel()

    import transformers

    monkeypatch.setattr(transformers.AutoModel, "from_pretrained",
                        staticmethod(fake_from_pretrained))
    from hipporag_tpu.embedding import get_embedding_model

    cfg = BaseConfig(
        embedding_model_name="nvidia/NV-Embed-v2",
        save_dir=str(tmp_path),
        embedding_max_seq_len=512,
    )
    model = get_embedding_model(cfg)
    out = model.batch_encode(["What is X?"], instruction="Answer the question")
    assert out.shape == (1, 6)
    assert state["ctor"] == {"name": "nvidia/NV-Embed-v2",
                             "trust_remote_code": True}
    enc = state["encodes"][0]
    # Instruct/Query wrapper applied in-band, then trailing eos appended
    # (ref NVEmbedV2.py:75-84)
    assert enc["texts"] == [
        "Instruct: Answer the question\nQuery: What is X?</s>"
    ]
    assert enc["max_length"] == 512
    # document encoding: no instruction -> raw text + eos
    model.batch_encode(["plain doc"])
    assert state["encodes"][1]["texts"] == ["plain doc</s>"]


# ----------------------------------------------------------------------
# Remote vLLM embedding server (REST; httpx MockTransport)
# ----------------------------------------------------------------------


def test_vllm_embed_rest_roundtrip(monkeypatch, tmp_path):
    import httpx

    seen = {}

    def handler(request):
        seen["url"] = str(request.url)
        payload = json.loads(request.content)
        seen["payload"] = payload
        # respond OUT OF ORDER to pin the index-sort
        data = [
            {"index": 1, "embedding": [1.0, 1.0, 1.0]},
            {"index": 0, "embedding": [0.0, 2.0, 0.0]},
        ]
        return httpx.Response(200, json={"data": data})

    from hipporag_tpu.embedding import get_embedding_model

    cfg = BaseConfig(
        embedding_model_name="VLLM/intfloat/e5-mistral-7b",
        embedding_base_url="http://fake-vllm:8000/v1",
        save_dir=str(tmp_path),
        embedding_return_as_normalized=False,
    )
    model = get_embedding_model(cfg)
    model._client = httpx.Client(transport=httpx.MockTransport(handler))
    out = model.batch_encode(["a", "b"])
    assert seen["url"] == "http://fake-vllm:8000/v1/embeddings"
    assert seen["payload"]["model"] == "intfloat/e5-mistral-7b"
    assert seen["payload"]["input"] == ["a", "b"]
    np.testing.assert_array_equal(
        out, np.array([[0.0, 2.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    )


def test_vllm_embed_requires_base_url(tmp_path):
    from hipporag_tpu.embedding import get_embedding_model

    with pytest.raises(ValueError, match="embedding_base_url"):
        get_embedding_model(
            BaseConfig(embedding_model_name="VLLM/m", save_dir=str(tmp_path))
        )


def test_vllm_embed_http_error_raises(monkeypatch, tmp_path):
    import httpx

    from hipporag_tpu.embedding import get_embedding_model

    cfg = BaseConfig(
        embedding_model_name="VLLM/m",
        embedding_base_url="http://fake:1",
        save_dir=str(tmp_path),
    )
    model = get_embedding_model(cfg)
    model._client = httpx.Client(
        transport=httpx.MockTransport(lambda r: httpx.Response(500, json={}))
    )
    with pytest.raises(httpx.HTTPStatusError):
        model.batch_encode(["x"])
