"""End-to-end rag_qa with pinned EM/F1 through the reference-format
replay cache — no live LLM anywhere (VERDICT r3 #7).

The committed fixture ``tests/fixtures/replay_sample_cache.sqlite`` holds
every LLM response (OpenIE NER + triple extraction, recognition-memory
filter, QA) for the sample dataset in the REFERENCE's SQLite cache schema
and key derivation (reference llm/openai_gpt.py:44-75). The test drives
the real ``CacheOpenAILLM`` provider against a dead loopback endpoint: a
single replay miss would surface as a connection error, so passing proves
the full pipeline reproduces the recorded run bit-for-bit — the
checkpoint/resume property SURVEY §5 requires for parity evals.

Regenerate the fixture with ``python scripts/make_replay_fixture.py``
(it prints the EM/F1 values pinned here).
"""

import importlib.util
import json
import os
import sqlite3
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(HERE, "tests", "fixtures", "replay_sample_cache.sqlite")


@pytest.fixture(scope="module")
def fixture_mod():
    spec = importlib.util.spec_from_file_location(
        "make_replay_fixture", os.path.join(HERE, "scripts", "make_replay_fixture.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["make_replay_fixture"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_fixture_uses_reference_schema_and_keys():
    """The fixture must be byte-compatible with the reference cache format:
    same table/columns, and keys reproducible from (messages, model, seed,
    temperature) via the reference derivation."""
    from hipporag_tpu.llm.replay_cache import ReferenceReplayCache

    conn = sqlite3.connect(f"file:{FIXTURE}?mode=ro", uri=True)
    cols = [r[1] for r in conn.execute("PRAGMA table_info(cache)")]
    assert cols == ["key", "message", "metadata"]
    n = conn.execute("SELECT COUNT(*) FROM cache").fetchone()[0]
    assert n >= 20  # OpenIE (NER+RE per chunk) + filter + QA for 3 queries
    # every key is a sha256 hex digest; metadata is JSON
    for key, _msg, meta in conn.execute("SELECT * FROM cache"):
        assert len(key) == 64 and all(c in "0123456789abcdef" for c in key)
        json.loads(meta)
    conn.close()
    # a lookup through the adapter with a wrong temperature must miss
    # (the key binds the generation parameters, reference parity)
    rc = ReferenceReplayCache(FIXTURE)
    assert rc.get([{"role": "user", "content": "nope"}], "gpt-4o-mini", None, 0.0) is None


def test_rag_qa_pinned_em_f1_replay_only(fixture_mod, tmp_path):
    """index -> retrieve -> filter -> QA with every LLM response replayed:
    exact pinned EM/F1, zero live inference."""
    kwargs = dict(fixture_mod.CONFIG_KWARGS, llm_replay_cache_path=FIXTURE)
    em, f1, rag = fixture_mod.run_pipeline(kwargs, str(tmp_path / "replay"))
    assert em == pytest.approx(fixture_mod.EXPECTED_EM, abs=1e-4)
    assert f1 == pytest.approx(fixture_mod.EXPECTED_F1, abs=1e-4)
    # the provider is the real OpenAI-compatible client, not a mock
    from hipporag_tpu.llm.openai_llm import CacheOpenAILLM

    assert isinstance(rag.llm, CacheOpenAILLM)
    assert rag.llm.replay_cache is not None


def test_replay_miss_fails_fast_not_silently(fixture_mod, tmp_path):
    """A query the fixture never saw must ERROR (dead endpoint), not
    hallucinate — replay evals fail loudly on coverage gaps."""
    kwargs = dict(
        fixture_mod.CONFIG_KWARGS,
        llm_replay_cache_path=FIXTURE,
        max_retry_attempts=1,
    )
    em, f1, rag = fixture_mod.run_pipeline(kwargs, str(tmp_path / "replay2"))
    with pytest.raises(Exception):
        rag.rag_qa(queries=["Entirely novel question the fixture lacks?"])


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"
    ),
    reason="2wiki corpus unavailable",
)
def test_rag_qa_pinned_em_f1_replay_only_2wiki150(fixture_mod, tmp_path):
    """Corpus-scale replay: 150 REAL 2WikiMultihopQA passages, 12
    synthesized 2-hop queries, several hundred replayed responses
    (OpenIE NER+RE per chunk, filter, QA) — exact pinned EM/F1 with a
    dead endpoint."""
    fixture = os.path.join(
        HERE, "tests", "fixtures", "replay_2wiki150_cache.sqlite"
    )
    kwargs = dict(
        fixture_mod.TWIKI_CONFIG_KWARGS, llm_replay_cache_path=fixture
    )
    em, f1, rag = fixture_mod.run_twiki_pipeline(kwargs, str(tmp_path / "tw"))
    assert em == pytest.approx(fixture_mod.TWIKI_EXPECTED_EM, abs=1e-4)
    assert f1 == pytest.approx(fixture_mod.TWIKI_EXPECTED_F1, abs=1e-4)
    # the fixture really is corpus-scale: hundreds of distinct responses
    conn = sqlite3.connect(f"file:{fixture}?mode=ro", uri=True)
    n = conn.execute("SELECT COUNT(*) FROM cache").fetchone()[0]
    conn.close()
    assert n >= 250


def test_ircot_pinned_em_f1_replay_only(fixture_mod, tmp_path):
    """Multi-step IRCoT (reason step -> follow-up retrieval -> reason step
    -> rag_qa epilogue) with every LLM response replayed from the
    committed reference-format fixture against a dead endpoint: exact
    pinned EM/F1, and the recorded branch structure reproduces — one
    query early-exits at step 1, the others emit an intermediate thought
    and answer at step 2 (ref HippoRAG.py:509-558)."""
    fixture = os.path.join(HERE, "tests", "fixtures", "replay_ircot_cache.sqlite")
    kwargs = dict(fixture_mod.IRCOT_CONFIG_KWARGS, llm_replay_cache_path=fixture)
    em, f1, sols, rag = fixture_mod.run_ircot_pipeline(kwargs, str(tmp_path / "ir"))
    assert em == pytest.approx(fixture_mod.IRCOT_EXPECTED_EM, abs=1e-4)
    assert f1 == pytest.approx(fixture_mod.IRCOT_EXPECTED_F1, abs=1e-4)
    counts = sorted(len(s.thoughts or []) for s in sols)
    assert counts == [1, 2, 2], counts  # early exit + two follow-up rounds
    # every final thought carries the termination marker
    for s in sols:
        assert "So the answer is:" in s.thoughts[-1]
    from hipporag_tpu.llm.openai_llm import CacheOpenAILLM

    assert isinstance(rag.llm, CacheOpenAILLM)
