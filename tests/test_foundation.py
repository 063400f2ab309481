"""Foundation-layer tests: utils, eval metrics, stores, prompts, mocks."""

import json
import os

import numpy as np
import pytest

from hipporag_tpu.config import BaseConfig
from hipporag_tpu.embedding.mock import MockEmbeddingModel
from hipporag_tpu.evaluation import QAExactMatch, QAF1Score, RetrievalRecall, normalize_answer
from hipporag_tpu.llm.mock import MockLLM
from hipporag_tpu.prompts import PromptTemplateManager, get_query_instruction
from hipporag_tpu.storage import ParquetEmbeddingStore, SqliteKVCache, hash_key
from hipporag_tpu.utils.llm_json import (
    extract_named_entities,
    extract_triples,
    repair_truncated_json,
)
from hipporag_tpu.utils.misc import (
    compute_mdhash_id,
    filter_invalid_triples,
    flatten_facts,
    min_max_normalize,
    text_processing,
)


def test_compute_mdhash_id():
    h = compute_mdhash_id("hello", prefix="entity-")
    assert h.startswith("entity-") and len(h) == len("entity-") + 32
    assert h == compute_mdhash_id("hello", prefix="entity-")


def test_text_processing():
    assert text_processing("Héllo, World! 42") == "h llo  world  42"
    assert text_processing(["A-B", "c.d"]) == ["a b", "c d"]


def test_min_max_normalize():
    out = min_max_normalize(np.array([1.0, 3.0, 2.0]))
    assert np.allclose(out, [0.0, 1.0, 0.5])
    assert np.allclose(min_max_normalize(np.array([2.0, 2.0])), [1.0, 1.0])


def test_filter_invalid_triples():
    triples = [["a", "b", "c"], ["a", "b"], ["a", "b", "c"], [1, 2, 3]]
    assert filter_invalid_triples(triples) == [["a", "b", "c"], ["1", "2", "3"]]


def test_flatten_facts_dedup():
    facts = flatten_facts([[("a", "r", "b")], [("a", "r", "b"), ("c", "r", "d")]])
    assert facts == [("a", "r", "b"), ("c", "r", "d")]


def test_json_repair():
    broken = '{"triples": [["a", "b", "c"], ["d", "e"'
    fixed = repair_truncated_json(broken)
    parsed = json.loads(fixed)["triples"]
    assert parsed[0] == ["a", "b", "c"]  # complete triples always survive
    # already-valid JSON passes through untouched
    ok = '{"x": [1, 2]}'
    assert repair_truncated_json(ok) == ok


def test_extract_entities_and_triples_safe():
    text = 'noise {"named_entities": ["X", "Y"]} tail'
    assert extract_named_entities(text) == ["X", "Y"]
    text2 = 'prefix {"triples": [["a","r","b"]]} suffix'
    assert extract_triples(text2) == [["a", "r", "b"]]
    # eval() injection must NOT execute
    evil = '{"named_entities": "__import__(\'os\')"}'
    assert extract_named_entities(evil) == []


def test_normalize_answer():
    assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
    assert normalize_answer("An apple") == "apple"


def test_recall_at_k():
    metric = RetrievalRecall()
    pooled, per_ex = metric.calculate_metric_scores(
        gold_docs=[["d1", "d2"]], retrieved_docs=[["d1", "x", "d2"]], k_list=[1, 2, 5]
    )
    assert pooled == {"Recall@1": 0.5, "Recall@2": 0.5, "Recall@5": 1.0}


def test_qa_metrics():
    em, _ = QAExactMatch().calculate_metric_scores([["Paris", "paris!"]], ["the Paris"])
    assert em["ExactMatch"] == 1.0
    f1, _ = QAF1Score().calculate_metric_scores([["Paris France"]], ["Paris"])
    assert 0 < f1["F1"] < 1


def test_qa_metrics_edge_cases():
    """Degenerate inputs the MRQA protocol must not crash or misscore on:
    answers that normalize to empty, unicode text, and max-over-golds."""
    # punctuation/articles-only answers normalize to "" on both sides -> EM 1
    em, _ = QAExactMatch().calculate_metric_scores([["the ..."]], ["a !!"])
    assert em["ExactMatch"] == 1.0
    # empty prediction vs real gold -> EM 0, F1 0 (no token overlap)
    em, _ = QAExactMatch().calculate_metric_scores([["Paris"]], [""])
    assert em["ExactMatch"] == 0.0
    f1, _ = QAF1Score().calculate_metric_scores([["Paris"]], [""])
    assert f1["F1"] == 0.0
    # unicode survives normalization
    em, _ = QAExactMatch().calculate_metric_scores([["Łódź"]], ["łódź"])
    assert em["ExactMatch"] == 1.0
    # max over golds: one perfect gold dominates a partial one
    f1, per = QAF1Score().calculate_metric_scores(
        [["completely different", "exact match"]], ["exact match"]
    )
    assert f1["F1"] == 1.0


def test_kv_cache(tmp_path):
    cache = SqliteKVCache(str(tmp_path / "c.sqlite"))
    key = hash_key("a", {"b": 1})
    assert cache.get(key) is None
    cache.put(key, "value", {"m": 2})
    assert cache.get(key) == ("value", {"m": 2})
    assert len(cache) == 1


def test_parquet_store_roundtrip(tmp_path):
    model = MockEmbeddingModel(BaseConfig(embedding_dim=32))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="entity")
    store.insert_strings(["alpha", "beta", "gamma"])
    assert len(store.get_all_ids()) == 3
    # idempotent re-insert
    store.insert_strings(["alpha", "delta"])
    assert len(store.get_all_ids()) == 4

    ids = store.get_all_ids()
    mat = store.get_embeddings_matrix(ids)
    assert mat.shape == (4, 32)

    # reload from disk
    store2 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="entity")
    assert set(store2.get_all_ids()) == set(ids)
    np.testing.assert_allclose(store2.get_embeddings_matrix(ids), mat, atol=1e-6)

    # delete
    h = compute_mdhash_id("alpha", prefix="entity-")
    store2.delete([h])
    assert h not in store2.get_all_ids()
    store3 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="entity")
    assert h not in store3.get_all_ids()


def test_parquet_store_delta_appends(tmp_path):
    """Incremental inserts append delta files instead of rewriting the
    base table; reloads fold base + deltas; deletes compact everything."""
    model = MockEmbeddingModel(BaseConfig(embedding_dim=16))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="d")
    store.insert_strings(["a", "b", "c"])  # first write -> base file
    base = store.filename
    assert os.path.exists(base) and not store._delta_paths()
    base_mtime = os.path.getmtime(base)

    store.insert_strings(["d", "e"])  # incremental -> one delta, base untouched
    assert len(store._delta_paths()) == 1
    assert os.path.getmtime(base) == base_mtime
    store.insert_strings(["f"])
    assert len(store._delta_paths()) == 2

    ids = store.get_all_ids()
    mat = store.get_embeddings_matrix(ids)
    store2 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="d")
    assert store2.get_all_ids() == ids  # insertion order preserved per file
    np.testing.assert_allclose(store2.get_embeddings_matrix(ids), mat, atol=1e-6)

    # delete -> full rewrite, deltas folded away
    store2.delete([compute_mdhash_id("a", prefix="d-")])
    assert not store2._delta_paths()
    store3 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="d")
    assert len(store3.get_all_ids()) == 5


def test_parquet_store_delta_compaction_and_crash_dup(tmp_path):
    model = MockEmbeddingModel(BaseConfig(embedding_dim=16))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="c")
    store.insert_strings(["a", "b"])
    # force an aggressive compaction threshold
    store._COMPACT_FRACTION = 0.0
    orig = ParquetEmbeddingStore._COMPACT_FRACTION
    try:
        ParquetEmbeddingStore._COMPACT_FRACTION = 0.0

        def insert_many(s, n, start):
            s.insert_strings([f"w{start+i}" for i in range(n)])

        # threshold is max(1024, frac*len): exceed 1024 delta rows
        insert_many(store, 1100, 0)
        assert not store._delta_paths(), "compaction should have folded deltas"
        assert store._delta_rows == 0
    finally:
        ParquetEmbeddingStore._COMPACT_FRACTION = orig

    # crash window: a delta that duplicates base rows (base rewrite
    # finished, delta cleanup didn't) must not double-count on load
    store._write_table([store.get_all_ids()[0]], store._next_delta_path())
    store2 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="c")
    assert len(store2.get_all_ids()) == len(store.get_all_ids())


def test_parquet_store_delete_crash_does_not_resurrect(tmp_path, monkeypatch):
    """A crash between the delete's base rewrite and the delta cleanup
    must NOT resurrect the deleted row on reload: the stale delta belongs
    to an older generation, so the loader skips and removes it."""
    model = MockEmbeddingModel(BaseConfig(embedding_dim=16))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="g")
    store.insert_strings(["a", "b", "c"])  # base file
    store.insert_strings(["d"])  # lives in a delta
    (delta,) = store._delta_paths()
    h_d = compute_mdhash_id("d", prefix="g-")
    # simulate the crash: the rewrite lands, the delta removals do not
    monkeypatch.setattr(os, "remove", lambda p: None)
    store.delete([h_d])
    monkeypatch.undo()
    assert os.path.exists(delta), "stale delta should have survived the crash"

    store2 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="g")
    assert h_d not in store2.get_all_ids(), "deleted row resurrected by stale delta"
    assert set(store2.get_all_texts()) == {"a", "b", "c"}
    assert not os.path.exists(delta), "stale delta should be cleaned on load"

    # the store keeps working at the new generation
    store2.insert_strings(["e"])
    store3 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="g")
    assert set(store3.get_all_texts()) == {"a", "b", "c", "e"}


def test_parquet_store_failed_rewrite_keeps_generations_in_sync(tmp_path, monkeypatch):
    """If the base rewrite raises, the in-memory generation must NOT
    advance — otherwise later deltas get tagged with a generation that
    never reached disk and the next load would discard them (silent data
    loss after a transient write failure)."""
    model = MockEmbeddingModel(BaseConfig(embedding_dim=16))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="f")
    store.insert_strings(["a", "b", "c"])
    gen_before = store._gen
    orig_write = ParquetEmbeddingStore._write_table

    def failing(self, ids, path, generation=None):
        raise OSError("disk full")

    monkeypatch.setattr(ParquetEmbeddingStore, "_write_table", failing)
    h_a = compute_mdhash_id("a", prefix="f-")
    with pytest.raises(OSError):
        store.delete([h_a])
    monkeypatch.setattr(ParquetEmbeddingStore, "_write_table", orig_write)
    assert store._gen == gen_before, "generation advanced past a failed write"

    # deltas appended after the failure carry the on-disk generation and
    # must survive a reload (pre-fix they were tagged gen+1 and removed)
    store.insert_strings(["d", "e"])
    store2 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="f")
    assert {"d", "e"} <= set(store2.get_all_texts())

    # a delta tagged AHEAD of the base (should-be-impossible state) is
    # skipped but kept on disk for manual recovery, never deleted
    future = f"{store2.filename}.delta-g{store2._gen + 1:06d}-000000.parquet"
    h_d = compute_mdhash_id("d", prefix="f-")
    store2._write_table([h_d], future)
    store3 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="f")
    assert os.path.exists(future), "future-generation delta must not be removed"
    assert {"d", "e"} <= set(store3.get_all_texts())
    os.remove(future)


def test_parquet_store_over_threshold_insert_writes_once(tmp_path, monkeypatch):
    """An insert that crosses the compaction threshold folds straight into
    the base rewrite — it must not first write a delta file that the
    compaction immediately discards."""
    model = MockEmbeddingModel(BaseConfig(embedding_dim=16))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="w")
    store.insert_strings(["a", "b"])
    monkeypatch.setattr(ParquetEmbeddingStore, "_COMPACT_FRACTION", 0.0)
    writes = []
    orig_write = ParquetEmbeddingStore._write_table

    def counting(self, ids, path, generation=None):
        writes.append(path)
        return orig_write(self, ids, path, generation=generation)

    monkeypatch.setattr(ParquetEmbeddingStore, "_write_table", counting)
    store.insert_strings([f"x{i}" for i in range(1100)])
    assert writes == [store.filename], writes
    assert not store._delta_paths() and store._delta_rows == 0


def test_parquet_store_loads_legacy_list_layout(tmp_path):
    """Stores written by the old pandas object-list column (variable-length
    list<float> parquet type) must still load after the switch to the
    fixed-size-list + contiguous-buffer writer."""
    import pandas as pd

    embs = np.arange(6, dtype=np.float32).reshape(2, 3)
    df = pd.DataFrame(
        {
            "hash_id": ["h1", "h2"],
            "content": ["one", "two"],
            "embedding": [embs[0].tolist(), embs[1].tolist()],
        }
    )
    df.to_parquet(str(tmp_path / "vdb_legacy.parquet"), index=False)

    model = MockEmbeddingModel(BaseConfig(embedding_dim=3))
    store = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="legacy")
    assert set(store.get_all_ids()) == {"h1", "h2"}
    np.testing.assert_allclose(store.get_embedding("h2"), embs[1])
    # a mutation re-persists in the new layout and still reloads
    store.insert_strings(["three"])
    store2 = ParquetEmbeddingStore(model, str(tmp_path), batch_size=4, namespace="legacy")
    assert len(store2.get_all_ids()) == 3
    np.testing.assert_allclose(store2.get_embedding("h1"), embs[0])


def test_l2_normalize_parity():
    """The einsum fast path must (a) match a float64 reference within f32
    tolerance and (b) be SHAPE-CONSISTENT: the same rows normalize
    identically whether they arrive 2D or stacked N-D (the fast path
    covers every axis=-1 shape, so no caller straddles two accumulation
    orders)."""
    from hipporag_tpu.embedding.base import l2_normalize

    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 1024)).astype(np.float32)
    got = l2_normalize(x)
    ref = (x.astype(np.float64) / np.linalg.norm(x.astype(np.float64), axis=-1, keepdims=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-6)
    # rows are unit-norm
    np.testing.assert_allclose(np.einsum("ij,ij->i", got, got), 1.0, atol=1e-5)
    # 2D vs 3D consistency must be EXACT (same code path, same accumulation)
    got3 = l2_normalize(x.reshape(8, 8, 1024)).reshape(64, 1024)
    np.testing.assert_array_equal(got, got3)
    # axis != -1 fallback still normalizes correctly
    gota = l2_normalize(x, axis=0)
    np.testing.assert_allclose(np.linalg.norm(gota, axis=0), 1.0, atol=1e-5)
    # zero rows stay finite (eps floor)
    z = l2_normalize(np.zeros((3, 8), dtype=np.float32))
    assert np.isfinite(z).all() and (z == 0).all()


def test_mock_embedder_similarity():
    model = MockEmbeddingModel(BaseConfig(embedding_dim=64))
    v = model.batch_encode(["Erik Hort was born in Montebello", "Montebello is in Rockland County", "bananas are yellow"])
    sim_related = float(v[0] @ v[1])
    sim_unrelated = float(v[0] @ v[2])
    assert sim_related > sim_unrelated
    # determinism
    v2 = model.batch_encode("Erik Hort was born in Montebello")
    np.testing.assert_allclose(v[0], v2, atol=1e-6)


def test_prompt_manager_renders():
    ptm = PromptTemplateManager()
    names = ptm.list_template_names()
    for required in ["ner", "ner_query", "triple_extraction", "rag_qa", "rag_qa_musique", "ircot_musique"]:
        assert required in names, names
    msgs = ptm.render("ner", passage="Some passage about Paris.")
    assert msgs[-1]["content"] == "Some passage about Paris."
    re_msgs = ptm.render("triple_extraction", passage="P", named_entity_json='{"named_entities": []}')
    assert "P" in re_msgs[-1]["content"]
    # strict substitution (reference parity): a missing/typo'd kwarg must
    # raise, never ship a literal '${passage}' to the LLM
    with pytest.raises(ValueError, match="passage"):
        ptm.render("ner", passages="typo'd kwarg name")
    # extra kwargs are ignored; values containing '$' are safe
    ok = ptm.render("ner", passage="costs $5", unused="x")
    assert ok[-1]["content"] == "costs $5"


def test_query_instruction():
    assert "triplet" in get_query_instruction("query_to_fact")
    assert get_query_instruction("nope") == get_query_instruction("query_to_passage")


def test_mock_llm_ner_and_triples():
    llm = MockLLM()
    ptm = PromptTemplateManager()
    passage = "Erik Hort was born in Montebello. Montebello is part of Rockland County."
    resp, meta, _ = llm.infer(ptm.render("ner", passage=passage))
    ents = json.loads(resp)["named_entities"]
    assert "Erik Hort" in ents and "Montebello" in ents
    assert meta["finish_reason"] == "stop"

    re_resp, _, _ = llm.infer(
        ptm.render(
            "triple_extraction",
            passage=passage,
            named_entity_json=json.dumps({"named_entities": ents}),
        )
    )
    triples = json.loads(re_resp)["triples"]
    assert any(t[0] == "Erik Hort" and t[2] == "Montebello" for t in triples)


def test_mock_ner_title_line_and_stopwords():
    """The extraction fixes behind the 2wiki quality gain (review r2):
    a bare title line is its own sentence (the passage's own title — the
    multi-hop bridge node — must come out clean, not merged with the next
    sentence's first phrase), and sentence-initial pronouns/function words
    never become entities."""
    from hipporag_tpu.llm.mock import extract_capitalized_entities

    ents = extract_capitalized_entities(
        "Lothair II\nLothair II (835) was king of Lotharingia. "
        "He married Teutberga. In November they traveled."
    )
    assert "Lothair II" in ents
    assert not any("\n" in e for e in ents)
    assert "He" not in ents and "They" not in ents
    assert "In November" not in ents and "November" in ents


def test_mock_llm_filter():
    llm = MockLLM()
    user = (
        "[[ ## question ## ]]\nWhere was Erik Hort born?\n\n"
        '[[ ## fact_before_filter ## ]]\n{"fact": [["erik hort", "born in", "montebello"], ["bananas", "are", "yellow"]]}\n\n'
        "Respond with the corresponding output fields."
    )
    resp, _, _ = llm.infer([{"role": "user", "content": user}])
    assert "[[ ## fact_after_filter ## ]]" in resp
    assert "erik hort" in resp and "bananas" not in resp


def test_filter_response_parsing_and_matching():
    """Recognition-memory parsing: sectioned response -> fact list, and
    difflib matching of generated facts back to candidates."""
    from hipporag_tpu.rerank import parse_filter_response

    resp = (
        "[[ ## fact_after_filter ## ]]\n"
        '{"fact": [["mira voss", "born in", "port ellery"],'
        ' ["port ellery", "located in", "calder county"]]}\n\n'
        "[[ ## completed ## ]]"
    )
    facts = parse_filter_response(resp)
    assert facts == [
        ["mira voss", "born in", "port ellery"],
        ["port ellery", "located in", "calder county"],
    ]
    # malformed section degrades to empty, not an exception
    assert parse_filter_response("[[ ## fact_after_filter ## ]]\nnot json") == []
    assert parse_filter_response("no sections at all") == []


def test_rerank_filter_matches_back_to_candidates(tmp_path):
    from hipporag_tpu.config import BaseConfig
    from hipporag_tpu.llm.mock import MockLLM
    from hipporag_tpu.rerank import RecognitionMemoryFilter

    cfg = BaseConfig(llm_name="mock", save_dir=str(tmp_path))
    canned = {
        "filter": (
            "[[ ## fact_after_filter ## ]]\n"
            '{"fact": [["port ellery", "located in", "calder county"]]}\n'
            "[[ ## completed ## ]]"
        )
    }
    filt = RecognitionMemoryFilter(MockLLM(cfg, canned=canned))
    candidates = [
        ("mira voss", "born in", "port ellery"),
        ("port ellery", "located in", "calder county"),
        ("aldous finch", "composed", "the glass harbor"),
    ]
    sorted_idx, sorted_items, _ = filt.rerank(
        "Which county is Port Ellery in?", candidates, [10, 20, 30], 2
    )
    assert sorted_idx[0] == 20  # maps back to the candidate's row id
    assert sorted_items[0] == ("port ellery", "located in", "calder county")


def test_parquet_store_order_and_missing_ids(tmp_path):
    """Reference store-contract behaviors (run_vector_stores.py): fetch
    order preservation, missing-id diff, idempotent re-insert."""
    from hipporag_tpu.config import BaseConfig
    from hipporag_tpu.embedding.mock import MockEmbeddingModel
    from hipporag_tpu.storage.embedding_store import ParquetEmbeddingStore

    cfg = BaseConfig(embedding_model_name="mock", save_dir=str(tmp_path))
    model = MockEmbeddingModel(cfg)
    store = ParquetEmbeddingStore(model, str(tmp_path), 4, "chunk")

    texts = [f"text number {i}" for i in range(6)]
    store.insert_strings(texts)
    n = len(store.get_all_ids())
    store.insert_strings(texts)  # idempotent re-insert
    assert len(store.get_all_ids()) == n == 6

    # order preservation across arbitrary request order
    ids = [store.get_hash_id(t) for t in texts]
    shuffled = [ids[3], ids[0], ids[5], ids[1]]
    embs = store.get_embeddings(shuffled)
    direct = [store.get_embedding(h) for h in shuffled]
    import numpy as np
    for a, b in zip(embs, direct):
        np.testing.assert_array_equal(a, b)
    mat = store.get_embeddings_matrix(shuffled)
    np.testing.assert_array_equal(mat[2], store.get_embedding(ids[5]))

    # missing-id diff
    missing = store.get_missing_string_hash_ids(texts + ["brand new text"])
    assert len(missing) == 1
    assert next(iter(missing.values()))["content"] == "brand new text"

    # incremental insert + reload keeps everything
    store.insert_strings(["brand new text"])
    store2 = ParquetEmbeddingStore(model, str(tmp_path), 4, "chunk")
    assert set(store2.get_all_texts()) == set(texts + ["brand new text"])


def test_graph_category_counts_exact(tmp_path):
    """Edge-category stats stay exact when duplicate facts merge into one
    edge (VERDICT r1 #8; ref get_graph_info, HippoRAG.py:1232-1285)."""
    from hipporag_tpu.graph.builder import GraphBuilder

    g = GraphBuilder()
    # two DIFFERENT facts over the same entity pair -> the directed entries
    # merge; the old subtraction heuristic (total - 2*extracted - passage)
    # would go negative here
    g.add_fact_edges(
        ["chunk-1"],
        [[("alice", "likes", "bob"), ("alice", "knows", "bob")]],
    )
    # a second chunk repeating one of the facts (weights accumulate,
    # still the same 2 directed entries)
    g.add_fact_edges(["chunk-2"], [[("alice", "likes", "bob")]])
    g.add_passage_edges(["chunk-1"], [["alice", "bob"]])
    g.mark_chunks_indexed(["chunk-1", "chunk-2"])

    a = compute_mdhash_id("alice", prefix="entity-")
    b = compute_mdhash_id("bob", prefix="entity-")
    g.register_nodes([a, b, "chunk-1"])

    cats = g.edge_category_counts()
    assert cats == {"fact": 2, "passage": 2, "synonymy": 0}
    # weights merged: each direction saw +1 (likes), +1 (knows), +1 (likes again)
    assert g.edge_weights[(a, b)] == 3.0
    assert g.edge_weights[(b, a)] == 3.0

    # synonymy over a NEW pair counts; over an existing fact pair it only
    # updates the weight, not the category
    g.register_nodes([compute_mdhash_id("carol", prefix="entity-")])
    c = compute_mdhash_id("carol", prefix="entity-")
    contents = {a: "alice", b: "bob", c: "carol"}
    g.add_synonymy_edges(
        [a, b, c], contents,
        np.array([[1, 2], [0, 2], [0, 1]]),  # neighbor indices
        np.array([[0.95, 0.9], [0.95, 0.9], [0.1, 0.1]]),
        sim_threshold=0.8,
    )
    cats = g.edge_category_counts()
    assert cats["fact"] == 2          # a<->b kept fact category
    assert cats["synonymy"] == 2      # a->c and b->c
    assert g.edge_weights[(a, b)] == 0.95  # weight overwritten like the ref

    # persistence round-trip keeps categories
    path = str(tmp_path / "graph.pickle")
    g.save(path)
    g2 = GraphBuilder.load(path)
    assert g2.edge_category_counts() == cats

    # deleting a vertex prunes its categories
    g2.delete_vertices({c})
    assert g2.edge_category_counts() == {"fact": 2, "passage": 2, "synonymy": 0}


def test_graph_legacy_state_backfills_categories(tmp_path):
    """States saved before edge-category tags existed must not misreport
    every edge as synonymy on load (review r2): passage edges backfill by
    chunk- prefix, fact edges from the persisted fact pairs."""
    import pickle

    from hipporag_tpu.graph.builder import GraphBuilder

    g = GraphBuilder()
    g.add_fact_edges(["chunk-1"], [[("alice", "likes", "bob")]])
    g.add_passage_edges(["chunk-1"], [["alice", "bob"]])
    a = compute_mdhash_id("alice", prefix="entity-")
    b = compute_mdhash_id("bob", prefix="entity-")
    c = compute_mdhash_id("carol", prefix="entity-")
    g.register_nodes([a, b, c, "chunk-1"])
    contents = {a: "alice", b: "bob", c: "carol"}
    g.add_synonymy_edges(
        [a, c], contents,
        np.array([[1], [0]]), np.array([[0.9], [0.9]]), sim_threshold=0.8,
    )
    want = g.edge_category_counts()
    assert want == {"fact": 2, "passage": 2, "synonymy": 2}

    # simulate a legacy save: strip the category map from the pickled state
    path = str(tmp_path / "graph.pickle")
    g.save(path)
    with open(path, "rb") as f:
        state = pickle.load(f)
    del state["edge_category"]
    with open(path, "wb") as f:
        pickle.dump(state, f)

    g2 = GraphBuilder.load(path)
    assert g2.needs_category_backfill
    g2.backfill_edge_categories([(a, b)])
    assert not g2.needs_category_backfill
    assert g2.edge_category_counts() == want

    # a legacy state that was loaded and then incrementally indexed holds a
    # MIX of tagged and untagged edges — backfill must still fire (advisor
    # r2: the old trigger only checked for a completely empty category map)
    g3 = GraphBuilder.load(path)
    g3.add_fact_edges(["chunk-2"], [[("carol", "knows", "dan")]])
    assert g3.edge_category  # the new edges ARE tagged
    assert g3.needs_category_backfill  # ...but the legacy ones are not
    g3.backfill_edge_categories([(a, b)])
    assert not g3.needs_category_backfill
    counts = g3.edge_category_counts()
    assert counts["fact"] == want["fact"] + 2
    assert counts["passage"] == want["passage"]
    assert counts["synonymy"] == want["synonymy"]


def test_per_dataset_templates_distinct():
    """Each dataset ships its own few-shot demo (VERDICT r1 #5), and IRCoT
    templates follow the reference shape: demo in the system turn, user turn
    only ${prompt_user} (ref ircot_musique.py:1-30)."""
    mgr = PromptTemplateManager()
    rendered = {}
    for ds in ("musique", "hotpotqa", "2wikimultihopqa"):
        qa = mgr.render(f"rag_qa_{ds}", prompt_user="Question: test\nThought: ")
        assert qa[0]["role"] == "system"
        assert qa[-1]["content"].startswith("Question: test")
        # 4-message one-shot structure: system, demo user, demo assistant, user
        assert [m["role"] for m in qa] == ["system", "user", "assistant", "user"]
        assert "Answer:" in qa[2]["content"]
        rendered[f"qa_{ds}"] = qa[1]["content"]

        ircot = mgr.render(f"ircot_{ds}", prompt_user="Question: test\nThought: ")
        assert [m["role"] for m in ircot] == ["system", "user"]
        assert "So the answer is:" in ircot[0]["content"]
        assert ircot[1]["content"] == "Question: test\nThought: "
        rendered[f"ircot_{ds}"] = ircot[0]["content"]

    # the demos genuinely differ per dataset (no alias collapse)
    assert len({rendered[f"qa_{ds}"] for ds in ("musique", "hotpotqa", "2wikimultihopqa")}) == 3
    assert len({rendered[f"ircot_{ds}"] for ds in ("musique", "hotpotqa", "2wikimultihopqa")}) == 3
    # dataset style: 2wiki = comparison, musique = composition chain
    assert "same country" in rendered["ircot_2wikimultihopqa"]


def test_compiled_filter_prompt_loads(tmp_path):
    """The shipped per-model compiled filter JSON loads via
    rerank_dspy_file_path (ref prompts/dspy_prompts/filter_llama3.3-70B-Instruct.json)."""
    from hipporag_tpu.rerank import RecognitionMemoryFilter

    llm = MockLLM(BaseConfig(llm_name="mock", save_dir=str(tmp_path)))
    default = RecognitionMemoryFilter(llm)
    compiled = RecognitionMemoryFilter(llm, "filter_llama3.3-70B-Instruct.json")
    # compiled prompt: system + 10 demos x 2 turns
    assert len(compiled.message_template) == 21
    assert len(compiled.message_template) > len(default.message_template)
    for turn in compiled.message_template[1::2]:
        assert "[[ ## question ## ]]" in turn["content"]
    # absolute path also works
    import os as _os
    abs_path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "hipporag_tpu", "prompts", "dspy_prompts", "filter_llama3.3-70B-Instruct.json",
    )
    compiled2 = RecognitionMemoryFilter(llm, abs_path)
    assert [m["content"] for m in compiled2.message_template] == [
        m["content"] for m in compiled.message_template
    ]
    # end-to-end: filter still reranks with the compiled prompt
    cands = [("alice", "likes", "bob"), ("x", "y", "z")]
    idx, items, meta = compiled.rerank("Does alice like bob?", cands, [0, 1], 2)
    assert set(idx) <= {0, 1}


def test_closest_candidate_matches_difflib_exactly():
    """_closest_candidate must be result-identical to the reference's
    difflib.get_close_matches(n=1, cutoff=0.0) + .index() matching across
    exact echoes, fuzzy matches, duplicates, and ratio ties."""
    import difflib
    import random
    import string

    from hipporag_tpu.rerank import _closest_candidate

    def reference(s, cands):
        m = difflib.get_close_matches(s, cands, n=1, cutoff=0.0)
        return cands.index(m[0]) if m else None

    rnd = random.Random(7)
    alphabet = string.ascii_lowercase[:6]

    def rand_str():
        return "".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 8)))

    # directed cases: exact echo, duplicates, tie-prone short strings
    cases = [
        ("abc", ["abc", "abd", "abc"]),
        ("abc", ["xyz", "abd", "acb"]),  # tie-prone permutations
        ("", ["", "a", ""]),
        ("aa", ["ab", "ba"]),  # equal ratios -> lexicographic tie rule
        ("q", []),
    ]
    for _ in range(300):
        cases.append(
            (rand_str(), [rand_str() for _ in range(rnd.randint(1, 12))])
        )
    for s, cands in cases:
        assert _closest_candidate(s, cands) == reference(s, cands), (s, cands)
