"""Second-dataset (hotpotqa SCHEMA) quality harness tests (VERDICT r4 #4).

The harness writes a synthesized supporting_facts/context dataset to disk
and loads it back through datasets.load_dataset, so the production
hotpotqa gold-doc reconstruction (title + "".join(sents), empty separator)
is what gets evaluated — score semantics tuned only to the 2wiki shape
would fail here."""

import os

import pytest

CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="2wiki corpus not present"
)


def test_sentence_split_reconstructs_exactly():
    from hipporag_tpu.evaluation.hotpot_synth import split_sentences

    for text in (
        "One. Two! Three? Four",
        "No punctuation at all",
        "Trailing. ",
        "Multi  space.  And\ttabs.\nNewlines too. end",
        "...",
        "",
    ):
        assert "".join(split_sentences(text)) == text


def test_hotpot_schema_loader_roundtrip(tmp_path):
    """Gold docs reconstructed by get_gold_docs from the context sentence
    lists must STRING-MATCH the indexed corpus docs — otherwise Recall@k
    would silently measure against unreachable gold strings."""
    from hipporag_tpu.datasets import load_dataset
    from hipporag_tpu.evaluation.hotpot_synth import (
        DATASET_NAME,
        synthesize_hotpot_samples,
        write_hotpot_files,
    )
    from hipporag_tpu.evaluation.twiki import load_corpus

    corpus = load_corpus(CORPUS)[:150]
    samples = synthesize_hotpot_samples(corpus)
    assert len(samples) == 50  # 25 bridge pairs x (bridge + comparison)
    assert {s["type"] for s in samples} == {"bridge", "comparison"}
    data_dir = write_hotpot_files(corpus, samples, str(tmp_path))

    docs, questions, gold_docs, gold_answers = load_dataset(
        DATASET_NAME, data_dir
    )
    assert len(docs) == 150 and len(questions) == 50
    doc_set = set(docs)
    for golds in gold_docs:
        assert len(golds) == 2
        for g in golds:
            assert g in doc_set, f"gold doc not reconstructible: {g[:80]!r}"
    # bridge questions must NOT contain the bridge answer verbatim
    for s, answers in zip(samples, gold_answers):
        if s["type"] == "bridge":
            assert answers[0] not in s["question"]
        else:  # comparison questions name both titles
            assert answers[0] in s["question"]


def test_hotpot_graph_vs_dense(tmp_path):
    """Graph must beat dense at R@5 on the bridge questions and must not
    LOSE on the comparison questions (the overfit check runs both ways)."""
    from hipporag_tpu.evaluation.hotpot_synth import run_hotpot_eval

    res = run_hotpot_eval(CORPUS, save_dir=str(tmp_path), n_docs=150)
    assert res["num_queries"] == 50
    assert res["recall"][5] >= res["dense_recall"][5]
    bt = res["by_type"]
    # regression pin for the by_type indexing bug: the split must be over
    # QUERIES (per_query_recall), so the n-weighted average of the two
    # types must reconstruct the overall Recall@5 exactly (every query has
    # 2 gold docs, so pooled recall == mean per-query recall). The old
    # doc_level_hits indexing scrambled the split and broke this identity.
    n_total = sum(v["n"] for v in bt.values())
    weighted = sum(v["graph_r5"] * v["n"] for v in bt.values()) / n_total
    assert abs(weighted - res["recall"][5]) < 5e-4, (weighted, res["recall"][5])
    weighted_d = sum(v["dense_r5"] * v["n"] for v in bt.values()) / n_total
    assert abs(weighted_d - res["dense_recall"][5]) < 5e-4
    assert bt["bridge"]["graph_r5"] >= bt["bridge"]["dense_r5"]
    # comparison questions are dense-friendly; graph may tie but not drop
    # more than one query's worth below dense
    n_cmp = bt["comparison"]["n"]
    assert bt["comparison"]["graph_r5"] >= bt["comparison"]["dense_r5"] - (
        1.0 / n_cmp + 1e-9
    )
