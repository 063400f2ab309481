"""Third-dataset (musique SCHEMA) quality harness tests.

The harness writes a synthesized ``paragraphs`` dataset to disk — each
sample carrying 20 paragraphs of which only the 2 ``is_supporting`` ones
are gold — and loads it back through datasets.load_dataset, so the
production distractor filter (reference main.py:28-31) is what gets
evaluated. The ``contexts``/``is_supporting`` branch (2wiki's released
format) is cross-checked against it on the same samples."""

import os

import pytest

CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="2wiki corpus not present"
)


def test_musique_schema_loader_roundtrip(tmp_path):
    """The paragraphs branch must keep exactly the supporting pair (none
    of the 18 distractors) and every gold doc must STRING-MATCH an
    indexed corpus doc; the contexts branch must agree."""
    from hipporag_tpu.datasets import get_gold_docs, load_dataset
    from hipporag_tpu.evaluation.musique_synth import (
        DATASET_NAME,
        PARAGRAPHS_PER_SAMPLE,
        synthesize_musique_samples,
        to_contexts_schema,
        write_musique_files,
    )
    from hipporag_tpu.evaluation.twiki import load_corpus

    corpus = load_corpus(CORPUS)[:150]
    samples = synthesize_musique_samples(corpus)
    assert len(samples) == 25  # one per discovered bridge pair
    for s in samples:
        assert len(s["paragraphs"]) == PARAGRAPHS_PER_SAMPLE
        sup = [p for p in s["paragraphs"] if p["is_supporting"]]
        assert len(sup) == 2
        # bridge mention blanked from the question surface
        assert s["answer"] not in s["question"]
        # gold paragraphs must not always lead the list (position must
        # not leak supportingness to a lazy retriever)
    assert any(not s["paragraphs"][0]["is_supporting"] for s in samples)

    data_dir = write_musique_files(corpus, samples, str(tmp_path))
    docs, questions, gold_docs, gold_answers = load_dataset(
        DATASET_NAME, data_dir
    )
    assert len(docs) == 150 and len(questions) == 25
    doc_set = set(docs)
    for golds in gold_docs:
        assert len(golds) == 2  # distractors filtered out
        for g in golds:
            assert g in doc_set, f"gold doc not reconstructible: {g[:80]!r}"

    # the contexts branch (2wiki's released schema) reconstructs the SAME
    # gold docs from the same samples
    ctx_gold = get_gold_docs(
        [to_contexts_schema(s) for s in samples], DATASET_NAME
    )
    assert ctx_gold == gold_docs


def test_musique_graph_vs_dense(tmp_path):
    """Graph must beat dense at R@5 through the paragraphs loader branch
    (same directional pin as the other schema harnesses)."""
    from hipporag_tpu.evaluation.musique_synth import run_musique_eval

    res = run_musique_eval(CORPUS, save_dir=str(tmp_path), n_docs=150)
    assert res["num_queries"] == 25
    assert res["distractors_per_query"] == 18
    assert res["schemas_cross_checked"] == ["paragraphs", "contexts"]
    assert res["recall"][5] >= res["dense_recall"][5]
    assert res["recall"][20] >= res["dense_recall"][20]
