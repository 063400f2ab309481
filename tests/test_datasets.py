"""Dataset loader coverage: the four gold-doc schemas + answer variants
(reference main.py:17-53)."""

import json

import pytest

from hipporag_tpu.datasets import get_gold_answers, get_gold_docs, load_dataset


def test_hotpotqa_supporting_facts_schema():
    samples = [{
        "question": "q",
        "answer": "a",
        "supporting_facts": [["TitleA", 0], ["TitleB", 1]],
        "context": [
            ["TitleA", ["Sent 1.", "Sent 2."]],
            ["TitleB", ["Other."]],
            ["TitleC", ["Ignored."]],
        ],
    }]
    docs = get_gold_docs(samples, "hotpotqa")
    assert docs == [sorted(["TitleA\nSent 1.Sent 2.", "TitleB\nOther."])]
    # non-hotpotqa datasets join sentences with spaces
    docs2 = get_gold_docs(samples, "2wikimultihopqa")
    assert "TitleA\nSent 1. Sent 2." in docs2[0]


def test_musique_paragraphs_schema():
    samples = [{
        "question": "q",
        "answer": "a",
        "paragraphs": [
            {"title": "T1", "paragraph_text": "body1", "is_supporting": True},
            {"title": "T2", "paragraph_text": "body2", "is_supporting": False},
        ],
    }]
    assert get_gold_docs(samples) == [["T1\nbody1"]]


def test_contexts_schema():
    samples = [{
        "question": "q",
        "answer": "a",
        "contexts": [
            {"title": "T1", "text": "body1", "is_supporting": True},
            {"title": "T2", "text": "body2"},
        ],
    }]
    assert get_gold_docs(samples) == [["T1\nbody1"]]


def test_unknown_schema_raises():
    with pytest.raises(KeyError):
        get_gold_docs([{"question": "q"}])


def test_gold_answers_variants():
    samples = [
        {"answer": "plain", "answer_aliases": ["alias"]},
        {"gold_ans": "ga"},
        {"reference": "ref"},
        {"obj": "o", "o_wiki_title": "t", "possible_answers": ["p1"],
         "o_aliases": ["al"]},
    ]
    answers = get_gold_answers(samples)
    assert set(answers[0]) >= {"plain", "alias"}
    assert "ga" in answers[1]
    assert "ref" in answers[2]
    assert set(answers[3]) >= {"o", "t", "p1", "al"}


def test_load_dataset_roundtrip(tmp_path):
    corpus = [{"title": "T1", "text": "body1"}, {"title": "T2", "text": "body2"}]
    samples = [{
        "question": "which?",
        "answer": "T1",
        "paragraphs": [{"title": "T1", "paragraph_text": "body1",
                        "is_supporting": True}],
    }]
    (tmp_path / "mini_corpus.json").write_text(json.dumps(corpus))
    (tmp_path / "mini.json").write_text(json.dumps(samples))
    docs, queries, gold_docs, gold_answers = load_dataset("mini", str(tmp_path))
    assert docs == ["T1\nbody1", "T2\nbody2"]
    assert queries == ["which?"]
    assert gold_docs == [["T1\nbody1"]]
    assert gold_answers[0][0] == "T1"
