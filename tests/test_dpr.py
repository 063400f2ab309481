"""HippoRAG pure-DPR path (retrieve_dpr / rag_qa_dpr) parity tests."""

import jax

jax.config.update("jax_platforms", "cpu")

from hipporag_tpu import BaseConfig, HippoRAG  # noqa: E402

DOCS = [
    "Mira Voss is a marine biologist. Mira Voss was born in Port Ellery.",
    "Port Ellery is a coastal town. Port Ellery is located in Calder County.",
    "Aldous Finch composed the opera The Glass Harbor in 1921.",
]


def _rag(tmp_path):
    cfg = BaseConfig(llm_name="mock", embedding_model_name="mock", save_dir=str(tmp_path))
    rag = HippoRAG(global_config=cfg)
    rag.index(DOCS)
    return rag


def test_retrieve_dpr_ranks_relevant_doc_first(tmp_path):
    rag = _rag(tmp_path)
    results = rag.retrieve_dpr(["Port Ellery coastal town county"], num_to_retrieve=3)
    assert len(results) == 1
    assert "Port Ellery" in results[0].docs[0]
    # scores sorted descending
    s = results[0].doc_scores
    assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))


def test_retrieve_dpr_with_gold_docs_returns_recall(tmp_path):
    rag = _rag(tmp_path)
    results, overall = rag.retrieve_dpr(
        ["Who composed The Glass Harbor?"], gold_docs=[[DOCS[2]]]
    )
    assert overall["Recall@2"] == 1.0


def test_rag_qa_dpr_full_pipeline(tmp_path):
    rag = _rag(tmp_path)
    sols, responses, meta, retr, qa = rag.rag_qa_dpr(
        ["In which county was Mira Voss born?"],
        gold_docs=[[DOCS[1]]],
        gold_answers=[["Calder County"]],
    )
    assert sols[0].answer
    assert "ExactMatch" in qa and "Recall@5" in retr
