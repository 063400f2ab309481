"""Seeding-sensitivity sweep for the 2wiki harness (VERDICT r2 #3).

Indexes the real 2wiki corpus once, then re-runs retrieval over the 600
synthesized 2-hop queries under a grid of (passage_node_weight,
link_top_k) to find a setting where graph Recall@2 >= dense Recall@2
without hurting Recall@5/@20. Also breaks R@2 down into "found A"
(anchor doc, dense-findable) vs "found B" (bridge doc, graph-only).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("TWIKI_BACKEND", "cpu") == "cpu":
    # sitecustomize force-registers the tunneled accelerator backend and
    # overrides JAX_PLATFORMS; config-level update is required (see
    # tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from hipporag_tpu import BaseConfig, HippoRAG
from hipporag_tpu.evaluation.metrics import RetrievalRecall
from hipporag_tpu.evaluation.twiki import (
    doc_text,
    load_corpus,
    synthesize_multihop_queries,
)

CORPUS = os.environ.get(
    "TWIKI_CORPUS",
    "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json",
)
SAVE = os.environ.get("TWIKI_SAVE", "/tmp/twiki_sweep")
NQ = int(os.environ.get("TWIKI_NQ", 600))


def main():
    corpus = load_corpus(CORPUS)
    docs = [doc_text(item) for item in corpus]
    queries = synthesize_multihop_queries(corpus, max_queries=NQ)
    questions = [q for q, _, _ in queries]
    gold = [g for _, g, _ in queries]

    cfg = BaseConfig(
        llm_name="mock",
        embedding_model_name="hashing",
        save_dir=SAVE,
        embedding_dim=1024,
        retrieval_top_k=20,
        embedding_batch_size=256,
    )
    rag = HippoRAG(global_config=cfg)
    t0 = time.time()
    rag.index(docs)
    print(f"indexed in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    evaluator = RetrievalRecall(cfg)

    _, dense_recall = rag.retrieve_dpr(questions, gold_docs=gold)
    print("dense:", {k: dense_recall[f"Recall@{k}"] for k in (1, 2, 5, 20)},
          file=sys.stderr, flush=True)

    def run(pnw, ltk):
        rag.global_config.passage_node_weight = pnw
        rag.global_config.linking_top_k = ltk
        results = rag.retrieve(questions)
        overall, _ = evaluator.calculate_metric_scores(
            gold, [r.docs for r in results], [1, 2, 5, 20]
        )
        # breakdown: per-query, is the anchor (gold[0]) / bridge (gold[1])
        # doc inside the top-2?
        a_hit = np.mean([g[0] in r.docs[:2] for g, r in zip(gold, results)])
        b_hit = np.mean([g[1] in r.docs[:2] for g, r in zip(gold, results)])
        return overall, float(a_hit), float(b_hit)

    grid = []
    for ltk in (5, 3, 8):
        for pnw in (0.05, 0.1, 0.2, 0.3, 0.5):
            overall, a_hit, b_hit = run(pnw, ltk)
            row = {
                "pnw": pnw, "ltk": ltk,
                **{f"R@{k}": overall[f"Recall@{k}"] for k in (1, 2, 5, 20)},
                "anchor_in_top2": round(a_hit, 3),
                "bridge_in_top2": round(b_hit, 3),
            }
            grid.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

    print(json.dumps({
        "dense": {k: dense_recall[f"Recall@{k}"] for k in (1, 2, 5, 20)},
        "grid": grid,
    }))


if __name__ == "__main__":
    main()
