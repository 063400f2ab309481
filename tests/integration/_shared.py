"""Shared lifecycle runner for live-service integration checks
(reference pattern: tests/integration/_shared.py:5-15).

`run_lifecycle(config_kwargs)` drives the full index → rag_qa → reload →
incremental index → delete cycle twice over the same save_dir, verifying
persistence. Exits non-zero on failure. These scripts hit real services
and are run manually, not by pytest.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from hipporag_tpu import BaseConfig, HippoRAG  # noqa: E402
from hipporag_tpu.utils.sample_data import all_queries, corpus, gold_answers  # noqa: E402


def run_lifecycle(**config_kwargs) -> int:
    save_dir = config_kwargs.pop("save_dir", None) or tempfile.mkdtemp(
        prefix="hipporag_tpu_it_"
    )
    cfg = BaseConfig(save_dir=save_dir, **config_kwargs)

    print(f"[1/5] index {len(corpus)} docs -> {save_dir}")
    rag = HippoRAG(global_config=cfg)
    rag.index(corpus)

    print("[2/5] rag_qa")
    solutions, _, _ = rag.rag_qa(list(all_queries))
    for sol, golds in zip(solutions, gold_answers):
        print(f"  Q: {sol.question}\n  A: {sol.answer}  (gold: {golds[0]})")
        assert sol.docs, "no documents retrieved"

    print("[3/5] reload from disk")
    rag2 = HippoRAG(global_config=BaseConfig(save_dir=save_dir, **config_kwargs))
    sols2 = rag2.retrieve([all_queries[0]])
    assert sols2[0].docs, "reloaded instance retrieved nothing"

    print("[4/5] incremental index")
    rag2.index(["Calder County hosts an annual fishing festival."])
    assert rag2.retrieve(["fishing festival county"])[0].docs

    print("[5/5] delete")
    before = rag2.get_graph_info()["num_passage_nodes"]
    rag2.delete(["Calder County hosts an annual fishing festival."])
    after = rag2.get_graph_info()["num_passage_nodes"]
    assert after == before - 1, (before, after)

    print("LIFECYCLE PASS")
    return 0
