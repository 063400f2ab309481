"""Graph-vs-dense Recall@k pinned on REAL-pipeline extraction output
(VERDICT r4 #2).

The committed fixture ``replay_2wiki_quality_cache.sqlite`` (7624 recorded
responses; regenerate with ``python scripts/make_replay_fixture.py
quality``) replays the FULL production provider path — CacheOpenAILLM,
real prompt templates, real JSON parse/repair — over real 2WikiMultihopQA
passages, against a dead loopback endpoint (any replay miss is a hard
connection error). It records TWO slices: 1000 docs / 168 queries (this
test, fast) and 2500 docs / 473 queries (bench + the env-gated full-slice
test below, statistical power).

The honest R@2 story (VERDICT r4 weak #1), with paired error bars:
graph beats dense at R@5 and R@20 on the real-extraction graph with
McNemar p ~ 0 at BOTH scales. At R@2 the graph advantage is positive at
both scales but its significance does not survive tripling the sample:
+4.2pp p=.029 on 168 queries, +1.2pp p=.31 on 473. Conclusion: on this
harness the robust graph win on real facts is at k>=5; R@2 is a small
positive effect, not a headline.
"""

import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(
    HERE, "tests", "fixtures", "replay_2wiki_quality_cache.sqlite"
)
CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"

# Pinned by the fixture-generation run (deterministic end to end):
EXPECTED_RECALL = {1: 0.4345, 2: 0.6131, 5: 0.7411, 10: 0.7798, 20: 0.8065}
EXPECTED_DENSE = {1: 0.494, 2: 0.5714, 5: 0.6161, 10: 0.6815, 20: 0.7173}

# 2500-doc / 473-query slice (bench's section; env-gated test below):
EXPECTED_RECALL_FULL = {1: 0.4429, 2: 0.593, 5: 0.7304, 10: 0.7664, 20: 0.7918}
EXPECTED_DENSE_FULL = {1: 0.4884, 2: 0.5814, 5: 0.6469, 10: 0.6903, 20: 0.7241}

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and os.path.exists(CORPUS)),
    reason="quality fixture or 2wiki corpus not present",
)


def test_graph_beats_dense_on_real_extraction_output(tmp_path):
    from hipporag_tpu.evaluation.replay_quality import run_replay_quality_eval

    out = run_replay_quality_eval(
        fixture_path=FIXTURE, save_dir=str(tmp_path)
    )
    assert out["num_queries"] == 168 and out["corpus_docs"] == 1000

    # exact pins: the whole pipeline is deterministic; any drift in
    # extraction, graph construction, seeding, or solver semantics shows
    # up here first
    assert out["recall"] == EXPECTED_RECALL, out["recall"]
    assert out["dense_recall"] == EXPECTED_DENSE, out["dense_recall"]

    # the substantive claims (VERDICT r4 done-criteria): graph >= dense at
    # R@5 on real facts, with significant paired evidence
    s5 = out["stats"][5]
    assert s5["recall_a"] >= s5["recall_b"] + 0.05, s5
    assert s5["significant"] and s5["mcnemar_p"] < 0.001, s5
    assert s5["ci95"][0] > 0, s5  # bootstrap CI excludes zero
    # R@2 / R@20: graph ahead on this slice (R@2 significance is
    # slice-dependent — see module docstring; do not over-claim it)
    s2 = out["stats"][2]
    assert s2["recall_a"] > s2["recall_b"], s2
    s20 = out["stats"][20]
    assert s20["recall_a"] > s20["recall_b"], s20


@pytest.mark.skipif(
    os.environ.get("HIPPO_FULL_REPLAY", "0") != "1",
    reason="full 2500-doc slice is bench's job; set HIPPO_FULL_REPLAY=1",
)
def test_full_slice_graph_vs_dense(tmp_path):
    """473-query slice: the R@5/R@20 wins stay p~0; the R@2 delta is
    positive but NOT significant — pinned so the reporting stays honest."""
    from hipporag_tpu.evaluation.replay_quality import (
        QUALITY_DOCS_FULL,
        run_replay_quality_eval,
    )

    out = run_replay_quality_eval(
        fixture_path=FIXTURE, save_dir=str(tmp_path),
        n_docs=QUALITY_DOCS_FULL,
    )
    assert out["num_queries"] == 473 and out["corpus_docs"] == 2500
    assert out["recall"] == EXPECTED_RECALL_FULL, out["recall"]
    assert out["dense_recall"] == EXPECTED_DENSE_FULL, out["dense_recall"]
    s5, s2 = out["stats"][5], out["stats"][2]
    assert s5["significant"] and s5["mcnemar_p"] < 1e-6, s5
    assert out["stats"][20]["significant"], out["stats"][20]
    assert s2["delta"] > 0 and not s2["significant"], s2
