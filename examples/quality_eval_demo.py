"""Quality-evaluation demo: the four graph-vs-dense harnesses.

Runs (fully offline, deterministic):

1. the 2wiki synthetic harness (mock OpenIE + hashing embedder, the r3
   calibration) on a small corpus slice;
2. the hotpotqa-SCHEMA harness — same corpus, but the dataset flows
   through disk files and ``datasets.load_dataset``'s supporting_facts
   branch, with a bridge + comparison question mix;
3. the musique-SCHEMA harness — the ``paragraphs`` loader branch with 18
   is_supporting=false distractors per sample, cross-checked against the
   ``contexts`` branch;
4. the REAL-extraction replay harness — the full production provider
   path (CacheOpenAILLM, real prompts, JSON parse/repair) replayed from
   the committed fixture over 1000 real passages — when the fixture and
   corpus are present.

Every result carries paired error bars (exact McNemar + cluster
bootstrap CI, evaluation/stats.py).

    HIPPO_PLATFORM=cpu python examples/quality_eval_demo.py
"""

import json
import os
import tempfile

import _shared  # noqa: F401 — path + platform setup

CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "replay_2wiki_quality_cache.sqlite",
)


def show(name, res):
    print(f"\n=== {name} ({res['corpus_docs']} docs, "
          f"{res['num_queries']} queries) ===")
    for k in (2, 5, 20):
        print(f"  R@{k}: graph {res['recall'][k]:.3f} vs "
              f"dense {res['dense_recall'][k]:.3f}")
    s5 = res["stats"][5]
    print(f"  R@5 paired stats: delta {s5['delta']:+.3f}, "
          f"CI95 {s5['ci95']}, McNemar p {s5['mcnemar_p']:.2g}")
    if res.get("by_type"):
        print(f"  by question type: {json.dumps(res['by_type'])}")


def main():
    if not os.path.exists(CORPUS):
        print(f"2wiki corpus missing at {CORPUS}; nothing to demo")
        return

    from hipporag_tpu.evaluation.twiki import run_2wiki_eval

    show("2wiki synthetic harness",
         run_2wiki_eval(CORPUS, save_dir=tempfile.mkdtemp(),
                        n_queries=50, n_docs=300, exact_queries=None,
                        twin_queries=1))

    from hipporag_tpu.evaluation.hotpot_synth import run_hotpot_eval

    show("hotpotqa-schema harness",
         run_hotpot_eval(CORPUS, save_dir=tempfile.mkdtemp(), n_docs=300))

    from hipporag_tpu.evaluation.musique_synth import run_musique_eval

    show("musique-schema harness (paragraphs + distractors)",
         run_musique_eval(CORPUS, save_dir=tempfile.mkdtemp(), n_docs=300))

    if os.path.exists(FIXTURE):
        from hipporag_tpu.evaluation.replay_quality import (
            run_replay_quality_eval,
        )

        show("REAL extraction output (replayed production pipeline)",
             run_replay_quality_eval(fixture_path=FIXTURE,
                                     save_dir=tempfile.mkdtemp(),
                                     corpus_path=CORPUS))
    else:
        print(f"\nreplay fixture missing at {FIXTURE}; skipped harness 4")


if __name__ == "__main__":
    main()
