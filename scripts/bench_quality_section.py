"""Run ONE bench quality section on the forced-CPU backend and print its
result dict as a single JSON line.

Used by bench.py as the degraded-tunnel fallback: the graph-vs-dense
quality numbers (2wiki / hotpot-schema / replay) are backend-independent,
so a dead device link should downgrade WHERE they run, not WHETHER they
run. When the link is healthy bench still runs these sections in-process
on the real device — that is deliberate (a TPU-lowering bug is only
visible there; see the r4 int32-bitcast lesson in CLAUDE.md) — this
script exists so BENCH_r{N}.json never loses the quality story to a bad
tunnel day.

Usage: python scripts/bench_quality_section.py {2wiki|hotpot|replay}
Env knobs: the same BENCH_* variables bench.py documents per section.
"""

import json
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEFAULT_CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"


def _jsonable(o):
    import numpy as np

    if isinstance(o, np.generic):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON-serializable: {type(o)}")


def main() -> None:
    section = sys.argv[1]
    import jax

    # sitecustomize force-registers the axon backend on this box; the
    # config update (not env vars) is what actually wins before first use
    jax.config.update("jax_platforms", "cpu")

    corpus = os.environ.get("BENCH_2WIKI_CORPUS", DEFAULT_CORPUS)
    out_dir = tempfile.mkdtemp()
    try:
        if section == "2wiki":
            from hipporag_tpu.evaluation.twiki import run_2wiki_eval

            exact_env = os.environ.get("BENCH_2WIKI_EXACT", "all")
            exact_q = (
                None if exact_env == "0"
                else 0 if exact_env == "all" else int(exact_env)
            )
            res = run_2wiki_eval(
                corpus,
                save_dir=out_dir,
                n_queries=int(os.environ.get("BENCH_2WIKI_QUERIES", 0)),
                n_docs=int(os.environ.get("BENCH_2WIKI_DOCS", 0)) or None,
                top_k=20,
                twin_queries=int(os.environ.get("BENCH_2WIKI_TWIN", 128)),
                exact_queries=exact_q,
            )
        elif section == "hotpot":
            from hipporag_tpu.evaluation.hotpot_synth import run_hotpot_eval

            res = run_hotpot_eval(
                corpus,
                save_dir=out_dir,
                n_docs=int(os.environ.get("BENCH_HOTPOT_DOCS", 2000)),
                n_queries=int(os.environ.get("BENCH_HOTPOT_QUERIES", 0)),
            )
        elif section == "replay":
            from hipporag_tpu.evaluation.replay_quality import (
                QUALITY_DOCS_FULL,
                run_replay_quality_eval,
            )

            res = run_replay_quality_eval(
                fixture_path=os.path.join(
                    HERE, "tests", "fixtures",
                    "replay_2wiki_quality_cache.sqlite",
                ),
                save_dir=out_dir,
                corpus_path=corpus,
                n_docs=int(
                    os.environ.get("BENCH_REPLAY_DOCS", QUALITY_DOCS_FULL)
                ),
            )
        else:
            raise SystemExit(f"unknown section: {section!r}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # stdout carries EXACTLY one line (bench.py parses the last line);
    # harness logging goes to stderr via the logging module already
    print(json.dumps(res, default=_jsonable))


if __name__ == "__main__":
    main()
