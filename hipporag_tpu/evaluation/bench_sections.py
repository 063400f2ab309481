"""Single source of truth for the bench graph-vs-dense quality sections.

bench.py runs these three sections in-process on the real device when the
link is healthy (TPU-lowering bugs are only visible there — see the r4
int32-bitcast lesson) and in a forced-CPU subprocess
(scripts/bench_quality_section.py) when the tunnel is degraded. Both
paths resolve the BENCH_* knobs through `run_section` below, so a default
bumped or a knob added in one place cannot make healthy and degraded runs
silently measure different configurations.
"""

import os

DEFAULT_CORPUS = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"
SECTIONS = ("2wiki", "hotpot", "musique", "replay", "multihop")

# repo root (this file lives at <repo>/hipporag_tpu/evaluation/)
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def corpus_path() -> str:
    return os.environ.get("BENCH_2WIKI_CORPUS", DEFAULT_CORPUS)


def run_section(section: str, save_dir: str, repo_root: str = _REPO_ROOT):
    """Resolve one quality section's BENCH_* env knobs and run it.

    Returns the section's result dict (see evaluation/twiki.py,
    hotpot_synth.py, replay_quality.py). Raises ValueError on an unknown
    section name — callers must fail loudly, not skip silently.
    """
    corpus = corpus_path()
    if section == "2wiki":
        from .twiki import run_2wiki_eval

        # BENCH_2WIKI_EXACT: unset/"all" = every query, "0" = off
        # (matching the other BENCH_*=0 disable convention), N = first N
        exact_env = os.environ.get("BENCH_2WIKI_EXACT", "all")
        exact_q = (
            None if exact_env == "0"
            else 0 if exact_env == "all" else int(exact_env)
        )
        # n_queries default 0 = every synthesizable query (1206 on the
        # full corpus) — maximum paired statistical power (VERDICT r3 #2)
        return run_2wiki_eval(
            corpus,
            save_dir=save_dir,
            n_queries=int(os.environ.get("BENCH_2WIKI_QUERIES", 0)),
            n_docs=int(os.environ.get("BENCH_2WIKI_DOCS", 0)) or None,
            top_k=20,
            twin_queries=int(os.environ.get("BENCH_2WIKI_TWIN", 128)),
            exact_queries=exact_q,
        )
    if section == "hotpot":
        from .hotpot_synth import run_hotpot_eval

        return run_hotpot_eval(
            corpus,
            save_dir=save_dir,
            n_docs=int(os.environ.get("BENCH_HOTPOT_DOCS", 2000)),
            n_queries=int(os.environ.get("BENCH_HOTPOT_QUERIES", 0)),
        )
    if section == "musique":
        from .musique_synth import run_musique_eval

        return run_musique_eval(
            corpus,
            save_dir=save_dir,
            n_docs=int(os.environ.get("BENCH_MUSIQUE_DOCS", 2000)),
            n_queries=int(os.environ.get("BENCH_MUSIQUE_QUERIES", 0)),
        )
    if section == "multihop":
        from .multihop import run_multihop_eval

        # no BENCH_* knobs: the chain corpus is tiny and fixed
        return run_multihop_eval(save_dir=save_dir)
    if section == "replay":
        from .replay_quality import (
            QUALITY_DOCS_FULL,
            run_replay_quality_eval,
        )

        # bench replays the FULL recorded slice (2500 docs, 473 queries)
        # for statistical power at R@2; the pinned test replays the
        # 1000-doc slice. Only these two doc counts are in the fixture —
        # the filter prompts' cache keys depend on the whole indexed
        # graph, so other sizes would replay-miss.
        return run_replay_quality_eval(
            fixture_path=os.path.join(
                repo_root, "tests", "fixtures",
                "replay_2wiki_quality_cache.sqlite",
            ),
            save_dir=save_dir,
            corpus_path=corpus,
            n_docs=int(os.environ.get("BENCH_REPLAY_DOCS", QUALITY_DOCS_FULL)),
        )
    raise ValueError(f"unknown quality section: {section!r}")
