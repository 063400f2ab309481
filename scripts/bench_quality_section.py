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

The BENCH_* knob resolution lives in
hipporag_tpu/evaluation/bench_sections.py, shared with bench.py's
in-process path, so healthy and degraded runs cannot drift apart.

Usage: python scripts/bench_quality_section.py {2wiki|hotpot|musique|replay|multihop}
Env knobs: the same BENCH_* variables bench.py documents per section.
"""

import json
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


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

    from hipporag_tpu.evaluation.bench_sections import run_section

    out_dir = tempfile.mkdtemp()
    try:
        res = run_section(section, save_dir=out_dir, repo_root=HERE)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # stdout carries EXACTLY one line (bench.py parses the last line);
    # harness logging goes to stderr via the logging module already
    print(json.dumps(res, default=_jsonable))


if __name__ == "__main__":
    main()
