"""Profile the offline indexing path (SURVEY §3.2 — "the expensive path").

Indexes N real 2wiki docs through the production pipeline with mock
OpenIE + the hashing embedder (so LLM/network cost is zero and what
remains is the framework's own host + device work), under cProfile.

Usage:
    python scripts/index_profile.py [n_docs]

Env:
    IDXPROF_BACKEND=cpu|tpu   (default cpu)
"""

import cProfile
import io
import os
import pstats
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("IDXPROF_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from hipporag_tpu import BaseConfig, HippoRAG
from hipporag_tpu.evaluation.twiki import doc_text, load_corpus

CORPUS = os.environ.get(
    "IDXPROF_CORPUS",
    "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json",
)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    save = "/tmp/index_profile"
    shutil.rmtree(save, ignore_errors=True)

    corpus = load_corpus(CORPUS)[:n_docs]
    docs = [doc_text(item) for item in corpus]

    rag = HippoRAG(
        global_config=BaseConfig(
            llm_name="mock",
            embedding_model_name="hashing",
            save_dir=save,
            embedding_dim=1024,
            embedding_batch_size=256,
        )
    )

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    rag.index(docs)
    prof.disable()
    wall = time.time() - t0

    print(f"indexed {len(docs)} docs in {wall:.1f}s "
          f"({len(docs)/wall:.1f} docs/s)", file=sys.stderr)
    print(rag.get_graph_info(), file=sys.stderr)

    s = io.StringIO()
    stats = pstats.Stats(prof, stream=s)
    stats.sort_stats("cumulative").print_stats(45)
    print(s.getvalue())

    s = io.StringIO()
    stats = pstats.Stats(prof, stream=s)
    stats.sort_stats("tottime").print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
