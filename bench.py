"""Benchmark: batched-query PPR throughput on TPU vs reference-style CPU.

The reference answers each query with one serial C++ PPR solve over the
whole graph (HippoRAG.py:1709-1749 via igraph/prpack). This framework
advances the *entire query batch* through one sparse power iteration on
TPU. The benchmark builds a synthetic knowledge graph shaped like the
real ones (power-law-ish degree, ~10 directed edges/node), runs both, and
reports batched queries/sec with ``vs_baseline`` = TPU qps / CPU qps.

Prints ONE JSON line on stdout; progress goes to stderr.

Env knobs: BENCH_NODES, BENCH_EDGES, BENCH_BATCH, BENCH_ITERS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_synthetic_graph(num_nodes: int, num_edges: int, seed: int = 0):
    """Directed COO entries with a heavy-tailed out-degree distribution."""
    rng = np.random.default_rng(seed)
    # preferential-attachment-ish: sample endpoints from a zipf-weighted pool
    weights = 1.0 / np.arange(1, num_nodes + 1) ** 0.6
    weights /= weights.sum()
    src = rng.choice(num_nodes, size=num_edges, p=weights)
    dst = rng.integers(0, num_nodes, size=num_edges)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, size=len(src)).astype(np.float32)
    return src.astype(np.int64), dst.astype(np.int64), w


def backend_init_hangs(timeout_s: float = 240.0) -> bool:
    """Probe the accelerator backend in an ISOLATED subprocess.

    The tunneled backend has been observed to hang during INIT (before any
    output) for many minutes — an in-process probe can't guard against
    that, because once this process starts backend init it can't abandon
    it. A subprocess that times out or dies is abandoned safely, and the
    caller switches this process to the CPU backend BEFORE first jax use,
    so the bench still emits its JSON line.
    """
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    # the subprocess MUST use the same persistent compilation cache and
    # the same expression probe_device_health compiles — otherwise a
    # merely compile-degraded (but alive) backend pays a fresh compile,
    # exceeds the timeout, and falsely downgrades the whole run to CPU
    code = (
        f"import sys; sys.path.insert(0, {here!r});"
        "from hipporag_tpu.utils.compile_cache import enable_compilation_cache;"
        f"enable_compilation_cache({os.path.join(here, '.jax_cache')!r});"
        "import numpy as np, jax.numpy as jnp;"
        "x = jnp.ones((512, 512));"
        "print(float(np.asarray((x @ x).sum())))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        return proc.returncode != 0
    except subprocess.TimeoutExpired:
        return True
    except Exception as e:  # noqa: BLE001
        log(f"backend subprocess probe errored: {e}")
        return True


def probe_device_health() -> float:
    """Time a small matmul roundtrip; returns seconds (inf on failure).

    The TPU may sit behind a network tunnel; when the link is degraded a
    full-size benchmark would hang. The caller downsizes accordingly.
    """
    import jax
    import jax.numpy as jnp

    try:
        x = jnp.ones((512, 512))
        float(np.asarray((x @ x).sum()))  # warmup: backend init + compile
        t0 = time.perf_counter()
        float(np.asarray((x @ x).sum()))  # steady-state roundtrip
        return time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        log(f"device probe failed: {e}")
        return float("inf")


def main():
    # persistent compilation cache: repeat bench runs skip jit compiles
    from hipporag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    num_nodes = int(os.environ.get("BENCH_NODES", 200_000))
    num_edges = int(os.environ.get("BENCH_EDGES", 2_000_000))
    batch = int(os.environ.get("BENCH_BATCH", 128))
    max_iters = int(os.environ.get("BENCH_ITERS", 64))
    damping, tol = 0.5, 1e-8

    cpu_fallback = (
        os.environ.get("BENCH_SKIP_INIT_PROBE", "0") != "1"
        and backend_init_hangs(
            float(os.environ.get("BENCH_INIT_PROBE_TIMEOUT", 240))
        )
    )
    if cpu_fallback:
        # accelerator backend is hung/unreachable: fall back to CPU before
        # any in-process jax use so the run still produces its JSON line
        import jax

        jax.config.update("jax_platforms", "cpu")
        log("accelerator backend init hung; falling back to CPU backend")

    probe = probe_device_health()
    log(f"device probe: {probe:.2f}s")
    # soft deadline: optional sections are skipped once the elapsed budget
    # is spent, so a mid-run tunnel degradation still yields a JSON line
    bench_start = time.perf_counter()
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 1500))

    def over_deadline(section: str) -> bool:
        elapsed = time.perf_counter() - bench_start
        if elapsed > deadline_s:
            log(f"{section} skipped: {elapsed:.0f}s elapsed > {deadline_s:.0f}s deadline")
            return True
        return False
    overridden = any(
        k in os.environ for k in ("BENCH_NODES", "BENCH_EDGES", "BENCH_BATCH", "BENCH_ITERS")
    )
    if (probe > 5.0 or cpu_fallback) and not overridden:
        # degraded link / CPU fallback: shrink so the benchmark still
        # completes and records
        num_nodes, num_edges, batch = 20_000, 200_000, 32
        log("degraded device link detected; downscaling benchmark sizes")

    log(f"graph: {num_nodes} nodes, {num_edges} directed entries; batch={batch}")
    src, dst, w = build_synthetic_graph(num_nodes, num_edges)

    # symmetric expansion (undirected walk), sorted by dst — matches
    # GraphBuilder.symmetric_coo output
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w])
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]

    # reset vectors: 5 seeds per query
    rng = np.random.default_rng(1)
    seeds = rng.integers(0, num_nodes, size=(batch, 5))
    seed_weights = rng.uniform(0.1, 1.0, size=(batch, 5)).astype(np.float32)

    # ------------------------- CPU baseline (scipy CSR) -------------------------
    import scipy.sparse as sp

    log("building CSR for CPU baseline...")
    strength = np.zeros(num_nodes, dtype=np.float64)
    np.add.at(strength, s2, w2.astype(np.float64))
    w_norm_cpu = w2.astype(np.float64) / strength[s2]
    T = sp.csr_matrix((w_norm_cpu, (d2, s2)), shape=(num_nodes, num_nodes))
    dangling = (strength == 0).astype(np.float64)

    def cpu_ppr(reset_row):
        r = reset_row / reset_row.sum()
        p = r.copy()
        for _ in range(max_iters):
            y = T @ p
            dm = float(dangling @ p)
            p_next = (1 - damping) * r + damping * (y + dm * r)
            if np.max(np.abs(p_next - p)) < tol:
                p = p_next
                break
            p = p_next
        return p

    n_cpu = min(16, batch)
    log(f"CPU baseline: {n_cpu} serial queries...")
    reset_cpu = np.zeros((n_cpu, num_nodes), dtype=np.float64)
    for i in range(n_cpu):
        reset_cpu[i, seeds[i]] = seed_weights[i]
    # best-of-two passes: the serial baseline is sensitive to transient
    # host load, and taking the faster pass is conservative for vs_baseline
    t0 = time.perf_counter()
    cpu_results = [cpu_ppr(reset_cpu[i]) for i in range(n_cpu)]
    pass1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cpu_results = [cpu_ppr(reset_cpu[i]) for i in range(n_cpu)]
    pass2 = time.perf_counter() - t0
    cpu_time = min(pass1, pass2)
    cpu_qps = n_cpu / cpu_time
    log(f"CPU: best of {pass1:.2f}s/{pass2:.2f}s for {n_cpu} queries -> {cpu_qps:.2f} q/s")

    # ------------------------- TPU batched -------------------------
    import jax
    import jax.numpy as jnp

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        COOGraph,
        batched_ppr,
        batched_ppr_ell,
        ell_from_coo,
    )

    log(f"devices: {jax.devices()}")
    node_cap = round_up(num_nodes, 128)
    edge_cap = round_up(len(s2), 1024)
    src_pad = np.zeros(edge_cap, np.int32)
    dst_pad = np.full(edge_cap, node_cap - 1, np.int32)
    wn_pad = np.zeros(edge_cap, np.float32)
    src_pad[: len(s2)] = s2
    dst_pad[: len(s2)] = d2
    wn_pad[: len(s2)] = (w2.astype(np.float64) / strength[s2]).astype(np.float32)
    dang_pad = np.zeros(node_cap, np.float32)
    dang_pad[:num_nodes] = dangling

    graph = COOGraph(
        src=jax.device_put(jnp.asarray(src_pad)),
        dst=jax.device_put(jnp.asarray(dst_pad)),
        w_norm=jax.device_put(jnp.asarray(wn_pad)),
        dangling=jax.device_put(jnp.asarray(dang_pad)),
        num_nodes=jax.device_put(jnp.asarray(num_nodes, jnp.int32)),
    )
    reset = np.zeros((batch, node_cap), dtype=np.float32)
    for i in range(batch):
        reset[i, seeds[i]] = seed_weights[i]
    reset_dev = jax.device_put(jnp.asarray(reset))

    log("building bucketed-ELL operator...")
    ell = ell_from_coo(src_pad, dst_pad, wn_pad, dang_pad, num_nodes, node_cap)
    ell = jax.tree.map(jax.device_put, ell)

    log("compiling + warmup...")
    out = batched_ppr_ell(ell, reset_dev, damping=damping, max_iters=max_iters, tol=tol)
    np.asarray(out[0, 0])

    # numeric cross-check vs CPU baseline
    out_np = np.asarray(out[:n_cpu, :num_nodes], dtype=np.float64)
    max_err = max(
        float(np.max(np.abs(out_np[i] - cpu_results[i]))) for i in range(n_cpu)
    )
    log(f"TPU-vs-CPU max abs err over {n_cpu} queries: {max_err:.3e}")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = batched_ppr_ell(
            ell, reset_dev, damping=damping, max_iters=max_iters, tol=tol
        )
    np.asarray(out[0, 0])  # host sync (block_until_ready is unreliable on tunneled backends)
    tpu_time = (time.perf_counter() - t0) / reps
    tpu_qps = batch / tpu_time
    log(f"TPU ELL: {tpu_time*1e3:.1f}ms per {batch}-query batch -> {tpu_qps:.1f} q/s")

    extra = {}
    # ---------------- COO segment-sum variant ----------------
    try:
        out_coo = batched_ppr(
            graph, reset_dev, damping=damping, max_iters=max_iters, tol=tol
        )
        np.asarray(out_coo[0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out_coo = batched_ppr(
                graph, reset_dev, damping=damping, max_iters=max_iters, tol=tol
            )
        np.asarray(out_coo[0, 0])
        t_coo = (time.perf_counter() - t0) / reps
        extra["tpu_coo_batch_ms"] = round(t_coo * 1e3, 2)
        log(f"TPU COO segment-sum: {t_coo*1e3:.1f}ms per batch")
    except Exception as e:  # noqa: BLE001
        log(f"COO PPR variant skipped: {e}")

    # ---------------- large-batch scaling point ----------------
    # B=2x the headline batch exercises the 128-lane batch tiling in
    # batched_ppr_ell (lax.map over column tiles); throughput must stay
    # monotone in batch size (pre-fix, B=256 was 3.4x the B=128 time).
    if (os.environ.get("BENCH_B2X", "1") != "0" and probe <= 5.0
            and not over_deadline("large-batch")):
        try:
            b2 = 2 * batch
            seeds2 = rng.integers(0, num_nodes, size=(b2, 5))
            sw2 = rng.uniform(0.1, 1.0, size=(b2, 5)).astype(np.float32)
            reset2 = np.zeros((b2, node_cap), dtype=np.float32)
            for i in range(b2):
                reset2[i, seeds2[i]] = sw2[i]
            reset2_dev = jax.device_put(jnp.asarray(reset2))
            out2 = batched_ppr_ell(
                ell, reset2_dev, damping=damping, max_iters=max_iters, tol=tol
            )
            np.asarray(out2[0, 0])
            t0 = time.perf_counter()
            for _ in range(reps):
                out2 = batched_ppr_ell(
                    ell, reset2_dev, damping=damping, max_iters=max_iters,
                    tol=tol,
                )
            np.asarray(out2[0, 0])
            t_b2 = (time.perf_counter() - t0) / reps
            extra["b2x_batch"] = b2
            extra["b2x_batch_ms"] = round(t_b2 * 1e3, 2)
            log(
                f"TPU ELL B={b2}: {t_b2*1e3:.1f}ms per batch -> "
                f"{b2/t_b2:.1f} q/s"
            )
        except Exception as e:  # noqa: BLE001
            log(f"large-batch point skipped: {e}")

    # ---------------- big-graph capacity point ----------------
    # Records the single-chip latency at BASELINE.md scale (1M nodes / 20M
    # directed edges by default) so capacity regressions are visible to the
    # driver. BENCH_BIG=0 disables; skipped on a degraded tunnel.
    if (os.environ.get("BENCH_BIG", "1") != "0" and probe <= 5.0
            and not cpu_fallback and not over_deadline("big-graph")):
        try:
            from hipporag_tpu.ops.pagerank import normalize_symmetric_coo

            big_nodes = int(os.environ.get("BENCH_BIG_NODES", 1_000_000))
            big_edges = int(os.environ.get("BENCH_BIG_EDGES", 10_000_000))
            bsrc, bdst, bw = build_synthetic_graph(big_nodes, big_edges, seed=11)
            big_cap = round_up(big_nodes, 128)
            bs2, bd2, bwn, bdang = normalize_symmetric_coo(
                bsrc, bdst, bw, big_nodes, big_cap
            )
            big_ell = ell_from_coo(bs2, bd2, bwn, bdang, big_nodes, big_cap)
            big_ell = jax.tree.map(jax.device_put, big_ell)
            big_reset = np.zeros((batch, big_cap), dtype=np.float32)
            rng_b = np.random.default_rng(12)
            for i in range(batch):
                big_reset[i, rng_b.integers(0, big_nodes, 5)] = rng_b.uniform(
                    0.1, 1.0, 5
                )
            big_reset_dev = jax.device_put(jnp.asarray(big_reset))
            outb = batched_ppr_ell(
                big_ell, big_reset_dev, damping=damping,
                max_iters=max_iters, tol=tol,
            )
            np.asarray(outb[0, 0])  # compile + warmup
            t0 = time.perf_counter()
            outb = batched_ppr_ell(
                big_ell, big_reset_dev, damping=damping,
                max_iters=max_iters, tol=tol,
            )
            np.asarray(outb[0, 0])
            t_big = time.perf_counter() - t0
            extra["big_graph_nodes"] = big_nodes
            extra["big_graph_edges"] = len(bs2)
            extra["big_graph_batch_ms"] = round(t_big * 1e3, 1)
            log(
                f"big graph: {big_nodes} nodes / {len(bs2)} directed edges, "
                f"{t_big*1e3:.0f}ms per {batch}-query batch "
                f"-> {batch/t_big:.1f} q/s"
            )
            del big_ell, big_reset_dev, outb
        except Exception as e:  # noqa: BLE001
            log(f"big-graph section skipped: {e}")

    # ---------------- end-to-end retrieval pipeline ----------------
    # Index a synthetic corpus with the deterministic mock providers and
    # time the full retrieve() path (scoring -> rerank -> seeds -> PPR ->
    # ranking) for one query batch. BENCH_E2E=0 disables.
    if os.environ.get("BENCH_E2E", "1") != "0" and not over_deadline("e2e"):
        try:
            import tempfile

            from hipporag_tpu import BaseConfig, HippoRAG

            n_docs = int(os.environ.get("BENCH_E2E_DOCS", 2000))
            n_q = int(os.environ.get("BENCH_E2E_QUERIES", 128))
            rng_e = np.random.default_rng(3)
            corpus = [
                f"Entity{i} of group {rng_e.integers(0, n_docs // 10)} relates to "
                f"Entity{rng_e.integers(0, n_docs * 3)} and Entity{rng_e.integers(0, n_docs * 3)}."
                for i in range(n_docs)
            ]
            queries = [
                f"What relates to Entity{rng_e.integers(0, n_docs * 3)}?"
                for _ in range(n_q)
            ]
            tmp = tempfile.mkdtemp()
            rag = HippoRAG(
                global_config=BaseConfig(
                    llm_name="mock", embedding_model_name="mock", save_dir=tmp,
                    ppr_batch_size=n_q, jax_compilation_cache_dir=None,
                )
            )
            t0 = time.perf_counter()
            rag.index(corpus)
            t_index = time.perf_counter() - t0
            rag.retrieve(queries)  # full-size warmup: prepare + compile
            t0 = time.perf_counter()
            results = rag.retrieve(queries)
            t_retr = time.perf_counter() - t0
            extra["e2e_docs"] = n_docs
            extra["e2e_index_s"] = round(t_index, 2)
            extra["e2e_retrieve_qps"] = round(n_q / t_retr, 2)
            gi = rag.get_graph_info()
            extra["e2e_graph_nodes"] = gi["num_total_nodes"]
            assert results[0].docs  # sanity BEFORE publishing the numbers
            log(
                f"e2e: indexed {n_docs} docs in {t_index:.1f}s "
                f"({gi['num_total_nodes']} nodes); retrieve {n_q} queries "
                f"-> {n_q/t_retr:.1f} q/s"
            )
            try:
                # interactive serving latency: one query through the small
                # (b_pad=8) sub-bucket executable, median of 5 after warmup;
                # own try so a probe failure can't mislabel the batch
                # numbers already recorded above
                rag.retrieve(queries[:1])
                lat = []
                for q in queries[:5]:
                    t0 = time.perf_counter()
                    rag.retrieve([q])
                    lat.append(time.perf_counter() - t0)
                extra["e2e_single_query_ms"] = round(
                    sorted(lat)[len(lat) // 2] * 1e3, 1
                )
                log(f"e2e single-query p50: {extra['e2e_single_query_ms']:.0f} ms")
            except Exception as e:  # noqa: BLE001
                log(f"single-query latency probe skipped: {e}")
        except Exception as e:  # noqa: BLE001
            log(f"e2e section skipped: {e}")

    # ---------------- JAX encoder throughput (MXU) ----------------
    # BERT-base-sized random-weight encoder, bf16 on the MXU: the indexing
    # path's embedding forward. Reports docs/s at seq 256 and the achieved
    # model FLOP/s (2 * params * tokens estimate) so MXU utilization is
    # visible. BENCH_ENCODER=0 disables.
    if (os.environ.get("BENCH_ENCODER", "1") != "0" and probe <= 5.0
            and not cpu_fallback and not over_deadline("encoder")):
        try:
            from hipporag_tpu import BaseConfig
            from hipporag_tpu.embedding.jax_encoder import JaxEncoderEmbeddingModel

            enc_cfg = BaseConfig(
                embedding_model_name="jax/random-768x12",
                embedding_max_seq_len=256,
                embedding_batch_size=256,
            )
            enc = JaxEncoderEmbeddingModel(enc_cfg)
            rng_t = np.random.default_rng(7)
            words = [f"w{i:03d}" for i in range(5000)]
            docs_t = [
                " ".join(rng_t.choice(words, size=220)) for _ in range(512)
            ]
            enc.batch_encode(docs_t[:256])  # compile + warmup
            t0 = time.perf_counter()
            out_e = enc.batch_encode(docs_t)
            t_enc = time.perf_counter() - t0
            assert out_e.shape[0] == len(docs_t)
            d_model, n_layers, seq = 768, 12, 256
            n_params = n_layers * 12 * d_model * d_model  # attn+ffn weights
            flops = 2 * n_params * seq * len(docs_t)
            extra["encoder_docs_per_s"] = round(len(docs_t) / t_enc, 1)
            extra["encoder_tflops"] = round(flops / t_enc / 1e12, 1)
            log(
                f"jax encoder (768x12, seq {seq}): {len(docs_t)/t_enc:.0f} "
                f"docs/s, ~{flops/t_enc/1e12:.1f} TFLOP/s achieved"
            )
        except Exception as e:  # noqa: BLE001
            log(f"encoder section skipped: {e}")

    # ---------------- multi-hop quality: graph vs dense ----------------
    # The central HippoRAG capability claim, measured: 2-hop questions
    # where dense retrieval lacks a bridge to the second document.
    if os.environ.get("BENCH_QUALITY", "1") != "0" and not over_deadline("quality"):
        try:
            import tempfile

            from hipporag_tpu import BaseConfig, HippoRAG, StandardRAG

            n_chains = 12
            qdocs, qqs, qgold = [], [], []
            for i in range(n_chains):
                a, bb, c = f"Alpha{i}", f"Bridge{i}", f"Omega{i}"
                d1, d2_ = f"{a} is linked to {bb}.", f"{bb} is linked to {c}."
                qdocs += [d1, d2_]
                qqs.append(f"What does {a} eventually reach?")
                qgold.append([d1, d2_])
            qcfg = dict(llm_name="mock", embedding_model_name="mock",
                        ppr_batch_size=16, jax_compilation_cache_dir=None)
            dense = StandardRAG(global_config=BaseConfig(save_dir=tempfile.mkdtemp(), **qcfg))
            dense.index(qdocs)
            _, dense_overall = dense.retrieve(qqs, gold_docs=qgold)
            g = HippoRAG(global_config=BaseConfig(save_dir=tempfile.mkdtemp(), **qcfg))
            g.index(qdocs)
            _, graph_overall = g.retrieve(qqs, gold_docs=qgold)
            extra["multihop_recall2_graph"] = graph_overall["Recall@2"]
            extra["multihop_recall2_dense"] = dense_overall["Recall@2"]
            log(
                f"multi-hop Recall@2: graph {graph_overall['Recall@2']} "
                f"vs dense {dense_overall['Recall@2']}"
            )
        except Exception as e:  # noqa: BLE001
            log(f"quality section skipped: {e}")

    # ---------------- dataset-scale quality: 2WikiMultihopQA ----------------
    # Real 6k-passage corpus through the production pipeline with the
    # deterministic OpenIE stand-in + hashing embedder, plus a NumPy twin of
    # the retrieval math (evaluation/twiki.py). BENCH_2WIKI=0 disables.
    twiki_corpus = os.environ.get(
        "BENCH_2WIKI_CORPUS",
        "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json",
    )
    if (
        os.environ.get("BENCH_2WIKI", "1") != "0"
        and os.path.exists(twiki_corpus)
        and probe <= 5.0
        and not over_deadline("2wiki")
    ):
        try:
            import tempfile

            from hipporag_tpu.evaluation.twiki import run_2wiki_eval

            res = run_2wiki_eval(
                twiki_corpus,
                save_dir=tempfile.mkdtemp(),
                n_queries=int(os.environ.get("BENCH_2WIKI_QUERIES", 600)),
                n_docs=int(os.environ.get("BENCH_2WIKI_DOCS", 0)) or None,
                top_k=20,
                twin_queries=int(os.environ.get("BENCH_2WIKI_TWIN", 128)),
            )
            extra["2wiki_docs"] = res["corpus_docs"]
            extra["2wiki_queries"] = res["num_queries"]
            extra["2wiki_graph_nodes"] = res["graph_nodes"]
            for kk in (2, 5, 20):
                extra[f"2wiki_recall@{kk}_graph"] = res["recall"][kk]
                extra[f"2wiki_recall@{kk}_dense"] = res["dense_recall"][kk]
                extra[f"2wiki_recall@{kk}_twin"] = res["twin_recall"][kk]
            extra["2wiki_rank_agreement"] = res["rank_agreement"]
            extra["2wiki_index_s"] = res["index_s"]
            extra["2wiki_retrieve_s"] = res["retrieve_s"]
            log(
                f"2wiki ({res['corpus_docs']} docs, {res['num_queries']} queries): "
                f"Recall@5 graph {res['recall'][5]} vs dense {res['dense_recall'][5]}; "
                f"Recall@20 graph {res['recall'][20]} vs dense {res['dense_recall'][20]}; "
                f"twin rank agreement {res['rank_agreement']}"
            )
        except Exception as e:  # noqa: BLE001
            log(f"2wiki section skipped: {e}")

    # ---------------- fused Pallas scoring kernel ----------------
    # TPU-only: the Pallas kernel compiled for the CPU backend runs
    # minutes-slow emulation (tests use interpret=True instead).
    if jax.default_backend() == "tpu" and not over_deadline("fused-topk"):
      try:
        from hipporag_tpu.ops.fused_topk import fused_score_topk
        from hipporag_tpu.ops.scoring import score_and_topk

        nf, dim, bq, kk = 1_000_000, 768, 32, 8
        if probe > 5.0:
            nf = 65_536
        rngs = np.random.default_rng(7)
        qv = jnp.asarray(rngs.standard_normal((bq, dim)).astype(np.float32))
        kv = jnp.asarray(rngs.standard_normal((nf, dim)).astype(np.float32))
        vnf = jnp.asarray(nf, jnp.int32)
        np.asarray(fused_score_topk(qv, kv, vnf, kk)[2])  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fused_score_topk(qv, kv, vnf, kk)
        np.asarray(o[2])
        t_pl = (time.perf_counter() - t0) / reps
        np.asarray(score_and_topk(qv, kv, vnf, kk)[2])  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            o2 = score_and_topk(qv, kv, vnf, kk)
        np.asarray(o2[2])
        t_xla = (time.perf_counter() - t0) / reps
        extra["fused_topk_ms"] = round(t_pl * 1e3, 2)
        extra["fused_topk_xla_ms"] = round(t_xla * 1e3, 2)
        extra["fused_topk_gbps"] = round(nf * dim * 4 / t_pl / 1e9, 1)
        log(
            f"fused score+topk ({nf} x {dim} facts): pallas {t_pl*1e3:.2f}ms "
            f"({nf*dim*4/t_pl/1e9:.0f} GB/s) vs xla {t_xla*1e3:.2f}ms"
        )
      except Exception as e:  # noqa: BLE001
        log(f"fused scoring bench skipped: {e}")

    # effective SpMV bandwidth: per iteration touch ~E*(4B w + 4B idx*2 + 4B gather)
    result = {
        "metric": "batched_ppr_throughput",
        "value": round(tpu_qps, 2),
        "unit": "queries/sec",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "detail": {
            "nodes": num_nodes,
            "directed_edges": int(len(s2)),
            "batch": batch,
            # the baseline is this repo's serial scipy-CSR solver run in
            # the reference's one-solve-per-query style — NOT igraph
            # prpack itself (igraph is not installable here); numerics
            # cross-checked against it via max_err_vs_cpu
            "baseline": "serial scipy-CSR PPR, reference-style per-query",
            "cpu_qps": round(cpu_qps, 2),
            "tpu_batch_ms": round(tpu_time * 1e3, 2),
            "max_err_vs_cpu": max_err,
            **extra,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
