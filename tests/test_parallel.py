"""Sharded kernels on the virtual 8-device CPU mesh: parity vs single-chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipporag_tpu.graph import GraphBuilder, compile_device_graph
from hipporag_tpu.ops import batched_ppr, batched_normalized_scores
from hipporag_tpu.parallel import (
    make_mesh,
    make_sharded_ppr,
    make_sharded_score_topk,
    put_sharded_graph,
    shard_graph,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh((2, 4))


def _random_graph(num_nodes=300, num_edges=2000, seed=0):
    rng = np.random.default_rng(seed)
    builder = GraphBuilder()
    names = [f"n{i}" for i in range(num_nodes)]
    builder.register_nodes(names)
    for _ in range(num_edges):
        a, b = rng.integers(0, num_nodes, 2)
        if a == b:
            continue
        key = (names[a], names[b])
        builder.edge_weights[key] = builder.edge_weights.get(key, 0.0) + float(
            rng.uniform(0.1, 2.0)
        )
    return builder


def test_sharded_ppr_matches_single_chip(mesh):
    builder = _random_graph()
    graph, _, _ = compile_device_graph(builder)
    n_pad = graph.dangling.shape[0]
    n = builder.num_nodes

    rng = np.random.default_rng(5)
    b = 8
    reset = np.zeros((b, n_pad), dtype=np.float32)
    for i in range(b):
        cols = rng.integers(0, n, 5)
        reset[i, cols] = rng.uniform(0.1, 1.0, 5)

    single = np.asarray(batched_ppr(graph, jnp.asarray(reset), max_iters=96, tol=1e-10))

    sg = shard_graph(graph, num_shards=4)
    n_total = 4 * sg.shard_nodes
    reset_pad = np.zeros((b, n_total), dtype=np.float32)
    reset_pad[:, :n_pad] = reset
    sg_dev = put_sharded_graph(mesh, sg)
    run = make_sharded_ppr(mesh, max_iters=96, damping=0.5, tol=1e-10)
    out = np.asarray(run(sg_dev, jnp.asarray(reset_pad)))

    np.testing.assert_allclose(out[:, :n], single[:, :n], atol=2e-6)
    assert np.abs(out[:, n_pad:]).max() == 0.0


def test_sharded_score_topk_matches_single_chip(mesh):
    rng = np.random.default_rng(9)
    b, d, nk = 8, 32, 512
    q = rng.standard_normal((b, d)).astype(np.float32)
    keys = rng.standard_normal((nk, d)).astype(np.float32)
    valid_n = 500  # last rows are padding

    single = np.asarray(
        batched_normalized_scores(jnp.asarray(q), jnp.asarray(keys), jnp.asarray(valid_n))
    )

    run = make_sharded_score_topk(mesh, k=7)
    norm, vals, gidx = run(jnp.asarray(q), jnp.asarray(keys), jnp.asarray(valid_n))
    norm, vals, gidx = np.asarray(norm), np.asarray(vals), np.asarray(gidx)

    np.testing.assert_allclose(norm, single, atol=1e-5)
    expect_idx = np.argsort(-single, axis=1)[:, :7]
    np.testing.assert_allclose(
        vals, np.take_along_axis(single, expect_idx, axis=1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.take_along_axis(single, gidx, axis=1),
        np.take_along_axis(single, expect_idx, axis=1),
        atol=1e-5,
    )


def test_make_hybrid_mesh_single_slice_fallback():
    import jax

    from hipporag_tpu.parallel.mesh import CORPUS_AXIS, DP_AXIS, make_hybrid_mesh

    mesh = make_hybrid_mesh(dp_slices=2)
    assert mesh.axis_names == (DP_AXIS, CORPUS_AXIS)
    assert mesh.shape[DP_AXIS] == 2
    assert mesh.shape[CORPUS_AXIS] == len(jax.devices()) // 2


def test_sharded_ell_ppr_matches_single_device():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import COOGraph, batched_ppr
    from hipporag_tpu.parallel import make_mesh
    from hipporag_tpu.parallel.sharded import (
        make_sharded_ppr_ell, put_sharded_ell, shard_graph_ell,
    )

    rng = np.random.default_rng(21)
    n, b = 700, 8
    src = rng.integers(0, n, 5000); dst = rng.integers(0, n, 5000)
    # hub at node 3
    src = np.concatenate([src, rng.integers(0, n, 800)])
    dst = np.concatenate([dst, np.full(800, 3)])
    keep = src != dst
    src, dst, w = src[keep], dst[keep], rng.uniform(0.5, 2.0, keep.sum())
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    o = np.argsort(d2, kind="stable"); s2, d2, w2 = s2[o], d2[o], w2[o]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128)
    wp = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n] = (strength == 0)
    coo = COOGraph(
        src=s2.astype(np.int32), dst=d2.astype(np.int32), w_norm=wp,
        dangling=dang, num_nodes=np.asarray(n, np.int32),
    )

    devices = jax.devices()[:8]
    mesh = make_mesh((2, 4), devices=devices)
    sg = shard_graph_ell(coo, num_shards=4, bucket_widths=(4, 16, 64),
                         hub_width=128)
    sg_dev = put_sharded_ell(mesh, sg)
    n_total = 4 * sg.shard_nodes

    reset = np.zeros((b, n_total), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)
    ppr = make_sharded_ppr_ell(mesh, max_iters=64, n_hub=sg.n_hub)
    got = np.asarray(ppr(sg_dev, jnp.asarray(reset)))

    # single-device reference on the same graph (pad reset cols to node_cap)
    coo_dev = COOGraph(
        src=jnp.asarray(np.pad(s2.astype(np.int32), (0, 1024 - len(s2) % 1024))),
        dst=jnp.asarray(np.pad(d2.astype(np.int32), (0, 1024 - len(s2) % 1024),
                               constant_values=node_cap - 1)),
        w_norm=jnp.asarray(np.pad(wp, (0, 1024 - len(s2) % 1024))),
        dangling=jnp.asarray(dang),
        num_nodes=jnp.asarray(n, jnp.int32),
    )
    want = np.asarray(
        batched_ppr(coo_dev, jnp.asarray(reset[:, :node_cap]), max_iters=64)
    )
    np.testing.assert_allclose(got[:, :node_cap], want, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got[:, node_cap:], 0.0, atol=1e-9)


def test_sharded_ell_ppr_width_blocked_matches_single_device(monkeypatch):
    """A tiny gather budget forces the sharded solver's per-bucket reduce
    through the width-blocked (and, for wide hub chunks, the row-chunked
    fallback) paths; ranking must stay identical to the default one-shot
    reduce. At pod scale a shard's largest bucket alone can gather a
    multi-GB [nb, W, B] intermediate, so the budget logic is shared with
    the single-chip solver (ops/pagerank._bucket_reduce)."""
    from hipporag_tpu.ops import pagerank as pr

    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", 4096)
    test_sharded_ell_ppr_matches_single_device()


def test_sharded_ell_ppr_tiled_batch_matches_single_device():
    """Per-device batches past one 128-lane tile engage the lax.map column
    tiling inside the sharded halo solver; results must match the
    single-device COO solver, including non-multiple-of-128 padding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import COOGraph, batched_ppr, normalize_symmetric_coo
    from hipporag_tpu.parallel import make_mesh
    from hipporag_tpu.parallel.sharded import (
        make_sharded_ppr_ell, put_sharded_ell, shard_graph_ell,
    )

    rng = np.random.default_rng(31)
    n, b = 600, 160  # dp=1 -> 160 lanes per shard, crosses the 128 tile
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    node_cap = round_up(n, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, node_cap)
    coo = COOGraph(
        src=s2, dst=d2, w_norm=wn, dangling=dang,
        num_nodes=np.asarray(n, np.int32),
    )

    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    sg = shard_graph_ell(coo, num_shards=4, bucket_widths=(4, 16, 64),
                         hub_width=128)
    sg_dev = put_sharded_ell(mesh, sg)
    n_total = 4 * sg.shard_nodes

    reset = np.zeros((b, n_total), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)
    ppr = make_sharded_ppr_ell(mesh, max_iters=64, n_hub=sg.n_hub)
    got = np.asarray(ppr(sg_dev, jnp.asarray(reset)))

    coo_dev = COOGraph(
        src=jnp.asarray(s2), dst=jnp.asarray(d2), w_norm=jnp.asarray(wn),
        dangling=jnp.asarray(dang), num_nodes=jnp.asarray(n, jnp.int32),
    )
    want = np.asarray(
        batched_ppr(coo_dev, jnp.asarray(reset[:, :node_cap]), max_iters=64)
    )
    np.testing.assert_allclose(got[:, :node_cap], want, rtol=1e-5, atol=1e-7)


def test_shard_graph_ell_rejects_directed_operator():
    """The sharded slot-space converter must refuse directed operators as
    loudly as the single-chip one (review r2): zero-in-degree sources map
    to the shared zero slot and would silently drop rank mass."""
    import numpy as np
    import pytest as _pytest

    from hipporag_tpu.ops.pagerank import COOGraph
    from hipporag_tpu.parallel.sharded import shard_graph_ell

    # node 0 has out-edges but no in-edges (directed structure)
    coo = COOGraph(
        src=np.array([0, 1], np.int32),
        dst=np.array([1, 2], np.int32),
        w_norm=np.array([1.0, 1.0], np.float32),
        dangling=np.zeros(128, np.float32),
        num_nodes=np.asarray(3, np.int32),
    )
    with _pytest.raises(ValueError, match="symmetrized"):
        shard_graph_ell(coo, num_shards=4)


def test_full_sharded_retrieval_pipeline_matches_single_device():
    """Compose sharded scoring + seed construction + sharded ELL PPR and
    check document ranking parity with the single-device pipeline."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.models.retrieval import RetrievalIndex, graph_search_batch
    from hipporag_tpu.ops.pagerank import COOGraph
    from hipporag_tpu.parallel import (
        make_mesh,
        make_sharded_ppr_ell,
        make_sharded_score_topk,
        put_sharded_ell,
        shard_graph_ell,
    )

    rng = np.random.default_rng(33)
    n_entities, n_passages, n_facts, dim, b, k = 60, 12, 40, 128, 8, 5
    n_nodes = n_entities + n_passages
    node_cap = round_up(n_nodes + 1, 128)
    pad_slot = node_cap - 1

    # random graph
    edges = {}
    for _ in range(200):
        a, c = rng.integers(0, n_nodes, 2)
        if a != c:
            edges[(min(a, c), max(a, c))] = float(rng.uniform(0.2, 2.0))
    s, d, w = [], [], []
    for (a, c), wt in edges.items():
        s += [a, c]; d += [c, a]; w += [wt, wt]
    s, d, w = np.asarray(s), np.asarray(d), np.asarray(w)
    o = np.argsort(d, kind="stable"); s, d, w = s[o], d[o], w[o]
    strength = np.zeros(n_nodes); np.add.at(strength, s, w)
    wp = (w / strength[s]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n_nodes] = strength == 0
    ecap = round_up(len(s), 1024)
    sp = np.zeros(ecap, np.int32); dp = np.full(ecap, pad_slot, np.int32)
    wpp = np.zeros(ecap, np.float32)
    sp[: len(s)] = s; dp[: len(s)] = d; wpp[: len(s)] = wp
    coo = COOGraph(src=sp, dst=dp, w_norm=wpp, dangling=dang,
                   num_nodes=np.asarray(n_nodes, np.int32))

    fact_cap = round_up(n_facts, 128)
    fact_subj = np.full(fact_cap, pad_slot, np.int32)
    fact_obj = np.full(fact_cap, pad_slot, np.int32)
    fact_subj[:n_facts] = rng.integers(0, n_entities, n_facts)
    fact_obj[:n_facts] = rng.integers(0, n_entities, n_facts)
    pcap = round_up(n_passages, 128)
    passage_node_ids = np.full(pcap, pad_slot, np.int32)
    passage_node_ids[:n_passages] = np.arange(n_entities, n_nodes)
    chunk_counts = np.zeros(node_cap, np.float32)
    chunk_counts[:n_entities] = rng.integers(1, 4, n_entities)

    fact_emb = rng.standard_normal((fact_cap, dim)).astype(np.float32)
    fact_emb[n_facts:] = 0
    qf = rng.standard_normal((b, dim)).astype(np.float32)
    dpr = rng.standard_normal((b, pcap)).astype(np.float32)

    # ---------------- single-device reference pipeline ----------------
    index = RetrievalIndex(
        graph=jax.tree.map(jnp.asarray, coo),
        fact_subj_node=jnp.asarray(fact_subj),
        fact_obj_node=jnp.asarray(fact_obj),
        node_chunk_counts=jnp.asarray(chunk_counts),
        passage_node_ids=jnp.asarray(passage_node_ids),
        num_facts=jnp.asarray(n_facts, jnp.int32),
        num_passages=jnp.asarray(n_passages, jnp.int32),
    )
    from hipporag_tpu.ops.scoring import score_and_topk

    _, vals, idx = score_and_topk(
        jnp.asarray(qf), jnp.asarray(fact_emb), jnp.asarray(n_facts, jnp.int32), k
    )
    mask = (jnp.asarray(vals) > 0).astype(jnp.float32)
    want = np.asarray(
        graph_search_batch(index, vals, idx, mask, jnp.asarray(dpr),
                           link_top_k=k, ppr_max_iters=96, ppr_tol=1e-10)
    )[:, :n_passages]

    # ---------------- sharded pipeline ----------------
    mesh = make_mesh((2, 4), devices=jax.devices()[:8])
    score = make_sharded_score_topk(mesh, k=k)
    fpad = round_up(fact_cap, 4)  # divisible by corpus axis
    fact_emb_p = np.zeros((fpad, dim), np.float32); fact_emb_p[:fact_cap] = fact_emb
    norm_s, vals_s, idx_s = score(
        jnp.asarray(qf), jnp.asarray(fact_emb_p), jnp.asarray(n_facts, jnp.int32)
    )
    vals_s, idx_s = np.asarray(vals_s), np.asarray(idx_s)
    np.testing.assert_array_equal(idx_s, np.asarray(idx))

    # host-side seed construction: the SHIPPED helper the orchestrator uses
    from hipporag_tpu.parallel.seeds import build_reset_vectors

    sge = shard_graph_ell(coo, num_shards=4, bucket_widths=(4, 16, 64))
    n_total = 4 * sge.shard_nodes
    mask_np = (vals_s > 0).astype(np.float32)
    reset, _dprn, _has = build_reset_vectors(
        vals_s, idx_s, mask_np, dpr[:, :n_passages],
        fact_subj, fact_obj, passage_node_ids[:n_passages], chunk_counts,
        num_nodes=n_nodes, n_total=n_total, link_top_k=k,
        passage_node_weight=0.05,
    )

    ppr = make_sharded_ppr_ell(mesh, max_iters=96, tol=1e-10, n_hub=sge.n_hub)
    ranks = np.asarray(ppr(put_sharded_ell(mesh, sge), jnp.asarray(reset)))
    got = ranks[:, passage_node_ids[:n_passages]]

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_device_seed_builder_matches_host_twin():
    import jax.numpy as jnp
    import numpy as np

    from hipporag_tpu.models.retrieval import build_reset_batch
    from hipporag_tpu.parallel.seeds import build_reset_vectors

    rng = np.random.default_rng(44)
    b, k, n_cap, n_facts, p = 6, 5, 256, 40, 10
    n_total = 384
    fact_subj = rng.integers(0, 100, n_facts).astype(np.int32)
    fact_obj = rng.integers(0, 100, n_facts).astype(np.int32)
    chunk_counts = rng.integers(0, 5, n_cap).astype(np.float32)
    passage_ids = np.arange(100, 100 + p, dtype=np.int32)
    top_idx = rng.integers(0, n_facts, (b, k)).astype(np.int32)
    top_mask = (rng.uniform(size=(b, k)) > 0.4).astype(np.float32)
    top_mask[2] = 0.0
    sel = (rng.uniform(0.1, 1.0, (b, k)) * top_mask).astype(np.float32)
    dpr_raw = rng.standard_normal((b, p)).astype(np.float32)

    host_reset, dpr_norm, _ = build_reset_vectors(
        sel, top_idx, top_mask, dpr_raw, fact_subj, fact_obj, passage_ids,
        chunk_counts, num_nodes=120, n_total=n_total, link_top_k=k,
    )
    dev_reset = np.asarray(
        build_reset_batch(
            jnp.asarray(sel), jnp.asarray(top_idx), jnp.asarray(top_mask),
            jnp.asarray(dpr_norm), jnp.asarray(fact_subj), jnp.asarray(fact_obj),
            jnp.asarray(chunk_counts), jnp.asarray(passage_ids),
            jnp.asarray(120, jnp.int32), n_total=n_total, link_top_k=k,
        )
    )
    np.testing.assert_allclose(dev_reset, host_reset, rtol=1e-6, atol=1e-7)


def test_halo_exchange_comm_scales_with_cut():
    """VERDICT r1 #2: ICI bytes/iteration must scale with the edge cut, not
    N_total. A near-block-diagonal graph (shards almost disconnected) must
    produce a tiny halo capacity, and the solve must still match the
    single-device solver."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import COOGraph, batched_ppr
    from hipporag_tpu.parallel import make_mesh
    from hipporag_tpu.parallel.sharded import (
        make_sharded_ppr_ell, put_sharded_ell, shard_graph_ell,
    )

    rng = np.random.default_rng(5)
    n, b, shards = 2048, 8, 4
    per = n // shards  # 512 (= shard width after 128-alignment)
    # dense-ish edges WITHIN each shard's node range
    src_l, dst_l = [], []
    for s in range(shards):
        lo = s * per
        src_l.append(rng.integers(lo, lo + per, 4000))
        dst_l.append(rng.integers(lo, lo + per, 4000))
    # only 6 cross-shard edges: the entire cut
    src_l.append(np.array([10, 600, 1100, 1700, 20, 1500]))
    dst_l.append(np.array([600, 1100, 1700, 10, 1040, 30]))
    src = np.concatenate(src_l); dst = np.concatenate(dst_l)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src))
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    o = np.argsort(d2, kind="stable"); s2, d2, w2 = s2[o], d2[o], w2[o]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128)
    wp = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n] = (strength == 0)
    coo = COOGraph(src=s2.astype(np.int32), dst=d2.astype(np.int32),
                   w_norm=wp, dangling=dang, num_nodes=np.asarray(n, np.int32))

    sg = shard_graph_ell(coo, num_shards=shards)
    # halo capacity bounded by the cut (aligned to 8), NOT by shard width
    assert sg.halo_width <= 8, sg.halo_width
    assert sg.shard_nodes == 512
    # bytes/iter/device: C*H*B*4 vs the old all_gather Ns*C*B*4
    halo_bytes = shards * sg.halo_width * b * 4
    allgather_bytes = sg.shard_nodes * shards * b * 4
    assert halo_bytes < allgather_bytes / 20

    mesh = make_mesh((2, 4), devices=jax.devices()[:8])
    sg_dev = put_sharded_ell(mesh, sg)
    reset = np.zeros((b, shards * sg.shard_nodes), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)
    ppr = make_sharded_ppr_ell(mesh, max_iters=64)
    got = np.asarray(ppr(sg_dev, jnp.asarray(reset)))

    coo_dev = COOGraph(
        src=jnp.asarray(np.pad(s2.astype(np.int32), (0, 1024 - len(s2) % 1024))),
        dst=jnp.asarray(np.pad(d2.astype(np.int32), (0, 1024 - len(s2) % 1024),
                               constant_values=node_cap - 1)),
        w_norm=jnp.asarray(np.pad(wp, (0, 1024 - len(s2) % 1024))),
        dangling=jnp.asarray(dang),
        num_nodes=jnp.asarray(n, jnp.int32),
    )
    want = np.asarray(
        batched_ppr(coo_dev, jnp.asarray(reset[:, :node_cap]), max_iters=64)
    )
    np.testing.assert_allclose(got[:, :node_cap], want, rtol=1e-5, atol=1e-7)


def test_adapter_sharded_training_matches_single_device_and_learns(mesh):
    """The dp+tp adapter train step (batch dp-sharded, hidden corpus-
    sharded, Adam moments sharded with params) must follow the exact same
    trajectory as the plain single-device step, and several steps must
    actually reduce the InfoNCE loss."""
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hipporag_tpu.models.adapter import (
        init_adapter, make_sharded_train_step, make_train_step,
    )
    import jax

    dim, hidden, b = 16, 32, 8
    rng = np.random.default_rng(0)
    queries = rng.standard_normal((b, dim)).astype(np.float32)
    # positives are a fixed random rotation of the queries: the identity-
    # like adapter init is far from optimal, so the loss has room to drop
    rot, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    positives = (queries @ rot.astype(np.float32)).astype(np.float32)

    opt = optax.adamw(1e-2)
    params0 = init_adapter(jax.random.PRNGKey(0), dim, hidden)

    # single-device reference trajectory
    ref_step = make_train_step(opt)
    p_ref, s_ref = params0, opt.init(params0)
    ref_losses = []
    for _ in range(5):
        p_ref, s_ref, loss = ref_step(p_ref, s_ref, queries, positives)
        ref_losses.append(float(loss))

    # sharded trajectory on the (2, 4) mesh
    sh_step, place = make_sharded_train_step(mesh, opt)
    p_sh, s_sh, q_d, pos_d = place(
        params0, opt.init(params0), jnp.asarray(queries), jnp.asarray(positives)
    )
    sh_losses = []
    for _ in range(5):
        p_sh, s_sh, loss = sh_step(p_sh, s_sh, q_d, pos_d)
        sh_losses.append(float(loss))

    np.testing.assert_allclose(sh_losses, ref_losses, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_sh.w_in), np.asarray(p_ref.w_in), rtol=1e-4, atol=1e-5
    )
    # learning happened
    assert sh_losses[-1] < sh_losses[0]
