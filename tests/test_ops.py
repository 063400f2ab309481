"""Numeric tests for the TPU compute core (run on CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hipporag_tpu.graph import GraphBuilder, compile_device_graph
from hipporag_tpu.ops import (
    batched_normalized_scores,
    batched_ppr,
    min_max_normalize,
    ppr_numpy_reference,
    retrieve_knn,
    score_and_topk,
    streaming_topk_scores,
)


def _random_graph(num_nodes=60, num_edges=300, seed=0):
    rng = np.random.default_rng(seed)
    builder = GraphBuilder()
    names = [f"n{i}" for i in range(num_nodes)]
    builder.register_nodes(names)
    for _ in range(num_edges):
        a, b = rng.integers(0, num_nodes, 2)
        if a == b:
            continue
        w = float(rng.uniform(0.1, 3.0))
        key = (names[a], names[b])
        builder.edge_weights[key] = builder.edge_weights.get(key, 0.0) + w
    return builder


def test_min_max_normalize_matches_reference():
    x = jnp.asarray([[1.0, 3.0, 2.0], [5.0, 5.0, 5.0]])
    out = np.asarray(min_max_normalize(x))
    np.testing.assert_allclose(out[0], [0.0, 1.0, 0.5])
    np.testing.assert_allclose(out[1], [1.0, 1.0, 1.0])


def test_min_max_normalize_with_padding_mask():
    x = jnp.asarray([[1.0, 3.0, 100.0]])
    mask = jnp.asarray([[True, True, False]])
    out = np.asarray(min_max_normalize(x, where=mask))
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]])


def test_batched_scores_with_valid_mask():
    q = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    keys = jnp.asarray(np.eye(3, 4, dtype=np.float32))  # row 2 is "padding"
    out = np.asarray(batched_normalized_scores(q, keys, jnp.asarray(2)))
    assert out.shape == (2, 3)
    assert out[0, 2] == 0.0  # padded key masked out
    assert out[0, 0] == 1.0 and out[0, 1] == 0.0


def test_score_and_topk():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    keys = rng.standard_normal((50, 16)).astype(np.float32)
    scores, vals, idx = score_and_topk(jnp.asarray(q), jnp.asarray(keys), jnp.asarray(50), 5)
    ref = q @ keys.T
    ref_norm = np.stack([(r - r.min()) / (r.max() - r.min()) for r in ref])
    np.testing.assert_allclose(np.asarray(scores), ref_norm, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(-ref_norm, axis=1)[:, :5])


def test_streaming_topk_matches_full_matmul():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((7, 24)).astype(np.float32)
    keys = rng.standard_normal((103, 24)).astype(np.float32)
    vals, idx = streaming_topk_scores(
        jnp.asarray(q), jnp.asarray(keys), jnp.asarray(103), k=9, key_chunk=32
    )
    full = q @ keys.T
    expect_idx = np.argsort(-full, axis=1)[:, :9]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(full, expect_idx, axis=1), atol=1e-4
    )
    # indices may differ on exact ties only; values above guarantee correctness
    np.testing.assert_allclose(
        np.take_along_axis(full, np.asarray(idx), axis=1),
        np.take_along_axis(full, expect_idx, axis=1),
        atol=1e-4,
    )


def test_retrieve_knn_interface():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = [f"e{i}" for i in range(20)]
    out = retrieve_knn(ids, ids, vecs, vecs, k=4, query_batch_size=6, key_batch_size=7)
    assert set(out.keys()) == set(ids)
    for qid, (nbrs, scores) in out.items():
        assert len(nbrs) == 4
        assert nbrs[0] == qid  # self-similarity = 1.0 is always the top hit
        assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("damping", [0.5, 0.85])
def test_batched_ppr_matches_dense_reference(damping):
    builder = _random_graph()
    graph, _, _ = compile_device_graph(builder, capacity_factor=1.3)
    n = builder.num_nodes

    rng = np.random.default_rng(7)
    reset = np.zeros((5, graph.dangling.shape[0]), dtype=np.float32)
    reset[:, :n] = rng.uniform(0, 1, (5, n)) * (rng.uniform(0, 1, (5, n)) > 0.7)
    reset[0, :n] = 0.0
    reset[0, 3] = 1.0  # single-seed query

    src, dst, w = builder.symmetric_coo()
    expected = ppr_numpy_reference(n, zip(src, dst, w), reset[:, :n], damping=damping)

    out = np.asarray(
        batched_ppr(graph, jnp.asarray(reset), damping=damping, max_iters=128, tol=1e-10)
    )
    np.testing.assert_allclose(out[:, :n], expected, atol=2e-6)
    # padded node columns stay ~0
    assert np.abs(out[:, n:]).max() < 1e-6
    # each row is a probability distribution
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)


def test_ppr_dangling_nodes_redistribute_to_reset():
    builder = GraphBuilder()
    builder.register_nodes(["a", "b", "isolated"])
    builder.edge_weights[("a", "b")] = 1.0
    graph, _, _ = compile_device_graph(builder)
    reset = np.zeros((1, graph.dangling.shape[0]), dtype=np.float32)
    reset[0, 2] = 1.0  # all teleport mass on the isolated node
    out = np.asarray(batched_ppr(graph, jnp.asarray(reset), damping=0.5, max_iters=64))
    src, dst, w = builder.symmetric_coo()
    expected = ppr_numpy_reference(3, zip(src, dst, w), reset[:, :3], damping=0.5)
    np.testing.assert_allclose(out[0, :3], expected[0], atol=1e-6)
    assert out[0, 2] > 0.5  # isolated seed keeps most of its mass


def test_ppr_nan_negative_reset_sanitized():
    builder = _random_graph(num_nodes=10, num_edges=30)
    graph, _, _ = compile_device_graph(builder)
    reset = np.zeros((1, graph.dangling.shape[0]), dtype=np.float32)
    reset[0, 0] = np.nan
    reset[0, 1] = -5.0
    reset[0, 2] = 2.0
    out = np.asarray(batched_ppr(graph, jnp.asarray(reset)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(), 1.0, atol=1e-5)


def test_graph_builder_fact_edge_weights():
    builder = GraphBuilder()
    from hipporag_tpu.utils.misc import compute_mdhash_id

    triples = [("Erik Hort", "born in", "Montebello"), ("Erik Hort", "plays", "Soccer")]
    builder.add_fact_edges(["chunk-1"], [triples])
    builder.add_fact_edges(["chunk-1"], [triples])  # idempotent: chunk marked later
    builder.mark_chunks_indexed(["chunk-1"])
    builder.add_fact_edges(["chunk-1"], [triples])  # no double count once indexed

    e = compute_mdhash_id("Erik Hort", prefix="entity-")
    m = compute_mdhash_id("Montebello", prefix="entity-")
    # two un-indexed passes accumulated twice -> weight 2 per direction
    assert builder.edge_weights[(e, m)] == 2.0
    assert builder.edge_weights[(m, e)] == 2.0
    assert builder.ent_node_to_chunk_ids[e] == {"chunk-1"}


def test_graph_builder_delete_vertices():
    builder = _random_graph(num_nodes=10, num_edges=40)
    victim = builder.node_names[3]
    builder.delete_vertices({victim})
    assert victim not in builder.node_to_idx
    assert all(victim not in e for e in builder.edge_weights)
    assert builder.num_nodes == 9
    # compile still works
    graph, _, _ = compile_device_graph(builder)
    assert int(graph.num_nodes) == 9


def test_capacity_reuse_avoids_recompile():
    builder = _random_graph(num_nodes=50, num_edges=200)
    g1, ncap1, ecap1 = compile_device_graph(builder)
    # add a few nodes/edges within capacity
    builder.register_nodes(["extra1", "extra2"])
    builder.edge_weights[("extra1", "extra2")] = 1.0
    g2, ncap2, ecap2 = compile_device_graph(builder, node_capacity=ncap1, edge_capacity=ecap1)
    assert (ncap2, ecap2) == (ncap1, ecap1)
    assert g2.src.shape == g1.src.shape and g2.dangling.shape == g1.dangling.shape


def test_batched_ppr_bf16_ranking_agrees_with_f32():
    """bf16 gather traffic mode must preserve top-k ranking."""
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import COOGraph, batched_ppr

    rng = np.random.default_rng(3)
    n, e, b = 512, 4096, 8
    src = rng.integers(0, n, e); dst = rng.integers(0, n, e)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], rng.uniform(0.5, 2.0, keep.sum())
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128); edge_cap = round_up(len(s2), 1024)
    sp = np.zeros(edge_cap, np.int32); dp = np.full(edge_cap, node_cap - 1, np.int32)
    wp = np.zeros(edge_cap, np.float32)
    sp[: len(s2)] = s2; dp[: len(s2)] = d2
    wp[: len(s2)] = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32)
    dang[:n] = (strength == 0)
    graph = COOGraph(
        src=jnp.asarray(sp), dst=jnp.asarray(dp), w_norm=jnp.asarray(wp),
        dangling=jnp.asarray(dang), num_nodes=jnp.asarray(n, jnp.int32),
    )
    reset = np.zeros((b, node_cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 4)] = rng.uniform(0.2, 1.0, 4)

    p32 = np.asarray(batched_ppr(graph, jnp.asarray(reset)))
    pbf = np.asarray(batched_ppr(graph, jnp.asarray(reset), compute_dtype="bfloat16"))
    # scores close and top-10 rankings nearly identical
    assert np.max(np.abs(p32 - pbf)) < 5e-3
    for i in range(b):
        top32 = set(np.argsort(-p32[i])[:10])
        topbf = set(np.argsort(-pbf[i])[:10])
        assert len(top32 & topbf) >= 8


def test_batched_ppr_edge_chunked_matches_unchunked():
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import COOGraph, batched_ppr

    rng = np.random.default_rng(5)
    n, e, b = 256, 2000, 4
    src = rng.integers(0, n, e); dst = rng.integers(0, n, e)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], rng.uniform(0.5, 2.0, keep.sum())
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128); edge_cap = round_up(len(s2), 1024)
    sp = np.zeros(edge_cap, np.int32); dp = np.full(edge_cap, node_cap - 1, np.int32)
    wp = np.zeros(edge_cap, np.float32)
    sp[: len(s2)] = s2; dp[: len(s2)] = d2
    wp[: len(s2)] = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n] = (strength == 0)
    graph = COOGraph(
        src=jnp.asarray(sp), dst=jnp.asarray(dp), w_norm=jnp.asarray(wp),
        dangling=jnp.asarray(dang), num_nodes=jnp.asarray(n, jnp.int32),
    )
    reset = np.zeros((b, node_cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = 1.0

    base = np.asarray(batched_ppr(graph, jnp.asarray(reset)))
    for chunks in (2, 7):
        chunked = np.asarray(
            batched_ppr(graph, jnp.asarray(reset), edge_chunks=chunks)
        )
        np.testing.assert_allclose(chunked, base, rtol=1e-5, atol=1e-7)


def test_batched_ppr_ell_matches_coo():
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        COOGraph, batched_ppr, batched_ppr_ell, ell_from_coo,
    )

    rng = np.random.default_rng(11)
    n, b = 600, 8
    # power-law-ish degrees incl. a hub node with very high in-degree
    src = rng.integers(0, n, 6000)
    dst = rng.integers(0, n, 6000)
    src = np.concatenate([src, rng.integers(0, n, 1500)])
    dst = np.concatenate([dst, np.zeros(1500, np.int64)])  # node 0 = hub
    keep = src != dst
    src, dst, w = src[keep], dst[keep], rng.uniform(0.5, 2.0, keep.sum())
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128); edge_cap = round_up(len(s2), 1024)
    sp = np.zeros(edge_cap, np.int32); dp = np.full(edge_cap, node_cap - 1, np.int32)
    wp = np.zeros(edge_cap, np.float32)
    sp[: len(s2)] = s2; dp[: len(s2)] = d2
    wp[: len(s2)] = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n] = (strength == 0)

    coo = COOGraph(
        src=jnp.asarray(sp), dst=jnp.asarray(dp), w_norm=jnp.asarray(wp),
        dangling=jnp.asarray(dang), num_nodes=jnp.asarray(n, jnp.int32),
    )
    ell = ell_from_coo(sp, dp, wp, dang[:node_cap], n, node_cap,
                       bucket_widths=(4, 16, 64), hub_width=128)
    reset = np.zeros((b, node_cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)

    base = np.asarray(batched_ppr(coo, jnp.asarray(reset)))
    got = np.asarray(batched_ppr_ell(ell, jnp.asarray(reset)))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-7)


def test_batched_ppr_ell_tiled_batch_matches_coo():
    """B > 128 engages the lax.map batch-tiling path (the XLA gather has a
    latency cliff past one 128-lane tile); results must be identical to the
    COO solver, including the non-multiple-of-128 padding columns."""
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        COOGraph, batched_ppr, batched_ppr_ell, ell_from_coo,
        normalize_symmetric_coo,
    )

    rng = np.random.default_rng(17)
    n, b = 500, 160  # 160 > 128 and not a multiple of the tile
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    node_cap = round_up(n, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, node_cap)

    coo = COOGraph(
        src=jnp.asarray(s2), dst=jnp.asarray(d2), w_norm=jnp.asarray(wn),
        dangling=jnp.asarray(dang), num_nodes=jnp.asarray(n, jnp.int32),
    )
    ell = ell_from_coo(s2, d2, wn, dang, n, node_cap,
                       bucket_widths=(4, 16, 64), hub_width=128)
    reset = np.zeros((b, node_cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)

    base = np.asarray(batched_ppr(coo, jnp.asarray(reset)))
    got = np.asarray(batched_ppr_ell(ell, jnp.asarray(reset)))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-7)

    # untiled anchor: B=160 engages tiling in BOTH solvers above, so a
    # shared tile_columns bug could cancel — the first rows must also
    # match a small untiled (B=2) solve of the same reset vectors
    anchor = np.asarray(batched_ppr(coo, jnp.asarray(reset[:2])))
    np.testing.assert_allclose(got[:2], anchor, rtol=1e-5, atol=1e-7)


def test_ell_min_caps_keep_shapes_and_results():
    """Sticky ELL capacities (incremental-index recompile avoidance): a
    grown graph rebuilt with the previous build's min_caps must keep every
    pytree shape (so jitted consumers are reused) AND solve to the same
    answer as a fresh build of the grown graph."""
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        batched_ppr_ell, ell_caps, ell_from_coo, normalize_symmetric_coo,
    )

    rng = np.random.default_rng(23)
    n, node_cap = 700, round_up(700, 128)

    def build_coo(n_edges, seed):
        r = np.random.default_rng(seed)
        src = r.integers(0, n, n_edges)
        dst = r.integers(0, n, n_edges)
        keep = src != dst
        w = r.uniform(0.5, 2.0, keep.sum()).astype(np.float32)
        return normalize_symmetric_coo(src[keep], dst[keep], w, n, node_cap)

    kw = dict(bucket_widths=(2, 4, 8, 16), hub_width=64, row_multiple=16)
    s2, d2, wn, dang = build_coo(2000, 1)
    ell_small = ell_from_coo(s2, d2, wn, dang, n, node_cap, **kw)
    caps = ell_caps(ell_small)

    # grown graph: 2.5x the edges shifts nodes between degree buckets and
    # grows hub rows — without min_caps the shapes change
    s3, d3, wn3, dang3 = build_coo(5000, 2)
    fresh = ell_from_coo(s3, d3, wn3, dang3, n, node_cap, **kw)
    sticky = ell_from_coo(
        s3, d3, wn3, dang3, n, node_cap, min_caps=caps, **kw
    )
    grown_caps = ell_caps(sticky)
    for key in ("bucket_rows", "hub_rows", "n_hub_cap"):
        want = caps[key]
        got = grown_caps[key]
        if isinstance(want, tuple):
            assert all(g >= w_ for g, w_ in zip(got, want)), (key, got, want)
        else:
            assert got >= want, (key, got, want)

    # and the DOWN direction: rebuilding the SMALL graph with the grown
    # caps keeps the grown shapes exactly (this is the executable-reuse
    # case after a delete/shrink)
    shrunk = ell_from_coo(s2, d2, wn, dang, n, node_cap, min_caps=grown_caps, **kw)
    assert ell_caps(shrunk) == grown_caps

    reset = np.zeros((4, node_cap), np.float32)
    for i in range(4):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)
    want = np.asarray(batched_ppr_ell(fresh, jnp.asarray(reset)))
    got = np.asarray(batched_ppr_ell(sticky, jnp.asarray(reset)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    got_small_fresh = np.asarray(batched_ppr_ell(ell_small, jnp.asarray(reset)))
    got_small_sticky = np.asarray(batched_ppr_ell(shrunk, jnp.asarray(reset)))
    np.testing.assert_allclose(got_small_sticky, got_small_fresh, rtol=1e-6, atol=1e-8)


def test_ell_min_caps_numpy_path_matches_native(monkeypatch):
    """The numpy fallback packer must produce the same ELLGraph as the
    native C++ packer under min_caps (both route through _build, but the
    pre-_build layouts differ — this pins them)."""
    import numpy as np

    import hipporag_tpu.graph.native as native_mod
    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        ell_caps, ell_from_coo, normalize_symmetric_coo,
    )

    if not native_mod.native_available():
        pytest.skip("native graph core not built")

    rng = np.random.default_rng(31)
    n, node_cap = 600, round_up(600, 128)
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n, 3000)
    keep = src != dst
    w = rng.uniform(0.5, 2.0, keep.sum()).astype(np.float32)
    s2, d2, wn, dang = normalize_symmetric_coo(src[keep], dst[keep], w, n, node_cap)

    kw = dict(bucket_widths=(2, 4, 8, 16), hub_width=64, row_multiple=16)
    min_caps = {
        "bucket_rows": (64, 160, 64, 32),
        "hub_rows": 32,
        "n_hub_cap": 128,
    }
    ell_native = ell_from_coo(s2, d2, wn, dang, n, node_cap, min_caps=min_caps, **kw)
    monkeypatch.setattr(native_mod, "ell_pack", lambda *a, **k: None)
    ell_numpy = ell_from_coo(s2, d2, wn, dang, n, node_cap, min_caps=min_caps, **kw)

    import jax

    assert ell_caps(ell_native) == ell_caps(ell_numpy)
    for a, b in zip(jax.tree.leaves(ell_native), jax.tree.leaves(ell_numpy)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_ppr_ell_chebyshev_matches_power():
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import batched_ppr_ell, ell_from_coo

    rng = np.random.default_rng(13)
    n, b = 400, 4
    src = rng.integers(0, n, 3000); dst = rng.integers(0, n, 3000)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], rng.uniform(0.5, 2.0, keep.sum())
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    order = np.argsort(d2, kind="stable")
    s2, d2, w2 = s2[order], d2[order], w2[order]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128)
    sp = s2.astype(np.int32); dp = d2.astype(np.int32)
    wp = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n] = (strength == 0)
    ell = ell_from_coo(sp, dp, wp, dang, n, node_cap, bucket_widths=(4, 16, 64))
    reset = np.zeros((b, node_cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)

    power = np.asarray(
        batched_ppr_ell(ell, jnp.asarray(reset), accel="power",
                        max_iters=128, tol=1e-12)
    )
    cheb = np.asarray(
        batched_ppr_ell(ell, jnp.asarray(reset), accel="chebyshev",
                        max_iters=128, tol=1e-12)
    )
    np.testing.assert_allclose(cheb, power, rtol=1e-6, atol=1e-9)


def test_retrieve_knn_pairs_matches_dense():
    """Device-compacted above-threshold kNN pairs == dense numpy derivation,
    including per-row descending order and overflow-retry correctness."""
    import numpy as np

    from hipporag_tpu.ops.knn import retrieve_knn_pairs

    rng = np.random.default_rng(9)
    n, d = 300, 32
    base = rng.standard_normal((n, d)).astype(np.float32)
    # plant clusters of near-duplicates so some rows have many matches
    for i in range(0, 60, 3):
        base[i + 1] = base[i] + 0.01 * rng.standard_normal(d)
        base[i + 2] = base[i] + 0.01 * rng.standard_normal(d)
    vecs = base / np.linalg.norm(base, axis=1, keepdims=True)
    thr = 0.8

    rows, cols, scores = retrieve_knn_pairs(
        vecs, vecs, n, k=16, sim_threshold=thr,
        query_batch_size=128, key_batch_size=64, cap_per_row=2,
    )
    sims = vecs @ vecs.T
    for r in range(n):
        want_cols = np.argsort(-sims[r], kind="stable")[:16]
        want = [(int(c), float(sims[r, c])) for c in want_cols if sims[r, c] >= thr]
        got = [
            (int(c), float(s)) for rr, c, s in zip(rows, cols, scores) if rr == r
        ]
        assert len(got) == len(want), (r, got, want)
        for (gc, gs), (wc, ws) in zip(got, want):
            assert gc == wc
            assert abs(gs - ws) < 1e-5


def test_retrieve_knn_pairs_truncates_to_k():
    """A row with more above-threshold neighbors than k must keep only the
    k best (reference 'top-k then threshold' semantics), and distinct
    query/key matrices must take the two-upload path."""
    import numpy as np

    from hipporag_tpu.ops.knn import retrieve_knn_pairs

    rng = np.random.default_rng(21)
    d = 24
    hub = rng.standard_normal(d).astype(np.float32)
    # per-key noise scale grows with index so similarities are distinct
    # (near-ties would make the order float-noise-dependent)
    noise = rng.standard_normal((40, d)).astype(np.float32)
    keys = hub[None, :] + (0.02 + 0.01 * np.arange(40))[:, None] * noise
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)
    queries = np.tile(hub, (3, 1)) + 0.001 * rng.standard_normal((3, d)).astype(
        np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    k = 8
    rows, cols, scores = retrieve_knn_pairs(
        queries, keys, len(keys), k=k, sim_threshold=0.8,
        query_batch_size=2, key_batch_size=16, cap_per_row=64,
    )
    sims = queries @ keys.T
    for r in range(len(queries)):
        want_cols = np.argsort(-sims[r], kind="stable")[:k]
        want = [(int(c), float(sims[r, c])) for c in want_cols if sims[r, c] >= 0.8]
        got = [(int(c), float(s)) for rr, c, s in zip(rows, cols, scores) if rr == r]
        assert len(got) == len(want) == k
        for (gc, gs), (wc, ws) in zip(got, want):
            assert gc == wc and abs(gs - ws) < 1e-5


def test_ppr_tiling_property_sweep():
    """Property sweep: for batch widths straddling the 128-lane tile
    (including exact multiples and off-by-one), every tiled solve must
    match the per-row untiled solve of the same reset vectors."""
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        COOGraph, batched_ppr, batched_ppr_ell, ell_from_coo,
        normalize_symmetric_coo,
    )

    rng = np.random.default_rng(41)
    n = 300
    src = rng.integers(0, n, 2500)
    dst = rng.integers(0, n, 2500)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    cap = round_up(n, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, cap)
    coo = COOGraph(
        src=s2, dst=d2, w_norm=wn, dangling=dang,
        num_nodes=np.asarray(n, np.int32),
    )
    ell = ell_from_coo(s2, d2, wn, dang, n, cap, bucket_widths=(4, 16, 64),
                       hub_width=128)

    big = 257  # covers tiles [128, 128, 1]
    reset = np.zeros((big, cap), np.float32)
    for i in range(big):
        reset[i, rng.integers(0, n, 2)] = rng.uniform(0.3, 1.0, 2)

    # untiled anchors solved in small (<=16-wide) slices
    anchor = np.concatenate(
        [
            np.asarray(batched_ppr(coo, jnp.asarray(reset[s : s + 16])))
            for s in range(0, big, 16)
        ]
    )
    for b in (127, 128, 129, 256, 257):
        got_coo = np.asarray(batched_ppr(coo, jnp.asarray(reset[:b])))
        np.testing.assert_allclose(got_coo, anchor[:b], rtol=1e-5, atol=1e-7)
        got_ell = np.asarray(batched_ppr_ell(ell, jnp.asarray(reset[:b])))
        np.testing.assert_allclose(got_ell, anchor[:b], rtol=1e-5, atol=1e-7)


def test_normalize_symmetric_coo_matches_builder_operator():
    """normalize_symmetric_coo (bench/tool path) must produce the same
    transition operator as GraphBuilder.symmetric_coo + normalization (the
    production path) — compared densely, since entry order and duplicate
    merging legitimately differ."""
    import numpy as np

    from hipporag_tpu.graph import GraphBuilder
    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import normalize_symmetric_coo

    rng = np.random.default_rng(3)
    n, e = 40, 120
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)

    builder = GraphBuilder()
    names = [f"n{i}" for i in range(n)]
    builder.register_nodes(names)
    for a, b, ww in zip(src, dst, w):
        key = (names[a], names[b])
        builder.edge_weights[key] = builder.edge_weights.get(key, 0.0) + float(ww)
    bs, bd, bw = builder.symmetric_coo()
    b_strength = np.zeros(n)
    np.add.at(b_strength, bs, bw.astype(np.float64))
    dense_builder = np.zeros((n, n))
    np.add.at(dense_builder, (bd, bs), bw / np.maximum(b_strength[bs], 1e-300))

    cap = round_up(n, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, cap)
    dense_tool = np.zeros((n, n))
    np.add.at(dense_tool, (d2, s2), wn.astype(np.float64))

    np.testing.assert_allclose(dense_tool, dense_builder, rtol=1e-5, atol=1e-7)
    assert not dang[:n].any()  # every node has edges in this construction


def test_ppr_slow_damping_reaches_tol():
    """Stall detection must not fire on slow geometric convergence (review
    r2): damping=0.95 on a chain graph contracts ~0.95/iter and must keep
    iterating to tol, matching the independent NumPy derivation."""
    import numpy as np

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        COOGraph, batched_ppr, batched_ppr_ell, ell_from_coo,
        normalize_symmetric_coo, ppr_numpy_reference,
    )

    n = 256
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    w = np.ones(n - 1, np.float32)
    node_cap = round_up(n, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, node_cap)

    reset = np.zeros((2, node_cap), np.float32)
    reset[0, 0] = 1.0
    reset[1, n // 2] = 1.0

    edges = list(zip(s2.tolist(), d2.tolist(), wn.tolist()))
    want = ppr_numpy_reference(n, edges, reset[:, :n], damping=0.95, iters=2000)

    coo = COOGraph(
        src=s2, dst=d2, w_norm=wn, dangling=dang,
        num_nodes=np.asarray(n, np.int32),
    )
    got = np.asarray(batched_ppr(coo, reset, damping=0.95, max_iters=2000, tol=1e-8))
    # tol=1e-8 residual bounds solution error by ~tol*d/(1-d) = 1.9e-7
    # at d=0.95; the old 0.9 stall factor measured 5.1e-7 here
    err = np.max(np.abs(got[:, :n] - want))
    assert err < 2.5e-7, f"COO stalled early: err {err:.2e}"

    ell = ell_from_coo(s2, d2, wn, dang, n, node_cap)
    got_e = np.asarray(
        batched_ppr_ell(ell, reset, damping=0.95, max_iters=2000, tol=1e-8)
    )
    err_e = np.max(np.abs(got_e[:, :n] - want))
    assert err_e < 2.5e-7, f"ELL stalled early: err {err_e:.2e}"

    # damping ABOVE the fixed 0.995 floor of the stall factor (review r2
    # round two): geometric contraction ~0.996/iter must not be mistaken
    # for a stall — the damping-aware factor (1+d)/2 = 0.998 covers it.
    # f32's residual floor sits near 1e-7 at this contraction rate, so a
    # loose tol keeps the check about stalling, not float precision.
    want_hi = ppr_numpy_reference(n, edges, reset[:, :n], damping=0.996, iters=8000)
    got_hi = np.asarray(
        batched_ppr_ell(ell, reset, damping=0.996, max_iters=8000, tol=2e-7)
    )
    # residual tol 2e-7 bounds solution error by ~tol*d/(1-d) ~ 5e-5;
    # a premature stall at 100x tol would leave errors ~100x larger
    err_hi = np.max(np.abs(got_hi[:, :n] - want_hi))
    assert err_hi < 6e-5, f"ELL stalled early at d=0.996: err {err_hi:.2e}"


def test_ell_rejects_directed_operator():
    """The slot-space ELL solver requires the symmetrized operator; a
    directed edge list with zero-in-degree sources would silently drop
    rank mass, so ell_from_coo must refuse it (review r2)."""
    import numpy as np
    import pytest as _pytest

    from hipporag_tpu.ops.pagerank import ell_from_coo

    # node 0 has out-edges but no in-edges
    src = np.array([0, 1], np.int32)
    dst = np.array([1, 2], np.int32)
    w = np.array([1.0, 1.0], np.float32)
    dang = np.zeros(128, np.float32)
    with _pytest.raises(ValueError, match="symmetrized"):
        ell_from_coo(src, dst, w, dang, 3, 128)

    # a dangling node (no out-edges) that still receives edges is also
    # a directed-only structure
    dang2 = np.zeros(128, np.float32)
    dang2[2] = 1.0
    src2 = np.array([0, 1, 2], np.int32)  # make node 0 receive an edge too
    dst2 = np.array([1, 2, 0], np.int32)
    w2 = np.array([1.0, 1.0, 1.0], np.float32)
    with _pytest.raises(ValueError, match="dangling"):
        ell_from_coo(src2, dst2, w2, dang2, 3, 128)


def test_bucket_reduce_width_blocked_matches_one_shot(monkeypatch):
    """Over-budget buckets reduce in width blocks (and, past the block
    cap, fall back to lax.map row chunks); both must match the one-shot
    gather+einsum bitwise-closely. The width-block path is what the big
    graphs actually run (scripts/gather_partition_probe.py measured row
    chunking at 3.4x the unchunked per-row gather cost on v5e)."""
    import jax

    from hipporag_tpu.ops import pagerank as pr

    rng = np.random.default_rng(3)
    s, nb, w, b = 500, 96, 13, 8
    p_g = jnp.asarray(rng.normal(size=(s, b)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, s, (nb, w)).astype(np.int32))
    wgt = rng.uniform(0.0, 1.0, (nb, w)).astype(np.float32)
    wgt[rng.uniform(size=(nb, w)) < 0.3] = 0.0  # padding entries
    wgt = jnp.asarray(wgt)

    base = np.asarray(pr._bucket_reduce(p_g, idx, wgt))

    # force width blocking: budget of ~3 columns' worth of gather bytes
    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", nb * b * 4 * 3)
    blocked = np.asarray(jax.jit(pr._bucket_reduce)(p_g, idx, wgt))
    np.testing.assert_allclose(blocked, base, rtol=1e-6, atol=1e-6)

    # force the row-chunk fallback: same tiny budget, block cap of 1
    monkeypatch.setattr(pr, "_ELL_MAX_WIDTH_BLOCKS", 1)
    chunked = np.asarray(jax.jit(pr._bucket_reduce)(p_g, idx, wgt))
    np.testing.assert_allclose(chunked, base, rtol=1e-6, atol=1e-6)


def test_ppr_ell_width_blocked_end_to_end(monkeypatch):
    """A full ELL solve with a budget small enough that every bucket
    width-blocks must match the unrestricted solve exactly."""
    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops import pagerank as pr
    from hipporag_tpu.ops.pagerank import (
        batched_ppr_ell, ell_from_coo, normalize_symmetric_coo,
    )

    rng = np.random.default_rng(5)
    n, b = 400, 4
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    cap = round_up(n, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, cap)
    ell = ell_from_coo(s2, d2, wn, dang, n, cap, bucket_widths=(4, 16, 64),
                       hub_width=64)
    reset = np.zeros((b, cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, n, 3)] = rng.uniform(0.3, 1.0, 3)

    base = np.asarray(batched_ppr_ell(ell, jnp.asarray(reset)))
    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", 4096)
    batched_ppr_ell.clear_cache()
    try:
        blocked = np.asarray(batched_ppr_ell(ell, jnp.asarray(reset)))
    finally:
        batched_ppr_ell.clear_cache()
    np.testing.assert_allclose(blocked, base, rtol=1e-6, atol=1e-7)


def test_bucket_reduce_plan_mirrors_branches(monkeypatch):
    """bucket_reduce_plan must report the same branch _bucket_reduce takes
    for each bucket under the active budget/block-cap globals."""
    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops import pagerank as pr

    rng = np.random.default_rng(9)
    n = 400
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    cap = round_up(n, 128)
    s2, d2, wn, dang = pr.normalize_symmetric_coo(src, dst, w, n, cap)
    ell = pr.ell_from_coo(s2, d2, wn, dang, n, cap, bucket_widths=(4, 16, 64),
                          hub_width=64)

    n_parts = len(ell.bucket_idx) + (1 if ell.hub_idx.shape[0] else 0)

    plan = pr.bucket_reduce_plan(ell, 8)
    assert len(plan) == n_parts
    assert all("oneshot" in line for line in plan)  # default 2GB budget

    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", 4096)
    plan = pr.bucket_reduce_plan(ell, 8)
    assert any("width x" in line for line in plan)
    # every over-budget bucket must pick width blocks or the row fallback
    assert all(("oneshot" in p) or ("width x" in p) or ("rowchunk x" in p)
               for p in plan)

    monkeypatch.setattr(pr, "_ELL_MAX_WIDTH_BLOCKS", 1)
    plan_rc = pr.bucket_reduce_plan(ell, 8)
    assert any("rowchunk x" in line for line in plan_rc)


def test_bucket_plan_never_exceeds_budget(monkeypatch):
    """When even ONE column's gather ([nb, 1, B]) exceeds the budget, the
    width path is illegal (only splitting nb bounds the temp) and the plan
    must fall back to row chunks — the capacity_10m regime, where a
    mid-width bucket with millions of rows meets a small HBM budget."""
    from hipporag_tpu.ops import pagerank as pr

    nb, w, b, itemsize = 5_000, 16, 16, 4
    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", nb * b * itemsize // 2)
    path, param = pr._bucket_plan(nb, w, b, itemsize)
    assert path == "rowchunk"
    # the row chunk itself honors the budget
    assert param * w * b * itemsize <= pr._ELL_GATHER_BYTES or param == 1

    # with a budget of >= one column, width blocking is preferred
    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", nb * b * itemsize * 2)
    path, wc = pr._bucket_plan(nb, w, b, itemsize)
    assert path == "width"
    assert wc * nb * b * itemsize <= pr._ELL_GATHER_BYTES


def test_ell_hbm_estimate_tracks_plan(monkeypatch):
    """The HBM model's gather-temp term must follow the active reduce plan:
    a tiny budget caps the temp at (roughly) the budgeted block size, far
    below the one-shot gather."""
    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops import pagerank as pr

    rng = np.random.default_rng(11)
    n = 400
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    cap = round_up(n, 128)
    s2, d2, wn, dang = pr.normalize_symmetric_coo(src, dst, w, n, cap)
    ell = pr.ell_from_coo(s2, d2, wn, dang, n, cap)

    est = pr.ell_hbm_estimate(ell, 8)
    assert est["total_bytes"] == (
        est["operator_bytes"] + est["state_bytes"]
        + est["gather_temp_bytes"] + est["io_bytes"]
    )
    assert est["state_bytes"] > 0 and est["operator_bytes"] > 0

    big_temp = est["gather_temp_bytes"]
    monkeypatch.setattr(pr, "_ELL_GATHER_BYTES", 8192)
    small_temp = pr.ell_hbm_estimate(ell, 8)["gather_temp_bytes"]
    assert small_temp < big_temp

    # batch tiling: past one 128-lane tile the per-tile batch is what
    # reaches the loop, so states stop growing with B
    est_128 = pr.ell_hbm_estimate(ell, 128)
    est_256 = pr.ell_hbm_estimate(ell, 256)
    assert est_256["state_bytes"] == est_128["state_bytes"]
    assert est_256["io_bytes"] == 2 * est_128["io_bytes"]


def test_pack_unpack_vals_idx_roundtrip():
    """Single-transfer packing for (values, indices) pairs: indices ride
    as exact f32 VALUES (int bit patterns are denormal floats and TPU
    data movement may flush denormals — measured corruption on v5e), so
    every index below PACK_IDX_LIMIT must round-trip exactly and -inf
    sentinels in the values must pass through."""
    import jax.numpy as jnp

    from hipporag_tpu.ops.scoring import (
        PACK_IDX_LIMIT,
        pack_vals_idx,
        unpack_vals_idx,
    )

    rng = np.random.default_rng(0)
    b, k = 5, 7
    vals = rng.standard_normal((b, k)).astype(np.float32)
    vals[0, 0] = -np.inf  # padding sentinel used by rank_documents_topk
    vals[1, 2] = 0.0
    idx = rng.integers(0, PACK_IDX_LIMIT, (b, k)).astype(np.int32)
    idx[0, 0] = 0
    idx[2, 3] = PACK_IDX_LIMIT - 1

    packed = np.asarray(pack_vals_idx(jnp.asarray(vals), jnp.asarray(idx)))
    assert packed.shape == (b, 2 * k)
    assert packed.dtype == np.float32
    out_vals, out_idx = unpack_vals_idx(packed, k)
    np.testing.assert_array_equal(out_vals, vals)
    np.testing.assert_array_equal(out_idx, idx)
    assert out_idx.dtype == np.int32


def test_sharded_hbm_estimate_and_counters():
    """The sharded per-device HBM model must agree with the arrays a real
    shard_graph_ell build materializes, and the work counters must report
    the padding-inclusive gather rows the roofline accounting uses."""
    from hipporag_tpu.ops.pagerank import COOGraph, normalize_symmetric_coo
    from hipporag_tpu.parallel.sharded import (
        shard_graph_ell,
        sharded_ell_counters,
        sharded_ell_hbm_estimate,
    )

    rng = np.random.default_rng(3)
    n, e, shards = 2000, 16000, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    cap = ((n + 127) // 128) * 128
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, n, cap)
    coo = COOGraph(
        src=s2.astype(np.int32), dst=d2.astype(np.int32),
        w_norm=wn.astype(np.float32), dangling=dang.astype(np.float32),
        num_nodes=np.asarray(n, np.int32),
    )
    sg = shard_graph_ell(coo, num_shards=shards)

    cnt = sharded_ell_counters(sg, batch=16, dp=2)
    padded_rows = sum(x.shape[1] * x.shape[2] for x in sg.bucket_idx)
    padded_rows += sg.hub_idx.shape[1] * sg.hub_idx.shape[2]
    assert cnt["rows_gathered_per_iter_device"] == padded_rows
    assert cnt["ell_padding_overhead"] >= 1.0
    assert cnt["halo_rows_per_peer"] == sg.halo_width
    # B=16, dp=2 -> 8 lanes per device
    assert cnt["halo_ici_bytes_per_iter_device"] == shards * sg.halo_width * 8 * 4
    assert (
        cnt["allgather_ici_bytes_per_iter_device"]
        == (shards - 1) * sg.shard_nodes * 8 * 4
    )

    est = sharded_ell_hbm_estimate(
        batch=16, num_shards=shards, shard_nodes=sg.shard_nodes,
        n_slots=sg.n_slots, halo_width=sg.halo_width,
        entries_per_device=padded_rows, dp=2,
    )
    actual_op = (
        sum(x.shape[1] * x.shape[2] * 8 for x in sg.bucket_idx)
        + sg.hub_idx.shape[1] * sg.hub_idx.shape[2] * 8
        + (sg.shard_nodes * 2 + sg.n_slots) * 4
        + shards * sg.halo_width * 4
    )
    assert est["operator_bytes"] == actual_op
    assert est["total_bytes"] == (
        est["operator_bytes"] + est["states_bytes"] + est["halo_buffer_bytes"]
        + est["gather_temp_bytes"] + est["io_bytes"]
    )
    # batch tiling mirrors the single-chip model: states stop growing
    # past one 128-lane tile, io keeps growing
    kw = dict(
        num_shards=shards, shard_nodes=sg.shard_nodes, n_slots=sg.n_slots,
        halo_width=sg.halo_width, entries_per_device=padded_rows,
    )
    e128 = sharded_ell_hbm_estimate(batch=128, **kw)
    e256 = sharded_ell_hbm_estimate(batch=256, **kw)
    assert e256["states_bytes"] == e128["states_bytes"]
    assert e256["io_bytes"] == 2 * e128["io_bytes"]
