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
