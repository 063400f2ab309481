"""Pallas fused score+top-k kernel vs the XLA reference path.

Runs the kernel in interpreter mode on the CPU test backend; on real TPU
the same code path compiles via Mosaic (exercised by bench.py / driver).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hipporag_tpu.ops.fused_topk import fused_score_topk
from hipporag_tpu.ops.scoring import fact_topk, score_and_topk


@pytest.mark.parametrize(
    "b,n,d,valid_n,k",
    [
        (3, 1024, 384, 1000, 5),
        (8, 512, 128, 512, 8),
        (1, 640, 200, 7, 5),  # uneven everything, valid_n > k barely
        (4, 256, 64, 3, 5),  # fewer valid keys than k
    ],
)
def test_fused_matches_xla(b, n, d, valid_n, k):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32)
    keys = np.zeros((n, d), np.float32)
    keys[:valid_n] = rng.standard_normal((valid_n, d))

    norm, raw, idx = fused_score_topk(
        jnp.asarray(q), jnp.asarray(keys), valid_n, k, interpret=True
    )
    norm, raw, idx = np.asarray(norm), np.asarray(raw), np.asarray(idx)

    scores, ref_vals, ref_idx = score_and_topk(
        jnp.asarray(q), jnp.asarray(keys), jnp.asarray(valid_n, jnp.int32), k
    )
    ref_vals, ref_idx = np.asarray(ref_vals), np.asarray(ref_idx)

    n_valid_topk = min(k, valid_n)
    np.testing.assert_array_equal(idx[:, :n_valid_topk], ref_idx[:, :n_valid_topk])
    np.testing.assert_allclose(
        norm[:, :n_valid_topk], ref_vals[:, :n_valid_topk], rtol=1e-5, atol=1e-6
    )
    # invalid tail rows: raw -inf, norm 0
    if n_valid_topk < k:
        assert np.all(raw[:, n_valid_topk:] == -np.inf)
        assert np.all(norm[:, n_valid_topk:] == 0.0)

    # raw values equal the actual dot products
    full = q @ keys.T
    for i in range(b):
        for j in range(n_valid_topk):
            np.testing.assert_allclose(
                raw[i, j], full[i, idx[i, j]], rtol=1e-5, atol=1e-5
            )


def test_constant_row_normalizes_to_one():
    # all valid keys identical -> score range 0 -> norm 1.0 (reference
    # min_max_normalize maps constant rows to ones)
    q = np.ones((2, 128), np.float32)
    keys = np.ones((256, 128), np.float32)
    norm, raw, idx = fused_score_topk(
        jnp.asarray(q), jnp.asarray(keys), 256, 4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(norm), 1.0)


def test_fact_topk_dispatcher_cpu_fallback():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 64)).astype(np.float32)
    keys = rng.standard_normal((300, 64)).astype(np.float32)
    vals, idx = fact_topk(jnp.asarray(q), jnp.asarray(keys), 300, 5)
    scores, ref_vals, ref_idx = score_and_topk(
        jnp.asarray(q), jnp.asarray(keys), jnp.asarray(300, jnp.int32), 5
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-6)


def test_pallas_topk_routing_measured_grid():
    """Pin the fact_topk dispatcher against the v5e-measured size grid
    (r4 bench, f32 [B, N] scores): XLA wins at 0.12 GiB (14.1 vs 33.8 ms)
    and 2.44 GiB (88.3 vs 97.9 ms); Pallas wins at 4.88 GiB (85 vs 131 ms)
    and at sizes where XLA OOMs. A routing regression toward the Pallas
    path at small sizes costs 2.4x; toward XLA at capacity sizes, OOM."""
    from hipporag_tpu.ops.scoring import pallas_topk_route

    gib = 1 << 30

    def route_at(score_bytes):
        # bench grid shape: B=256 queries, N sized to hit the target bytes
        b = 256
        n = score_bytes // (b * 4)
        return pallas_topk_route(b, n, backend="tpu")

    assert route_at(int(0.12 * gib)) is False  # XLA measured 2.4x faster
    assert route_at(int(2.44 * gib)) is False  # XLA still wins here
    assert route_at(int(4.88 * gib)) is True  # Pallas measured 85 vs 131 ms
    assert route_at(10 * gib) is True  # XLA OOMs outright; Pallas only
    # never Pallas off-TPU: interpret mode is test-only, orders slower
    assert pallas_topk_route(256, 10 * gib // 1024, backend="cpu") is False
