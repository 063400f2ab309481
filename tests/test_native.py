"""Native C++ graph core: build, parity with the NumPy path, PPR verifier."""

import numpy as np
import pytest

from hipporag_tpu.graph import GraphBuilder, compile_device_graph
from hipporag_tpu.graph import native
from hipporag_tpu.ops import ppr_numpy_reference

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def _entries(num_nodes=80, num_entries=400, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, num_entries).astype(np.int32)
    dst = rng.integers(0, num_nodes, num_entries).astype(np.int32)
    w = rng.uniform(0.1, 2.0, num_entries).astype(np.float32)
    return src, dst, w


def test_coo_compile_matches_numpy_path():
    num_nodes = 80
    src, dst, w = _entries(num_nodes)

    out = native.coo_compile(src, dst, w, num_nodes)
    assert out is not None
    nsrc, ndst, nw, strength = out

    # independent dense accumulation
    A = np.zeros((num_nodes, num_nodes))
    for a, b, wi in zip(src, dst, w):
        if a == b:
            continue
        A[a, b] += wi
        A[b, a] += wi
    exp_pairs = np.argwhere(A > 0)
    assert len(nsrc) == len(exp_pairs)
    # dst-major sorted
    order = np.lexsort((nsrc, ndst))
    np.testing.assert_array_equal(order, np.arange(len(nsrc)))
    for s, d, wi in zip(nsrc[:50], ndst[:50], nw[:50]):
        assert abs(A[s, d] - wi) < 1e-4
    np.testing.assert_allclose(strength, A.sum(axis=1), rtol=1e-5)


def test_builder_uses_native_and_matches_dense():
    rng = np.random.default_rng(11)
    builder = GraphBuilder()
    names = [f"n{i}" for i in range(60)]
    builder.register_nodes(names)
    for _ in range(300):
        a, b = rng.integers(0, 60, 2)
        if a == b:
            continue
        key = (names[a], names[b])
        builder.edge_weights[key] = builder.edge_weights.get(key, 0.0) + float(
            rng.uniform(0.1, 1.0)
        )
    src, dst, w = builder.symmetric_coo()
    # symmetric: each (s,d) has matching (d,s) with equal weight
    pairs = {(int(s), int(d)): float(wi) for s, d, wi in zip(src, dst, w)}
    for (s, d), wi in list(pairs.items())[:100]:
        assert abs(pairs[(d, s)] - wi) < 1e-5


def test_native_ppr_matches_numpy_reference():
    num_nodes = 60
    src, dst, w = _entries(num_nodes, 300, seed=7)
    nsrc, ndst, nw, strength = native.coo_compile(src, dst, w, num_nodes, normalize=True)
    dangling = (strength == 0).astype(np.float64)

    rng = np.random.default_rng(1)
    reset = rng.uniform(0, 1, num_nodes) * (rng.uniform(0, 1, num_nodes) > 0.6)

    ranks, iters = native.ppr_serial(
        nsrc, ndst, nw, dangling, num_nodes, reset.astype(np.float64), 0.5, 200, 1e-12
    )
    assert 0 < iters <= 200

    # dense reference over the same symmetric graph
    sym = []
    A_entries = native.coo_compile(src, dst, w, num_nodes, normalize=False)
    for s, d, wi in zip(*A_entries[:3]):
        sym.append((int(s), int(d), float(wi)))
    expected = ppr_numpy_reference(num_nodes, sym, reset[None, :], damping=0.5)[0]
    np.testing.assert_allclose(ranks, expected, atol=1e-7)


def test_native_ell_pack_matches_numpy_fallback(monkeypatch):
    """Native and numpy ELL packings must be bit-identical."""
    import numpy as np

    import hipporag_tpu.graph.native as native
    import hipporag_tpu.ops.pagerank as pr
    from hipporag_tpu.graph.csr import round_up

    if not native.native_available():
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(7)
    n = 500
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    src = np.concatenate([src, rng.integers(0, n, 900)])
    dst = np.concatenate([dst, np.full(900, 7)])  # hub
    keep = src != dst
    src, dst, w = src[keep], dst[keep], rng.uniform(0.5, 2.0, keep.sum())
    s2 = np.concatenate([src, dst]); d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w]).astype(np.float64)
    o = np.argsort(d2, kind="stable"); s2, d2, w2 = s2[o], d2[o], w2[o]
    strength = np.zeros(n); np.add.at(strength, s2, w2)
    node_cap = round_up(n, 128)
    wp = (w2 / strength[s2]).astype(np.float32)
    dang = np.zeros(node_cap, np.float32); dang[:n] = (strength == 0)

    kwargs = dict(bucket_widths=(2, 8, 32), hub_width=64, row_multiple=64)
    a = pr.ell_from_coo(s2.astype(np.int32), d2.astype(np.int32), wp, dang,
                        n, node_cap, **kwargs)
    monkeypatch.setattr(native, "ell_pack", lambda *args, **kw: None)
    b = pr.ell_from_coo(s2.astype(np.int32), d2.astype(np.int32), wp, dang,
                        n, node_cap, **kwargs)

    assert len(a.bucket_idx) == len(b.bucket_idx)
    for x, y in zip(a.bucket_idx, b.bucket_idx):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(a.bucket_wgt, b.bucket_wgt):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(a.hub_idx), np.asarray(b.hub_idx))
    np.testing.assert_array_equal(np.asarray(a.hub_wgt), np.asarray(b.hub_wgt))
    np.testing.assert_array_equal(np.asarray(a.hub_seg), np.asarray(b.hub_seg))
    np.testing.assert_array_equal(np.asarray(a.local_inv), np.asarray(b.local_inv))
    assert a.hub_zero.shape == b.hub_zero.shape
