"""A/B the width-blocked vs row-chunked over-budget bucket reduce at
big-graph scale on the real device.

The gather-partition probe (scripts/gather_partition_probe.py) measured
lax.map row chunking at ~3.4x the unchunked per-row gather cost, while
column-split gathers run at the unchunked floor. This script checks that
finding holds end-to-end for the bench's big-graph point (1M nodes /
20M directed entries, B=128), where the largest buckets exceed the
2GB gathered-intermediate budget and must take one of the two paths.

Usage: python scripts/widthblock_big_ab.py [nodes] [edges] [batch]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_synthetic_graph  # noqa: E402
from hipporag_tpu.graph.csr import round_up  # noqa: E402
from hipporag_tpu.ops import pagerank as pr  # noqa: E402
from hipporag_tpu.ops.pagerank import (  # noqa: E402
    batched_ppr_ell,
    ell_from_coo,
    normalize_symmetric_coo,
)


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    edges = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    print(f"backend: {jax.devices()[0].device_kind}", file=sys.stderr)
    src, dst, w = build_synthetic_graph(nodes, edges, seed=11)
    cap = round_up(nodes, 128)
    s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, nodes, cap)
    ell = ell_from_coo(s2, d2, wn, dang, nodes, cap)
    ell = jax.tree.map(jax.device_put, ell)
    rng = np.random.default_rng(12)
    reset = np.zeros((batch, cap), dtype=np.float32)
    for i in range(batch):
        reset[i, rng.integers(0, nodes, 5)] = rng.uniform(0.1, 1.0, 5)
    reset_dev = jax.device_put(jnp.asarray(reset))

    results = {}
    for name, blocks in (("widthblock", pr._ELL_MAX_WIDTH_BLOCKS),
                         ("rowchunk", 0)):
        pr._ELL_MAX_WIDTH_BLOCKS = blocks
        batched_ppr_ell.clear_cache()
        out = batched_ppr_ell(ell, reset_dev)
        np.asarray(out[0, 0])  # compile + warmup
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = batched_ppr_ell(ell, reset_dev)
            np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / reps
        results[name] = (dt, np.asarray(out))
        print(f"{name}: {dt*1e3:.0f} ms per {batch}-batch "
              f"({batch/dt:.1f} q/s)")

    err = float(np.max(np.abs(results["widthblock"][1]
                              - results["rowchunk"][1])))
    ratio = results["rowchunk"][0] / results["widthblock"][0]
    print(f"rowchunk/widthblock = {ratio:.2f}x, max |diff| = {err:.2e}")


if __name__ == "__main__":
    main()
