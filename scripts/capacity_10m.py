"""Stretch capacity point: 10M-node / ~100M-directed-edge KG on ONE v5e.

BASELINE.md lists a 10M/100M synthetic KG as the stretch scale config
(targeting a pod with halo exchange); HBM math says a single chip can hold
it at a reduced batch: ELL ~100M entries x 8B = 0.8GB, reset+state
[B=64, 10M] f32 = 2.6GB x a few live buffers. This script measures it.

Usage: python scripts/capacity_10m.py  (env: CAP_NODES, CAP_EDGES, CAP_B)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipporag_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")

import numpy as np


def main():
    nodes = int(os.environ.get("CAP_NODES", 10_000_000))
    edges = int(os.environ.get("CAP_EDGES", 50_000_000))  # directed, pre-sym
    b = int(os.environ.get("CAP_B", 64))

    from bench import build_synthetic_graph

    import jax
    import jax.numpy as jnp

    from hipporag_tpu.graph.csr import round_up
    from hipporag_tpu.ops.pagerank import (
        _PPR_BATCH_TILE, batched_ppr_ell, bucket_reduce_plan, ell_from_coo,
        ell_gathered_rows_per_iter, ell_hbm_estimate, normalize_symmetric_coo,
    )

    cap = round_up(nodes, 128)
    cache_npz = f"/tmp/cap_{nodes}_{edges}.npz"
    if os.path.exists(cache_npz):
        z = np.load(cache_npz)
        s2, d2, wn, dang = z["s2"], z["d2"], z["wn"], z["dang"]
        print(f"operator loaded from {cache_npz}: {len(s2)} entries", flush=True)
    else:
        t0 = time.time()
        src, dst, w = build_synthetic_graph(nodes, edges, seed=21)
        print(f"graph sampled in {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        s2, d2, wn, dang = normalize_symmetric_coo(src, dst, w, nodes, cap)
        del src, dst, w
        print(f"symmetric operator: {len(s2)} entries in {time.time()-t0:.0f}s",
              flush=True)
        np.savez(cache_npz, s2=s2, d2=d2, wn=wn, dang=dang)
    t0 = time.time()
    ell = ell_from_coo(s2, d2, wn, dang, nodes, cap)
    del s2, d2, wn
    rows = ell_gathered_rows_per_iter(ell)
    print(f"ELL packed in {time.time()-t0:.0f}s; {rows} gathered rows/iter",
          flush=True)
    for line in bucket_reduce_plan(ell, min(b, _PPR_BATCH_TILE)):
        print(f"  reduce plan: {line}", flush=True)
    est = ell_hbm_estimate(ell, b)
    print(f"HBM estimate: {est}", flush=True)

    t0 = time.time()
    ell = jax.tree.map(jax.device_put, ell)
    jax.block_until_ready(jax.tree.leaves(ell)[0])
    print(f"upload in {time.time()-t0:.0f}s; devices: {jax.devices()}",
          flush=True)

    rng = np.random.default_rng(3)
    reset = np.zeros((b, cap), np.float32)
    for i in range(b):
        reset[i, rng.integers(0, nodes, 5)] = rng.uniform(0.1, 1.0, 5)
    reset_dev = jax.device_put(jnp.asarray(reset))

    out, iters = batched_ppr_ell(
        ell, reset_dev, damping=0.5, max_iters=64, tol=1e-8, return_iters=True
    )
    np.asarray(out[0, 0])  # compile+warmup
    t0 = time.perf_counter()
    out = batched_ppr_ell(ell, reset_dev, damping=0.5, max_iters=64, tol=1e-8)
    np.asarray(out[0, 0])
    dt = time.perf_counter() - t0
    it = np.asarray(iters)[::128][: -(-b // 128)].sum()
    print(
        f"RESULT: {nodes} nodes / {rows} ELL rows, B={b}: {dt:.2f}s/batch "
        f"({b/dt:.1f} q/s), {int(it)} iters, "
        f"{dt/max(rows*int(it),1)*1e9:.1f} ns/row",
        flush=True,
    )
    s = float(np.asarray(jnp.sum(out[0])))
    print(f"row-sum sanity: {s:.6f}", flush=True)
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats:
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(
                f"HBM actual peak: {peak/2**30:.2f} GiB "
                f"(estimate {est['total_gib']} GiB)", flush=True,
            )


if __name__ == "__main__":
    main()
