"""Regenerate the 10M-node / 100M-entry sharded-structure constants used
by the pod capacity table in ``__graft_entry__.dryrun_multichip``.

Builds the REAL ShardedELLGraph for the BASELINE.md stretch config
(clustered operator, 8 shards) on the host — no devices needed — and
prints the structural constants plus the per-device HBM estimate at a few
batch sizes. Takes ~5 minutes and ~8 GiB of host RAM (the dryrun cannot
afford that, hence the pinned constants there).

Usage: python scripts/capacity_sharded_10m.py [nodes] [directed_edges]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_485_760
    edges = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    shards = 8

    import __graft_entry__ as ge
    from hipporag_tpu.parallel.sharded import (
        shard_graph_ell,
        sharded_ell_counters,
        sharded_ell_hbm_estimate,
    )

    t0 = time.time()
    coo = ge._clustered_coo(nodes, edges, shards)
    print(f"clustered operator: {len(coo.src)} entries in {time.time()-t0:.0f}s")
    t0 = time.time()
    sg = shard_graph_ell(coo, num_shards=shards)
    print(f"shard_graph_ell: {time.time()-t0:.0f}s")

    cnt = sharded_ell_counters(sg, batch=64, dp=1)
    print("structure constants (pin these in __graft_entry__.POD_10M):")
    print(
        f"  num_shards={shards}, shard_nodes={sg.shard_nodes}, "
        f"n_slots={sg.n_slots}, halo_width={sg.halo_width},"
    )
    print(f"  entries_per_device={cnt['rows_gathered_per_iter_device']}")
    print(f"counters: {cnt}")

    for batch in (16, 64, 128, 256):
        est = sharded_ell_hbm_estimate(
            batch=batch, num_shards=shards, shard_nodes=sg.shard_nodes,
            n_slots=sg.n_slots, halo_width=sg.halo_width,
            entries_per_device=cnt["rows_gathered_per_iter_device"],
        )
        print(f"B={batch}: {est['total_gib']} GiB/device  ({est})")

    # sanity: estimator operator bytes vs the actually-built arrays
    actual_op = (
        sum(x.shape[1] * x.shape[2] * 8 for x in sg.bucket_idx)
        + sg.hub_idx.shape[1] * sg.hub_idx.shape[2] * 8
        + (sg.shard_nodes * 2 + sg.n_slots) * 4
        + shards * sg.halo_width * 4
    )
    est = sharded_ell_hbm_estimate(
        batch=64, num_shards=shards, shard_nodes=sg.shard_nodes,
        n_slots=sg.n_slots, halo_width=sg.halo_width,
        entries_per_device=cnt["rows_gathered_per_iter_device"],
    )
    print(
        f"operator bytes est/actual = {est['operator_bytes'] / actual_op:.3f}"
    )


if __name__ == "__main__":
    main()
