"""Probe: does gather cost depend on the OPERAND size, and do partitioned
sub-tables restore the small-table descriptor floor?

Measured context (round 2/3 notes): the bucketed-ELL gather costs
~3.8 ns/row at a 200k-slot table, ~8 ns at 1M, ~84 ns at 10M — and a
50MB hot-set at 1M-slot scale still costs ~8 ns/row, i.e. the cost
tracks the operand's size, not the accessed footprint. If gathering
from physically separate ~256k-row sub-tables runs at the floor, the
1M big-graph bench point gets ~2x and the 10M stretch up to ~10-20x.

Variants per (S, B):
  single : one [S, B] table, global indices              (current solver)
  parts  : P separate [S/P, B] tables, local indices, per-partition
           gather + einsum, results concatenated
  slice  : ONE [S, B] table, lax.slice'd into P pieces inside the jit
           each call (tests whether the partition split can stay a view
           of the monolithic iterate instead of restructured state)

Indices are identical across variants (same rows, same partition
grouping) so only the operand layout differs.

MEASURED (v5e, 2026-08-17, /tmp/gather_probe2.log; tunnel partially
degraded both runs so absolute ns are inflated ~1.7x vs the clean-link
3.8 ns floor — the RATIOS are the finding):
  S=262k  B=128: map 21.8 | unroll 20.8 | nochunk  6.5 ns/row
  S=1M    B=128: map 21.9 | unroll 20.8 | nochunk  6.4 | parts 6.7 | slice 6.9
  S=10M   B=16 : map 15.3 | unroll 15.2 | nochunk 15.1 | parts 8.5 | slice 8.8
Conclusions: (1) the lax.map chunking itself costs ~3.4x and inline
unrolled chunks are JUST AS SLOW — the penalty is the chunked
gather+einsum structure, not the while-loop; (2) a single UNchunked
gather is at the floor up to ~1M slots, so the 1M big-graph point only
needs a bigger gather budget, not partitioning; (3) above ~1M slots the
operand size itself is the cost and only partitioned (or in-jit sliced)
sub-tables restore the floor (1.8x at 10M); (4) "slice" == "parts":
the iterate can stay monolithic, sub-tables can be lax.slice views.

Usage: JAX_PLATFORMS=... python scripts/gather_partition_probe.py
Env: PROBE_CASES="200000:128,1000000:128,10000000:16" PROBE_ROWS=4400000
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipporag_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")

import numpy as np

W = 8  # ELL row width for the probe; rows = nb * W gathered rows
PART = 262_144  # sub-table rows (~the 200k scale where the floor was measured)


def main():
    import jax

    if os.environ.get("PROBE_FORCE_CPU", "0") == "1":
        # sitecustomize force-registers the axon backend over JAX_PLATFORMS;
        # override at the config level like tests/conftest.py does.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    cases = os.environ.get(
        "PROBE_CASES", "262144:128,1048576:128,10485760:16")
    rows_target = int(os.environ.get("PROBE_ROWS", 4_400_000))
    reps = int(os.environ.get("PROBE_REPS", 5))

    # device health: trivial matmul roundtrip
    t0 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.float32)
    np.asarray(x @ x)
    print(f"health: matmul roundtrip {time.perf_counter()-t0:.1f}s; "
          f"devices={jax.devices()}", flush=True)

    def reduce_rows(table, idx, wgt):
        return jnp.einsum("nwb,nw->nb", table[idx], wgt,
                          preferred_element_type=jnp.float32)

    budget = int(os.environ.get("PROBE_GATHER_BYTES", 1 << 30))

    def chunked_reduce(table, idx, wgt, mode="map"):
        nb = idx.shape[0]
        b = table.shape[1]
        per = W * b * 4
        chunk = max(1, budget // per)
        if nb <= chunk or mode == "nochunk":
            return reduce_rows(table, idx, wgt)
        n_chunks = -(-nb // chunk)
        pad = n_chunks * chunk - nb
        idx_c = jnp.pad(idx, ((0, pad), (0, 0))).reshape(n_chunks, chunk, W)
        wgt_c = jnp.pad(wgt, ((0, pad), (0, 0))).reshape(n_chunks, chunk, W)
        if mode == "unroll":
            out = jnp.concatenate(
                [reduce_rows(table, idx_c[c], wgt_c[c])
                 for c in range(n_chunks)], axis=0)
            return out[:nb]
        out = jax.lax.map(lambda a: reduce_rows(table, a[0], a[1]),
                          (idx_c, wgt_c))
        return out.reshape(-1, b)[:nb]

    for case in cases.split(","):
        s, b = (int(v) for v in case.split(":"))
        nb = rows_target // W
        n_parts = max(1, s // PART)
        psz = s // n_parts
        rng = np.random.default_rng(7)
        # assign each ELL row to a partition, indices local to it
        row_part = rng.integers(0, n_parts, nb).astype(np.int32)
        order = np.argsort(row_part, kind="stable")
        row_part = row_part[order]
        local = rng.integers(0, psz, (nb, W)).astype(np.int32)
        glob = local + row_part[:, None] * psz
        wgt = rng.uniform(0.1, 1.0, (nb, W)).astype(np.float32)
        counts = np.bincount(row_part, minlength=n_parts)
        # per-partition index blocks padded to a common max for lax.map
        pmax = int(counts.max())
        starts = np.zeros(n_parts + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        loc_pad = np.zeros((n_parts, pmax, W), np.int32)
        wgt_pad = np.zeros((n_parts, pmax, W), np.float32)
        for p in range(n_parts):
            c = counts[p]
            loc_pad[p, :c] = local[starts[p]:starts[p] + c]
            wgt_pad[p, :c] = wgt[starts[p]:starts[p] + c]
        pad_rows = int(n_parts * pmax - nb)

        table = rng.uniform(size=(s, b)).astype(np.float32)
        table_d = jax.device_put(table)
        parts_d = [jax.device_put(table[p * psz:(p + 1) * psz])
                   for p in range(n_parts)]
        glob_d = jax.device_put(glob)
        wgt_d = jax.device_put(wgt)
        loc_d = jax.device_put(loc_pad)
        wgtp_d = jax.device_put(wgt_pad)

        @jax.jit
        def f_single(t, i, g):
            return chunked_reduce(t, i, g, mode="map")

        @jax.jit
        def f_single_unroll(t, i, g):
            return chunked_reduce(t, i, g, mode="unroll")

        @jax.jit
        def f_single_nochunk(t, i, g):
            return chunked_reduce(t, i, g, mode="nochunk")

        @jax.jit
        def f_colacc(t, i, g):
            # accumulate over width columns: W gathers of [nb, B], no
            # [nb, W, B] temp — candidate replacement for row chunking
            out = t[i[:, 0]] * g[:, 0][:, None]
            for j in range(1, W):
                out = out + t[i[:, j]] * g[:, j][:, None]
            return out

        @jax.jit
        def f_parts(ts, i3, g3):
            return jnp.concatenate(
                [chunked_reduce(t, i3[p], g3[p]) for p, t in enumerate(ts)],
                axis=0)

        @jax.jit
        def f_slice(t, i3, g3):
            outs = []
            for p in range(n_parts):
                sub = jax.lax.slice_in_dim(t, p * psz, (p + 1) * psz, axis=0)
                outs.append(chunked_reduce(sub, i3[p], g3[p]))
            return jnp.concatenate(outs, axis=0)

        variants = {
            "single": (f_single, (table_d, glob_d, wgt_d), nb * W),
            "unroll": (f_single_unroll, (table_d, glob_d, wgt_d), nb * W),
            "nochunk": (f_single_nochunk, (table_d, glob_d, wgt_d), nb * W),
            "colacc": (f_colacc, (table_d, glob_d, wgt_d), nb * W),
            "parts": (f_parts, (parts_d, loc_d, wgtp_d), n_parts * pmax * W),
            "slice": (f_slice, (table_d, loc_d, wgtp_d), n_parts * pmax * W),
        }
        print(f"--- S={s} B={b} rows={nb*W} n_parts={n_parts} "
              f"pad_rows={pad_rows} ({pad_rows/(nb*W/W)*100:.1f}% of nb)",
              flush=True)
        for name, (fn, args, eff_rows) in variants.items():
            try:
                np.asarray(fn(*args)[:1])  # compile + warm
                # dispatch all reps, sync once: amortizes the ~100ms tunnel
                # dispatch/sync overhead exactly like bench.py's timed loops
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(*args)
                np.asarray(out[:1])
                dt = (time.perf_counter() - t0) / reps
                print(f"{name:7s} {dt*1e3:8.1f} ms  "
                      f"{dt*1e9/(nb*W):6.2f} ns/logical-row  "
                      f"{dt*1e9/eff_rows:6.2f} ns/gathered-row", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:7s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
        del table_d, parts_d, glob_d, wgt_d, loc_d, wgtp_d


if __name__ == "__main__":
    main()
