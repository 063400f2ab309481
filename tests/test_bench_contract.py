"""Pin bench.py's one-JSON-line stdout contract (VERDICT r3 #1).

Round 3's headline was lost because the stdout line outgrew the driver's
~2000-char tail capture: the leading ``value``/``vs_baseline`` fields were
truncated away and the driver recorded ``"parsed": null``. The fix routes
the full result to a ``BENCH_DETAIL.json`` sidecar and emits a compact,
priority-whitelisted line hard-capped at ``bench._LINE_BUDGET`` chars.

This test builds a WORST-CASE fully-populated result — every compact key
present with wide float values, several failed sections with long error
strings, and an abort reason — and asserts the line stays under budget,
stays valid JSON, and never drops the headline fields.
"""

import importlib.util
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    # import bench.py as a module without running main()
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def _worst_case(bench):
    snapshot = {
        "metric": "batched_ppr_throughput",
        "value": 12345.678912,
        "unit": "queries/sec",
        "vs_baseline": 9876.54321,
        "backend": "tpu",
        "device_kind": "TPU v5 lite (some very long device kind string)",
        "cpu_fallback": False,
    }
    # every compact key populated with a wide value
    extra = {k: -1234567.8901234567 for k in bench._COMPACT_KEYS}
    extra["baseline_protocol"] = (
        "serial scipy-CSR PPR, min-of-25 body calibration"
    )
    extra["2wiki_r2_delta_ci95"] = [-0.123456789, 0.987654321]
    extra["single_query_breakdown_ms"] = {
        "embed": 123.4, "topk": 123.4, "rerank": 123.4, "residual": 123.4,
    }
    # plus a pile of sidecar-only keys that must NOT leak onto the line
    for i in range(64):
        extra[f"sidecar_only_key_{i:03d}"] = "x" * 120
    sections = {f"section_{i:02d}": "ok" for i in range(24)}
    for i in range(6):
        sections[f"failed_{i}"] = (
            "skipped (RuntimeError: the tunnel degraded mid-run and the "
            "probe subprocess timed out after 300 seconds of waiting)"
        )
    reason = "signal 15 after 3299s — " + "y" * 200
    return snapshot, extra, sections, reason


def test_compact_line_under_budget_fully_populated(bench):
    snapshot, extra, sections, reason = _worst_case(bench)
    line = bench.build_compact_line(snapshot, extra, sections, reason=reason)
    assert len(line) <= bench._LINE_BUDGET, (
        f"compact line is {len(line)} chars, budget {bench._LINE_BUDGET}"
    )
    parsed = json.loads(line)
    # headline fields always survive
    for k in ("metric", "value", "unit", "vs_baseline", "backend",
              "device_kind", "cpu_fallback"):
        assert parsed[k] == snapshot[k]
    assert parsed["detail"]["detail_file"] == "BENCH_DETAIL.json"
    assert parsed["detail"]["aborted"].startswith("signal 15")
    # sidecar-only keys never leak onto the line
    assert not any(k.startswith("sidecar_only") for k in parsed["detail"])


def test_compact_line_budget_below_driver_capture(bench):
    # the driver tail-captures ~2000 chars; the budget must leave margin
    assert bench._LINE_BUDGET <= 1600


def test_compact_line_keeps_priority_keys_when_roomy(bench):
    snapshot, extra, sections, _ = _worst_case(bench)
    line = bench.build_compact_line(snapshot, extra, sections)
    parsed = json.loads(line)
    d = parsed["detail"]
    # the highest-priority detail keys must be present in a normal run
    for k in ("nodes", "directed_edges", "batch", "cpu_qps",
              "device_batch_ms"):
        assert k in d, f"high-priority key {k} was dropped"
    assert d["sections_ok"] == 24


def test_compact_line_drops_tail_first(bench):
    snapshot, extra, sections, reason = _worst_case(bench)
    line = bench.build_compact_line(
        snapshot, extra, sections, reason=reason, budget=700
    )
    assert len(line) <= 700
    parsed = json.loads(line)
    for k in ("metric", "value", "vs_baseline", "backend"):
        assert k in parsed
    # under a tiny budget, low-priority keys go before high-priority ones
    d = parsed["detail"]
    present = [k for k in bench._COMPACT_KEYS if k in d]
    # whatever survives must be a prefix of the priority list
    assert present == bench._COMPACT_KEYS[: len(present)]


def test_detail_sidecar_holds_everything(bench, tmp_path, monkeypatch):
    snapshot, extra, sections, reason = _worst_case(bench)
    monkeypatch.setattr(bench, "HERE", str(tmp_path))
    bench.write_detail_sidecar(snapshot, extra, sections, reason=reason)
    with open(tmp_path / "BENCH_DETAIL.json") as f:
        full = json.load(f)
    assert full["value"] == snapshot["value"]
    assert full["detail"]["aborted"] == reason
    assert full["detail"]["sections"] == sections
    for k in extra:
        assert k in full["detail"]


def test_annotated_ok_counts_as_ok(bench):
    """Degraded-run quality sections succeed with an annotated status
    ('ok (cpu subprocess; degraded link)'); the compact line must count
    them as ok, not list them under sections_bad."""
    snapshot, extra, sections, _ = _worst_case(bench)
    sections["2wiki"] = "ok (cpu subprocess; degraded link)"
    line = bench.build_compact_line(snapshot, extra, sections)
    d = json.loads(line)["detail"]
    assert d["sections_ok"] == 25
    assert "2wiki" not in d.get("sections_bad", {})


def test_quality_subprocess_timeout_kills_child(bench):
    """A quality subprocess that outlives its budget is killed (process
    group) and surfaces as a RuntimeError, not an orphaned full-corpus
    eval pinning the host CPU."""
    import subprocess
    import time

    corpus = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"
    if not os.path.exists(corpus):
        pytest.skip("2wiki corpus not present")
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="timed out"):
        bench.run_quality_subproc("2wiki", timeout_s=2)
    assert time.monotonic() - t0 < 30  # killpg + wait, not a full eval
    assert bench._QUALITY_CHILDREN == []
    # no surviving child of this process still runs the section script
    out = subprocess.run(
        ["ps", "-o", "args=", "--ppid", str(os.getpid())],
        capture_output=True, text=True,
    ).stdout
    assert "bench_quality_section" not in out


def test_quality_subprocess_roundtrip(bench, monkeypatch):
    """The degraded-link fallback (scripts/bench_quality_section.py) must
    emit one JSON line whose int-keyed dicts survive the subprocess
    boundary — bench consumes it via run_quality_subproc."""
    corpus = "/root/reference/reproduce/dataset/2wikimultihopqa_corpus.json"
    if not os.path.exists(corpus):
        pytest.skip("2wiki corpus not present")
    # shrink the section so the pin stays fast (~30s)
    monkeypatch.setenv("BENCH_2WIKI_QUERIES", "12")
    monkeypatch.setenv("BENCH_2WIKI_DOCS", "150")
    monkeypatch.setenv("BENCH_2WIKI_TWIN", "1")
    monkeypatch.setenv("BENCH_2WIKI_EXACT", "0")
    res = bench.run_quality_subproc("2wiki", timeout_s=600)
    assert res["num_queries"] == 12 and res["corpus_docs"] == 150
    # int keys restored after JSON stringification
    for k in ("recall", "dense_recall", "stats"):
        assert all(isinstance(kk, int) for kk in res[k]), res[k].keys()
    assert set(res["recall"]) == {1, 2, 5, 10, 20}
    s5 = res["stats"][5]
    assert {"recall_a", "recall_b", "mcnemar_p", "ci95"} <= set(s5)
    # unknown section name fails loudly, not silently
    with pytest.raises(Exception):
        bench.run_quality_subproc("nope", timeout_s=120)


def test_quality_subprocess_multihop_roundtrip(bench):
    """The multihop section (2-hop + 3-hop chains, mock providers) runs
    through the same degraded-link subprocess path as the dataset quality
    sections: flat JSON-serializable fields, graph beats dense on the
    bridge chains, and the 3-hop add-on lands (or records its error
    without discarding the 2-hop numbers)."""
    res = bench.run_quality_subproc("multihop", timeout_s=900)
    assert {"multihop_recall2_graph", "multihop_recall2_dense"} <= set(res)
    # the chain corpus is the capability claim in miniature: dense cannot
    # reach the second hop (no lexical bridge), the graph walks to it
    assert res["multihop_recall2_graph"] > res["multihop_recall2_dense"]
    assert (
        "multihop3_deep_top5_graph" in res or "multihop3_error" in res
    ), res
    if "multihop3_deep_top5_graph" in res:
        assert (
            res["multihop3_deep_top5_graph"]
            > res["multihop3_deep_top5_dense"]
        )


def test_time_chained_bounds_added_work_on_stale_probe(bench):
    """A stale/inflated probe (mid-band tunnel jitter) must not explode
    the window: the probe is clamped to the measured solo rep, growth is
    budget-checked with MEASURED numbers between windows, and each step
    grows at most 4x (the pre-fix arithmetic granted base+90,000 reps
    when probe_s >= t_single floored the body estimate)."""
    import time as _t

    calls = []

    def run(prev):
        calls.append(prev)
        _t.sleep(0.01)
        return prev + 1

    # probe claims 10s RTT but the whole solo rep takes ~10ms
    _, reps = bench.time_chained(
        run, 0, lambda o: None, 3, probe_s=10.0, max_extra_s=0.05
    )
    assert reps == 3  # the 4x-grown window (~0.13s) exceeds the budget
    # the chain threads outputs: warm rep + one base window
    assert calls == list(range(4))


def test_time_chained_survives_inf_probe(bench):
    """probe_device_health returns inf on any probe exception; the
    window arithmetic must clamp it (RTT cannot exceed the measured solo
    rep), not overflow int()."""
    _, reps = bench.time_chained(
        lambda prev: prev, 0, lambda o: None, 2,
        probe_s=float("inf"), max_extra_s=0.05,
    )
    assert reps == 2


def test_time_chained_healthy_link_keeps_base_reps(bench):
    """When the RTT is negligible next to the body, no extra reps are
    added — the window stays at base_reps."""
    import time as _t

    _, reps = bench.time_chained(
        lambda prev: (_t.sleep(0.02), prev)[1], 0, lambda o: None, 3,
        probe_s=1e-4, max_extra_s=60.0,
    )
    assert reps == 3


def test_time_chained_amortizes_dominant_rtt(bench):
    """Sick-tunnel regime (RTT >> body): the measured-body differencing
    (RTT cancels between two windows of different rep counts) must grow
    the window until the end-sync share is small, so the per-rep figure
    approaches the body instead of the RTT. Here RTT is 50x the body; a
    naive single-rep measurement would read 51 ms/rep."""
    import time as _t

    def run(prev):
        _t.sleep(0.001)
        return prev

    per_rep, reps = bench.time_chained(
        run, 0, lambda o: _t.sleep(0.05), 1, probe_s=0.05,
        max_extra_s=2.0,
    )
    assert reps >= 64  # grew well past the base window
    # body ~1ms (plus sleep() overhead); the 50ms sync must be amortized
    # to a small fraction — generous 5 ms bound vs the naive 51 ms
    assert per_rep < 0.005, per_rep
