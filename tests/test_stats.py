"""Tests for evaluation/stats.py (paired significance, VERDICT r3 #2).

The McNemar p-values are checked against hand-computed exact binomial
tails, and the bootstrap CI against known constructions (zero-delta data
must straddle 0; a decisive shift must exclude 0)."""

import math

import numpy as np
import pytest

from hipporag_tpu.evaluation.stats import (
    bootstrap_delta_ci,
    doc_level_hits,
    mcnemar_exact,
    paired_retrieval_stats,
    per_query_recall,
)


def test_doc_level_hits_and_per_query_recall():
    gold = [["a", "b"], ["c", "d"]]
    retrieved = [["a", "x", "b"], ["x", "y", "c"]]
    h2 = doc_level_hits(gold, retrieved, k=2)
    assert h2.tolist() == [True, False, False, False]
    h3 = doc_level_hits(gold, retrieved, k=3)
    assert h3.tolist() == [True, True, True, False]
    # equal gold counts: mean over doc trials == pooled Recall@k
    r3 = per_query_recall(gold, retrieved, k=3)
    assert r3.tolist() == [1.0, 0.5]
    assert h3.mean() == pytest.approx(r3.mean())


def test_mcnemar_exact_matches_binomial_tail():
    # 5 A-only, 1 B-only discordant out of 20 trials
    a = np.array([1] * 5 + [0] * 1 + [1] * 7 + [0] * 7, dtype=bool)
    b = np.array([0] * 5 + [1] * 1 + [1] * 7 + [0] * 7, dtype=bool)
    res = mcnemar_exact(a, b)
    assert (res["a_only"], res["b_only"]) == (5, 1)
    # exact two-sided binomial: 2 * P(X <= 1 | n=6, p=.5), not doubled past 1
    expect = 2 * sum(math.comb(6, i) for i in (0, 1)) / 2**6
    assert res["p_value"] == pytest.approx(expect)
    # symmetry
    res_swap = mcnemar_exact(b, a)
    assert res_swap["p_value"] == pytest.approx(res["p_value"])
    assert (res_swap["a_only"], res_swap["b_only"]) == (1, 5)


def test_mcnemar_no_discordant_is_p1():
    a = np.array([True, False, True])
    res = mcnemar_exact(a, a.copy())
    assert res["p_value"] == 1.0
    assert res["n_discordant"] == 0


def test_bootstrap_ci_straddles_zero_for_identical_systems():
    rng = np.random.default_rng(3)
    a = rng.random(200)
    res = bootstrap_delta_ci(a, a.copy(), n_boot=500, seed=1)
    assert res["delta"] == 0.0
    assert res["ci_low"] == 0.0 and res["ci_high"] == 0.0


def test_bootstrap_ci_excludes_zero_for_decisive_shift():
    rng = np.random.default_rng(4)
    b = rng.random(300)
    a = b + 0.2 + rng.normal(0, 0.02, 300)
    res = bootstrap_delta_ci(a, b, n_boot=2000, seed=2)
    assert res["ci_low"] > 0.15
    assert res["ci_high"] < 0.25
    assert res["ci_low"] <= res["delta"] <= res["ci_high"]
    # deterministic for a fixed seed
    res2 = bootstrap_delta_ci(a, b, n_boot=2000, seed=2)
    assert (res["ci_low"], res["ci_high"]) == (res2["ci_low"], res2["ci_high"])


def test_bootstrap_rejects_mismatched_shapes():
    with pytest.raises(ValueError):
        bootstrap_delta_ci(np.zeros(3), np.zeros(4))
    with pytest.raises(ValueError):
        mcnemar_exact(np.zeros(3, bool), np.zeros(4, bool))


def test_paired_retrieval_stats_end_to_end():
    # A finds both golds in top-2 for 30/40 queries; B for 10/40 — a
    # decisive difference that must come out significant
    gold, da, db = [], [], []
    for i in range(40):
        g = [f"g{i}a", f"g{i}b"]
        gold.append(g)
        da.append(g + ["x"] if i < 30 else ["x", "y", "z"])
        db.append(g + ["x"] if i < 10 else ["x", "y", "z"])
    st = paired_retrieval_stats(gold, da, db, k_list=(2,), n_boot=500)
    s2 = st[2]
    assert s2["recall_a"] == pytest.approx(0.75)
    assert s2["recall_b"] == pytest.approx(0.25)
    assert s2["delta"] == pytest.approx(0.5)
    assert s2["significant"] is True
    assert s2["mcnemar_p"] < 1e-6
    assert s2["ci95"][0] > 0.3
    # a_only counts doc trials: 20 queries x 2 docs where only A hit
    assert s2["a_only"] == 40 and s2["b_only"] == 0


def test_paired_retrieval_stats_tie_is_not_significant():
    gold = [[f"g{i}"] for i in range(50)]
    da = [[f"g{i}"] if i % 2 == 0 else ["x"] for i in range(50)]
    db = [[f"g{i}"] if i % 2 == 1 else ["x"] for i in range(50)]
    # same recall, fully discordant: McNemar must call it a tie
    st = paired_retrieval_stats(gold, da, db, k_list=(1,), n_boot=300)
    assert st[1]["recall_a"] == st[1]["recall_b"]
    assert st[1]["significant"] is False
    assert st[1]["mcnemar_p"] > 0.5
