"""Round-12 fourth-wave operator contracts — the invariants the oracle
pairs cannot state: ANOVA/KW calibration on known-variance micro
corpora, Kendall's sign semantics at the extremes, the CUSUM
running-extremum identity vs the textbook recursion, LLR's
independence zero, the DP mechanism's determinism and exact geometric
draw, Burrows' Delta's zero on stylometrically identical sources, and
the z-order audit's own-column-optimal ordering."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyspark.sql.functions as F
import pytest

from csv_crm_upload_spark.analytics import textstats as ts
from csv_crm_upload_spark.analytics import tpch


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_anova1_zero_between_variance_and_known_f(spark):
    """Identical group means -> F = 0 exactly (the micro-unit term sum
    is 0, not epsilon); a textbook two-group layout reproduces the
    hand-computed F."""
    d = dt.datetime(2024, 1, 1)
    same = _orders(
        spark,
        [(1, 1, "O", 10.0, d, "A"), (2, 1, "O", 20.0, d, "A"),
         (3, 1, "O", 10.0, d, "B"), (4, 1, "O", 20.0, d, "B")],
    )
    r = tpch.anova1_priority_anova(same).collect()[0]
    assert r["f_stat"] == 0.0 and r["eta_sq"] == 0.0

    # groups {1,2} and {7,8} (dollars): grand mean 4.5, SSB/n = 9,
    # SSW/n = 0.25, F = (n-k)/(k-1) * SSB/SSW = 2 * 36 = 72
    known = _orders(
        spark,
        [(1, 1, "O", 1.0, d, "A"), (2, 1, "O", 2.0, d, "A"),
         (3, 1, "O", 7.0, d, "B"), (4, 1, "O", 8.0, d, "B")],
    )
    r = tpch.anova1_priority_anova(known).collect()[0]
    assert r["n_orders"] == 4 and r["k_groups"] == 2
    assert r["f_stat"] == pytest.approx(72.0, abs=1e-4)
    assert r["eta_sq"] == pytest.approx(9.0 / 9.25, abs=1e-5)


def test_kw1_separated_vs_identical_sources(spark):
    """Fully separated length distributions reach the tie-free H
    maximum for two groups; identical distributions score near 0.
    Hand value: n=6, groups {1,2,3} vs {4,5,6} ranks, H = 3.857142..."""
    sep = _docs(
        spark,
        [(1, "a", "en", "s0", 10), (2, "a", "en", "s0", 20),
         (3, "a", "en", "s0", 30), (4, "a", "en", "s1", 40),
         (5, "a", "en", "s1", 50), (6, "a", "en", "s1", 60)],
    )
    r = tpch.kw1_kruskal_wallis(sep).collect()[0]
    assert r["n_docs"] == 6 and r["k_sources"] == 2 and r["df"] == 1
    # H = 12/(6*7) * (6^2/3 + 15^2/3) - 3*7 = 2/7*87 - 21 = 25.714285-21
    assert r["h_stat"] == pytest.approx(12 / 42 * (36 / 3 + 225 / 3) - 21, abs=1e-5)
    assert r["h_adj"] == r["h_stat"]  # no ties -> correction is 1

    same = _docs(
        spark,
        [(1, "a", "en", "s0", 10), (2, "a", "en", "s0", 20),
         (3, "a", "en", "s1", 10), (4, "a", "en", "s1", 20)],
    )
    r = tpch.kw1_kruskal_wallis(same).collect()[0]
    assert abs(r["h_stat"]) < 1e-5  # identical rank sums


def test_ktau1_perfect_and_inverted_concordance(spark):
    """Strictly co-monotone daily (count, value) -> tau_b = 1; value
    inverted -> tau_b = -1; counts are forced distinct by giving day i
    exactly i orders."""
    def mk(prices_by_day):
        rows, key = [], 0
        for i, p in enumerate(prices_by_day, start=1):
            for _ in range(i):  # day i has i orders -> distinct counts
                key += 1
                rows.append(
                    (key, 1, "O", p, dt.datetime(2024, 1, i), "A")
                )
        return _orders(spark, rows)

    # daily totals: 10, 2*20=40, 3*30=90 -> increasing with count
    r = tpch.ktau1_kendall_tau(mk([10.0, 20.0, 30.0])).collect()[0]
    assert r["n_days"] == 3 and r["concordant"] == 3 and r["discordant"] == 0
    assert r["tau_b"] == 1.0

    # daily totals: 60, 2*20=40, 3*10=30 -> decreasing with count
    r = tpch.ktau1_kendall_tau(mk([60.0, 20.0, 10.0])).collect()[0]
    assert r["concordant"] == 0 and r["discordant"] == 3
    assert r["tau_b"] == -1.0


def test_cusum1_matches_textbook_recursion(spark):
    """The running-extremum identity equals the literal Page recursion
    S+_t = max(0, S+_{t-1} + x_t - mu) computed in Python, on a series
    with a level shift; the positive peak lands inside the high
    regime."""
    counts = [2, 2, 2, 2, 10, 10, 10, 10]
    rows, key = [], 0
    for i, c in enumerate(counts, start=1):
        for _ in range(c):
            key += 1
            rows.append((key, dt.datetime(2024, 3, i), 7, "view", 1.0, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = tpch.cusum1_cusum_drift(ev).collect()[0]
    n, tot = len(counts), sum(counts)
    mu = tot / n
    sp = sn = 0.0
    sp_path, sn_path = [], []
    for c in counts:
        sp = max(0.0, sp + c - mu)
        sn = max(0.0, sn + mu - c)
        sp_path.append(sp)
        sn_path.append(sn)
    assert r["n_days"] == n and r["total_events"] == tot
    assert r["cusum_pos"] == pytest.approx(max(sp_path), abs=1e-6)
    assert r["cusum_neg"] == pytest.approx(max(sn_path), abs=1e-6)
    assert r["pos_day"] == dt.date(2024, 3, 1 + sp_path.index(max(sp_path)))
    assert r["neg_day"] == dt.date(2024, 3, 1 + sn_path.index(max(sn_path)))
    sigma = math.sqrt(sum(c * c for c in counts) / n - mu * mu)
    assert r["pos_sigma_units"] == pytest.approx(max(sp_path) / sigma, abs=1e-5)


def test_llr1_independence_scores_zero_dependence_scores_high(spark):
    """A corpus where bigram halves are independent by construction
    (every token pairs with every successor equally) scores ~0; a
    always-together pair dominates. G^2 is nonnegative up to the 6 dp
    rounding."""
    # "a b" always together (20x), fillers c..f uniformly crossed
    rows = [(i, "a b", "en", "s0", 3) for i in range(20)]
    fillers = ["c d", "c e", "d c", "d e", "e c", "e d"]
    rows += [
        (100 + i, fillers[i % len(fillers)], "en", "s0", 3) for i in range(30)
    ]
    out = ts.llr1_dunning_collocations(_docs(spark, rows), min_count=5).collect()
    assert out, "the a-b pair must clear min_count"
    top = out[0]
    assert (top["w1"], top["w2"]) == ("a", "b")
    for r in out:
        assert r["llr"] >= -1e-6  # G^2 >= 0 up to rounding
    assert top["llr"] > 10.0  # 20 co-occurrences of an exclusive pair


def test_dpn1_noise_is_the_exact_md5_geometric_draw(spark):
    """The noise column equals the Python-recomputed trailing-ones
    geometric difference for every cell (same md5, same bits), is
    identical across invocations, and released_n clamps at zero."""
    docs = _docs(
        spark,
        [(1, "x", "en", "s0", 1), (2, "x", "en", "s0", 1),
         (3, "x", "de", "s1", 1), (4, "x", None, None, 1)],
    )

    def g(key: str) -> int:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        return (h ^ (h + 1)).bit_count() - 1

    def expected_noise(source, lang):
        s = source if source is not None else "\x01"
        l = lang if lang is not None else "\x01"
        base = f"dpn1|{s}|{l}"
        return g(base + "|a") - g(base + "|b")

    out1 = {(r["source"], r["lang"]): r for r in ts.dpn1_dp_noisy_counts(docs).collect()}
    out2 = {(r["source"], r["lang"]): r for r in ts.dpn1_dp_noisy_counts(docs).collect()}
    assert set(out1) == {("s0", "en"), ("s1", "de"), (None, None)}
    for cell, r in out1.items():
        assert r["noise"] == expected_noise(*cell), cell
        assert r["noisy_n"] == r["true_n"] + r["noise"]
        assert r["released_n"] == max(r["noisy_n"], 0)
        assert out2[cell]["noise"] == r["noise"]  # deterministic


def test_dpn1_geometric_marginal_is_calibrated():
    """Over 4096 sequential keys the trailing-ones draw matches the
    Geometric(1/2) marginal: ~half the draws are 0, ~quarter are 1."""
    def g(key: str) -> int:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        return (h ^ (h + 1)).bit_count() - 1

    draws = [g(f"cal|{i}") for i in range(4096)]
    assert abs(sum(1 for d in draws if d == 0) / 4096 - 0.5) < 0.05
    assert abs(sum(1 for d in draws if d == 1) / 4096 - 0.25) < 0.05


def test_delta1_identical_sources_score_zero(spark):
    """Two sources with the SAME token distribution and one stylistic
    outlier: the twin pair's Delta is 0 (identical z-vectors), both
    twin-vs-outlier Deltas are equal and positive."""
    twin = "the cat sat on the mat"
    outlier = "zebra quark lumen " * 2
    rows = [
        (1, twin, "en", "sA", 1), (2, twin, "en", "sA", 1),
        (3, twin, "en", "sB", 1), (4, twin, "en", "sB", 1),
        (5, outlier, "en", "sC", 1), (6, outlier, "en", "sC", 1),
    ]
    out = {
        (r["source_a"], r["source_b"]): r["delta"]
        for r in ts.delta1_burrows_delta(_docs(spark, rows)).collect()
    }
    assert out[("sA", "sB")] == 0.0
    assert out[("sA", "sC")] > 0.5
    assert out[("sA", "sC")] == out[("sB", "sC")]


def test_zord1_own_column_sort_is_optimal_zorder_compromises(spark, sf_dir):
    """On the real fixture: each single-column sort minimizes its own
    column's span; z-order lands strictly between the winner and the
    loser on BOTH columns — the measured two-column compromise."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = {r["layout"]: r for r in tpch.zord1_zorder_layout(li).collect()}
    assert set(rows) == {"zorder", "by_qty", "by_price"}
    for r in rows.values():
        assert 0.0 <= r["avg_span_qty"] <= 1.0
        assert 0.0 <= r["avg_span_price"] <= 1.0
    assert rows["by_qty"]["avg_span_qty"] <= rows["zorder"]["avg_span_qty"]
    assert rows["zorder"]["avg_span_qty"] < rows["by_price"]["avg_span_qty"]
    assert rows["by_price"]["avg_span_price"] <= rows["zorder"]["avg_span_price"]
    assert rows["zorder"]["avg_span_price"] < rows["by_qty"]["avg_span_price"]
