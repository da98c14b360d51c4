"""Round-12 sixth-wave operator contracts: Mann-Kendall at the
monotone extremes, Brown-Forsythe's zero on equal spreads, the Gumbel
fit against a Python method-of-moments recompute, and keyness
direction/score against a from-scratch G² on one cell."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from csv_crm_upload_spark.analytics import textstats as ts
from csv_crm_upload_spark.analytics import tpch


def _events(spark, daily_counts, start=dt.datetime(2024, 3, 4)):
    rows, key = [], 0
    for i, c in enumerate(daily_counts):
        for _ in range(c):
            key += 1
            rows.append(
                (key, start + dt.timedelta(days=i), 7, "view", 1.0, None)
            )
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_mk1_monotone_and_flat(spark):
    """Strictly increasing daily counts -> S = n(n-1)/2, direction
    'increasing', z matches the tie-free closed form; constant counts
    -> S = 0, z = 0.0 exactly, direction 'none'."""
    n = 6
    r = tpch.mk1_mann_kendall(_events(spark, list(range(1, n + 1)))).collect()[0]
    assert r["n_days"] == n
    assert r["s_stat"] == n * (n - 1) // 2 and r["direction"] == "increasing"
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["z_mk"] == pytest.approx((r["s_stat"] - 1) / math.sqrt(var), abs=1e-5)

    r = tpch.mk1_mann_kendall(_events(spark, [4, 4, 4, 4])).collect()[0]
    assert r["s_stat"] == 0 and r["z_mk"] == 0.0 and r["direction"] == "none"


def test_mk1_decreasing_direction(spark):
    r = tpch.mk1_mann_kendall(_events(spark, [9, 7, 5, 3, 1])).collect()[0]
    assert r["s_stat"] == -10 and r["direction"] == "decreasing"
    assert r["z_mk"] < 0


def test_lev1_equal_vs_unequal_spread(spark):
    """Two sources with IDENTICAL deviation profiles about their own
    medians -> F = 0 (location shift is invisible to BF); blowing one
    source's spread up 10x makes F large."""
    shift = [
        (i, "x", "en", "sA", v) for i, v in enumerate([10, 20, 30])
    ] + [(10 + i, "x", "en", "sB", v + 500) for i, v in enumerate([10, 20, 30])]
    r = tpch.lev1_brown_forsythe(_docs(spark, shift)).collect()[0]
    assert r["n_docs"] == 6 and r["k_sources"] == 2
    assert r["f_bf"] == 0.0

    spread = [
        (i, "x", "en", "sA", v) for i, v in enumerate([20, 21, 22])
    ] + [(10 + i, "x", "en", "sB", v) for i, v in enumerate([0, 100, 200])]
    r = tpch.lev1_brown_forsythe(_docs(spark, spread)).collect()[0]
    # exact BF on the deviation streams [1,0,1] and [100,0,100]
    za, zb = [1, 0, 1], [100, 0, 100]
    n, k = 6, 2
    m1, m2 = sum(za) / 3, sum(zb) / 3
    m = (sum(za) + sum(zb)) / n
    ssb = 3 * (m1 - m) ** 2 + 3 * (m2 - m) ** 2
    ssw = sum((v - m1) ** 2 for v in za) + sum((v - m2) ** 2 for v in zb)
    assert r["f_bf"] == pytest.approx((n - k) / (k - 1) * ssb / ssw, abs=1e-3)


def test_evt1_matches_python_moment_fit(spark):
    """Weekly maxima on a Mon-aligned 3-week series equal [3, 6, 9];
    the Gumbel mu/beta/return levels match a from-scratch Python
    method-of-moments fit. 2024-03-04 is a Monday."""
    # week1 days: 1,2,3,1,1,1,1 ; week2: 6,...; week3: 9,...
    counts = [1, 2, 3, 1, 1, 1, 1] + [6, 1, 1, 1, 1, 1, 1] + [9, 1, 1, 1, 1, 1, 1]
    r = tpch.evt1_gumbel_return_levels(_events(spark, counts)).collect()[0]
    maxima = [3, 6, 9]
    nw = len(maxima)
    mean = sum(maxima) / nw
    var = (sum(m * m for m in maxima) - nw * mean * mean) / (nw - 1)
    beta = math.sqrt(var) * math.sqrt(6.0) / math.pi
    mu = mean - 0.5772156649015329 * beta
    assert r["n_weeks"] == 3
    assert r["mean_weekly_max"] == pytest.approx(mean, abs=1e-6)
    assert r["gumbel_mu"] == pytest.approx(mu, abs=1e-5)
    assert r["gumbel_beta"] == pytest.approx(beta, abs=1e-5)
    lvl52 = mu - beta * math.log(-math.log(1.0 - 1.0 / 52.0))
    assert r["ret_52w"] == pytest.approx(lvl52, abs=1e-4)
    assert r["ret_52w"] > r["ret_26w"] > r["mean_weekly_max"]

    flat = tpch.evt1_gumbel_return_levels(
        _events(spark, [2, 1, 1, 1, 1, 1, 1] * 2)
    ).collect()[0]
    assert flat["gumbel_mu"] is None  # zero-variance maxima


def test_key1_exclusive_token_dominates_and_matches_g2(spark):
    """A token appearing ONLY in sA (8 times) tops sA's keyness as
    'over', and its G² matches a from-scratch Python contingency
    computation; a token spread evenly scores far lower."""
    a_text = ("quux common " * 6).strip()
    b_text = ("common filler " * 6).strip()
    rows = [(1, a_text, "en", "sA", 1), (2, b_text, "en", "sB", 1)]
    out = ts.key1_source_keyness(_docs(spark, rows), min_count=5).collect()
    top_a = [r for r in out if r["source"] == "sA" and r["rank"] == 1][0]
    assert top_a["tok"] == "quux" and top_a["direction"] == "over"

    # exact recompute: corpus tokens: sA: quux x6, common x6;
    # sB: common x6, filler x6
    c, ts_, ct, nn = 6, 12, 6, 24

    def xlx(x):
        return x * math.log(x) if x > 0 else 0.0

    g2 = 2.0 * (
        xlx(c) + xlx(ts_ - c) + xlx(ct - c) + xlx(nn - ts_ - ct + c)
        - xlx(ts_) - xlx(nn - ts_) - xlx(ct) - xlx(nn - ct) + xlx(nn)
    )
    assert top_a["c_in"] == 6 and top_a["c_rest"] == 0
    assert top_a["keyness"] == pytest.approx(g2, abs=1e-5)
    # 'common' is perfectly balanced across sources -> keyness 0
    common = [r for r in out if r["tok"] == "common"]
    for r in common:
        assert abs(r["keyness"]) < 1e-6
