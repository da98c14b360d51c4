"""Round-12 fifth-wave operator contracts: DW against hand-computed
residual sums, runs-test extremes (alternation vs blocks), Welch/MWU on
known two-sample layouts, Q-Q on an exact 2x scaling, and CDC chunking
against a Python re-derivation of the same md5 boundary classes."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from csv_crm_upload_spark.analytics import textstats as ts
from csv_crm_upload_spark.analytics import tpch


def _events(spark, daily_counts, start=dt.datetime(2024, 3, 1)):
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


def test_dw1_hand_computed_and_extremes(spark):
    """counts [2,2,10,10]: residual diffs (0,8,0) -> num 64, den 64,
    DW = 1, rho1 = 0.5. A perfectly alternating series pushes DW
    toward 4 (rho1 -> -1)."""
    r = tpch.dw1_durbin_watson(_events(spark, [2, 2, 10, 10])).collect()[0]
    assert r["n_days"] == 4
    assert r["dw_stat"] == 1.0 and r["rho1_approx"] == 0.5

    r = tpch.dw1_durbin_watson(_events(spark, [2, 10] * 4)).collect()[0]
    assert r["dw_stat"] > 3.0 and r["rho1_approx"] < -0.5


def test_runs1_alternation_vs_blocks(spark):
    """A trailing median-5 day pins the nearest-rank median at 5 and
    then drops out; [1,9]*4 + [5] alternates -> 8 runs of 8 used days
    (z > 0); the block layout -> exactly 2 runs (z < 0). With
    n1 = n2 = 4: mu_R = 5, sigma_R^2 = 48/28."""
    r = tpch.runs1_runs_test(_events(spark, [1, 9] * 4 + [5])).collect()[0]
    assert (r["n_above"], r["n_below"]) == (4, 4)
    assert r["n_runs"] == 8 and r["n_days_used"] == 8
    var = 2.0 * 16 * (32 - 8) / (64 * 7)
    assert r["z_approx"] == pytest.approx((8 - 5) / math.sqrt(var), abs=1e-5)

    r = tpch.runs1_runs_test(
        _events(spark, [1, 1, 1, 1, 9, 9, 9, 9, 5])
    ).collect()[0]
    assert r["n_runs"] == 2
    assert r["z_approx"] == pytest.approx((2 - 5) / math.sqrt(var), abs=1e-5)


def test_runs1_median_days_dropped(spark):
    """Days at the exact median leave the sequence entirely: [5,5,9,1]
    has median 5, so only the 9 and 1 days remain -> 2 used, 2 runs."""
    r = tpch.runs1_runs_test(_events(spark, [5, 5, 9, 1])).collect()[0]
    assert r["n_days_used"] == 2
    assert (r["n_above"], r["n_below"]) == (1, 1)
    assert r["n_runs"] == 2


def test_welch1_known_two_sample(spark):
    """sA lengths {1,2,3}, sB {11,12,13} (sB larger so it still ranks
    second by name on equal counts... counts differ: sA gets 4 docs):
    verify t against the textbook formula computed in Python."""
    rows = [
        (1, "x", "en", "sA", 1), (2, "x", "en", "sA", 2),
        (3, "x", "en", "sA", 3), (4, "x", "en", "sA", 2),
        (5, "x", "en", "sB", 11), (6, "x", "en", "sB", 12),
        (7, "x", "en", "sB", 13),
    ]
    r = ts.welch1_source_welch_t(_docs(spark, rows)).collect()[0]
    assert (r["source_a"], r["source_b"]) == ("sA", "sB")
    xa, xb = [1, 2, 3, 2], [11, 12, 13]
    ma, mb = sum(xa) / 4, sum(xb) / 3
    va = sum((v - ma) ** 2 for v in xa) / 3
    vb = sum((v - mb) ** 2 for v in xb) / 2
    se2 = va / 4 + vb / 3
    assert r["mean_a"] == pytest.approx(ma, abs=1e-6)
    assert r["t_stat"] == pytest.approx((ma - mb) / math.sqrt(se2), abs=1e-5)
    df = se2 ** 2 / ((va / 4) ** 2 / 3 + (vb / 3) ** 2 / 2)
    assert r["df_welch"] == pytest.approx(df, abs=1e-4)


def test_mwu1_disjoint_distributions_hit_the_effect_size_rail(spark):
    """source_a (larger, ranked first) has ALL the small values:
    U1 = 0, rank-biserial = 1 - 0 = 1; flipped data gives U1 = n1*n2
    and rank-biserial -1."""
    small_a = [
        (i, "x", "en", "sA", v) for i, v in enumerate([1, 2, 3, 4])
    ] + [(10 + i, "x", "en", "sB", v) for i, v in enumerate([11, 12, 13])]
    r = ts.mwu1_mann_whitney(_docs(spark, small_a)).collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["u_stat"] == 0.0 and r["rank_biserial"] == 1.0
    assert r["z_approx"] < 0

    big_a = [
        (i, "x", "en", "sA", v) for i, v in enumerate([11, 12, 13, 14])
    ] + [(10 + i, "x", "en", "sB", v) for i, v in enumerate([1, 2, 3])]
    r = ts.mwu1_mann_whitney(_docs(spark, big_a)).collect()[0]
    assert r["u_stat"] == 12.0 and r["rank_biserial"] == -1.0
    assert r["z_approx"] > 0


def test_qq1_exact_doubling_shows_ratio_two(spark):
    """sA = 1..20, sB = 2,4,..,38 (19 docs so sA ranks first): every
    decile of sB is exactly 2x the matching sA decile by nearest-rank
    construction... verified against a Python nearest-rank recompute."""
    rows = [(i, "x", "en", "sA", i) for i in range(1, 21)]
    rows += [(100 + i, "x", "en", "sB", 2 * i) for i in range(1, 20)]
    out = {r["decile"]: r for r in ts.qq1_source_length_qq(_docs(spark, rows)).collect()}
    assert set(out) == {10, 20, 30, 40, 50, 60, 70, 80, 90}
    a_vals = sorted(range(1, 21))
    b_vals = sorted(2 * i for i in range(1, 20))
    for d, r in out.items():
        ka = (d * 20 + 99) // 100
        kb = (d * 19 + 99) // 100
        assert r["val_a"] == a_vals[ka - 1]
        assert r["val_b"] == b_vals[kb - 1]
        assert r["diff"] == r["val_b"] - r["val_a"]


def test_cdc1_matches_python_rederivation(spark):
    """Chunk count, distinct count and dup share on a crafted corpus
    equal a from-scratch Python implementation of the same md5
    boundary rule — and duplicated text yields duplicate chunks."""
    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 3
    t2 = "one two three four five six seven eight nine ten " * 2
    rows = [
        (1, t1, "en", "s0", 1), (2, t1, "en", "s0", 1),
        (3, t2, "en", "s0", 1),
    ]

    def boundary(tok: str) -> bool:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 16 == 0

    def chunks_of(text: str):
        toks = [t for t in text.lower().strip().split() if t]
        out, cur = [], []
        for t in toks:
            cur.append(t)
            if boundary(t):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    expect = []
    for _, text, _, _, _ in rows:
        expect.extend(chunks_of(text))
    r = ts.cdc1_chunk_dedup(_docs(spark, rows)).collect()[0]
    assert r["source"] == "s0"
    assert r["n_chunks"] == len(expect)
    assert r["n_distinct"] == len(set(expect))
    assert r["dup_share"] == pytest.approx(
        1 - len(set(expect)) / len(expect), abs=1e-6
    )
    total_toks = sum(len(c.split()) for c in expect)
    assert r["mean_chunk_tokens"] == pytest.approx(
        total_toks / len(expect), abs=1e-6
    )
    assert r["dup_share"] > 0  # t1 repeated -> duplicate chunks exist
