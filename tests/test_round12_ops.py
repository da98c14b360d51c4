"""Round-12 operator batch contracts — the invariants the oracle pairs
cannot state (they only prove cross-engine equality): CMS's
deterministic overcount direction, the funnel's strict-order cascade
semantics, Good-Turing's count bookkeeping, Neyman's proportionality,
kappa's endpoints."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from csv_crm_upload_spark.analytics import sketch_audit as sa
from csv_crm_upload_spark.analytics import textstats as ts
from csv_crm_upload_spark.analytics import tpch


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_cms1_overcount_is_deterministically_nonnegative(spark, docs, tmp_path):
    """est >= exact is NOT probabilistic: a CMS cell holds the token's
    own full count plus collision mass, so every reported estimate
    upper-bounds truth — and on the clean fixture the Markov envelope
    holds too. n_total must equal the exact stream total (row 0's
    counters sum to the token count by construction)."""
    out = sa.cms1_countmin_audit(docs, str(tmp_path / "cms.parquet")).collect()
    assert out, "fixture corpus has heavy tokens to probe"
    from csv_crm_upload_spark.analytics.textstats import MG_WS

    n_exact = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.lower(F.col("text")), MG_WS + "+")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    for r in out:
        assert r["overcount"] >= 0, r  # deterministic, never luck
        assert r["est_count"] >= r["exact_n"]
        assert r["within_bound"], r
        assert r["n_total"] == n_exact


def test_fun1_strict_order_cascade_semantics(spark):
    """The min-time cascade on a hand-built timeline: a click BEFORE
    the first view doesn't count, a purchase AT EXACTLY the click time
    doesn't count (strictly-after), and reach is monotone."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 12, m, 0)
    rows = [
        # u1 converts fully: view@0 -> click@2 -> purchase@3
        (1, t(0), 1, "view", None), (2, t(2), 1, "click", None),
        (3, t(3), 1, "purchase", None),
        # u2: click BEFORE its first view -> never reaches step 2
        (4, t(1), 2, "click", None), (5, t(2), 2, "view", None),
        # u3: purchase at EXACTLY the click time -> step 3 not reached
        (6, t(0), 3, "view", None), (7, t(1), 3, "click", None),
        (8, t(1), 3, "purchase", None),
        # u4: view only
        (9, t(0), 4, "view", None),
        # NULL user / NULL ts rows are excluded from the population
        (10, t(0), None, "view", None), (11, None, 1, "purchase", None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["step"]: r for r in tpch.fun1_ordered_funnel(ev).collect()}
    assert out[1]["n_users"] == 4 and out[1]["conversion"] == 1.0
    assert out[2]["n_users"] == 2  # u1 and u3
    assert out[3]["n_users"] == 1  # u1 only (u3's tie rejected)
    assert out[2]["n_users"] >= out[3]["n_users"]  # monotone
    assert out[3]["conversion"] == 0.25


def test_gt1_counts_on_known_corpus(spark):
    """alpha×3 beta×2 gamma×1 delta×1 in one source: N=7, V=4, N1=2,
    N2=1, p_unseen=2/7, r*=2·1/2=1; an all-NULL-text source vanishes."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s1", 16),
            (2, "alpha beta\talpha\ndelta", "en", "s1", 22),
            (3, None, "en", "s2", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = ts.gt1_good_turing_mass(docs).collect()
    assert len(out) == 1 and out[0]["source"] == "s1"
    r = out[0]
    assert (r["n_tokens"], r["n_vocab"], r["n_hapax"], r["n_dis"]) == (7, 4, 2, 1)
    assert r["p_unseen"] == round(2 / 7, 6)
    assert r["r1_star"] == 1.0


def test_ney1_allocation_proportional_and_bounded(spark):
    """Two strata with equal size and 2:1 std-dev ratio allocate 2:1;
    a singleton stratum gets zero weight; floor allocations never
    exceed the budget."""
    rows = []
    # s_hi: lengths alternate 100/300 (sd ~ 103.28), s_lo: 150/250 (sd ~ 51.64)
    for i in range(40):
        rows.append((i, "x", "en", "hi", 100 if i % 2 else 300))
    for i in range(40, 80):
        rows.append((i, "x", "en", "lo", 150 if i % 2 else 250))
    rows.append((80, "x", "en", "single", 9999))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["source"]: r for r in ts.ney1_neyman_allocation(docs, budget=90).collect()}
    assert out["single"]["s_chars"] == 0.0
    assert out["single"]["alloc_exact"] == 0.0
    assert math.isclose(
        out["hi"]["alloc_exact"] / out["lo"]["alloc_exact"], 2.0, rel_tol=1e-6
    )
    assert sum(r["n_alloc_floor"] for r in out.values()) <= 90
    assert out["hi"]["alloc_exact"] + out["lo"]["alloc_exact"] == pytest.approx(
        90.0, abs=2e-6
    )


def test_kap1_endpoints(spark):
    """Perfect agreement → kappa 1; a single-cell confusion matrix
    (p_e = 1) → kappa NULL, not 0/0."""
    stop_text = "the of and to in is it the a"  # ratio >> 0.08 -> 'en'
    agree = spark.createDataFrame(
        [(1, stop_text, "en", "s", 1), (2, "zz qq ww rr tt yy uu", "de", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = ts.kap1_cohens_kappa(agree).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (1, 0, 0, 1)
    assert r["kappa"] == 1.0
    one_cell = spark.createDataFrame(
        [(1, "zz qq", "de", "s", 1), (2, "ww rr", "fr", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r2 = ts.kap1_cohens_kappa(one_cell).collect()[0]
    assert (r2["a"], r2["b"], r2["c"], r2["d"]) == (0, 0, 0, 2)
    assert r2["p_expected"] == 1.0 and r2["kappa"] is None


def test_mad1_known_values_and_all_null(spark):
    """values 1..9 of one type: median = 5 (nearest rank), deviations
    {0,1,1,2,2,3,3,4,4} → MAD = 2; an all-NULL column is an EMPTY
    frame, not a NULL row."""
    rows = [(i, None, i, "t", float(i)) for i in range(1, 10)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = tpch.mad1_value_mad(ev).collect()[0]
    assert (r["n_values"], r["median"], r["mad"]) == (9, 5.0, 2.0)
    assert r["sigma_robust"] == round(2 * 1.4826, 6)
    nulls = spark.createDataFrame(
        [(1, None, 1, "t", None)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    assert tpch.mad1_value_mad(nulls).count() == 0


def test_theil1_equality_is_zero_and_concentration_is_ln_n(spark):
    """Equal spends → T = 0; all spend on one of n customers → ln(n)
    (the index's two endpoints, Theil 1967)."""
    import math as m

    def orders(spends):
        return spark.createDataFrame(
            [(i, i, float(s)) for i, s in enumerate(spends)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )

    eq = tpch.theil1_spend_inequality(orders([100.0] * 8)).collect()[0]
    assert eq["theil_t"] == 0.0
    # one whale, seven zero-spend customers: terms only from x>0,
    # r = n·x/X = 8 for the whale → T = (1/8)·8·ln(8) = ln(8)
    conc = tpch.theil1_spend_inequality(orders([800.0, 0, 0, 0, 0, 0, 0, 0])).collect()[0]
    assert conc["theil_t"] == pytest.approx(m.log(8), abs=1e-6)


def test_simp1_and_cha1_on_known_corpus(spark):
    """alpha×3 beta×2 gamma delta (N=7, V=4, N1=2, N2=1):
    Simpson D = (6+2)/(42) = 4/21; Chao1 = 4 + 2·1/(2·2) = 4.5."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s1", 1),
         (2, "alpha beta alpha delta", "en", "s1", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    s = ts.simp1_simpson_diversity(docs).collect()[0]
    assert s["simpson_d"] == round(8 / 42, 6)
    assert s["diversity"] == round(1 - 8 / 42, 6)
    c = ts.cha1_chao1_richness(docs).collect()[0]
    assert c["chao1_est"] == 4.5
    assert c["coverage"] == round(4 / 4.5, 6)


def test_deg1_degree_histogram_consistency(spark, docs):
    """The histogram must account for every pair endpoint: Σ d·n_docs
    = 2·|pairs|, and membership equals dd4's near-dup member count."""
    from csv_crm_upload_spark.analytics import dedup as dd

    pairs = dd.d_minhash_lsh_pairs(docs)
    n_pairs = pairs.count()
    hist = dd.deg1_dup_degree_hist(docs).collect()
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * n_pairs
    n_members = (
        pairs.select(F.col("doc_a").alias("d"))
        .unionByName(pairs.select(F.col("doc_b").alias("d")))
        .distinct()
        .count()
    )
    assert sum(r["n_docs"] for r in hist) == n_members


def test_spr1_endpoints_and_ties(spark):
    """Monotone pairs → rho = 1 exactly (rank arithmetic, not float
    luck); anti-monotone → −1; a constant column → NULL (zero rank
    variance); tied blocks use average ranks."""
    def frames(pairs):
        orders = spark.createDataFrame(
            [(i, i, float(x)) for i, (x, _) in enumerate(pairs)],
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        cust = spark.createDataFrame(
            [(i, float(y)) for i, (_, y) in enumerate(pairs)],
            "c_custkey long, c_acctbal double",
        )
        return orders, cust

    up = tpch.spr1_spearman_rank_corr(*frames([(1, 10), (2, 20), (3, 30), (4, 40)]))
    assert up.collect()[0]["spearman_rho"] == 1.0
    down = tpch.spr1_spearman_rank_corr(*frames([(1, 40), (2, 30), (3, 20), (4, 10)]))
    assert down.collect()[0]["spearman_rho"] == -1.0
    const = tpch.spr1_spearman_rank_corr(*frames([(1, 5), (2, 5), (3, 5)]))
    assert const.collect()[0]["spearman_rho"] is None
    # ties: x = (1,1,2), y = (3,4,9) — avg rank of the tied 1s is 1.5;
    # classical tie-corrected rho = 0.866025
    tied = tpch.spr1_spearman_rank_corr(*frames([(1, 3), (1, 4), (2, 9)]))
    assert tied.collect()[0]["spearman_rho"] == pytest.approx(0.866025, abs=1e-6)


def test_ptt1_step_series_change_point(spark):
    """Step series 1×4 then 10×4 over 8 days: average ranks 2.5/6.5,
    W_4 = 10, U_4 = 2·10 − 4·9 = −16 → K = 16 at day 4, the hand
    arithmetic of Pettitt's rank-sum identity; a 1-day series is
    empty (no interior split)."""
    import datetime as dt

    rows, eid = [], 0
    for d in range(8):
        for _ in range(1 if d < 4 else 10):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 12, 0, 0), 1, "view", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = tpch.ptt1_pettitt_change_point(ev).collect()[0]
    assert (r["n_days"], r["k_stat"]) == (8, 16)
    assert r["change_day"] == dt.date(2024, 1, 4)
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0, 0), 1, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    assert tpch.ptt1_pettitt_change_point(one).count() == 0
