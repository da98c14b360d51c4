"""Round-11 operator batch: hand-computable fixtures for mb1 basket
affinity, burst1 inter-arrival burstiness, anom1 seasonal anomalies and
id1 intrinsic dimension (cross-engine value agreement lives in the
three parity suites; THESE pin the semantics against worked examples)."""

from __future__ import annotations

import datetime as dt

import pytest

from csv_crm_upload_spark.analytics import tpch
from csv_crm_upload_spark.analytics.similarity import id1_intrinsic_dimension


def test_mb1_support_confidence_lift_by_hand(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10),
        (2, 20),  # duplicate line in one order: counted once
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r["part_a"], r["part_b"]): r for r in tpch.mb1_part_affinity(li).collect()}
    ab = out[(10, 20)]
    assert ab["n_both"] == 2 and ab["n_a"] == 3 and ab["n_b"] == 2
    assert ab["n_baskets"] == 3
    assert ab["support"] == pytest.approx(2 / 3, abs=1e-6)
    assert ab["confidence"] == pytest.approx(2 / 3, abs=1e-6)
    assert ab["lift"] == pytest.approx(2 * 3 / (3 * 2), abs=1e-6)
    assert (10, 30) in out and (20, 30) in out and len(out) == 3


def test_mb1_empty_is_typed_empty(spark):
    li = spark.createDataFrame([], "l_orderkey long, l_partkey long")
    df = tpch.mb1_part_affinity(li)
    assert df.count() == 0
    assert "lift" in df.columns


def _ev(rows):
    return [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t)
        for i, (s, t) in enumerate(rows)
    ]


def test_burst1_clock_vs_bursty(spark):
    clock = [(60 * i, "clock") for i in range(10)]
    bursty = [(s, "bursty") for s in [0, 1, 2, 3, 4, 1000, 1001, 1002, 1003, 2000]]
    ev = spark.createDataFrame(
        _ev(clock + bursty), "event_id long, ts timestamp, event_type string"
    )
    out = {r["event_type"]: r for r in tpch.burst1_interarrival_burstiness(ev).collect()}
    # a perfect clock: sigma = 0 -> B = -1, cv = 0
    assert out["clock"]["burstiness"] == pytest.approx(-1.0, abs=1e-6)
    assert out["clock"]["cv"] == pytest.approx(0.0, abs=1e-6)
    assert out["clock"]["mean_gap_s"] == pytest.approx(60.0, abs=1e-6)
    # bursts: dispersion >> mean gap -> B well above the clock's -1
    assert out["bursty"]["burstiness"] > 0.0
    assert out["bursty"]["n_gaps"] == 9


def test_burst1_small_groups_dropped(spark):
    ev = spark.createDataFrame(
        _ev([(0, "solo"), (10, "pair"), (20, "pair"), (0, "trio"), (10, "trio"), (40, "trio")]),
        "event_id long, ts timestamp, event_type string",
    )
    out = {r["event_type"] for r in tpch.burst1_interarrival_burstiness(ev).collect()}
    # solo: no gap; pair: one gap (n_gaps < 2) — both dropped; trio stays
    assert out == {"trio"}


def test_anom1_flags_the_planted_spike(spark):
    rows = []
    eid = 0
    for d in range(28):
        n = 500 if d == 14 else 100
        for _ in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 12, 0, 0)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = tpch.anom1_seasonal_anomalies(ev).collect()
    days = {r["day"].isoformat() for r in out}
    assert "2024-01-15" in days  # the spike day
    spike = next(r for r in out if r["day"].isoformat() == "2024-01-15")
    assert spike["residual"] > 0 and spike["z_score"] > 2.0


def test_anom1_constant_series_is_empty(spark):
    rows = [
        (d * 10 + j, dt.datetime(2024, 1, 1 + d, 12, 0, 0))
        for d in range(21)
        for j in range(5)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    assert tpch.anom1_seasonal_anomalies(ev).count() == 0  # var_r = 0


def test_id1_recovers_low_dimension_and_drops_duplicates(spark):
    import math
    import random

    rng = random.Random(7)
    # points on a 1-D curve embedded in 8-D: intrinsic dim should read
    # far below ambient; vec 0 gets an exact duplicate (vec 100) so the
    # d1=0 exclusion path is exercised
    def pt(t):
        return [math.cos(t), math.sin(t), t, 2 * t, 0.5 * t, math.cos(2 * t), math.sin(2 * t), 1.0]

    rows = [(i, "a", pt(rng.random() * 6)) for i in range(100)]
    rows.append((100, "a", rows[0][2]))
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = id1_intrinsic_dimension(emb).collect()
    assert len(out) == 1
    r = out[0]
    # query 0's nearest is its exact duplicate -> dropped; other panel
    # queries may ALSO drop when a curve neighbor's cosine rounds to
    # 1.0 at 6 dp (the same d1=0 exclusion, by design)
    assert 5 <= r["n_queries"] <= 9
    assert 0.1 < r["intrinsic_dim"] < 4.0


def test_surv1_km_by_hand(spark):
    base = dt.datetime(2024, 3, 1, 10, 0, 0)

    def at(day):
        return base + dt.timedelta(days=day)

    rows = [
        # u1, u2: view d0 -> purchase d2
        (1, at(0), 1, "view"), (2, at(2), 1, "purchase"),
        (3, at(0), 2, "view"), (4, at(2), 2, "purchase"),
        # u3: view d0, last activity d5, never purchases (censored)
        (5, at(0), 3, "view"), (6, at(5), 3, "cart"),
        # u4: view d0 -> purchase d7 (the last at-risk subject: S -> 0)
        (7, at(0), 4, "view"), (8, at(7), 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["t_days"]: r for r in tpch.surv1_conversion_survival(ev).collect()}
    assert set(out) == {2, 7}
    assert out[2]["n_at_risk"] == 4 and out[2]["n_events"] == 2
    assert out[2]["survival"] == pytest.approx(0.5, abs=1e-6)
    # at t=7 the sole remaining subject converts: d = n -> S drops to 0
    assert out[7]["n_at_risk"] == 1 and out[7]["survival"] == 0.0


def test_surv1_no_viewers_is_empty(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    assert tpch.surv1_conversion_survival(ev).count() == 0


def test_pur1_purity_on_planted_clusters(spark):
    from csv_crm_upload_spark.analytics.clustering import pur1_cluster_purity

    rows = [
        (0, "a", [1.0, 0.0]),
        (1, "b", [0.0, 1.0]),
        (2, "a", [0.9, 0.1]),
        (3, "a", [0.9, 0.1]),
        (4, "b", [0.95, 0.05]),
        (5, "b", [0.1, 0.9]),
        (6, "b", [0.1, 0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = {r["cluster_id"]: r for r in pur1_cluster_purity(emb, k=2).collect()}
    assert out[0]["top_label"] == "a" and out[0]["n_members"] == 4
    assert out[0]["purity"] == pytest.approx(0.75, abs=1e-6)
    assert out[1]["top_label"] == "b" and out[1]["purity"] == pytest.approx(1.0)


def test_ent1_deterministic_vs_uniform_state(spark):
    # 'det' always goes to 'x' (H = 0); 'unif' splits evenly over
    # x/y/z/w (H = 2 bits, normalized 1.0)
    rows = []
    eid = 0
    for u, seq in enumerate(
        [["det", "x"]] * 4
        + [["unif", "x"], ["unif", "y"], ["unif", "z"], ["unif", "w"]]
    ):
        for i, t in enumerate(seq):
            rows.append((eid, dt.datetime(2024, 1, 1, 0, 0, eid % 60), u, t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["prev_type"]: r for r in tpch.ent1_transition_entropy(ev).collect()}
    assert out["det"]["entropy_bits"] == pytest.approx(0.0, abs=1e-6)
    assert out["det"]["norm_entropy"] == 0.0  # log2(1) guard
    assert out["unif"]["entropy_bits"] == pytest.approx(2.0, abs=1e-6)
    assert out["unif"]["norm_entropy"] == pytest.approx(1.0, abs=1e-6)


def test_wau1_sliding_distinct_by_hand(spark):
    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (1, base, 1),                             # u1 active day 0
        (2, base, 1),                             # same user+day: dedup
        (3, base + dt.timedelta(days=3), 2),      # u2 day 3
        (4, base + dt.timedelta(days=9), 1),      # u1 day 9
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["day"].isoformat(): r["wau"] for r in tpch.wau1_rolling_weekly_active(ev).collect()}
    # span = day0..day9 (10 spine days)
    assert len(out) == 10
    assert out["2024-05-01"] == 1          # window [-6, 0]: u1
    assert out["2024-05-04"] == 2          # u1 (day0) + u2 (day3)
    assert out["2024-05-07"] == 2          # day0 still in [1,7]... u1@0 in, u2@3 in
    assert out["2024-05-08"] == 1          # u1@0 aged out, u2@3 in
    assert out["2024-05-10"] == 2          # u2@3 still in (<=9), u1@9 in


def test_ret1_retention_by_hand(spark):
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # day0: u1, u2 active; u1 returns day3 (retained), u2 never does
        (1, base, 1), (2, base, 2),
        (3, base + dt.timedelta(days=3), 1),
        # day3: u1 active, returns day12 (outside the 7-day horizon)
        (4, base + dt.timedelta(days=12), 1),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["day"].isoformat(): r for r in tpch.ret1_rolling_retention(ev).collect()}
    assert out["2024-06-01"]["n_active"] == 2
    assert out["2024-06-01"]["n_retained"] == 1
    assert out["2024-06-01"]["retention"] == pytest.approx(0.5, abs=1e-6)
    assert out["2024-06-04"]["n_retained"] == 0  # day12 is beyond +7
    assert out["2024-06-13"]["n_retained"] == 0  # nothing after
    assert len(out) == 3  # only ACTIVE days emit


def test_hll2_overlap_audit_within_bound(spark, sf_dir, tmp_path):
    from csv_crm_upload_spark.analytics import sketch_audit as sa

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sa.hll2_overlap_audit(ev, str(tmp_path / "hll2.parquet")).collect()
    assert len(out) >= 3  # pairs of the >=3 event types
    assert all(r["within_bound"] for r in out), out[:5]
    # exact side really is the exact overlap for one pair
    first = out[0]
    a = {
        r["user_id"]
        for r in ev.filter(ev.event_type == first["type_a"])
        .select("user_id").distinct().collect()
    }
    b = {
        r["user_id"]
        for r in ev.filter(ev.event_type == first["type_b"])
        .select("user_id").distinct().collect()
    }
    assert first["exact_intersect"] == len((a & b) - {None})
