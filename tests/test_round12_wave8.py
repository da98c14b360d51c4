"""Round-12 eighth-wave operator contracts: the Huber mean's bounded
response to gross outliers (vs the unbounded arithmetic mean) plus an
IRLS re-derivation in Python, and the SPRT's three decisions on
crafted conversion streams with a Python LLR-path recompute."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from csv_crm_upload_spark.analytics import tpch


def _orders(spark, prices, d=dt.datetime(2024, 1, 1)):
    return spark.createDataFrame(
        [(i, 1, "O", p, d, "A") for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_hub1_bounded_outlier_response_and_python_irls(spark):
    """9 x $10 + 1 x $1000: the arithmetic mean is $109, the Huber
    mean stays near $10 — and every reported step matches a
    from-scratch Python IRLS with the same median/MAD/c and the same
    micro/nano rounding."""
    prices = [9.0, 10.0, 10.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0]
    r = tpch.hub1_huber_robust_mean(_orders(spark, prices)).collect()[0]
    assert r["n_orders"] == 10
    assert r["median"] == 10.0
    assert r["mu3"] < 20.0  # vs arithmetic mean 109.3

    cents = sorted(round(p * 100) for p in prices)
    n = len(cents)
    rank = (50 * n + 99) // 100
    m0 = cents[rank - 1]
    devs = sorted(abs(c - m0) for c in cents)
    mad = devs[rank - 1]
    sigma = 1.4826 * float(mad) / 100.0
    ch = 1.345 * sigma
    assert r["sigma_robust"] == pytest.approx(sigma, abs=1e-6)
    assert r["c_huber"] == pytest.approx(ch, abs=1e-6)
    mu = m0 / 100.0
    for step in ["mu1", "mu2", "mu3"]:
        swx = sw = 0
        for c in cents:
            x = c / 100.0
            dev = x - mu
            w = 1.0 if abs(dev) <= ch else ch / abs(dev)
            swx += round(w * x * 1e6)
            sw += round(w * 1e9)
        mu = (swx / 1e6) / (sw / 1e9)
        assert r[step] == pytest.approx(mu, abs=1e-5), step


def test_hub1_constant_corpus_zero_mad_is_safe(spark):
    """All-identical prices: MAD = 0 so c = 0; the branch-safe weight
    gives every median row w = 1 and the IRLS fixes at the median —
    no 0/0 anywhere."""
    r = tpch.hub1_huber_robust_mean(_orders(spark, [25.0] * 6)).collect()[0]
    assert r["c_huber"] == 0.0
    assert r["mu1"] == r["mu2"] == r["mu3"] == 25.0


def _events(spark, day_specs, start=dt.datetime(2024, 3, 1)):
    """day_specs: list of (n_events, n_purchases) per day."""
    rows, key = [], 0
    for i, (n, x) in enumerate(day_specs):
        for j in range(n):
            key += 1
            t = "purchase" if j < x else "view"
            rows.append((key, start + dt.timedelta(days=i), 7, t, 1.0, None))
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_sprt1_three_decisions_and_python_path(spark):
    """High conversion (8%) crosses the H1 bound; near-zero conversion
    crosses the H0 bound; a two-day trickle stays 'continue'. The
    decided day equals the Python-recomputed first crossing."""
    l1 = math.log(0.04 / 0.02)
    l2 = math.log(0.96 / 0.98)
    a_n = round(math.log(0.95 / 0.05) * 1e9)
    b_n = round(math.log(0.05 / 0.95) * 1e9)

    def py_first_crossing(specs):
        llr = 0
        for i, (n, x) in enumerate(specs):
            llr += round((x * l1 + (n - x) * l2) * 1e9)
            if llr >= a_n:
                return i, "accept_h1"
            if llr <= b_n:
                return i, "accept_h0"
        return None, "continue"

    hi = [(100, 8)] * 10
    r = tpch.sprt1_conversion_sprt(_events(spark, hi)).collect()[0]
    i, dec = py_first_crossing(hi)
    assert r["decision"] == dec == "accept_h1"
    assert r["decided_day"] == dt.date(2024, 3, 1 + i)
    assert r["total_events"] == 1000 and r["total_conversions"] == 80

    lo = [(200, 0)] * 10
    r = tpch.sprt1_conversion_sprt(_events(spark, lo)).collect()[0]
    i, dec = py_first_crossing(lo)
    assert r["decision"] == dec == "accept_h0"
    assert r["decided_day"] == dt.date(2024, 3, 1 + i)

    tiny = [(10, 1), (10, 0)]
    r = tpch.sprt1_conversion_sprt(_events(spark, tiny)).collect()[0]
    assert r["decision"] == "continue" and r["decided_day"] is None
    llr = sum(round((x * l1 + (n - x) * l2) * 1e9) for n, x in tiny)
    assert r["final_llr"] == pytest.approx(llr / 1e9, abs=1e-6)
