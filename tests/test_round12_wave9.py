"""Round-12 ninth-wave operator contracts: Hill against a Python
recompute with the same top-k and nano rounding (and on a synthetic
Pareto grid it should recover the tail index), tail dependence at the
comonotone and antithetic rails."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from csv_crm_upload_spark.analytics import tpch


def _orders(spark, prices, d=dt.datetime(2024, 1, 1)):
    return spark.createDataFrame(
        [(i, i, "O", p, d, "A") for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _customers(spark, bals):
    return spark.createDataFrame(
        [(i, f"c{i}", f"a{i}", 0, f"p{i}", b, "SEG", "x") for i, b in enumerate(bals)],
        "c_custkey long, c_name string, c_address string, c_nationkey long, "
        "c_phone string, c_acctbal double, c_mktsegment string, c_comment string",
    )


def test_hill1_python_recompute_and_pareto_recovery(spark):
    """150 known prices: k_used=100, x_k and alpha match the same
    top-k + nano-rounding recomputed in Python. On a Pareto(alpha=1.5)
    inverse-CDF grid the estimate lands near 1.5 and flags infinite
    variance."""
    prices = [float(1000 + 7 * i) for i in range(150)]
    r = tpch.hill1_tail_index(_orders(spark, prices)).collect()[0]
    cents = sorted((round(p * 100) for p in prices), reverse=True)[:100]
    xk = cents[-1]
    terms = [round(math.log(c / xk) * 1e9) for c in cents if c > xk]
    alpha = 1.0 / (sum(terms) / len(terms) / 1e9)
    assert r["k_used"] == 100
    assert r["x_k_dollars"] == xk / 100.0
    assert r["n_exceed"] == len(terms)
    assert r["hill_alpha"] == pytest.approx(alpha, abs=1e-5)

    # inverse-CDF Pareto grid: x = scale * u^(-1/1.5), u = i/n
    n, a_true = 400, 1.5
    pareto = [10.0 * ((i + 0.5) / n) ** (-1.0 / a_true) for i in range(n)]
    r = tpch.hill1_tail_index(_orders(spark, pareto)).collect()[0]
    assert r["hill_alpha"] == pytest.approx(a_true, rel=0.25)
    assert r["infinite_variance"] is True


def test_tail1_comonotone_and_antithetic_rails(spark):
    """price == balance per customer -> the extremes co-occur exactly
    (lambda_u = 1); price inverted against balance -> the top tails
    are disjoint (lambda_u = 0)."""
    bals = [float(100 + i) for i in range(100)]
    cust = _customers(spark, bals)
    same = _orders(spark, bals)
    r = tpch.tail1_tail_dependence(same, cust).collect()[0]
    assert r["n_pairs"] == 100
    assert r["n_joint"] == r["n_x_exceed"] == r["n_y_exceed"] > 0
    assert r["lambda_u"] == 1.0 and r["p_y_given_x"] == 1.0

    inv = _orders(spark, [float(300 - (100 + i)) for i in range(100)])
    r = tpch.tail1_tail_dependence(inv, cust).collect()[0]
    assert r["n_joint"] == 0
    assert r["lambda_u"] == 0.0 and r["p_joint"] == 0.0
