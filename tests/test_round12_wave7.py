"""Round-12 seventh-wave operator contracts: SRM against a Python
recompute of the same md5 gates, ESS at the uniform and dominated
extremes, the jackknife against closed-form leave-one-out means, and
the two-proportion z / Wilson bounds against textbook formulas."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from csv_crm_upload_spark.analytics import textstats as ts
from csv_crm_upload_spark.analytics import tpch


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_srm1_matches_python_gate_recompute(spark):
    """Observed split counts, z and chi2 equal a from-scratch Python
    implementation of the identical md5 hash gate over the same ids."""
    ids = list(range(1, 401))
    rows = [(i, "x", "en", "s0", 5) for i in ids]
    out = {r["split"]: r for r in ts.srm1_split_ratio_mismatch(_docs(spark, rows)).collect()}

    def gate(i: int) -> str:
        g = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100
        return "train" if g < 80 else ("val" if g < 90 else "test")

    obs = {"train": 0, "val": 0, "test": 0}
    for i in ids:
        obs[gate(i)] += 1
    n = len(ids)
    chi2 = 0.0
    for s, p in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        e = n * p
        chi2 += round((obs[s] - e) ** 2 / e * 1e6) / 1e6
        assert out[s]["n_obs"] == obs[s]
        assert out[s]["n_expected"] == pytest.approx(e, abs=1e-6)
        assert out[s]["z"] == pytest.approx(
            (obs[s] - e) / math.sqrt(n * p * (1 - p)), abs=1e-5
        )
    for s in obs:
        assert out[s]["chi2_total"] == pytest.approx(chi2, abs=1e-5)


def test_ess1_uniform_and_dominated(spark):
    """Uniform lengths -> ESS = n (ratio 1.0); one dominant doc drags
    the ratio toward 1/n."""
    uni = [(i, "x", "en", "s0", 10) for i in range(4)]
    r = ts.ess1_length_weight_ess(_docs(spark, uni)).collect()[0]
    assert r["ess"] == 4.0 and r["ess_ratio"] == 1.0

    dom = [(0, "x", "en", "s0", 97)] + [
        (i, "x", "en", "s0", 1) for i in range(1, 4)
    ]
    r = ts.ess1_length_weight_ess(_docs(spark, dom)).collect()[0]
    assert r["ess"] == pytest.approx(10000 / 9412, abs=1e-5)
    assert r["ess_ratio"] < 0.3


def test_jk1_closed_form_replicates(spark):
    """Three sources with known sums: every loo mean, influence and
    the jackknife SE match the closed forms."""
    rows = (
        [(i, "x", "en", "sA", 10) for i in range(2)]
        + [(10 + i, "x", "en", "sB", 20) for i in range(3)]
        + [(20 + i, "x", "en", "sC", 60) for i in range(1)]
    )
    out = {r["source"]: r for r in ts.jk1_source_jackknife(_docs(spark, rows)).collect()}
    tot_n, tot_s = 6, 2 * 10 + 3 * 20 + 60
    loos = {}
    for src, (nj, sj) in {"sA": (2, 20), "sB": (3, 60), "sC": (1, 60)}.items():
        loos[src] = round((tot_s - sj) / (tot_n - nj) * 1e6) / 1e6
        assert out[src]["loo_mean"] == pytest.approx(loos[src], abs=1e-6)
        assert out[src]["influence"] == pytest.approx(
            loos[src] - tot_s / tot_n, abs=1e-5
        )
    k = 3
    bar = sum(loos.values()) / k
    sd2 = sum(round((v - bar) ** 2 * 1e6) / 1e6 for v in loos.values())
    se = math.sqrt((k - 1) / k * sd2)
    for r in out.values():
        assert r["jack_se"] == pytest.approx(se, abs=1e-4)


def test_prop1_textbook_two_proportion(spark):
    """Sat 2024-03-02 (weekend) 2/4 purchases vs Mon 2024-03-04
    (weekday) 1/5: z and both Wilson bounds match the textbook
    formulas; the intervals contain their rates."""
    sat, mon = dt.datetime(2024, 3, 2, 12), dt.datetime(2024, 3, 4, 12)
    rows = []
    for i, t in enumerate(["purchase", "purchase", "view", "view"]):
        rows.append((i, sat, 1, t, 1.0, None))
    for i, t in enumerate(["purchase", "view", "view", "view", "view"]):
        rows.append((10 + i, mon, 1, t, 1.0, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = tpch.prop1_weekend_conversion(ev).collect()[0]
    assert (r["n_weekend"], r["conv_weekend"]) == (4, 2)
    assert (r["n_weekday"], r["conv_weekday"]) == (5, 1)
    p1, p2, n1, n2 = 0.5, 0.2, 4, 5
    pool = 3 / 9
    z = (p1 - p2) / math.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n2))
    assert r["z_two_prop"] == pytest.approx(z, abs=1e-5)

    def wilson(p, n, zc=1.96):
        z2 = zc * zc
        c = p + z2 / (2 * n)
        m = zc * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        d = 1 + z2 / n
        return (c - m) / d, (c + m) / d

    lo, hi = wilson(p1, n1)
    assert r["wilson_lo_weekend"] == pytest.approx(lo, abs=1e-5)
    assert r["wilson_hi_weekend"] == pytest.approx(hi, abs=1e-5)
    assert r["wilson_lo_weekend"] < p1 < r["wilson_hi_weekend"]
    lo, hi = wilson(p2, n2)
    assert r["wilson_lo_weekday"] == pytest.approx(lo, abs=1e-5)
    assert r["wilson_hi_weekday"] == pytest.approx(hi, abs=1e-5)
