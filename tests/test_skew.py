"""Salting operators: exact equivalence to their unsalted forms on a
PLANTED hot key (one key holding half the table), plus plan shape —
the heavy stage must partition on (key, salt), which is the whole
point."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.skew import salted_count_distinct, salted_join


def _skewed_events(spark, n=20_000, hot_frac=0.5):
    """user_id 7 owns `hot_frac` of all rows; values repeat so distinct
    counting is non-trivial."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.pmod(F.col("id"), 97))
        .alias("user_id"),
        F.pmod(F.col("id") * 31, 4096).alias("item_id"),
        (F.col("id") % 13).cast("double").alias("value"),
    )


def test_salted_count_distinct_is_exact_under_skew(spark):
    df = _skewed_events(spark)
    got = {
        (r["user_id"], r["n_distinct"])
        for r in salted_count_distinct(df, ["user_id"], "item_id").collect()
    }
    want = {
        (r["user_id"], r["n_distinct"])
        for r in df.groupBy("user_id")
        .agg(F.count_distinct("item_id").cast("long").alias("n_distinct"))
        .collect()
    }
    assert got == want and len(got) > 1

    # the hot key really is hot, and stage 1 spreads it: the partial agg
    # partitions on (user_id, _salt), not user_id alone
    salted = salted_count_distinct(df, ["user_id"], "item_id")
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"hashpartitioning\(user_id#\d+L?, _salt#\d+", plan), plan[:1200]


def test_salted_join_equals_plain_join_under_skew(spark):
    facts = _skewed_events(spark)
    dim = spark.range(97).select(
        F.col("id").alias("user_id"), F.concat(F.lit("seg_"), F.col("id") % 5).alias("segment")
    )
    got = sorted(
        map(tuple, salted_join(facts, dim, "user_id", n_salts=8).collect())
    )
    want = sorted(
        map(
            tuple,
            facts.join(dim, "user_id")
            .select(*facts.columns, "segment")
            .collect(),
        )
    )
    assert got == want and len(got) > 0

    # the join key carries the salt
    sj = salted_join(facts, dim, "user_id", n_salts=8)
    plan = sj._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_salted_join_left_keeps_unmatched_facts(spark):
    facts = _skewed_events(spark, n=1000)
    dim = spark.range(5).select(  # most users unmatched
        F.col("id").alias("user_id"), F.lit("x").alias("segment")
    )
    got = salted_join(facts, dim, "user_id", n_salts=4, how="left")
    want = facts.join(dim, "user_id", "left").select(*facts.columns, "segment")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
