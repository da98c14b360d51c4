"""Bloom join pruning: the no-false-negative guarantee, the FP pruning
rate, and plan shape (map-only probe, no UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.bloom import bf1_bloom_pruned_revenue, build_bloom


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bf = build_bloom(keys, F.col("k"))
    # every inserted key must pass the probe
    assert bf.prune(keys, F.col("k")).count() == 500


def test_false_positive_rate_prunes_disjoint_keys(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    bf = build_bloom(keys, F.col("k"), bits_per_key=10)
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    passed = bf.prune(probe, F.col("k")).count()
    # bits_per_key=10 → theoretical fpp ≈ 1%; allow generous slack
    assert passed < 20_000 * 0.10


def test_empty_build_side_prunes_everything(spark):
    keys = spark.range(0).select(F.col("id").alias("k"))
    bf = build_bloom(keys, F.col("k"))
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    assert bf.prune(probe, F.col("k")).count() == 0


def test_probe_is_jvm_only(spark):
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bf = build_bloom(keys, F.col("k"))
    probed = bf.prune(spark.range(0, 1000).select(F.col("id").alias("k")), F.col("k"))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
