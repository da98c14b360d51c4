"""Storage-layout tests: partition pruning must show in the plan, bucketed
joins must be Exchange-free, compaction must preserve data."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.layout import (
    compact,
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from csv_crm_upload_spark.sources.tables import load_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_partitioned(orders, path, ["order_year"])
    # hive layout on disk
    years = {d for d in os.listdir(path) if d.startswith("order_year=")}
    assert len(years) >= 3

    back = read_partitioned(spark, path).filter(F.col("order_year") == 1996)
    plan = plan_of(back)
    assert "PartitionFilters: [isnotnull(order_year" in plan
    # only the matching partition's rows come back
    expected = orders.filter(F.year("o_orderdate") == 1996).count()
    assert back.count() == expected


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8
    )
    # the tiny test tables would broadcast (which disables bucketing);
    # force the SMJ path to observe the co-bucketed shuffle-free plan —
    # at real scale neither fact side is broadcastable and this IS the plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-bucketed: shuffle-free join
        assert "Bucketed: true" in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_compact_preserves_data(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "fragmented")
    events.repartition(32).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    total = events.count()
    checksum = events.agg(F.sum("event_id")).collect()[0][0]

    compact(spark, path, target_files=4)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after < n_before and n_after <= 4
    back = spark.read.parquet(path)
    assert back.count() == total
    assert back.agg(F.sum("event_id")).collect()[0][0] == checksum
