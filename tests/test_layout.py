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


def test_zorder_clustering_enables_file_skipping(spark, sf_dir, tmp_path):
    """The point of Z-order: a box predicate on BOTH clustered columns
    touches few files in the clustered layout, and the zone-map scan
    returns exactly what a full-scan filter returns."""
    from csv_crm_upload_spark.operators.layout import cluster_zorder, zonemap_scan

    orders = load_table(spark, sf_dir, "orders")
    random_path = str(tmp_path / "orders_random")
    z_path = str(tmp_path / "orders_z")
    # random layout = the streaming-sink worst case (rows shuffled by hash)
    orders.repartition(16, "o_orderkey").write.parquet(random_path)
    cluster_zorder(orders, z_path, ["o_custkey", "o_totalprice"], n_files=16)

    # a ~20%×20% box in the middle of each column's observed range
    st = orders.agg(
        F.min("o_custkey").alias("k0"), F.max("o_custkey").alias("k1"),
        F.min("o_totalprice").alias("p0"), F.max("o_totalprice").alias("p1"),
    ).collect()[0]
    lo_k = int(st["k0"] + 0.2 * (st["k1"] - st["k0"]))
    hi_k = int(st["k0"] + 0.4 * (st["k1"] - st["k0"]))
    lo_p = st["p0"] + 0.2 * (st["p1"] - st["p0"])
    hi_p = st["p0"] + 0.4 * (st["p1"] - st["p0"])
    preds = {"o_custkey": (lo_k, hi_k), "o_totalprice": (lo_p, hi_p)}
    df_z, read_z, total_z = zonemap_scan(spark, z_path, preds)
    df_r, read_r, total_r = zonemap_scan(spark, random_path, preds)

    expected = orders.filter(
        (F.col("o_custkey").between(lo_k, hi_k))
        & (F.col("o_totalprice").between(lo_p, hi_p))
    ).count()
    assert expected > 0
    assert df_z.count() == expected == df_r.count()  # skipping never loses rows
    # random layout: every file spans the whole key space → nothing skips;
    # z-ordered layout: the box predicate isolates a corner of z-space
    assert read_r == total_r
    assert read_z < total_z / 2, f"z-order skipped too little: {read_z}/{total_z}"


def test_zonemap_is_metadata_only(spark, sf_dir, tmp_path):
    from csv_crm_upload_spark.operators.layout import cluster_zorder, zonemap

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_zm")
    cluster_zorder(orders, path, ["o_custkey"], n_files=4)
    zm = zonemap(path, ["o_custkey"])
    assert len(zm) == 4
    mns = sorted(env["o_custkey"][0] for env in zm)
    mxs = sorted(env["o_custkey"][1] for env in zm)
    # clustered on one column ≡ range sort: envelopes are nearly disjoint
    for i in range(3):
        assert mxs[i] <= mns[i + 1] + 1 or mxs[i] <= mxs[i + 1]
    total_rows = orders.count()
    assert spark.read.parquet(path).count() == total_rows
