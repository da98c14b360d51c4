"""Streaming operator tests: event-time windows (batch parity + real
stream run) and the applyInPandasWithState budget tracker across
micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from csv_crm_upload_spark.sources.tables import load_table
from csv_crm_upload_spark.streaming.stateful import user_budget_stream
from csv_crm_upload_spark.streaming.windows import (
    session_windows,
    sliding_user_activity,
    tumbling_counts,
)


def test_tumbling_counts_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = tumbling_counts(events)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()  # tumbling windows partition all events
    # window bounds are aligned hours
    row = out.orderBy("window_start").first()
    assert row["window_start"].minute == 0 and row["window_start"].second == 0


def test_sliding_windows_double_count(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = sliding_user_activity(events, width="2 hours", slide="1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * events.count()  # every event in exactly 2 windows


def test_session_windows_match_batch_sessionize(spark, sf_dir):
    from csv_crm_upload_spark.analytics.tpch import e1_sessionize

    events = load_table(spark, sf_dir, "events")
    native = session_windows(events, gap="30 minutes")
    manual = e1_sessionize(events, gap_minutes=30)
    # same number of sessions and same per-user session counts
    n_native = native.groupBy("user_id").count().orderBy("user_id").collect()
    n_manual = manual.groupBy("user_id").count().orderBy("user_id").collect()
    assert [tuple(r) for r in n_native] == [tuple(r) for r in n_manual]


def test_streaming_tumbling_with_watermark(spark, tmp_path, sf_dir):
    # run the SAME operator as a real stream over the events data
    events = load_table(spark, sf_dir, "events").limit(200)
    src = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = tumbling_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with
    # availableNow over finite input the final watermark closes all but
    # the trailing window(s)
    got = spark.sql("select sum(n_events) from tumbling_test").collect()[0][0]
    batch_total = tumbling_counts(events).agg(F.sum("n_events")).collect()[0][0]
    assert got is not None and 0 < got <= batch_total


def test_stateful_budget_tracker_across_batches(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events")
    one_user = events.orderBy("event_id").limit(50).cache()
    expected_total = one_user.groupBy("user_id").agg(
        F.sum("value").alias("v"), F.count(F.lit(1)).alias("n")
    )
    exp = {r["user_id"]: (r["v"], r["n"]) for r in expected_total.collect()}

    src = str(tmp_path / "stateful_src")
    # two micro-batches: two separate files, maxFilesPerTrigger=1
    half = one_user.count() // 2
    rows = one_user.collect()
    spark.createDataFrame(rows[:half], one_user.schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows[half:], one_user.schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(one_user.schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = user_budget_stream(stream, threshold=10.0)
    q = (
        out.writeStream.format("memory")
        .queryName("budget_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user reflects cumulative totals across micro-batches
    final = spark.sql(
        "select user_id, max(n_events) as n, max(total_value) as v from budget_test group by user_id"
    ).collect()
    got = {r["user_id"]: (r["v"], r["n"]) for r in final}
    assert set(got) == set(exp)
    for uid, (v, n) in exp.items():
        assert got[uid][1] == n
        assert got[uid][0] == pytest.approx(v, rel=1e-9)
