"""Streaming dedup + stream-stream join — the streaming halves of the
engine's dedup and join families.

  * stream_dedup_exact — `dropDuplicatesWithinWatermark` on a content
    key: the streaming analog of analytics.dedup.d_exact_dups. State
    holds one entry per key only within the watermark horizon — bounded
    state, unlike an unbounded `dropDuplicates` which grows forever.
  * stream_enrich_join — stream-stream equi-join with event-time range:
    each side watermark-bounded so join state expires. The pattern for
    joining a click stream to a view stream at 100 TB/day.

Both run identically on batch frames (tests, backfill) minus the
watermark, same as streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.streaming.event_time import as_event_time as _as_event_time


def stream_dedup_exact(
    events: DataFrame, key_cols: list[str] | None = None, delay: str = "30 minutes"
) -> DataFrame:
    """Keep the first arrival per key; duplicates arriving within the
    watermark horizon are dropped, state expires after it."""
    keys = key_cols or ["user_id", "event_type"]
    if events.isStreaming:
        events = _as_event_time(events, "ts")
        return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def stream_enrich_join(
    views: DataFrame, purchases: DataFrame, within: str = "1 hour", delay: str = "30 minutes"
) -> DataFrame:
    """Attribute each purchase to a prior view by the same user within
    `within` (event-time range join). Watermarks on both sides bound the
    join state; without them stream-stream joins are unbounded."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if views.isStreaming:
        v = _as_event_time(v, "view_ts").withWatermark("view_ts", delay)
        p = _as_event_time(p, "purchase_ts").withWatermark("purchase_ts", delay)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}"))
    )
    return v.join(p, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "view_id",
        "view_ts",
    )
