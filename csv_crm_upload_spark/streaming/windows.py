"""Event-time streaming operators over the events stream — the streaming
surface a training-data pipeline needs beyond the reference's
arrival-ordered micro-batching (the reference has no watermarks or
event-time windows: SURVEY §2.7).

Everything here is expressed so the SAME function body works on a batch
DataFrame (tests, backfills) and a streaming DataFrame (production):
tumbling/sliding windows via `F.window`, session windows via
`F.session_window`, and late-data handling via `withWatermark` applied
only when the input is streaming.

Scale posture: windowed aggregation state is keyed by (key, window) and
expired by the watermark — bounded state; sliding windows multiply state
by overlap factor (choose slide ≥ length/4 in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.streaming.event_time import as_event_time


def _maybe_watermark(events: DataFrame, delay: str) -> DataFrame:
    if events.isStreaming:
        return as_event_time(events, "ts").withWatermark("ts", delay)
    return events


def tumbling_counts(events: DataFrame, width: str = "1 hour", delay: str = "30 minutes") -> DataFrame:
    """Per-type event counts in tumbling event-time windows."""
    return (
        _maybe_watermark(events, delay)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_user_activity(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour", delay: str = "30 minutes"
) -> DataFrame:
    """Sliding-window distinct-ish activity per user (count; exact
    distinct across sliding windows is state-heavy — counts suffice for
    activity scoring)."""
    return (
        _maybe_watermark(events, delay)
        .groupBy(F.window("ts", width, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", delay: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-based), the streaming analog of
    analytics.tpch.e1_sessionize's batch window arithmetic."""
    return (
        _maybe_watermark(events, delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
