"""Event-time normalization shared by the streaming operators.

Watermarks require TIMESTAMP (with local timezone); parquet scans of
naive timestamps infer TIMESTAMP_NTZ, and `withWatermark` on an NTZ
column raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Normalizing at the
operator boundary lets callers watermark either flavor — values are
reinterpreted in session-local time, which is what batch/stream parity
over the same parquet fixtures wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_event_time(df: DataFrame, col: str) -> DataFrame:
    """Cast `col` to TIMESTAMP iff it scanned as TIMESTAMP_NTZ."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
