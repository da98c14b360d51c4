"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract steps need codec libraries that are NOT in
this container, so the actual byte→pixels/samples decode is STUBBED
(deterministic fake features, clearly marked). Everything Spark-side is
real and tested: schema, binary handling, Arrow-batched Pandas UDF
signatures, mapInPandas batch shapes, and partition sizing — the parts
that must be right for a 100 TB media pipeline.

Scale posture: media rows are large (MBs) — `media_table` keeps payload
opaque binary so parquet stores it column-separated; feature extraction
runs via mapInPandas (Arrow batches, bounded memory per batch via
spark.sql.execution.arrow.maxRecordsPerBatch); never collect payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    text (a deterministic opaque blob), kind cycles image/audio/video,
    metadata as a typed map. Real pipelines swap this for actual bytes —
    the downstream plumbing is identical."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"),
            F.lit("lang"), F.col("lang"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """STUB: the real decode needs PIL/ffmpeg/librosa, none of which ship
    in this container. A production build replaces this body; the Spark
    plumbing around it does not change."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this container"
    )


def _fake_features(payload: bytes, k: int = 4) -> list[float]:
    """Deterministic stand-in features so the distributed path is testable:
    simple byte statistics (NOT a real embedding — see decode_media)."""
    if payload is None or len(payload) == 0:
        return [0.0] * k
    n = len(payload)
    return [
        float(n),
        float(sum(payload[:256]) % 997),
        float(payload[0]),
        float(payload[-1]),
    ]


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    distributed shape of a decode stage: Arrow batches in, Arrow batches
    out, payload column dropped on output so only small features shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return media.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-relational metadata query over the media table (no Python):
    per-kind payload sizing — the kind of scan a storage planner needs."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.min(F.octet_length("payload")).alias("min_bytes"),
            F.max(F.octet_length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )
