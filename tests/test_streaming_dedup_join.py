"""Streaming dedup + stream-stream join: batch-mode semantics and real
streaming runs with watermarked state."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_crm_upload_spark.sources.tables import load_table
from csv_crm_upload_spark.streaming.dedup_join import stream_dedup_exact, stream_enrich_join


def test_stream_dedup_streaming_drops_within_watermark(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(100)
    # plant duplicates: same (user_id, event_type) twice via self-union
    dup = events.unionAll(events)
    src = str(tmp_path / "dedup_src")
    dup.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) from dedup_stream").collect()[0][0]
    expected = events.select("user_id", "event_type").distinct().count()
    assert got == expected


def test_enrich_join_batch_semantics(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    out = stream_enrich_join(views, purchases, within="1 hour")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        delta = (r["purchase_ts"] - r["view_ts"]).total_seconds()
        assert 0 <= delta <= 3600


def test_enrich_join_streaming_runs(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events").limit(500)
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    events.filter(F.col("event_type") == "view").write.mode("overwrite").parquet(vdir)
    events.filter(F.col("event_type") == "purchase").write.mode("overwrite").parquet(pdir)
    vs = spark.readStream.schema(events.schema).parquet(vdir)
    ps = spark.readStream.schema(events.schema).parquet(pdir)
    out = stream_enrich_join(vs, ps, within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch_count = stream_enrich_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
        within="1 hour",
    ).count()
    got = spark.sql("select count(*) from enrich_stream").collect()[0][0]
    # append-mode emits matches once watermarks close them; with
    # availableNow the final watermark may hold back the trailing horizon
    assert 0 < got <= batch_count
