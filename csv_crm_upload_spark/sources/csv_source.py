"""CSV source (S1-S3).

Reference behavior being reproduced (Spark-first, not a translation):
  * S1 — incremental scan, never whole-file in memory (reference
    README.md:109; cmd/csvreader/csvreader.go:23-33). Spark's CSV
    datasource streams splits; in streaming mode the file source feeds
    micro-batches.
  * S2 — optional header skip (reference cmd/main.go:29 `-noheader`,
    csvreader.go:49-52). Maps to the `header` reader option. The
    reference's double-skip bug (SURVEY §2.10) is NOT replicated.
  * S3 — per-record parse with malformed-row tolerance (reference
    csvreader.go:80-82,109-129): a bad line is logged and skipped, never
    fatal. Maps to PERMISSIVE mode + a corrupt-record column; the split
    into clean vs corrupt happens in operators.validate.

Columns are positional (id, first_name, last_name, email, phone) — the
header row, when present, is discarded, not used for naming (reference
csvreader.go:49-52). We therefore always impose our own schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from csv_crm_upload_spark.schemas import CUSTOMER_CSV_SCHEMA

_CSV_OPTIONS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
    "enforceSchema": "true",  # positional semantics: never trust the header names
}


def read_customers_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Batch CSV scan with the fixed positional schema (S1+S2+S3)."""
    reader = spark.read.schema(CUSTOMER_CSV_SCHEMA).options(**_CSV_OPTIONS)
    return reader.option("header", header).csv(path)


def read_customers_csv_stream(
    spark: SparkSession, directory: str, header: bool = True, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming CSV scan over a directory (T1's micro-batch source).

    The reference micro-batches by row count (buffer=5, cmd/main.go:30);
    Spark micro-batches by trigger — `maxFilesPerTrigger` bounds batch
    size, `Trigger.AvailableNow` drains finite input (T2).
    """
    reader = spark.readStream.schema(CUSTOMER_CSV_SCHEMA).options(**_CSV_OPTIONS)
    reader = reader.option("header", header)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(directory)
