"""File-format source/sink surface beyond CSV: JSON (the reference's wire
format, database/database.go:16-17 — here as a file source), Parquet, ORC.

All readers take the explicit schema (no inference, §1.3); all writers are
plain DataFrameWriter paths so Catalyst/Tungsten handle them natively.
JDBC is intentionally absent: no database driver jar ships in this
container — the store interface (operators/store.py) is the seam where a
JDBC-backed variant would plug in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from csv_crm_upload_spark.schemas import CUSTOMER_SCHEMA

_FORMATS = ("json", "parquet", "orc", "csv")


def write_customers(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)


def read_customers(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read.schema(CUSTOMER_SCHEMA)
    if fmt == "csv":
        reader = reader.option("header", True)
    return getattr(reader, fmt)(path)
