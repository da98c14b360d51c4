"""Parquet table source for the driver testdata (TESTDATA.md).

Explicit schemas (schemas.TESTDATA_SCHEMAS) — reads never infer; column
pruning and predicate pushdown reach the parquet scan because loads are
plain `spark.read.parquet` DataFrames that Catalyst can prune.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from csv_crm_upload_spark.schemas import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan: pushdown-friendly."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
