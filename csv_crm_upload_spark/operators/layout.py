"""Storage layout operators — the physical-design levers that decide
whether a 100 TB table is scannable or a full-table tax.

  * write_partitioned — hive-style date/key partitioning: queries with a
    partition predicate read only matching directories (partition
    pruning happens at planning time, before any file I/O).
  * write_bucketed — pre-shuffled, hash-bucketed table on a join key:
    joins/aggs on that key skip the shuffle entirely (both sides read
    co-located buckets). The lakehouse answer to "this join shuffles
    100 TB every night".
  * compact — bin-pack small files to a target count per partition; the
    small-files problem is the classic slow killer of streaming sinks.

The reference has a single Postgres table with a B-tree index
(init-db.sh:23-25); partitioning on the `uploaded` flag + date is the
columnar analog of that index for the pending scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition columns come back as columns; predicates on them prune
    directories at plan time (verify via PartitionFilters in explain)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) managed table. Joins between
    two tables bucketed identically on the join key execute with NO
    Exchange on either side."""
    spark = df.sparkSession
    if mode == "overwrite":
        # a crashed prior write can leave the location without catalog
        # metadata, which blocks saveAsTable — clear both
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{table_name}", ignore_errors=True)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def compact(spark: SparkSession, path: str, target_files: int = 8) -> None:
    """Bin-pack a parquet directory to ~target_files files (small-files
    compaction). Rewrites via a temp location then swaps."""
    import os
    import shutil

    tmp = path.rstrip("/") + ".compact.tmp"
    backup = path.rstrip("/") + ".compact.bak"
    # a prior crash can strand either temp dir; clear them or the renames
    # below fail (rename onto existing non-empty dir)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)
    df = spark.read.parquet(path)
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # NOTE: between these two renames the table path briefly does not
    # exist; compact() assumes no concurrent reader mid-scan (single-node
    # maintenance op — a table format's atomic commit is the real fix).
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
