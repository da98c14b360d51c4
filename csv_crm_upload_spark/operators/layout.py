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


# ---------------------------------------------------------------------------
# Z-order clustering + zone-map file skipping — the data-skipping pair a
# lakehouse OPTIMIZE ZORDER BY gives you, on plain parquet. Clustering
# makes per-file min/max ranges NARROW on every clustered column at once;
# the zone-map scan then skips files whose range cannot match a predicate.
# At 100 TB this is the difference between "read 3 files" and "read the
# table" for multi-column selective queries.
# ---------------------------------------------------------------------------

_Z_BITS = 16  # per-column bucket resolution (16 bits → 65536 buckets)


def _zvalue(df: DataFrame, cols: list[str]):
    """Z-order key as a pure Column expression: linearly bucketize each
    column into 16-bit space (width_bucket against the observed min/max —
    one tiny agg job), then bit-interleave the buckets round-robin.
    All JVM-side integer algebra; codegen keeps it in the scan stage."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    parts = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        b = F.least(
            F.lit((1 << _Z_BITS) - 1),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * (1 << _Z_BITS)),
        ).cast("long")
        parts.append(b)
    z = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(_Z_BITS):
        for j, b in enumerate(parts):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + (k - 1 - j)
            )
    return z


def cluster_zorder(df: DataFrame, path: str, cols: list[str], n_files: int = 16) -> None:
    """OPTIMIZE ... ZORDER BY (cols): rewrite `df` so rows co-locate by
    z-value — range-partitioned into n_files, sorted within each — giving
    every output file a tight min/max envelope on EVERY clustered column.
    One range shuffle (sampled boundaries), then a sorted write."""
    z = _zvalue(df, cols)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zonemap(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max envelopes from parquet footers — metadata-only
    (no row I/O), the scan planner's skipping index. Equivalent info to
    a Delta add-file stats entry or an ORC/Iceberg zone map."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        env = {"file": f}
        for c in cols:
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    mn, mx = None, None
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            env[c] = (mn, mx)
        out.append(env)
    return out


def zonemap_scan(
    spark: SparkSession, path: str, predicates: dict[str, tuple]
) -> tuple[DataFrame, int, int]:
    """File-skipping scan: read ONLY the files whose zone-map envelope
    intersects every [lo, hi] predicate, then re-apply the predicates
    exactly (the envelope is necessary, not sufficient). Returns
    (DataFrame, files_read, files_total). Parquet row-group stats inside
    the chosen files still prune further — this adds the FILE level a
    plain directory scan lacks."""
    from pyspark.sql import functions as F

    zm = zonemap(path, list(predicates))
    keep = []
    for env in zm:
        ok = True
        for c, (lo, hi) in predicates.items():
            mn, mx = env[c]
            if mn is None or mx is None:  # no stats → cannot skip safely
                continue
            if mx < lo or mn > hi:
                ok = False
                break
        if ok:
            keep.append(env["file"])
    if not keep:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*keep)
    for c, (lo, hi) in predicates.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df, len(keep), len(zm)
