"""Scale-adaptive fan-out for per-row-heavy map stages.

The driver testdata parquet files are written as a SINGLE row group, and
parquet scans can only parallelize across row groups — so every scan of
these files plans as ONE task no matter how many cores the session has.
That is fine for cheap scans, but a per-row-heavy map stage downstream
(shingling + MinHash, n-gram explode, d² covariance pair terms, k×d
distance scoring) then runs single-threaded while every other core
idles: the guide's "input skew: one huge unsplittable file" case
(spark_optimization_guide §2.5), whose fix is to repartition immediately
after the read.

`fan_out` applies that fix scale-adaptively: it round-robin-repartitions
to the session's default parallelism ONLY when the input currently plans
fewer partitions than that. On a real cluster any corpus-sized scan
already plans at least as many partitions as there are cores, so the
branch never fires and the plan is untouched — this is not a local[32]
tuning constant, it is a floor on map-stage parallelism that is a no-op
wherever the scan already provides it.

Measured (sf0.1, local[32]): the pca1 d² pair-term aggregation drops
12.7 s → 1.75 s warm with identical output; similar ratios on the
MinHash signature and n-gram map stages.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: Logical-plan nodes that introduce an exchange (or are themselves a
#: repartition): a frame containing one already has — or will get — a
#: parallel stage of its own, so fanning it out again would only add an
#: exchange; and calling `.rdd` on such a frame would eagerly
#: materialize its shuffle stages under AQE. Map-side nodes (Filter,
#: Project, Generate/explode, Union of scans) are fine.
#: anchored to the START of a plan-tree line (after the tree-drawing
#: prefix chars), so an attribute/alias that happens to be named like a
#: node (e.g. a column "Sort#12" printed mid-line inside a Project's
#: expression list) can no longer turn fan_out into a silent no-op
#: (advice r12)
_EXCHANGE_NODES = re.compile(
    r"(?m)^[\s:+|-]*(?:Join|Aggregate|Window|Sort|Repartition|"
    r"RepartitionByExpression|Deduplicate|GlobalLimit|CoGroup|FlatMapGroups)\b"
)


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition `df` up to the session's default
    parallelism when it would otherwise plan fewer map tasks.

    Intended for scan-shaped inputs (scan/filter/project). Composed
    callers sometimes hand in frames that already contain joins or
    aggregations; those are detected from the optimized logical plan
    (driver-only, no job) and returned unchanged — they already have a
    parallel stage of their own, and probing `.rdd` on them would
    eagerly materialize shuffle stages under AQE.

    Round-robin (not keyed) because the goal is spread, not layout; the
    sort-before-repartition determinism guard (SPARK-23207) stays on, so
    retried tasks reproduce the same row placement. Every consumer in
    this repo aggregates or joins downstream of the fan-out, so row
    order never reaches a result.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target <= 1:
        return df
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if _EXCHANGE_NODES.search(plan):
            return df
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning failure falls back to as-is
        return df
    if current >= target:
        return df
    return df.repartition(target)


def cluster_for_write(
    df: DataFrame, *cols: str, max_bucket_rows: int | None = None
) -> DataFrame:
    """Hash-cluster rows on the physical partition column(s) before a
    `partitionBy` write, so each partition value is written by (usually)
    one task instead of every task writing a sliver of every value —
    the small-files fix of spark_optimization_guide §6. Measured at
    sf0.1: save_text_index wrote 1,725 ~4 KB files for 7.2 MB of index
    (64 buckets × 32 tasks, per subdir) before; one file per bucket
    after. At scale the per-bucket file size is governed by the build's
    own n_buckets parameter — the pruning grain and the file grain are
    deliberately the same knob, and AQE partition coalescing keeps the
    shuffle cheap when the table is small.

    `max_bucket_rows` (round-13 skew guard, guide §2.5): every current
    call site clusters on a `pmod(hash(...), n_buckets)` column, so
    values are near-uniform by construction and the default (None, one
    task/file per value) is right. For a NON-hashed partition column a
    hot value would otherwise funnel into one straggler task and one
    giant file; with a threshold, values whose row count exceeds it are
    salted deterministically (xxhash64 of the whole row — retry-safe)
    across ceil(n/threshold) sub-tasks, so the hot value gets
    proportionally many tasks/files while every cold value keeps exactly
    one. Costs one bucket-grain count pass + a broadcast join; only pay
    it when the partition column's distribution is not already hashed."""
    from pyspark.sql import functions as F

    key_cols = [F.col(c) for c in cols]
    if max_bucket_rows is None:
        return df.repartition(*key_cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_cfw_n"))
    n_salts = F.ceil(F.col("_cfw_n") / F.lit(float(max_bucket_rows))).cast("int")
    salt = F.when(
        F.col("_cfw_n") > max_bucket_rows,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_salts),
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(counts), list(cols))
        .withColumn("_cfw_salt", salt)
        .repartition(*key_cols, F.col("_cfw_salt"))
        .drop("_cfw_n", "_cfw_salt")
    )
