"""Skew mitigation by key salting — the manual lever for the hot-key
shapes AQE cannot fix.

AQE's skew-join split (spark.sql.adaptive.skewJoin) re-plans oversized
sort-merge-join partitions at runtime, and Spark's partial aggregation
already absorbs skew for algebraic aggs (sum/count/min/max combine
map-side). What neither helps with:

  * EXACT per-key distinct counts — count_distinct shuffles the raw
    (key, value) pairs, so one hot key serializes on one reducer no
    matter how it's split (partial agg can't combine distincts);
  * joins where the build/probe partitioning must survive into later
    stages, or broadcast is off the table because the dim side grows.

Both get the classic salting treatment here, as reusable operators:
spread ONE key's rows across `n_salts` reducers with a deterministic
salt, do the heavy work per (key, salt), then fold the salt back out.
Exactness is structural, not sampled: the salt is a pure function of
the VALUE (distinct) or the row (join), so no cross-salt double count
is possible — both operators are asserted ≡ their unsalted forms.

At 100 TB: a key holding 1% of a 100 TB fact table is a 1 TB reducer —
a guaranteed spill/straggler. Salting at n_salts=64 turns it into 64
~16 GB units; the extra cost is one more (tiny, combining) shuffle for
the final fold, and n_salts duplicate dim rows per key for the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_col: str = "n_distinct",
    n_salts: int = 16,
) -> DataFrame:
    """EXACT per-key distinct count that survives a hot key.

    The salt is pmod(xxhash64(value), n_salts): equal values always
    land in the same salt bucket, so the per-(key, salt) distinct
    counts PARTITION the per-key distinct set — summing them is exact,
    never an estimate. Stage 1 shuffles on (keys…, salt) — the hot
    key's values spread over n_salts reducers — stage 2 is a tiny
    combining sum on the keys alone."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count_distinct(F.col(value_col)).alias("_part_nd")
    )
    return partial.groupBy(*keys).agg(F.sum("_part_nd").cast("long").alias(out_col))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads a hot fact key over n_salts reducers:
    each fact row gets a deterministic salt (xxhash64 of the whole
    row), the dim side is replicated once per salt value (explode of a
    literal 0..n-1 array — dim grows ×n_salts, which is the explicit
    cost knob), and the join key becomes (on, salt). Result ≡ the plain
    join (salting only refines the partitioning, never the match
    predicate); column order is facts… then dim…."""
    fact_salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    salted_facts = facts.withColumn("_salt", fact_salt)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_facts.join(salted_dim, [on, "_salt"], how)
        .drop("_salt")
        .select(*facts.columns, *[c for c in dim.columns if c != on])
    )
