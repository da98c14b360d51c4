"""Skew mitigation utilities — the manual fallbacks for hot keys.

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these helpers cover the two patterns AQE can't:

  * salted_join — a shuffle join where ONE side has a pathological hot
    key and the other side is too big to broadcast: the big side salts
    each row deterministically into `n_salts` sub-keys; the small side
    replicates once per salt. The hot key's rows spread over `n_salts`
    tasks instead of one straggler.
  * two_phase_agg — aggregation on a skewed group key: phase 1 groups on
    (key, salt) so partials spread, phase 2 combines partials per key.
    Only decomposable aggregates (sum/count/min/max) qualify.
  * salted_count_distinct — the one aggregate two_phase_agg CANNOT
    cover (distincts don't combine): salt by a hash of the VALUE so
    equal values land in the same salt bucket, making the per-(key,
    salt) distinct counts a PARTITION of the per-key distinct set —
    summing them is exact, never an estimate.

Salt is derived from a stable hash of the row's OTHER columns (never
random — retries and the DuckDB oracle must reproduce results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, key: str, n_salts: int) -> F.Column:
    """Deterministic per-row salt in [0, n_salts): hash of all non-key
    columns (falls back to the key itself for key-only frames)."""
    others = [c for c in df.columns if c != key] or [key]
    return F.pmod(F.hash(*[F.col(c) for c in others]), F.lit(n_salts))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16, how: str = "inner"
) -> DataFrame:
    """Equi-join on `key` with the big side salted and the small side
    replicated n_salts times. Same result set as big.join(small, key, how)
    for inner/left joins; hot keys fan out over n_salts tasks."""
    big_salted = big.withColumn("_salt", _salt_col(big, key, n_salts))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame, key: str, agg_col: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe sum+count on a hot group key: (key, salt) partials →
    per-key combine. Returns key, total (double via exact decimal), cnt."""
    salted = df.withColumn("_salt", _salt_col(df, key, n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(F.col(agg_col).cast("decimal(28,6)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias("total"),
        F.sum("_pcnt").alias("cnt"),
    )


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_col: str = "n_distinct",
    n_salts: int = 16,
) -> DataFrame:
    """EXACT per-key distinct count that survives a hot key.

    COUNT(DISTINCT v) shuffles the raw (key, v) pairs, so one hot key
    serializes on one reducer no matter how AQE splits it — partial
    aggregation can't combine distincts. Salting by pmod(xxhash64(v),
    n_salts) spreads the hot key's VALUES over n_salts reducers while
    keeping equal values together, so stage 1's per-(keys…, salt)
    distinct counts sum exactly to the per-key distinct count; stage 2
    is a tiny combining sum on the keys alone. Oracle-pinned ≡ plain
    COUNT(DISTINCT) (queries(): skw1_salted_distinct_users)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count_distinct(F.col(value_col)).alias("_part_nd")
    )
    return partial.groupBy(*keys).agg(F.sum("_part_nd").cast("long").alias(out_col))
