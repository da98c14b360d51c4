"""Bloom-filter join pruning — runtime row-level filtering, hand-built
from JVM-side expressions.

The 100 TB problem: a fact⋈dim semi join where the dim's distinct-key
set is too large to ship as an exact broadcast IN-list, but the fact
scan is dominated by rows that will never match. Spark's optimizer has
an internal `bloom_filter_agg` runtime filter for exactly this; it is
not exposed to the public API (UNRESOLVED_ROUTINE from SQL), so this
module builds the same structure out of public, codegen-friendly
primitives — no UDF, no driver-side bit twiddling:

  build (one pass over the dim keys):
    md5(key) → (h1, h2) 60/56-bit ints → k double-hashed bit positions
    (Kirsch–Mitzenmacher, same trick as the MinHash family);
    positions explode to (word_idx, bit_mask) pairs; `bit_or` aggregates
    per word (map-side combining); the ≤ m/64 words fold into ONE dense
    array<long> row via map_from_entries + transform(sequence(...)).

  probe (map-only over the fact scan):
    broadcast the 1-row bitmap; a row passes iff ALL k of its positions
    have their bit set — element_at + bitwiseAND, whole-stage codegen.

No false negatives ever (every inserted key's bits are set); false
positives at the classic (1 − e^(−kn/m))^k rate are removed by the
exact join that follows — the bloom stage only PRUNES the shuffle.

Sizing: m = bits_per_key × n rounded up to a power of two (so the
modulo is cheap), k ≈ 0.7·m/n. n comes from one count() over the dim —
the same cardinality estimate Spark's own runtime filter derives from
statistics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h1h2(key: Column) -> tuple[Column, Column]:
    md5hex = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(md5hex, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5hex, 16, 14), 16, 10).cast("long")
    return h1, h2


class BloomFilter:
    """A built bitmap: `words` is a 1-row DataFrame with array<long>."""

    def __init__(self, words: DataFrame, m_bits: int, k_hashes: int):
        self.words = words
        self.m_bits = m_bits
        self.k_hashes = k_hashes

    def prune(self, df: DataFrame, key: Column) -> DataFrame:
        """Rows of df whose key MIGHT be in the built set (map-only)."""
        h1, h2 = _h1h2(key)
        staged = (
            df.crossJoin(F.broadcast(self.words))
            .withColumn("_bf_h1", h1)
            .withColumn("_bf_h2", h2)
        )
        cond = F.lit(True)
        for i in range(self.k_hashes):
            # SQL shiftleft accepts a column shift amount (the pyspark
            # wrapper does not), hence the expr() probes
            cond = cond & (
                F.expr(
                    f"element_at(_bf_words, CAST(((_bf_h1 + {i} * _bf_h2) % {self.m_bits}) DIV 64 AS INT) + 1)"
                    f" & shiftleft(CAST(1 AS BIGINT),"
                    f" CAST((_bf_h1 + {i} * _bf_h2) % {self.m_bits} % 64 AS INT))"
                )
                != 0
            )
        return staged.filter(cond).drop("_bf_words", "_bf_h1", "_bf_h2")


def build_bloom(
    keys: DataFrame, key: Column, bits_per_key: int = 10
) -> BloomFilter:
    """One aggregation pass over `keys` → a broadcastable bitmap.

    The dim cardinality (one count() job — the stats estimate) sizes the
    filter; k_hashes = round(0.7 · bits_per_key) per the optimum."""
    n = max(1, keys.count())
    m_bits = 1 << max(6, int(math.ceil(math.log2(bits_per_key * n))))
    k_hashes = max(1, min(8, round(0.7 * m_bits / n)))
    h1, h2 = _h1h2(key)
    hashed = keys.select(h1.alias("h1"), h2.alias("h2"))
    positions = hashed.select(
        F.explode(
            F.array(
                *[
                    ((F.col("h1") + F.lit(i) * F.col("h2")) % m_bits).alias(f"p{i}")
                    for i in range(k_hashes)
                ]
            )
        ).alias("pos")
    )
    per_word = (
        positions.select(
            F.expr("CAST(pos DIV 64 AS BIGINT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    n_words = m_bits // 64
    words = per_word.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda w: F.coalesce(F.element_at(F.col("wm"), w), F.lit(0).cast("long")),
        ).alias("_bf_words")
    )
    return BloomFilter(words, m_bits, k_hashes)


def bf1_bloom_pruned_revenue(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Revenue of open orders belonging to high-balance customers, with
    the orders scan bloom-pruned BEFORE the exact semi join.

    The bloom stage strips non-matching orders map-side so the semi-join
    shuffle carries (matches + FP rate), not the whole fact table; the
    exact join then removes false positives, so the RESULT is identical
    to the plain semi join — which is exactly what the DuckDB oracle
    computes. At 100 TB this is the difference between shuffling the
    full fact table and shuffling ~the match set."""
    rich = customer.filter(F.col("c_acctbal") > 7500.0).select("c_custkey")
    bf = build_bloom(rich, F.col("c_custkey"))
    pruned = bf.prune(orders.filter(F.col("o_orderstatus") == "O"), F.col("o_custkey"))
    return (
        pruned.join(rich, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )
