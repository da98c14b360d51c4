"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Two paths, per the standard ANN playbook:
  * brute-force cosine top-k — the exact baseline. All vector math is
    built-in higher-order functions (zip_with + aggregate), JVM-side; the
    query side broadcasts, so the big side streams through one stage with
    NO shuffle until the per-query top-k (a small groupBy).
  * LSH-bucketed (random hyperplane signs) — the scale path: vectors
    hash into sign-pattern buckets; only same-bucket pairs are compared.
    At 100 TB this turns O(n·q) into O(n) + per-bucket work.

Determinism: cosine is computed in double with sequential left-fold
summation (same order both engines), rounded to 6 decimals; hyperplanes
are generated from a fixed seed dot-product with md5-derived pseudo-random
±1 components so the oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is tiny → broadcast cross join; the corpus side never
    shuffles until the final small top-k aggregation.
    """
    if query_ids is None:
        query_ids = list(range(10))
    queries = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def lsh_bucket_signature(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane LSH: bit p = sign(v · h_p). Returns vec_id +
    integer bucket. Same-bucket vectors are cosine-similar w.h.p."""
    emb = F.col("embedding")
    bits = []
    for p in range(n_planes):
        # v · h_p with ±1 components: sum of ±v[d] — sequential fold
        idx = F.sequence(F.lit(0), F.size(emb) - 1)
        dot = F.aggregate(
            F.transform(idx, lambda d: F.element_at(emb, d + 1).cast("double") * _hp_sign(p, d)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.select("vec_id", bucket.cast("int").alias("bucket"))


def _hp_sign(plane: int, dim_col) -> F.Column:
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(plane), dim_col.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def knn_lsh(embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5, n_planes: int = 8) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket, then
    exact cosine rerank within bucket. Recall trades off with n_planes."""
    if query_ids is None:
        query_ids = list(range(10))
    sig = lsh_bucket_signature(embeddings, n_planes)
    with_bucket = embeddings.join(sig, "vec_id")
    queries = with_bucket.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    scored = (
        with_bucket.join(F.broadcast(queries), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embed_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.9, n_planes: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector cousin of
    MinHash dedup: LSH-bucket by hyperplane signs, then exact cosine
    within buckets, keep pairs ≥ threshold.

    Scale path: the quadratic pair space shrinks to same-bucket pairs
    (ONE shuffle on the bucket key); tighter buckets (more planes) trade
    recall for cost exactly like LSH bands."""
    sig = lsh_bucket_signature(embeddings, n_planes)
    wb = embeddings.join(sig, "vec_id")
    a = wb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket")
    b = wb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
