"""Distributed text retrieval — BM25 scoring and hybrid (lexical +
embedding) re-ranking over the documents corpus.

The missing half of corpus tooling next to t10's TF-IDF keyword
extraction: given a small set of QUERIES, rank documents. This is the
shape of retrieval behind RAG data curation, eval-set mining, and
targeted corpus slicing at training scale.

Scale posture (100 TB corpus, handful-to-thousands of queries):
  * One explode + one (doc_id, tok) aggregation builds term frequencies
    — map-side combining, single shuffle keyed by (doc, token).
  * Document-frequency and corpus stats are aggregations over the tf
    table: df shuffles on token (bounded by vocabulary size), N/avgdl
    is a 1-row aggregate that broadcasts.
  * The query set joins as a BROADCAST on token — scoring rides the tf
    scan; no per-query pass over the corpus.
  * Top-k per query ranks only matched (query, doc) pairs — candidate
    set, never the corpus.
Everything is built-in Column expressions; no Python UDFs.

BM25 formula (Robertson/Okapi, the +1 idf variant Lucene uses so scores
stay positive): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).

Reference parity note: the reference repo (a CSV→CRM uploader) has no
retrieval surface; this extends the engine's LLM-data-pipeline family
(SURVEY §6 widening) alongside dedup/similarity/textstats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.textstats import _tokens

# Deterministic demo query set over the synthetic corpus vocabulary.
# query_id doubles as the vec_id of the query's embedding for the hybrid
# path (the synthetic embeddings table is keyed 0..N-1 like documents).
DEFAULT_QUERIES: dict[int, list[str]] = {
    0: ["spark", "join", "window"],
    1: ["hash", "table", "merge"],
    2: ["vector", "stream", "sort"],
}


def _query_terms_df(spark, queries: dict[int, list[str]]) -> DataFrame:
    rows = [(qid, t) for qid, terms in sorted(queries.items()) for t in sorted(set(terms))]
    return spark.createDataFrame(rows, "query_id long, tok string")


def _tf_stats(documents: DataFrame):
    """Shared retrieval statistics: (tf, dfreq, corpus-stats) frames.
    tf carries each document's length so the scorer needs no extra join
    back to the corpus."""
    has_text = F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    toks = (
        documents.filter(has_text)
        .select("doc_id", F.explode(_tokens()).alias("tok"))
        .withColumn("tok", F.lower(F.col("tok")))
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # dl = Σ tf per doc: second agg re-uses tf's partitioning prefix, and
    # the window avoids a join back to the corpus
    tf = tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
    # persist before the fan-out: tf feeds BOTH the scorer join and the
    # document-frequency aggregation — without a materialization point
    # Spark recomputes the corpus scan + explode + (doc,tok) shuffle for
    # each consumer (plan-asserted by the bm25 shuffle budget)
    tf = tf.persist()
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # total_tokens (exact long) travels with avgdl so incremental index
    # maintenance can fold counts integer-exactly and re-derive the SAME
    # double avgdl = total/n a fresh build computes
    stats = documents.filter(has_text).select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens())).cast("long").alias("total_tokens"),
        (F.sum(F.size(_tokens())) / F.count(F.lit(1))).alias("avgdl"),
    )
    return tf, dfreq, stats


def bm25_scores(
    documents: DataFrame,
    queries: dict[int, list[str]] | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """All matched (query_id, doc_id, bm25) pairs, unranked — the
    candidate-generation stage hybrid retrieval re-ranks."""
    queries = DEFAULT_QUERIES if queries is None else queries
    qdf = _query_terms_df(documents.sparkSession, queries)
    tf, dfreq, stats = _tf_stats(documents)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(qdf), "tok")
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_sat), 4).alias("bm25"))
    )


def bm25_search(
    documents: DataFrame,
    queries: dict[int, list[str]] | None = None,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by BM25. Scores round to 4 decimals
    BEFORE ranking (cross-engine determinism), ties break on doc_id."""
    scored = bm25_scores(documents, queries, k1=k1, b=b)
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )


def save_text_index(documents: DataFrame, path: str, n_buckets: int = 64) -> None:
    """Persist the BM25 inverted index: postings (doc, token, tf, dl)
    partitioned BY a token hash bucket, document frequencies partitioned
    the same way, and the 1-row corpus stats. The build-once /
    query-many split of production retrieval (the text twin of
    ivf.save_index): the corpus scan + (doc,token) shuffle run once per
    snapshot, then every query reads ONLY the partitions its terms hash
    into — partition pruning does the candidate selection before any
    row is touched."""
    tf, dfreq, stats = _tf_stats(documents)
    bucket = F.pmod(F.hash("tok"), F.lit(n_buckets)).alias("tok_bucket")
    tf.select("doc_id", "tok", "tf", "dl", bucket).write.mode("overwrite").partitionBy(
        "tok_bucket"
    ).parquet(f"{path}/postings")
    dfreq.select("tok", "df", bucket).write.mode("overwrite").partitionBy(
        "tok_bucket"
    ).parquet(f"{path}/dfreq")
    # the bucket modulus rides the 1-row stats file so probes recover it
    # without relying on which partition dirs happened to materialize
    stats.withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
        f"{path}/stats"
    )


def update_text_index(new_documents: DataFrame, path: str) -> None:
    """Incremental index maintenance for a corpus APPEND: tokenize ONLY
    the new documents, append their postings to the bucket-partitioned
    layout, and fold their term/document counts into dfreq and stats.

    Cost: O(new docs) tokenize + O(vocab) dfreq merge — never a re-scan
    of the indexed corpus. The merged dfreq/stats are staged to temp dirs
    and swapped in with os.replace, so a concurrent probe reads either
    the old or the new file set, not a half-written one.

    Precondition (caller's dedup responsibility, same as any inverted
    index): new_documents' doc_ids are not already indexed — the dedup
    family upstream is exactly the tool for that.
    """
    import os
    import shutil

    spark = new_documents.sparkSession
    old_stats = spark.read.parquet(f"{path}/stats").first()
    n_buckets = old_stats["n_buckets"]
    tf, delta_dfreq, delta_stats = _tf_stats(new_documents)
    bucket = F.pmod(F.hash("tok"), F.lit(n_buckets)).alias("tok_bucket")

    tf.select("doc_id", "tok", "tf", "dl", bucket).write.mode("append").partitionBy(
        "tok_bucket"
    ).parquet(f"{path}/postings")

    # merge document frequencies: vocab-sized pass, staged then swapped
    merged = (
        spark.read.parquet(f"{path}/dfreq")
        .select("tok", "df")
        .unionByName(delta_dfreq)
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
        .select("tok", "df", bucket)
    )
    merged.write.mode("overwrite").partitionBy("tok_bucket").parquet(f"{path}/dfreq_next")

    # fold corpus stats with EXACT integer counts, then re-derive avgdl
    # the same way a fresh build does (total/n double division) — the
    # incremental index is bit-identical to a rebuild
    d = delta_stats.first()
    n_new = old_stats["n_docs"] + d["n_docs"]
    tot_new = old_stats["total_tokens"] + d["total_tokens"]
    spark.createDataFrame(
        [(n_new, tot_new, tot_new / n_new, n_buckets)],
        "n_docs long, total_tokens long, avgdl double, n_buckets int",
    ).write.mode("overwrite").parquet(f"{path}/stats_next")

    for name in ("dfreq", "stats"):
        shutil.rmtree(f"{path}/{name}")
        os.replace(f"{path}/{name}_next", f"{path}/{name}")


def bm25_search_indexed(
    spark,
    index_path: str,
    queries: dict[int, list[str]] | None = None,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 from a PERSISTED index — identical results to
    bm25_search, but the per-query cost is partition-pruned reads of the
    buckets the query terms hash into (plan-asserted in tests), never a
    corpus pass. The term→bucket map is computed with the same F.hash on
    the tiny query-term set (bounded collect, ≤ terms rows)."""
    queries = DEFAULT_QUERIES if queries is None else queries
    qdf = _query_terms_df(spark, queries)
    stats = spark.read.parquet(f"{index_path}/stats")
    n_buckets = stats.select("n_buckets").first()["n_buckets"]
    stats = stats.drop("n_buckets")
    q_buckets = qdf.select(
        "query_id", "tok", F.pmod(F.hash("tok"), F.lit(n_buckets)).alias("tok_bucket")
    )
    wanted = sorted({r["tok_bucket"] for r in q_buckets.select("tok_bucket").distinct().collect()})
    postings = spark.read.parquet(f"{index_path}/postings").filter(
        F.col("tok_bucket").isin(wanted)
    )
    dfreq = spark.read.parquet(f"{index_path}/dfreq").filter(F.col("tok_bucket").isin(wanted))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        postings.join(F.broadcast(q_buckets.select("query_id", "tok")), "tok")
        .join(dfreq.select("tok", "df"), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_sat), 4).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "rank")
    )


def _candidates_with_cosine(
    documents: DataFrame,
    embeddings: DataFrame,
    queries: dict[int, list[str]],
    n_candidates: int,
) -> DataFrame:
    """Shared stage of the fusion searches: BM25 top-N candidates per
    query, joined to their embedding vectors and cosine-scored against
    the query vector. Touches only candidate rows — the embedding join
    is a semi-join of the candidate set; query vectors broadcast."""
    w_cand = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    cands = (
        bm25_scores(documents, queries)
        .withColumn("rn", F.row_number().over(w_cand))
        .filter(F.col("rn") <= n_candidates)
        .drop("rn")
    )
    qvecs = embeddings.filter(
        F.col("vec_id").isin(*queries.keys())
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    pairs = cands.join(
        embeddings.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).join(F.broadcast(qvecs), "query_id")

    def _dot(a, bcol):
        return F.aggregate(
            F.zip_with(a, bcol, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _norm(c):
        return F.sqrt(
            F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
        )

    cos = F.round(
        _dot(F.col("embedding"), F.col("q_emb"))
        / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
        6,
    )
    return pairs.select("query_id", "doc_id", "bm25", cos.alias("cos_sim"))


def rrf1_rank_fusion(
    documents: DataFrame,
    embeddings: DataFrame,
    queries: dict[int, list[str]] | None = None,
    k: int = 5,
    n_candidates: int = 20,
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (the other standard hybrid-retrieval
    combiner, and the more robust one): fuse the BM25 ranking and the
    cosine ranking of the SAME candidate set by

        rrf = 1/(k_rrf + rank_bm25) + 1/(k_rrf + rank_cos)

    RRF is rank-based, so unlike the min-max blend it is immune to score
    scale and outliers — and INTEGER-exact up to the final two divisions
    of small integers (identical IEEE in any engine): no rounding knife
    edges at all. Same candidate-only cost shape as hybrid_search."""
    queries = DEFAULT_QUERIES if queries is None else queries
    scored = _candidates_with_cosine(documents, embeddings, queries, n_candidates)
    w_bm = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
    w_cos = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("doc_id"))
    fused = scored.select(
        "query_id",
        "doc_id",
        F.row_number().over(w_bm).cast("int").alias("rank_bm25"),
        F.row_number().over(w_cos).cast("int").alias("rank_cos"),
    ).withColumn(
        "rrf",
        F.round(
            F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_bm25"))
            + F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_cos")),
            6,
        ),
    )
    w_final = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_final).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank_bm25", "rank_cos", "rrf", "rank")
    )


def hybrid_search(
    documents: DataFrame,
    embeddings: DataFrame,
    queries: dict[int, list[str]] | None = None,
    k: int = 5,
    n_candidates: int = 20,
    alpha: float = 0.5,
) -> DataFrame:
    """Two-stage hybrid retrieval: BM25 candidate generation, embedding
    cosine re-rank, min-max-normalized blend — the standard hybrid
    (lexical ∪ semantic) retrieval pattern.

      blend = α · norm(bm25) + (1-α) · norm(cos_sim)

    per query, where norm is min-max over that query's candidate set
    (scale-free: BM25 magnitudes and cosine live on different scales).
    Query vectors are the embeddings rows whose vec_id equals the
    query_id; candidate vectors join on doc_id = vec_id (the synthetic
    tables are key-aligned).

    Scale: the cosine re-rank touches only `n_candidates` rows per query
    — the embedding join is a semi-join of the candidate set, never a
    scan of the vector table; query vectors broadcast."""
    queries = DEFAULT_QUERIES if queries is None else queries
    scored = _candidates_with_cosine(documents, embeddings, queries, n_candidates)
    wq = Window.partitionBy("query_id")
    eps = F.lit(1e-12)
    norm_bm25 = (F.col("bm25") - F.min("bm25").over(wq)) / F.greatest(
        F.max("bm25").over(wq) - F.min("bm25").over(wq), eps
    )
    norm_cos = (F.col("cos_sim") - F.min("cos_sim").over(wq)) / F.greatest(
        F.max("cos_sim").over(wq) - F.min("cos_sim").over(wq), eps
    )
    blended = scored.withColumn(
        "blend", F.round(F.lit(alpha) * norm_bm25 + F.lit(1.0 - alpha) * norm_cos, 4)
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("blend").desc(), F.col("doc_id"))
    return (
        blended.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25", "cos_sim", "blend", "rank")
    )
