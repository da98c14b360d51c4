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

from csv_crm_upload_spark.analytics.fanout import fan_out


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Total cosine: NULL (never an ANSI DIVIDE_BY_ZERO abort) when
    either side has zero norm. Oracle-paired callers exclude zero-norm
    rows up front (valid_vectors / _VALID_EMB), so the guard only fires
    on the rows-only index paths where a corrupt row must degrade to a
    skipped candidate — one zero vector previously killed every
    IVF/PQ/LSH rerank job (round-8 property fuzzer)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom)


def knn_bruteforce(
    embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is tiny → broadcast cross join; the corpus side never
    shuffles until the final small top-k aggregation.
    """
    if query_ids is None:
        query_ids = list(range(10))
    # Norms are per-ROW quantities: compute each side's norm ONCE in a
    # projection below the join (corpus: one extra column on the scan;
    # queries: on the tiny broadcast side), so the per-PAIR expression
    # is a single dot product instead of dot + two norms — 3× less
    # arithmetic and a much smaller codegen unit on the n·q hot path.
    # The arithmetic is the same expression tree cosine() builds
    # (dot / (q_norm * c_norm), q side first), so results are
    # bit-identical to the oracle's — projections don't collapse across
    # the join, which keeps the norms per-row, not per-pair.
    queries = valid_vectors(
        embeddings.filter(F.col("vec_id").isin(query_ids))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = fan_out(valid_vectors(embeddings)).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("c_norm")
    )
    # width-mismatched pairs are EXCLUDED, not NULL-scored: Spark's
    # zip_with NULL-pads the short side (dot -> NULL) while DuckDB's
    # list_sum SKIPS the out-of-range NULLs (partial dot) — the only
    # cross-engine-stable semantics for a ragged corpus is absence
    # (round-8 property fuzzer)
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.size("embedding") == F.size("q_emb"))
        )
        .select(
            "query_id",
            "vec_id",
            (
                F.round(
                    _dot(F.col("q_emb"), F.col("embedding"))
                    / (F.col("q_norm") * F.col("c_norm")),
                    6,
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (engine-dependent sign)
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def hn1_hard_negatives(
    embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5
) -> DataFrame:
    """Hard-negative mining — the contrastive-training data op: for each
    query vector, the top-k most cosine-similar vectors with a
    DIFFERENT label (the near-misses a contrastive loss learns most
    from; random negatives are too easy, same-label neighbors are
    positives).

    Same scale shape as knn_bruteforce: the query set is tiny →
    broadcast cross join with hoisted per-row norms; the corpus streams
    map-only until the per-query top-k window. The label-mismatch
    predicate rides the join filter, so same-label pairs never reach
    the scoring expression. At 100 TB the IVF/LSH bucketed variants
    substitute for the cross join exactly as in the kNN family."""
    if query_ids is None:
        query_ids = list(range(10))
    queries = valid_vectors(
        embeddings.filter(F.col("vec_id").isin(query_ids))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = fan_out(valid_vectors(embeddings)).select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("c_norm")
    )
    # width-mismatched pairs excluded (see knn_bruteforce)
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("label") != F.col("q_label"))
            & (F.size("embedding") == F.size("q_emb"))
        )
        .select(
            "query_id",
            "vec_id",
            F.col("label").alias("neg_label"),
            (
                F.round(
                    _dot(F.col("q_emb"), F.col("embedding"))
                    / (F.col("q_norm") * F.col("c_norm")),
                    6,
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (engine-dependent sign)
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "neg_label", "cos_sim", "rank")
    )


def _hp_sign(table: int, plane: int, dim_col) -> F.Column:
    """Deterministic ±1 hyperplane component from md5(table:plane:dim)
    parity — oracle-reproducible, unique per (table, plane)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(table), F.lit(plane), dim_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _plane_term(table: int, plane: int):
    # factory, NOT a defaulted lambda: F.transform dispatches on lambda
    # arity, so extra default params would bind the element index
    emb = F.col("embedding")
    return lambda d: F.element_at(emb, d + 1).cast("double") * _hp_sign(table, plane, d)


def _bucket_expr(table: int, n_planes: int) -> F.Column:
    emb = F.col("embedding")
    bits = []
    for p in range(n_planes):
        # v · h_p with ±1 components: sequential fold (engine-stable)
        idx = F.sequence(F.lit(0), F.size(emb) - 1)
        dot = F.aggregate(
            F.transform(idx, _plane_term(table, p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("int")


def valid_vectors(embeddings: DataFrame) -> DataFrame:
    """Drop NULL/zero-length/ALL-ZERO vectors before any vector op —
    sequence(0, size−1) on an EMPTY array steps backwards ([0, −1]) and
    element_at(emb, 0) then aborts the job; an all-zero vector has norm
    0, so every cosine against it divides by zero — an ANSI-mode job
    abort (found by the round-8 property fuzzer: ONE zero embedding
    killed every kNN job). A zero vector is unnormalizable — corrupt by
    definition — so it degrades to a skipped row exactly like NULL. The
    oracles carry the same WHERE (_VALID_EMB) so both engines define
    every vector op over the same row set."""
    return embeddings.filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") > 0)
        & F.exists("embedding", lambda x: x != 0)
        # a vector CONTAINING NULL components is corrupt too: Spark's
        # zip_with/aggregate dots go NULL while DuckDB's list_sum skips
        # the NULL term (partial dot) — same divergence class as the
        # ragged width, same remedy (round-8 review)
        & ~F.exists("embedding", lambda x: x.isNull())
    )


def lsh_bucket_signature(embeddings: DataFrame, n_planes: int = 8, table: int = 0) -> DataFrame:
    """Random-hyperplane LSH (one table): bit p = sign(v · h_p). Returns
    vec_id + integer bucket. Same-bucket vectors are cosine-similar w.h.p."""
    return fan_out(valid_vectors(embeddings)).select(
        "vec_id", _bucket_expr(table, n_planes).alias("bucket")
    )


def multi_table_buckets(embeddings: DataFrame, n_tables: int = 8, n_planes: int = 4) -> DataFrame:
    """L independent LSH tables (OR-amplification): (vec_id, table,
    bucket) in long form. Each table's planes are salted independently;
    candidate recall is 1-(1-p^planes)^tables — tune tables up for
    recall, planes up for precision/cost."""
    return fan_out(valid_vectors(embeddings)).select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("table"), _bucket_expr(t, n_planes).alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.table", "tb.bucket")


def knn_lsh(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = union of same-bucket vectors across L hash
    tables (one shuffle on (table, bucket)), then exact cosine rerank of
    the candidate set. The standard sublinear path: corpus is hashed once;
    each query probes L buckets instead of scanning everything."""
    if query_ids is None:
        query_ids = list(range(10))
    buckets = multi_table_buckets(embeddings, n_tables, n_planes)
    q_buckets = buckets.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(q_buckets), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    queries = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = embeddings.select("vec_id", F.col("embedding").alias("c_emb"))
    scored = (
        cand.join(F.broadcast(queries), "query_id")
        .join(corpus, "vec_id")
        # ragged pairs excluded, not NULL-scored (knn_bruteforce)
        .filter(F.size("c_emb") == F.size("q_emb"))
        .select(
            "query_id",
            "vec_id",
            (F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6) + F.lit(0.0)).alias("cos_sim"),
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


def arr1_embedding_stats(embeddings: DataFrame) -> DataFrame:
    """Array-function surface over vectors: size, extremes, L2 norm —
    all higher-order built-ins, no UDFs."""
    emb = F.col("embedding")
    return embeddings.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.array_min(F.transform(emb, lambda x: x.cast("double"))), 6).alias("min_val"),
        F.round(F.array_max(F.transform(emb, lambda x: x.cast("double"))), 6).alias("max_val"),
        # empty vector → NULL like min/max (the fold alone would say
        # 0.0 where the oracle's list_sum says NULL); a NULL COMPONENT
        # also reports NULL — Spark's fold NULL-poisons while DuckDB's
        # list_sum skips the term, so the diagnostic value for a
        # corrupt vector is NULL in both engines, not an engine-
        # dependent partial norm (round-8 fuzzer)
        F.when(
            (F.size(emb) > 0) & ~F.exists(emb, lambda x: x.isNull()),
            F.round(_norm(emb), 6),
        ).alias("l2_norm"),
    )


def vq_codes(embeddings: DataFrame) -> DataFrame:
    """Int8 scalar quantization (the FAISS SQ8 shape): per-dimension
    min/max learned from the corpus, each float mapped to a 0..255 code.
    64 floats/vec (256 B) become 64 bytes — the 4× compression that lets
    a 100 TB embedding corpus fit hot storage tiers for ANN.

    Plan: per-dim stats are one explode + groupBy(pos) with map-side
    combining (the shuffle carries 64 rows per partition, not the vector
    stream), folded into ONE 1-row broadcast of (mins[], maxs[]); code
    assignment is a map-only transform over the scan. Constant dimensions
    (max == min) code to 0 rather than dividing by zero.

    Determinism: codes are round((v−mn)/(mx−mn)·255) in IEEE double —
    identical arithmetic in the DuckDB oracle — and all downstream
    scoring is INTEGER, so results hash-compare exactly.
    """
    embeddings = fan_out(valid_vectors(embeddings))  # corrupt rows code to absence
    dims = (
        embeddings.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.min(F.col("val").cast("double")).alias("mn"),
            F.max(F.col("val").cast("double")).alias("mx"),
        )
    )
    stats = F.broadcast(
        dims.agg(
            F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("smm")
        ).select(
            F.transform("smm", lambda s: s.mn).alias("mins"),
            F.transform("smm", lambda s: s.mx).alias("maxs"),
        )
    )

    def code(v, i):
        mn = F.element_at(F.col("mins"), i + 1)
        mx = F.element_at(F.col("maxs"), i + 1)
        return (
            F.when(mx > mn, F.round((v.cast("double") - mn) / (mx - mn) * 255, 0))
            .otherwise(F.lit(0.0))
            .cast("int")
        )

    return embeddings.crossJoin(F.broadcast(stats)).select(
        "vec_id", F.transform("embedding", code).alias("codes")
    )


def vq1_quantized_knn(
    embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5
) -> DataFrame:
    """Top-k neighbors by CENTERED INTEGER dot product over SQ8 codes —
    the asymmetric-distance ANN rerank, kept in exact int64 so ranking is
    engine-independent (float dot products tie-break differently per
    summation order; integer sums cannot).

    Same sanctioned broadcast shape as knn_bruteforce: the tiny query
    side broadcasts, the corpus streams map-only into a per-query top-k.
    score = Σ (code_d−128)(code_q−128) ∈ [−64·128², 64·128²] ≪ 2⁶³.
    """
    if query_ids is None:
        query_ids = list(range(10))
    codes = vq_codes(embeddings)
    queries = codes.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("q_codes")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("q_codes"),
            lambda d, q: (d - F.lit(128)).cast("long") * (q - F.lit(128)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            # ragged code rows excluded, not NULL-scored (knn_bruteforce)
            & (F.size("codes") == F.size("q_codes"))
        )
        .select("query_id", "vec_id", dot.alias("dot_q"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot_q", "rank")
    )


def mmr1_diversified_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    pool: int = 20,
    k: int = 5,
    lam: float = 0.7,
    mu: float = 0.3,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified top-k: greedily pick the candidate maximizing
    λ·rel(q, d) − μ·max_{s∈S} sim(d, s) — the retrieval/sampling
    operator that stops a near-duplicate cluster from monopolizing a
    result list (RAG contexts, eval-set sampling, dedup-aware
    shortlists). λ and μ are INDEPENDENT literals (default 0.7/0.3),
    not λ/1−λ: 1−0.7 is 0.30000000000000004 in IEEE — the oracle's 0.3
    literal would diverge.

    Deterministic greedy unroll (the kmeans1 discipline): the selection
    loop is data-independent in LENGTH (k fixed), so it unrolls into k
    declarative steps the oracle mirrors as CTEs; every score is
    round(·, 6/9) with vec_id tie-breaks, so both engines pick the same
    chain. Step 1 is argmax rel (max_div ≡ 0.0 under the same formula).

    Scale shape: ONE corpus pass scores relevance against the broadcast
    query set (hoisted norms, the knn_bruteforce hot path) and keeps a
    top-`pool` shortlist per query — the standard MMR-over-shortlist
    split; the shortlist (queries·pool rows) is pinned with an eager
    localCheckpoint and the k unrolled steps run joins/windows over it
    alone, so the corpus is never rescanned."""
    from pyspark.sql import Window

    if query_ids is None:
        query_ids = list(range(5))
    queries = valid_vectors(
        embeddings.filter(F.col("vec_id").isin(query_ids))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = fan_out(valid_vectors(embeddings)).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("c_norm")
    )
    rel = (
        F.round(
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("c_norm")),
            6,
        )
        + F.lit(0.0)
    )
    w_rel = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "vec_id")
    pool_df = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            # ragged pairs excluded, not NULL-scored (knn_bruteforce)
            & (F.size("embedding") == F.size("q_emb"))
        )
        .select("query_id", "vec_id", "embedding", "c_norm", rel.alias("rel"))
        .withColumn("_rn", F.row_number().over(w_rel))
        .filter(F.col("_rn") <= pool)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    lam_c, mu_c = F.lit(float(lam)), F.lit(float(mu))
    mmr1 = F.round(lam_c * F.col("rel") - mu_c * F.lit(0.0), 9)
    w_pick = Window.partitionBy("query_id").orderBy(
        F.col("_mmr").desc(), "vec_id"
    )
    # each step's selection set is pinned (tiny: queries·step rows) —
    # step s+1 references `sel` three times (anti-join, broadcast side,
    # union), so an unpinned greedy unroll would TRIPLE the plan per
    # step (3^k subtrees, 200+ exchange nodes at k=5); checkpointed,
    # every step plans against flat scans and the returned plan stays
    # linear in k
    sel = (
        pool_df.withColumn("_mmr", mmr1)
        .withColumn("_rk", F.row_number().over(w_pick))
        .filter(F.col("_rk") == 1)
        .select(
            "query_id", "vec_id", "embedding", "c_norm",
            F.col("_mmr").alias("mmr"), F.lit(1).alias("pick"),
        )
        .localCheckpoint(eager=True)
    )
    for step in range(2, k + 1):
        sel_side = sel.select(
            "query_id",
            F.col("vec_id").alias("_sv"),
            F.col("embedding").alias("_s_emb"),
            F.col("c_norm").alias("_s_norm"),
        )
        div = (
            F.round(
                _dot(F.col("embedding"), F.col("_s_emb"))
                / (F.col("c_norm") * F.col("_s_norm")),
                6,
            )
            + F.lit(0.0)
        )
        maxdiv = (
            pool_df.join(
                sel.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti"
            )
            .join(F.broadcast(sel_side), "query_id")
            .select("query_id", "vec_id", "rel", "embedding", "c_norm", div.alias("_div"))
            .groupBy("query_id", "vec_id")
            .agg(
                F.first("rel").alias("rel"),
                F.first("embedding").alias("embedding"),
                F.first("c_norm").alias("c_norm"),
                F.max("_div").alias("_maxdiv"),
            )
        )
        pick = (
            maxdiv.withColumn(
                "_mmr", F.round(lam_c * F.col("rel") - mu_c * F.col("_maxdiv"), 9)
            )
            .withColumn("_rk", F.row_number().over(w_pick))
            .filter(F.col("_rk") == 1)
            .select(
                "query_id", "vec_id", "embedding", "c_norm",
                F.col("_mmr").alias("mmr"), F.lit(step).alias("pick"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select(
        "query_id", "vec_id", (F.col("mmr") + F.lit(0.0)).alias("mmr"), "pick"
    ).orderBy("query_id", "pick")


def recall_rollup(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """The shared recall@k readout every ANN audit uses (lshrec1 /
    bqrec1 / ivfrec1 / pqrec1 / pcarec1): per query, how many of the
    TRUE top-k (`exact`, the base relation — a query the approximate
    path returned nothing for still reports recall 0, not an absent
    row) the approximate search returned. Both inputs are
    (query_id, vec_id) frames of ≤ |queries|·k rows — driver-scale
    free; hits = the left join on the pair."""
    hits = approx.select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        exact.select("query_id", "vec_id")
        .join(hits, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


def lshrec1_recall_audit(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 4,
) -> DataFrame:
    """Recall@k of the LSH index against exact brute-force — the eval
    every ANN deployment runs before trusting the approximate path: per
    query, how many of the TRUE top-k the bucketed search actually
    returned. A recall cliff is the signal to add tables / reduce
    planes (wider buckets) before the 100 TB corpus quietly loses its
    nearest neighbors; this op turns that tuning loop into a query.

    Composes the two oracle-paired kNN operators verbatim (same
    query_ids/k/tables/planes), so the audit measures EXACTLY the
    production index's behavior. The exact side is the base relation
    (a query with zero LSH candidates still reports recall 0, not an
    absent row); hits = inner join on the (query, neighbor) pair —
    both sides are ≤ |queries|·k rows, driver-scale free."""
    return recall_rollup(
        knn_bruteforce(embeddings, query_ids, k),
        knn_lsh(embeddings, query_ids, k, n_tables, n_planes),
    )


def _sign_words(emb: F.Column) -> F.Column:
    """Sign-bit binary quantization, packed into array<long> of 32-bit
    words: bit i = (emb[i] > 0). Pure per-row Column expression (no UDF,
    no shuffle); 2^k is exact in IEEE for k <= 31 so the pow-based bit
    weight is integer-exact. Width-generic: ceil(d/32) words, so mixed-
    width corpora pack without a schema contract (callers align widths
    at the join)."""
    last_word = F.floor((F.size(emb) - 1) / F.lit(32)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), last_word),
        lambda wi: F.aggregate(
            F.sequence(wi * 32 + 1, F.least(wi * 32 + 32, F.size(emb))),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at(emb, i) > 0,
                F.pow(F.lit(2.0), (i - 1 - wi * 32).cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def bq1_binary_hamming_knn(
    embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5
) -> DataFrame:
    """Binary-quantized top-k nearest neighbors: 1-bit sign quantization
    (bit = component > 0) + Hamming distance — the 32×-compression ANN
    baseline (a 64-dim float vector becomes two 64-bit words) modern
    retrieval stacks run as the coarse first pass before exact
    re-ranking. Ties break on vec_id; self-matches are excluded like
    knn_bruteforce.

    Scale shape: packing is map-side on the scan (per-row expression);
    the tiny query side broadcasts; the per-pair cost is
    bit_count(xor) per word — two instructions per 64 components vs 64
    multiply-adds for cosine, which is the whole point of the binary
    pass at 100 TB. Corpus rows with NULL/empty embeddings are skipped
    (valid_vectors discipline) and width mismatches are excluded at the
    join (both engines carry the same predicates), so one corrupt row
    degrades to absence, not a job abort. The oracle computes the same
    distance directly on the float signs — packing is an
    implementation detail the cross-engine compare never sees."""
    if query_ids is None:
        query_ids = list(range(10))
    valid = valid_vectors(embeddings)
    queries = valid.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.size("embedding").alias("q_dim"),
        _sign_words(F.col("embedding")).alias("q_words"),
    )
    corpus = fan_out(valid).select(
        "vec_id",
        F.size("embedding").alias("c_dim"),
        _sign_words(F.col("embedding")).alias("c_words"),
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("q_words"),
            F.col("c_words"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("c_dim") == F.col("q_dim"))
        )
        .select("query_id", "vec_id", hamming.cast("int").alias("hamming"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "hamming", "rank")
    )


def bqrec1_binary_recall_audit(
    embeddings: DataFrame, query_ids: list[int] | None = None, k: int = 5
) -> DataFrame:
    """Recall@k of the 1-bit Hamming pass (bq1) against exact cosine
    brute-force — lshrec1's twin for the binary-quantization path: the
    eval that decides whether the 32x-compressed coarse pass may feed
    the re-ranker directly or needs a wider candidate pool. Same
    composition discipline: both sides are the oracle-paired operators
    verbatim; the exact side is the base relation so zero-overlap
    queries report recall 0, not an absent row."""
    if query_ids is None:
        query_ids = list(range(10))
    return recall_rollup(
        knn_bruteforce(embeddings, query_ids, k),
        bq1_binary_hamming_knn(embeddings, query_ids, k),
    )


def id1_intrinsic_dimension(
    embeddings: DataFrame, query_ids: list[int] | None = None
) -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco, d'Errico, Rodriguez
    & Laio 2017) over a deterministic query panel: for each panel
    vector, mu = d2/d1 — the ratio of its 2nd- and 1st-nearest cosine
    DISTANCES (1 − cos_sim) — and the MLE of the manifold's intrinsic
    dimension is n / SUM(ln mu). The "how compressed can this embedding
    space get" readout that tells you whether pca2's r or pq1's m/k are
    sized against the data's true dimensionality or against its ambient
    one.

    Estimation note: the canonical estimator averages over ALL points
    (an n² pairing at corpus scale); this panel form is the bounded
    production variant — the same q·n broadcast pass every kNN audit
    here uses, over the shared default panel. Panel queries whose d1 is
    0 (an exact duplicate's cosine rounds to 1.0) are excluded: their
    ratio is undefined; a panel left with SUM(ln mu) = 0 (all ties)
    reports no row rather than an infinite dimension.

    Cross-engine exactness: distances derive from the SAME 6-dp rounded
    cos_sim the kNN oracle computes, so ln() sees identical doubles;
    per-query ln terms round to 9 dp into DECIMAL sums; the estimate is
    one double division rounded to 6 dp.

    Scale shape: knn_bruteforce with k=2 (broadcast panel, one small
    top-k agg) + a |panel|-row pivot and a 1-row readout."""
    if query_ids is None:
        query_ids = list(range(10))
    nn = knn_bruteforce(embeddings, query_ids, k=2)
    per_q = (
        nn.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("rank") == 1, F.col("cos_sim"))).alias("c1"),
            F.max(F.when(F.col("rank") == 2, F.col("cos_sim"))).alias("c2"),
        )
        .filter(F.col("c2").isNotNull())  # a 1-vector corpus has no 2nd NN
        .select(
            "query_id",
            (F.lit(1.0) - F.col("c1")).alias("d1"),
            (F.lit(1.0) - F.col("c2")).alias("d2"),
        )
        .filter(F.col("d1") > 0)
    )
    mom = per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(
            F.round(F.log(F.col("d2") / F.col("d1")), 9).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("slog"),
    )
    return mom.filter((F.col("n_queries") > 0) & (F.col("slog") > 0)).select(
        "n_queries",
        (
            F.round(F.col("n_queries").cast("double") / F.col("slog"), 6)
            + F.lit(0.0)
        ).alias("intrinsic_dim"),
    )
