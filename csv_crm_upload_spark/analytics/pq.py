"""Product quantization (PQ) ANN — the m-subspace learned vector codec
(Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011), the compression behind production IVF-PQ
indexes, next to the repo's IVF coarse quantizer (ivf.py) and SQ8
scalar quantizer (similarity.vq_codes).

The embedding space splits into m contiguous subspaces; each subspace
learns its own k-entry codebook (k ≤ 256 → one byte per subspace). A
vector encodes to m small codes — at m=8 a 64-dim float32 vector
(256 B) becomes 8 B, the 32× compression that turns an exhaustive
candidate scan of a 100 TB embedding corpus into a RAM-tier operation
(SQ8's 4× keeps full dimensionality; PQ trades more precision for far
smaller codes — the two ends of the production quantization spectrum).

Search uses ASYMMETRIC distance computation (ADC): the query stays
full-precision; per (query, subspace) a k-entry table of partial dot
products is computed once DRIVER-side (m·k doubles per query — tiny,
from the ≤10 collected query vectors, same bounded-collect sanction as
ivf.knn_ivf) and ships as a broadcast literal; scoring a corpus vector
is m table lookups + a sum — map-only over the code scan, no shuffle
until the final per-query top-k.

No DuckDB oracle: codebooks are learned (data-dependent) like IVF's
centroids, so the op is pinned by pytest instead —
  * ADC identity: with codebooks that contain every distinct subvector,
    encoding is lossless and ADC equals the exact dot product;
  * recall floor vs knn_bruteforce on the synthetic corpus;
  * code-shape invariants (m codes, each in [0, k)).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_cap: int = 4096,
    n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace Lloyd's k-means on a deterministic bounded sample
    (first `sample_cap` rows by vec_id — driver memory is bounded
    regardless of corpus size, mirroring ivf.fit_centroids). Returns an
    (m, k, dim/m) codebook tensor. The sample routes through
    uniform_vector_sample — a NULL/empty/wrong-width embedding in the
    first rows would land a ragged driver matrix and abort the fit;
    clean corpora fit the identical sample."""
    from csv_crm_upload_spark.analytics.similarity import uniform_vector_sample

    sample = uniform_vector_sample(embeddings, sample_cap)
    x = np.array([r["embedding"] for r in sample], dtype=np.float64)
    return fit_books_from_matrix(x, m, k, n_iter=n_iter, seed=seed)


def fit_books_from_matrix(
    x: np.ndarray, m: int, k: int, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Per-subspace Lloyd's over an in-memory sample matrix — the codec
    fit shared by raw-vector PQ (fit_pq_codebooks) and residual IVF-PQ
    (ivfpq fits it on x − centroid[cell] of the same bounded sample)."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(x) < k:
        raise ValueError(f"sample of {len(x)} rows cannot seed k={k} codes")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, k, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def codes_expr(codebooks: np.ndarray, col=None):
    """Column expression for the m nearest-codebook-entry codes of
    `col` (default the `embedding` column — pass any array<double>
    expression, e.g. a residual, for IVF-PQ). The codebook tensor rides
    into the plan as array literals (m·k·sub doubles — tiny). Nearest
    entry minimizes ||x_j − c||² = ||c||² − 2·x_j·c + const, computed as
    argmax of (2·dot − ||c||²) so each candidate costs one fused
    zip_with/aggregate pass. Usable in any map stage, e.g. fused with
    the coarse cell assignment in ivfpq._assign_and_encode."""
    m, k, sub = codebooks.shape
    emb = F.col("embedding") if col is None else col
    code_cols = []
    for j in range(m):
        xs = F.slice(emb, j * sub + 1, sub)
        # the codebook rides in as ONE nested k×sub literal and the
        # scores come from ONE transform — not k separate aggregate
        # lambdas whose tree the argmax then duplicates (the old shape
        # planned 2·m·k aggregates; Catalyst ANALYSIS of that tree, not
        # the data, dominated pq1's per-call cost and drifted with JVM
        # state). Arithmetic per element is unchanged (same
        # zip_with/aggregate dot, same 2·dot − ||c||² score, same IEEE
        # order), so codes are bit-identical.
        book = F.array(
            *[
                F.array(*[F.lit(float(v)) for v in codebooks[j, c]])
                for c in range(k)
            ]
        )
        norms = F.array(
            *[
                F.lit(float(codebooks[j, c] @ codebooks[j, c]))
                for c in range(k)
            ]
        )
        scores = F.transform(
            book,
            lambda e, i: 2.0
            * F.aggregate(
                F.zip_with(xs, e, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            - F.element_at(norms, i + 1),
        )
        # first-max argmax in ONE pass over the scores array (the
        # array_position(scores, array_max(scores)) form evaluates the
        # scores expression twice); strictly-greater keeps the FIRST
        # max — array_position's tiebreak — and Spark's NaN-is-greatest
        # ordering matches too (first NaN wins in both forms)
        zipped = F.zip_with(
            scores,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda s, i: F.struct(s.alias("s"), i.alias("i")),
        )
        best = F.aggregate(
            zipped,
            F.struct(
                F.lit(float("-inf")).alias("s"), F.lit(-1).alias("i")
            ),
            lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
        )
        # a corrupt row (empty/short vector → NULL dot → NULL scores)
        # leaves the -1 init in place; surface it as a NULL code exactly
        # like the old array_position-of-NULL form did — element_at(lut,
        # 0) would otherwise ABORT the whole job under ANSI (the
        # one-corrupt-row-kills-the-fleet class the degenerate smoke
        # sweep exists to catch)
        code_cols.append(
            F.when(best["i"] >= 0, best["i"]).cast("int")
        )
    return F.array(*code_cols)


def pq_encode(embeddings: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """vec_id → m codes: ONE map stage over the scan, no shuffle."""
    return embeddings.select("vec_id", codes_expr(codebooks).alias("codes"))


def query_luts(spark, query_vectors, codebooks: np.ndarray) -> DataFrame:
    """One (query_id, lut) row per query: lut[j*k + c] = dot(q's j-th
    subvector, codebook[j][c]) — the m·k-entry ADC table, computed
    driver-side from the bounded query set and shipped as a broadcast."""
    m, k, sub = codebooks.shape
    rows = []
    for qid, qvec in query_vectors:
        q = np.asarray(qvec, dtype=np.float64)
        lut = [
            float(q[j * sub : (j + 1) * sub] @ codebooks[j, c])
            for j in range(m)
            for c in range(k)
        ]
        rows.append((int(qid), lut))
    return spark.createDataFrame(rows, "query_id long, lut array<double>")


def adc_expr(m: int, k: int):
    """ADC dot-product column over (codes, lut): m table lookups + a sum
    per row — map-only, no shuffle."""
    subspace_term = F.zip_with(
        F.col("codes"),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.element_at(F.col("lut"), (j * k + c + 1).cast("int")),
    )
    return F.aggregate(subspace_term, F.lit(0.0), lambda acc, v: acc + v)


def adc_scores(
    codes: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    codebooks: np.ndarray,
) -> DataFrame:
    """(query_id, vec_id, adc_dot): asymmetric dot product of each
    full-precision query against every encoded corpus vector — m lookups
    into the query's broadcast (m·k)-entry table per row, map-only."""
    m, k, _sub = codebooks.shape
    ludf = query_luts(codes.sparkSession, query_vectors, codebooks)
    return (
        codes.crossJoin(F.broadcast(ludf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(adc_expr(m, k), 6).alias("adc_dot"))
    )


def pq1_quantized_knn(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    n_candidates: int = 50,
) -> DataFrame:
    """Top-k neighbors per query via the production PQ two-stage shape:
    the 8-byte codes SELECT candidates, full precision DECIDES.

      1. fit codebooks (bounded driver sample) and encode the corpus —
         map-only over the scan;
      2. ADC-score every code against broadcast per-query lookup tables
         and keep the top `n_candidates` per query (the one wide pass,
         over m-byte codes instead of full vectors);
      3. exact-cosine rerank of the CANDIDATE SET only (a semi-join of
         ~n_candidates·queries rows against the full-precision vectors —
         never a second corpus scan at full width).

    This candidate-then-refine split is why PQ codes can be lossy: ADC
    only has to land true neighbors inside the candidate set, and the
    rerank restores exact ordering. Ties break on vec_id (total order).

    The fit+encode here runs per call (self-contained, oracle-free
    queries() entry); the build-once/query-many split of the same
    search lives in save_pq_index / pq_search_indexed.
    """
    if query_ids is None:
        query_ids = list(range(10))  # same default query set as knn_bruteforce
    books = fit_pq_codebooks(embeddings, m=m, k=n_codes)
    codes = pq_encode(embeddings, books)
    return _pq_search(codes, books, embeddings, query_ids, k, n_candidates)


def _pq_search(
    codes: DataFrame,
    books: np.ndarray,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    n_candidates: int,
) -> DataFrame:
    """Shared ADC-candidates → exact-cosine-rerank stage used by both the
    self-contained pq1_quantized_knn and the persisted-index probe
    (pq_search_indexed), so the two paths are identical by construction."""
    qrows = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )  # bounded: ≤ len(query_ids) rows, the ivf.knn_ivf sanction
    qvecs = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    scored = adc_scores(codes, qvecs, books)
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("vec_id")
    )
    cands = (
        scored.withColumn("adc_rank", F.row_number().over(w_adc))
        .filter(F.col("adc_rank") <= n_candidates)
        .select("query_id", "vec_id")
    )
    return exact_rerank(cands, embeddings, qvecs, k)


def exact_rerank(
    cands: DataFrame,
    embeddings: DataFrame,
    qvecs: list[tuple[int, list[float]]],
    k: int,
) -> DataFrame:
    """Full-precision cosine top-k over a (query_id, vec_id) CANDIDATE
    set — a semi-join of ~n_candidates·queries rows against the vector
    table, never a second corpus scan at full width. Ties break on
    vec_id (total order). Shared by the PQ and IVF-PQ search paths."""
    from csv_crm_upload_spark.analytics.similarity import cosine

    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(qvecs, "query_id long, q_emb array<double>")
    reranked = (
        cands.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def save_pq_index(
    embeddings: DataFrame,
    path: str,
    m: int = 8,
    n_codes: int = 16,
    **fit_kwargs,
) -> np.ndarray:
    """Persist a PQ index: the learned codebooks (one parquet of
    (subspace, code, entry array)) plus the encoded corpus. This is the
    build-once/query-many split of production PQ — fit + the wide
    encode scan (whose giant codegen expression dominates pq1's cold
    cost) run once per corpus snapshot; every probe afterwards reads
    only m-byte codes.

    Code files AND codebooks are EPOCH-VERSIONED (codes/epoch=K,
    codebooks/epoch=K) with the shared manifest commit protocol
    (operators/manifest.py), so update_pq_index can append a corpus
    shard atomically — and a REBUILD over a live index is atomic too:
    the new codebooks+codes land under the next epoch and the manifest's
    `base_epoch`/`codebook_epoch` advance together in one commit, so a
    racing reader pairs old codebooks with old codes or new with new,
    never a mix (stale pre-rebuild epoch dirs stay on disk for readers
    still holding the old manifest; they are garbage, not a hazard, and
    the next rebuild's commit supersedes them the same way).

    Portability note (same caveat as ivf.save_index): the layout is
    self-describing — codebooks ride the index and probes rebuild their
    ADC tables from them — but code assignment is float argmax,
    consistent for any reader repeating the same arithmetic, unlike the
    md5 integer conventions of the oracle-visible queries."""
    from csv_crm_upload_spark.operators.manifest import commit_manifest, rebuild_epoch

    spark = embeddings.sparkSession
    new_epoch, prior = rebuild_epoch(path)  # atomic rebuild over a live index
    books = fit_pq_codebooks(embeddings, m=m, k=n_codes, **fit_kwargs)
    mm, kk, _sub = books.shape
    book_rows = [
        (int(j), int(c), [float(v) for v in books[j, c]])
        for j in range(mm)
        for c in range(kk)
    ]
    spark.createDataFrame(
        book_rows, "subspace int, code int, entry array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks/epoch={new_epoch}")
    pq_encode(embeddings, books).write.mode("overwrite").parquet(
        f"{path}/codes/epoch={new_epoch}"
    )
    commit_manifest(
        path,
        {
            **prior,  # preserves last_txn across the rebuild
            "epoch": new_epoch,
            "base_epoch": new_epoch,
            "codebook_epoch": new_epoch,
            "m": int(mm),
            "k": int(kk),
        },
    )
    return books


def update_pq_index(
    new_embeddings: DataFrame, path: str, txn: tuple[str, int] | None = None
) -> None:
    """Incremental PQ maintenance for a corpus APPEND: encode ONLY the
    new vectors with the STORED codebooks (the codec stays fixed on
    append — retraining it is a rebuild, exactly like IVF's coarse
    quantizer) and commit their codes as a new epoch. O(new vectors),
    map-only, atomic via the shared manifest protocol."""
    from csv_crm_upload_spark.operators.manifest import (
        commit_manifest,
        read_manifest,
        remove_orphan_epochs,
        txn_already_applied,
        with_txn,
    )

    spark = new_embeddings.sparkSession
    man = read_manifest(path)
    if txn_already_applied(man, txn):
        return  # replayed streaming batch: already folded
    epoch = man["epoch"]
    remove_orphan_epochs(path, ["codes"], epoch)
    if not new_embeddings.limit(1).count():
        return  # empty append is a clean no-op before any write
    books = _load_codebooks(spark, path, man.get("codebook_epoch"))
    dim = books.shape[0] * books.shape[2]
    # pq_encode's zip_with would silently null-pad a mismatched array, so
    # a wrong-width shard must fail loudly, mirroring fit's dim % m check
    # — via a fail-fast probe (limit 1), not a full shard count
    if new_embeddings.filter(F.size("embedding") != dim).limit(1).count():
        raise ValueError(
            f"appended vectors have dim != the stored codec's "
            f"{dim} (m={books.shape[0]} × sub={books.shape[2]})"
        )
    pq_encode(new_embeddings, books).write.mode("overwrite").parquet(
        f"{path}/codes/epoch={epoch + 1}"
    )
    commit_manifest(path, with_txn({**man, "epoch": epoch + 1}, txn))


def _load_codebooks(spark, path: str, codebook_epoch: int | None = None) -> np.ndarray:
    sub_path = (
        f"{path}/codebooks"
        if codebook_epoch is None  # pre-versioning layout (flat dir)
        else f"{path}/codebooks/epoch={codebook_epoch}"
    )
    rows = spark.read.parquet(sub_path).collect()  # bounded: m·k rows
    mm = 1 + max(r["subspace"] for r in rows)
    kk = 1 + max(r["code"] for r in rows)
    sub = len(rows[0]["entry"])
    books = np.zeros((mm, kk, sub))
    for r in rows:
        books[r["subspace"], r["code"]] = r["entry"]
    return books


def compact_pq_index(spark, path: str) -> bool:
    """OPTIMIZE for the PQ index: fold the live code epochs into one new
    epoch and advance base_epoch in one manifest commit — atomic, the
    codec untouched. Returns False when already compact."""
    from csv_crm_upload_spark.operators.manifest import compact_epochs

    return compact_epochs(spark, path, union_dirs={"codes": []})


def load_pq_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    """(codebook tensor, codes DataFrame) from a saved index — the union
    of the committed epochs in [base_epoch, epoch], manifest-resolved so
    a racing update OR rebuild is seen entirely or not at all."""
    from csv_crm_upload_spark.operators.manifest import read_manifest

    man = read_manifest(path)
    epoch, base = man["epoch"], man.get("base_epoch", 0)
    books = _load_codebooks(spark, path, man.get("codebook_epoch"))
    codes = (
        spark.read.option("basePath", f"{path}/codes")
        .parquet(f"{path}/codes")
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .select("vec_id", "codes")
    )
    return books, codes


def pq_search_indexed(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_candidates: int = 50,
) -> DataFrame:
    """Probe a persisted PQ index: identical semantics to
    pq1_quantized_knn (same _pq_search stage) minus the per-call fit +
    corpus encode. `embeddings` supplies the full-precision vectors for
    the query rows and the candidate rerank only — the wide ADC pass
    runs over the stored m-byte codes."""
    if query_ids is None:
        query_ids = list(range(10))
    books, codes = load_pq_index(spark, path)
    return _pq_search(codes, books, embeddings, query_ids, k, n_candidates)
