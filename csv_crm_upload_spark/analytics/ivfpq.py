"""IVF-PQ composed ANN — the production index shape: the IVF coarse
quantizer (ivf.py) SELECTS which cells to read, PQ asymmetric-distance
codes (pq.py) RANK candidates within only those cells, and an exact
cosine rerank DECIDES the final top-k (Jegou/Douze/Schmid, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 §IV —
"IVFADC"; FAISS's IndexIVFPQ is the production analogue).

Why the composition matters at 100 TB: IVF alone still reads the
probed cells' FULL-precision vectors (memory-bound at scale); PQ alone
still scans EVERY vector's codes (corpus-wide pass per query batch).
Composed, a probe touches nprobe/n_cells of the corpus, and what it
touches is m-byte codes instead of full vectors — the two reductions
multiply.

This variant encodes RAW vectors rather than per-cell residuals: the
ADC machinery (dot-product lookup tables) is then byte-identical to
pq.py's and the stored codes are cell-independent, which is what makes
`update_ivfpq_index` a pure O(new vectors) append. Residual encoding
(IVFADC proper) is a precision refinement of the same layout, not a
structural change, and is the natural next step if recall at a given
(m, k) needs tightening.

Index layout (`{path}/`):
  centroids/epoch=K   coarse quantizer (cell_id, centroid)
  codebooks/epoch=K   PQ codec (subspace, code, entry)
  codes/epoch=K/cell_id=C/   (vec_id, codes) — PARTITIONED BY CELL so a
                      probe's scan is partition-pruned to its cells
  MANIFEST            single-file atomic commit (operators/manifest.py)

All three artifact families are epoch-versioned under ONE manifest with
`base_epoch`/`centroid_epoch`/`codebook_epoch`, so appends AND rebuilds
are atomic: a racing reader pairs old quantizers with old codes or new
with new, never a mix (same protocol as ivf.save_index/save_pq_index).

No DuckDB oracle (learned centroids AND codebooks); pinned instead by
  * recall floor vs knn_bruteforce;
  * full-probe + full-candidate search ≡ exact brute force (every cell
    probed and every member reranked → lossiness can only reorder the
    candidate stage, which the exact rerank then undoes);
  * indexed ≡ inline (same fits, same corpus);
  * PartitionFilters-asserted cell pruning on the probe's code scan;
  * incremental append ≡ fixed-codec rebuild.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics import ivf as _ivf
from csv_crm_upload_spark.analytics import pq as _pq


def _assign_and_encode(
    embeddings: DataFrame, centroids: np.ndarray, books: np.ndarray
) -> DataFrame:
    """(vec_id, codes, cell_id) in ONE map pass over the vector scan:
    the cell argmax and the m code argmaxes are all expressions of the
    same `embedding` column, so fusing them avoids the join (and its
    corpus-wide shuffle) that composing assign_cells ∘ pq_encode would
    cost — the whole build is scan → project → write."""
    cell_expr = _ivf.cell_id_expr(centroids)
    code_expr = _pq.codes_expr(books)
    return embeddings.select(
        "vec_id", code_expr.alias("codes"), cell_expr.alias("cell_id")
    )


def _probe_plan(
    embeddings: DataFrame,
    centroids: np.ndarray,
    query_ids: list[int],
    nprobe: int,
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """(bounded query vectors, broadcastable (query_id, cell_id) probe
    table): nearest-nprobe cells per query, computed driver-side from
    the ≤len(query_ids) collected query rows — the ivf.knn_ivf
    bounded-collect sanction."""
    qrows = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    qvecs = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
    qx = np.array([v for _, v in qvecs], dtype=np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    nprobe = min(nprobe, len(centroids))
    probe_cells = (qx @ centroids.T).argsort(axis=1)[:, ::-1][:, :nprobe]
    probes = [(qid, int(c)) for (qid, _), row in zip(qvecs, probe_cells) for c in row]
    spark = embeddings.sparkSession
    return qvecs, spark.createDataFrame(probes, "query_id long, cell_id int")


def _search(
    cell_codes: DataFrame,
    books: np.ndarray,
    embeddings: DataFrame,
    qvecs: list[tuple[int, list[float]]],
    probe_df: DataFrame,
    k: int,
    n_candidates: int,
) -> DataFrame:
    """Shared probe stage: restrict codes to each query's probed cells
    (broadcast join on cell_id — the scan side is already partition-
    pruned in the indexed path), ADC-rank within them, exact-rerank the
    survivors. Used by both ivfpq1_quantized_knn and ivfpq_search so the
    two paths are identical by construction."""
    m, kk, _sub = books.shape
    ludf = _pq.query_luts(cell_codes.sparkSession, qvecs, books)
    scored = (
        cell_codes.join(F.broadcast(probe_df), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(ludf), "query_id")
        .select(
            "query_id", "vec_id", F.round(_pq.adc_expr(m, kk), 6).alias("adc_dot")
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("vec_id")
    )
    cands = (
        scored.withColumn("adc_rank", F.row_number().over(w_adc))
        .filter(F.col("adc_rank") <= n_candidates)
        .select("query_id", "vec_id")
    )
    return _pq.exact_rerank(cands, embeddings, qvecs, k)


def ivfpq1_quantized_knn(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    n_candidates: int = 50,
) -> DataFrame:
    """Self-contained IVF-PQ search (fit + assign + encode inline) —
    the oracle-free queries() entry; the build-once/probe-many split of
    the same search lives in save_ivfpq_index / ivfpq_search."""
    if query_ids is None:
        query_ids = list(range(10))
    centroids = _ivf.fit_centroids(embeddings, n_cells=n_cells)
    books = _pq.fit_pq_codebooks(embeddings, m=m, k=n_codes)
    cell_codes = _assign_and_encode(embeddings, centroids, books)
    qvecs, probe_df = _probe_plan(embeddings, centroids, query_ids, nprobe)
    return _search(cell_codes, books, embeddings, qvecs, probe_df, k, n_candidates)


def save_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 16,
    **fit_kwargs,
) -> None:
    """Build the composed index once per corpus snapshot: coarse
    centroids + PQ codebooks (both from bounded driver samples) and ONE
    corpus map pass producing (vec_id, codes) partitioned BY cell_id.
    Atomic for both fresh builds and rebuilds over a live index (next
    epoch + base/centroid/codebook epoch advance in one commit)."""
    from csv_crm_upload_spark.operators.manifest import commit_manifest, read_manifest

    spark = embeddings.sparkSession
    try:
        new_epoch = read_manifest(path)["epoch"] + 1  # rebuild over a live index
    except FileNotFoundError:
        new_epoch = 0
    centroids = _ivf.fit_centroids(embeddings, n_cells=n_cells, **fit_kwargs)
    books = _pq.fit_pq_codebooks(embeddings, m=m, k=n_codes)
    cent_rows = [
        (int(c), [float(v) for v in centroids[c]]) for c in range(len(centroids))
    ]
    spark.createDataFrame(cent_rows, "cell_id int, centroid array<double>").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids/epoch={new_epoch}")
    mm, kk, _sub = books.shape
    book_rows = [
        (int(j), int(c), [float(v) for v in books[j, c]])
        for j in range(mm)
        for c in range(kk)
    ]
    spark.createDataFrame(
        book_rows, "subspace int, code int, entry array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks/epoch={new_epoch}")
    _assign_and_encode(embeddings, centroids, books).write.mode(
        "overwrite"
    ).partitionBy("cell_id").parquet(f"{path}/codes/epoch={new_epoch}")
    commit_manifest(
        path,
        {
            "epoch": new_epoch,
            "base_epoch": new_epoch,
            "centroid_epoch": new_epoch,
            "codebook_epoch": new_epoch,
            "n_cells": int(len(centroids)),
            "m": int(mm),
            "k": int(kk),
        },
    )


def update_ivfpq_index(new_embeddings: DataFrame, path: str) -> None:
    """O(new vectors) append: assign + encode ONLY the new vectors with
    the STORED quantizers (both stay fixed on append — retraining either
    is a rebuild) and commit as a new epoch. Wrong-width shards fail
    loudly before any write."""
    from csv_crm_upload_spark.operators.manifest import (
        commit_manifest,
        read_manifest,
        remove_orphan_epochs,
    )

    spark = new_embeddings.sparkSession
    man = read_manifest(path)
    epoch = man["epoch"]
    remove_orphan_epochs(path, ["codes"], epoch)
    if not new_embeddings.limit(1).count():
        return  # empty append is a clean no-op before any write
    centroids = _load_centroids(spark, path, man["centroid_epoch"])
    books = _pq._load_codebooks(spark, path, man["codebook_epoch"])
    dim = books.shape[0] * books.shape[2]
    bad = new_embeddings.filter(F.size("embedding") != dim).count()
    if bad:
        raise ValueError(
            f"{bad} appended vectors have dim != the stored codec's {dim}"
        )
    _assign_and_encode(new_embeddings, centroids, books).write.mode(
        "overwrite"
    ).partitionBy("cell_id").parquet(f"{path}/codes/epoch={epoch + 1}")
    commit_manifest(path, {**man, "epoch": epoch + 1})


def _load_centroids(spark, path: str, centroid_epoch: int) -> np.ndarray:
    rows = sorted(
        spark.read.parquet(f"{path}/centroids/epoch={centroid_epoch}").collect(),
        key=lambda r: r["cell_id"],
    )  # bounded: n_cells rows
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def ivfpq_search(
    spark,
    path: str,
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 4,
    n_candidates: int = 50,
) -> DataFrame:
    """Probe a persisted IVF-PQ index. The code scan carries a pushed
    cell_id IN (...) predicate over the Hive layout, so only the probed
    cells' files are read (PartitionFilters-asserted in tests) — at
    scale the probe touches nprobe/n_cells of the corpus, as m-byte
    codes. `embeddings` supplies full precision for the query rows and
    the candidate rerank only."""
    if query_ids is None:
        query_ids = list(range(10))
    from csv_crm_upload_spark.operators.manifest import read_manifest

    man = read_manifest(path)
    epoch, base = man["epoch"], man["base_epoch"]
    centroids = _load_centroids(spark, path, man["centroid_epoch"])
    books = _pq._load_codebooks(spark, path, man["codebook_epoch"])
    qvecs, probe_df = _probe_plan(embeddings, centroids, query_ids, nprobe)
    probed_cells = sorted({r["cell_id"] for r in probe_df.collect()})  # ≤ q·nprobe
    cell_codes = (
        spark.read.option("basePath", f"{path}/codes")
        .parquet(f"{path}/codes")
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .filter(F.col("cell_id").isin(probed_cells))
        .select("vec_id", "codes", "cell_id")
    )
    return _search(cell_codes, books, embeddings, qvecs, probe_df, k, n_candidates)
