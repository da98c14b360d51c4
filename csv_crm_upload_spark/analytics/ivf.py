"""IVF (inverted-file) approximate nearest neighbor — the learned-
partition counterpart to hyperplane LSH (similarity.py).

Index build:
  1. fit k centroids on a bounded deterministic sample (driver-side
     numpy Lloyd's — the sample is capped, so driver memory is bounded
     regardless of corpus size; this mirrors how FAISS-style IVF trains
     coarse quantizers on a sample);
  2. assign every vector to its nearest centroid — one broadcast of the
     (k × dim) centroid matrix and a single map stage over the corpus.

Search: probe the `nprobe` nearest cells per query, exact-rerank only
those cells' members. At 100 TB: assignment is embarrassingly parallel,
the cell join is one shuffle on cell_id, and recall/cost is tuned by
(n_cells, nprobe) exactly as in standard IVF practice.

No DuckDB oracle: centroids are learned (data-dependent), so the op is
checked by recall-vs-brute-force tests instead (the driver records a
rows-only check; see COVERAGE.md).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.similarity import cosine


def fit_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    sample_cap: int = 4096,
    n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means on a deterministic bounded sample (normalized
    vectors, so euclidean k-means ≈ spherical/cosine k-means). The
    sample routes through uniform_vector_sample: one NULL/empty/
    wrong-width embedding in the first `sample_cap` rows would
    otherwise land a ragged driver matrix and abort the fit (clean
    corpora are unchanged — the filter drops nothing there)."""
    from csv_crm_upload_spark.analytics.similarity import uniform_vector_sample

    sample = uniform_vector_sample(embeddings, sample_cap)
    x = np.array([r["embedding"] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(n_iter):
        sims = x @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-12)
    return centroids


def cell_id_expr(centroids: np.ndarray):
    """Column expression (over `embedding`) for the nearest-centroid
    cell id. The centroid matrix rides into the plan as array literals
    (broadcast-equivalent; k×dim doubles is tiny) — usable in any map
    stage, e.g. fused with PQ encoding in ivfpq._assign_and_encode."""
    emb = F.col("embedding")
    sims = [
        F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(float(v)) for v in centroids[c]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in range(len(centroids))
    ]
    best = F.array_position(
        F.array(*sims), F.array_max(F.array(*sims))
    ) - 1  # 1-based → 0-based
    return best.cast("int")


def assign_cells(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """vec_id → cell_id of nearest centroid — one map stage, no shuffle."""
    return embeddings.select("vec_id", cell_id_expr(centroids).alias("cell_id"))


def save_index(
    embeddings: DataFrame, path: str, n_cells: int = 16, **fit_kwargs
) -> np.ndarray:
    """Persist an IVF index: centroids (one parquet of (cell_id, centroid
    array)) + the full corpus cell assignment, partitioned BY cell_id so
    a probe reads only its cells' files. This is the build-once /
    query-many split of production ANN: the expensive assignment scan
    runs once per corpus snapshot, then every query costs nprobe
    partition-pruned reads.

    Portability note: the physical layout is self-describing (centroids
    ride the index, probes re-derive cell ids from them), but cell
    assignment is float argmin — consistent for any reader repeating the
    same arithmetic, unlike the md5-derived integer conventions the
    oracle-visible queries use for cross-engine bit-identity.

    Cell files AND centroids are EPOCH-VERSIONED (cells/epoch=K/
    cell_id=*, centroids/epoch=K) with the shared manifest commit
    protocol (operators/manifest.py), so update_index can append a
    corpus shard atomically — and a REBUILD over a live index is atomic
    too: new centroids+cells land under the next epoch and the
    manifest's `base_epoch`/`centroid_epoch` advance together in one
    commit, so a racing probe pairs old centroids with old cells or new
    with new, never a mix (stale pre-rebuild epochs stay on disk for
    readers holding the old manifest; harmless garbage)."""
    from csv_crm_upload_spark.operators.manifest import commit_manifest, rebuild_epoch

    spark = embeddings.sparkSession
    new_epoch, prior = rebuild_epoch(path)  # atomic rebuild over a live index
    centroids = fit_centroids(embeddings, n_cells=n_cells, **fit_kwargs)
    cent_rows = [(int(c), [float(v) for v in centroids[c]]) for c in range(len(centroids))]
    spark.createDataFrame(cent_rows, "cell_id int, centroid array<double>").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids/epoch={new_epoch}")
    assign_cells(embeddings, centroids).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{path}/cells/epoch={new_epoch}")
    commit_manifest(
        path,
        {
            **prior,  # preserves last_txn across the rebuild
            "epoch": new_epoch,
            "base_epoch": new_epoch,
            "centroid_epoch": new_epoch,
            "n_cells": int(len(centroids)),
        },
    )
    return centroids


def update_index(
    new_embeddings: DataFrame, path: str, txn: tuple[str, int] | None = None
) -> None:
    """Incremental IVF maintenance for a corpus APPEND: assign ONLY the
    new vectors to the STORED centroids (the coarse quantizer stays
    fixed on append — standard IVF practice; retraining it is a rebuild)
    and commit the assignments as a new epoch. O(new vectors), map-only,
    atomic via the shared manifest protocol — a racing probe sees the
    old or the new cell set, never a partial epoch."""
    from csv_crm_upload_spark.operators.manifest import (
        commit_manifest,
        read_manifest,
        remove_orphan_epochs,
        txn_already_applied,
        with_txn,
    )

    spark = new_embeddings.sparkSession
    m = read_manifest(path)
    if txn_already_applied(m, txn):
        return  # replayed streaming batch: already folded
    epoch = m["epoch"]
    remove_orphan_epochs(path, ["cells"], epoch)
    if not new_embeddings.limit(1).count():
        return  # empty append is a clean no-op before any write
    centroids = _load_centroids(spark, path, m.get("centroid_epoch"))
    dim = centroids.shape[1]
    # fail-fast probe (limit 1), not a full shard count: the guard must
    # be loud, not an extra corpus-shard pass on every healthy append
    if new_embeddings.filter(F.size("embedding") != dim).limit(1).count():
        raise ValueError(
            f"appended vectors have dim != the stored centroids' {dim}"
        )
    assign_cells(new_embeddings, centroids).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{path}/cells/epoch={epoch + 1}")
    commit_manifest(path, with_txn({**m, "epoch": epoch + 1}, txn))


def _load_centroids(spark, path: str, centroid_epoch: int | None = None) -> np.ndarray:
    sub_path = (
        f"{path}/centroids"
        if centroid_epoch is None  # pre-versioning layout (flat dir)
        else f"{path}/centroids/epoch={centroid_epoch}"
    )
    rows = sorted(spark.read.parquet(sub_path).collect(), key=lambda r: r["cell_id"])
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def compact_index(spark, path: str) -> bool:
    """OPTIMIZE for the IVF index: fold the live cell epochs into one
    new epoch (still partitioned BY cell_id) and advance base_epoch in
    one manifest commit — atomic, quantizers untouched. Returns False
    when already compact."""
    from csv_crm_upload_spark.operators.manifest import compact_epochs

    return compact_epochs(spark, path, union_dirs={"cells": ["cell_id"]})


def load_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    """(centroid matrix, cell-assignment DataFrame) from a saved index —
    the union of the committed epochs in [base_epoch, epoch],
    manifest-resolved so a racing update OR rebuild is seen entirely or
    not at all."""
    from csv_crm_upload_spark.operators.manifest import read_manifest

    man = read_manifest(path)
    epoch, base = man["epoch"], man.get("base_epoch", 0)
    centroids = _load_centroids(spark, path, man.get("centroid_epoch"))
    cells = (
        spark.read.parquet(f"{path}/cells")
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .drop("epoch")
    )
    return centroids, cells


def knn_ivf(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    index_path: str | None = None,
) -> DataFrame:
    """IVF search: per query, exact-rerank members of the nprobe nearest
    cells only. With `index_path`, centroids and assignments come from
    the persisted index (no fit, no assignment scan)."""
    if query_ids is None:
        query_ids = list(range(10))
    if index_path is not None:
        centroids, cells = load_index(embeddings.sparkSession, index_path)
        cells = cells.persist()
    else:
        centroids = fit_centroids(embeddings, n_cells=n_cells)
        cells = assign_cells(embeddings, centroids).persist()

    # nprobe nearest cells per query: computed on the tiny query set
    queries = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    q_rows = queries.collect()
    if not q_rows:  # no query id exists: empty result, not an AxisError
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double, rank int"
        )
    qx = np.array([r["q_emb"] for r in q_rows], dtype=np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    probe_cells = (qx @ centroids.T).argsort(axis=1)[:, ::-1][:, :nprobe]
    probes = [
        (int(r["query_id"]), int(c)) for r, row in zip(q_rows, probe_cells) for c in row
    ]
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame(probes, ["query_id", "cell_id"])

    cand = (
        cells.join(F.broadcast(probe_df), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    corpus = embeddings.select("vec_id", F.col("embedding").alias("c_emb"))
    scored = (
        cand.join(F.broadcast(queries), "query_id")
        .join(corpus, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
