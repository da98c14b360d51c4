"""IVF (inverted-file) approximate nearest neighbor — the learned-
partition counterpart to hyperplane LSH (similarity.py).

Index build:
  1. fit k centroids with the ORACLE-PAIRED distributed k-means
     (clustering._fitted_centroids — the kmeans1 fit: first-k-by-vec_id
     init, 6-dp rounded-dot assignment, DECIMAL per-dim means rounded
     to 12 dp): whole-corpus Lloyd's with one combining shuffle + one
     bounded k-row collect per round, no driver sample matrix at all
     (round-9: replaces the sampled numpy fit so the whole IVF search
     is reproducible in ANSI SQL — sim_knn_ivf is now driver-checked
     against a DuckDB oracle instead of rows-only);
  2. assign every vector to its nearest centroid — the (k × dim)
     centroid matrix rides into the plan as literals and assignment is
     a single map stage over the corpus.

Search: probe the `nprobe` nearest cells per query (ranked by the SAME
6-dp rounded dot, ties → lowest cell — computed IN THE PLAN, not with
driver floats, so the ranking is the oracle's), exact-rerank only those
cells' members. At 100 TB: assignment is embarrassingly parallel, the
cell join is one shuffle on cell_id, and recall/cost is tuned by
(n_cells, nprobe) exactly as in standard IVF practice.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.fanout import cluster_for_write


def fit_centroids(
    embeddings: DataFrame, n_cells: int = 16, iters: int = 2
) -> np.ndarray:
    """The distributed k-means fit (clustering._fitted_centroids) as a
    coarse-quantizer matrix: deterministic (first n_cells valid vectors
    by vec_id init, fixed `iters` rounds), whole-corpus, and exactly
    reproducible by the kmeans1 oracle chain. Rows are in ascending
    cluster-id order; a cluster emptied during the update rounds is
    dropped (the kmeans1 convention) — positions stay a monotone
    relabeling, so rankings/partitions agree with the oracle's ids.
    Returns an empty (0, 0) matrix when the corpus has no valid vector
    (callers degrade to an empty result, never a None-index abort).

    Recall note for UNNORMALIZED corpora: the centroids are raw per-dim
    means (not re-normalized to the unit sphere) and cell assignment /
    probe ranking use the raw dot product, so when vector norms vary
    widely, cell selection biases toward high-norm centroids and recall
    can degrade relative to a spherical (normalize-then-fit) quantizer.
    Either L2-normalize embeddings upstream (cosine semantics — the
    testdata corpus is near-unit-norm, where the two fits coincide) or
    keep ivfrec1_recall_audit in the production tuning loop to measure
    the actual recall floor at the deployed n_cells/nprobe; the floors
    pinned in tests are at test scale only."""
    from csv_crm_upload_spark.analytics.fitmemo import memo_fit

    # fit-memoized (r10 verdict ask #2): the fit is deterministic
    # (fixed init/iters, decimal recompute), so a repeat caller in the
    # same process (ivfpq1 after sim_knn_ivf, the parity sweep's warm
    # pass) reuses the centroid matrix instead of re-running Lloyd's
    return memo_fit(
        "ivf_centroids",
        embeddings,
        (n_cells, iters),
        lambda: _fit_centroids_impl(embeddings, n_cells, iters),
    )


def _fit_centroids_impl(
    embeddings: DataFrame, n_cells: int, iters: int
) -> np.ndarray:
    # the UNmemoized core on purpose: this impl already runs under the
    # ivf_centroids memo entry — routing through the kmeans-family memo
    # too would double-count every fresh fit as two misses for zero
    # extra sharing (the two families gate their input frames
    # differently, so their plans never collide anyway)
    from csv_crm_upload_spark.analytics.clustering import _fitted_centroids_impl
    from csv_crm_upload_spark.analytics.similarity import valid_vectors

    valid = valid_vectors(embeddings)
    # one bounded collect serves the fit-width probe AND (on the common
    # all-one-width corpus) the Lloyd's init rows — round 13, guide
    # §1.2: one fewer blocking job per fresh fit; a ragged head falls
    # back to the exact width-gated init query (semantics unchanged)
    head = valid.orderBy("vec_id").limit(n_cells).select("vec_id", "embedding").collect()
    if not head:
        return np.zeros((0, 0))
    dim = len(head[0]["embedding"])
    init = (
        [(i, [float(v) for v in r["embedding"]]) for i, r in enumerate(head)]
        if all(len(r["embedding"]) == dim for r in head)
        else None
    )
    cent = _fitted_centroids_impl(
        valid.filter(F.size("embedding") == dim), n_cells, iters, dim, init_cent=init
    )
    return np.array([c for _cid, c in cent], dtype=np.float64)


def cell_id_expr(centroids: np.ndarray):
    """Column expression (over `embedding`) for the nearest-centroid
    cell id. The centroid matrix rides into the plan as array literals
    (broadcast-equivalent; k×dim doubles is tiny) — usable in any map
    stage, e.g. fused with PQ encoding in ivfpq._assign_and_encode.
    Each dot is 6-dp rounded before the argmax (ties → FIRST max =
    lowest cell), the clustering._assign discipline, so the assignment
    is reproducible by the kmeans oracle chain."""
    emb = F.col("embedding")
    sims = [
        F.round(
            F.aggregate(
                F.zip_with(
                    emb,
                    F.array(*[F.lit(float(v)) for v in centroids[c]]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )
        for c in range(len(centroids))
    ]
    best = F.array_position(
        F.array(*sims), F.array_max(F.array(*sims))
    ) - 1  # 1-based → 0-based
    return best.cast("int")


def assign_cells(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """vec_id → cell_id of nearest centroid — one map stage, no shuffle.
    Gated to valid vectors of the quantizer's width: a NULL/empty/
    zero-norm/ragged row degrades to absence from the cell table (the
    valid_vectors discipline) instead of a NULL-dot argmax abort."""
    from csv_crm_upload_spark.analytics.arrowquant import cells_arrow
    from csv_crm_upload_spark.analytics.similarity import valid_vectors

    gated = valid_vectors(embeddings).filter(
        F.size("embedding") == int(centroids.shape[1])
    )
    # Arrow-native since round 13: bit-identical to cell_id_expr
    # (tests/test_arrowquant.py) without the k×dim literal tree's
    # construction/analysis/codegen cost per call (guide §4.2)
    return cells_arrow(gated, centroids)


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
    if centroids.size == 0:
        # loud, BEFORE any epoch dir lands (review r9: the empty-matrix
        # degrade is for query entry points; building an index over a
        # corpus with zero valid vectors is a caller error)
        raise ValueError(
            "save_index: no valid vectors to fit centroids on "
            "(corpus is empty or all embeddings are NULL/empty/zero-norm)"
        )
    cent_rows = [(int(c), [float(v) for v in centroids[c]]) for c in range(len(centroids))]
    spark.createDataFrame(cent_rows, "cell_id int, centroid array<double>").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids/epoch={new_epoch}")
    cluster_for_write(
        assign_cells(embeddings, centroids), "cell_id"
    ).write.mode("overwrite").partitionBy(
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
    cluster_for_write(
        assign_cells(new_embeddings, centroids), "cell_id"
    ).write.mode("overwrite").partitionBy(
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
    the persisted index (no fit, no assignment scan).

    Every ranking is IN THE PLAN with the cross-engine discipline
    (round-9 — this is what makes the op oracle-paired): probe cells
    rank by the 6-dp rounded query·centroid dot (ties → lowest cell);
    the rerank is knn_bruteforce's exact expression (6-dp rounded
    cosine, +0.0 signed-zero guard, vec_id tiebreak). Queries are gated
    to valid fit-width vectors — the cell table only covers those, so a
    ragged/corrupt query degrades to absence (the valid_vectors rule),
    matching the oracle's WHERE. Scale shape: the centroid table is a
    k-row literal broadcast; cells join is one shuffle keyed on
    cell_id (partition-pruned reads on the persisted path); the rerank
    touches only probed cells' members."""
    from pyspark.sql import Window

    from csv_crm_upload_spark.analytics.similarity import _dot, _norm, valid_vectors

    if query_ids is None:
        query_ids = list(range(10))
    spark = embeddings.sparkSession
    if index_path is not None:
        centroids, cells = load_index(spark, index_path)
    else:
        centroids = fit_centroids(embeddings, n_cells=n_cells)
        cells = None
    if centroids.size == 0:  # zero valid vectors: the oracle's empty result
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double, rank int"
        )
    if cells is None:
        # inline path: the corpus cell table is a pure function of
        # (corpus, centroids) — ride the fit memo as a bounded
        # localCheckpoint like the pq/ivfpq code tables (round 13).
        # Replaces a bare per-call persist() that (a) leaked one cached
        # corpus-scale table per invocation for the life of the session
        # (the round-5 signature-memo leak class — nothing ever
        # unpersisted it) and (b) bought nothing within a single call,
        # since the cell table has exactly one consumer in the plan.
        from csv_crm_upload_spark.analytics.fitmemo import memo_fit

        cells = memo_fit(
            "ivf_cells",
            embeddings,
            (centroids.shape, centroids.tobytes()),
            lambda: assign_cells(embeddings, centroids).localCheckpoint(eager=True),
        )
    dim = int(centroids.shape[1])

    cent_df = spark.createDataFrame(
        [(int(c), [float(v) for v in centroids[c]]) for c in range(len(centroids))],
        "cell_id int, centroid array<double>",
    )
    queries = (
        valid_vectors(embeddings.filter(F.col("vec_id").isin(query_ids)))
        .filter(F.size("embedding") == dim)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_norm"),
        )
    )
    qdot = F.round(_dot(F.col("q_emb"), F.col("centroid")), 6)
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cell_id")
    )
    probe = (
        queries.crossJoin(F.broadcast(cent_df))
        .select("query_id", "cell_id", qdot.alias("csim"))
        .withColumn("rk", F.row_number().over(w_probe))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "cell_id")
    )
    cand = (
        cells.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    corpus = embeddings.select(
        "vec_id",
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
    )
    # knn_bruteforce's exact scoring tree (q side first, hoisted norms)
    cos = F.round(
        _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    scored = (
        cand.join(F.broadcast(queries), "query_id")
        .join(corpus, "vec_id")
        .select("query_id", "vec_id", (cos + F.lit(0.0)).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def ivfrec1_recall_audit(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Recall@k of the IVF search against exact cosine brute-force —
    lshrec1's twin for the learned-partition path: the eval that tunes
    (n_cells, nprobe) before the 100 TB corpus quietly loses neighbors
    to unprobed cells. Composes the two oracle-paired operators
    verbatim (now that the coarse fit is the distributed k-means, BOTH
    sides are driver-checked — round-9); the exact side is the base
    relation so a query whose probed cells miss everything reports
    recall 0, not an absent row. Both sides are ≤ |queries|·k rows."""
    from csv_crm_upload_spark.analytics.similarity import knn_bruteforce, recall_rollup

    return recall_rollup(
        knn_bruteforce(embeddings, query_ids, k),
        knn_ivf(embeddings, query_ids, k, n_cells, nprobe),
    )
