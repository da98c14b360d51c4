"""Persisted winnowing fingerprint index — the eighth artifact under
the shared epoch-manifest protocol (operators/manifest.py): the MOSS
use case at corpus scale, "check any document against everything ever
indexed for shared content" without re-fingerprinting the corpus.

Layout (same conventions as the BM25/dedup/vector indexes):
  prints/epoch=E/bucket=B/   (doc_id, fp) — the distinct selected
                             fingerprints, hash-partitioned by
                             bucket = pmod(fp, n_buckets) so probes
                             prune to the buckets their fingerprints
                             land in (PartitionFilters, like the
                             BM25 token buckets and NB model counts)
  MANIFEST.json              epoch / base_epoch / k / w / n_buckets
                             (+ last_txn for streaming exactly-once)

Maintenance contract (shared with every other artifact):
  * build  — save_winnow_index: atomic rebuild-over-live
  * append — update_winnow_index: fingerprints are pure per-document
             functions, so folding ONLY the new docs' prints is
             byte-identical to a rebuild (test-pinned); O(new docs)
  * OPTIMIZE — compact_winnow_index via manifest.compact_epochs
  * gc     — rides CorpusIndexService.vacuum via INDEX_LAYOUTS
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.fanout import cluster_for_write

from csv_crm_upload_spark.analytics.textstats import (
    shared_print_pairs,
    winnow_prints,
)

DEFAULT_N_BUCKETS = 16

#: derived-key format stamp (manifest.check_key_format — the substr
#: gram_format lesson generalized, r9): fp = window-min of md5-60 over
#: \x01-joined word k-grams of norm_tokens text. Bump when any of the
#: tokenization / gram join / hash / selection rule changes.
KEY_FORMAT = "normtok-x01gram-md560-winmin-v1"


def _bucketed(prints: DataFrame, n_buckets: int) -> DataFrame:
    return prints.withColumn("bucket", F.pmod(F.col("fp"), F.lit(n_buckets)))


def save_winnow_index(
    documents: DataFrame,
    path: str,
    k: int = 4,
    w: int = 5,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """Materialize the corpus's selected fingerprints once. Rebuild over
    a LIVE index is atomic (epoch + base_epoch advance in one manifest
    commit; prior last_txn preserved — the streaming replay guard)."""
    from csv_crm_upload_spark.operators.manifest import commit_manifest, rebuild_epoch

    new_epoch, prior = rebuild_epoch(path)
    cluster_for_write(
        _bucketed(winnow_prints(documents, k, w), n_buckets), "bucket"
    ).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(f"{path}/prints/epoch={new_epoch}")
    commit_manifest(
        path,
        {
            **prior,
            "epoch": new_epoch,
            "base_epoch": new_epoch,
            "k": k,
            "w": w,
            "n_buckets": n_buckets,
            "key_format": KEY_FORMAT,
        },
    )


def load_winnow_prints(spark, path: str) -> DataFrame:
    """The stored (doc_id, fp) fingerprint table — the union of the
    committed epochs in [base_epoch, epoch] (manifest-resolved: a racing
    update or compaction is invisible — old-or-new, never partial)."""
    from csv_crm_upload_spark.operators.manifest import check_key_format, read_manifest

    m = read_manifest(path)
    check_key_format(m, path, KEY_FORMAT, missing_ok=True)
    epoch, base = m["epoch"], m.get("base_epoch", 0)
    return (
        spark.read.parquet(f"{path}/prints")
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .select("doc_id", "fp")
    )


def update_winnow_index(
    new_documents: DataFrame, path: str, txn: tuple[str, int] | None = None
) -> None:
    """Fold a corpus APPEND: fingerprint ONLY the new documents and
    commit them as a new epoch. Because selection is a pure per-document
    function, the post-append print table is EXACTLY what a rebuild
    over the full corpus would store (test-pinned) — no cross-document
    state to reconcile. Precondition (as for any index append): new
    doc_ids are not already indexed."""
    from csv_crm_upload_spark.operators.manifest import (
        check_key_format,
        commit_manifest,
        read_manifest,
        remove_orphan_epochs,
        txn_already_applied,
        with_txn,
    )

    m = read_manifest(path)
    check_key_format(m, path, KEY_FORMAT, missing_ok=True)
    if txn_already_applied(m, txn):
        return  # replayed streaming batch: already folded
    epoch = m["epoch"]
    remove_orphan_epochs(path, ["prints"], epoch)
    new_prints = _bucketed(
        winnow_prints(new_documents, m["k"], m["w"]), m["n_buckets"]
    ).localCheckpoint(eager=True)
    if not new_prints.limit(1).count():
        return  # nothing with content — clean no-op before any write
    cluster_for_write(new_prints, "bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/prints/epoch={epoch + 1}")
    commit_manifest(path, with_txn({**m, "epoch": epoch + 1}, txn))


def compact_winnow_index(spark, path: str) -> bool:
    """OPTIMIZE: fold the live [base_epoch, epoch] chain into one epoch
    (bucket partitioning preserved) in one atomic manifest commit.
    Returns False when already compact."""
    from csv_crm_upload_spark.operators.manifest import (
        check_key_format,
        compact_epochs,
        read_manifest,
    )

    check_key_format(read_manifest(path), path, KEY_FORMAT, missing_ok=True)
    return compact_epochs(spark, path, union_dirs={"prints": ["bucket"]})


def wfp2_indexed_pairs(
    spark, path: str, min_shared: int = 2, max_df: int = 50
) -> DataFrame:
    """The wfp2 near-copy pair query over the PERSISTED prints — no
    re-fingerprinting; ≡ the inline wfp2_shared_fingerprint_pairs over
    the indexed corpus (test-pinned). The df cap is computed here, over
    the full stored table, exactly as a rebuild would."""
    return shared_print_pairs(load_winnow_prints(spark, path), min_shared, max_df)


def match_documents(
    spark,
    path: str,
    probe_documents: DataFrame,
    min_shared: int = 1,
    max_df: int = 50,
) -> DataFrame:
    """The MOSS probe: which INDEXED documents share fingerprints with
    each probe document — (probe_doc_id, indexed_doc_id, n_shared),
    n_shared >= min_shared, most-shared first.

    Scale shape: the probe set is small by nature (a submission batch,
    a crawl increment); its fingerprints are computed map-only, and the
    stored-print scan PRUNES to the buckets the probe's fingerprints
    land in (PartitionFilters on the bucket partition column — the
    NB-model/BM25 probe discipline), so a probe reads
    O(probe buckets / n_buckets) of the index, not all of it. Hot
    stored fingerprints (df > max_df over the stored table) are dropped
    before the join, same cap as the pair query."""
    from csv_crm_upload_spark.operators.manifest import check_key_format, read_manifest

    m = read_manifest(path)
    check_key_format(m, path, KEY_FORMAT, missing_ok=True)
    epoch, base = m["epoch"], m.get("base_epoch", 0)
    probe = _bucketed(
        winnow_prints(probe_documents, m["k"], m["w"]), m["n_buckets"]
    ).localCheckpoint(eager=True)
    buckets = [r["bucket"] for r in probe.select("bucket").distinct().collect()]
    stored = (
        spark.read.parquet(f"{path}/prints")
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .filter(F.col("bucket").isin(buckets))  # partition-pruned scan
        .select("doc_id", "fp")
    )
    dfc = stored.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = stored.join(dfc.filter(F.col("df") <= max_df), "fp")
    return (
        probe.select(F.col("doc_id").alias("probe_doc_id"), "fp")
        .join(rare.select(F.col("doc_id").alias("indexed_doc_id"), "fp"), "fp")
        .filter(F.col("probe_doc_id") != F.col("indexed_doc_id"))
        .groupBy("probe_doc_id", "indexed_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("probe_doc_id", F.col("n_shared").desc(), "indexed_doc_id")
    )
