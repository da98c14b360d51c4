"""Persisted LSH candidate-pair index: the graph-family queries consume
one materialized pair table (built once per corpus snapshot) instead of
each re-deriving the shingle→minhash→band pipeline — the build-once
pattern of retrieval.save_text_index / ivf.save_index applied to the
near-dup graph. Index-fed results must be IDENTICAL to the inline path.
"""

from __future__ import annotations

from csv_crm_upload_spark.analytics import dedup as dd
from csv_crm_upload_spark.sources.tables import load_table


def test_index_fed_graph_family_matches_direct(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "dedup_idx")
    dd.save_dedup_index(docs, idx)
    pairs = dd.load_dedup_index(spark, idx)

    # the persisted pair table IS the inline derivation
    assert sorted(map(tuple, pairs.collect())) == sorted(
        map(tuple, dd.d_minhash_lsh_pairs(docs).collect())
    )

    # every graph consumer: index-fed == derived-inline
    for fn in (
        dd.d_dup_clusters,
        dd.tri1_triangle_counts,
        dd.dd2_dedup_corpus,
        dd.pr1_doc_pagerank,
    ):
        got = sorted(map(tuple, fn(docs, pairs=pairs).collect()))
        want = sorted(map(tuple, fn(docs).collect()))
        assert got == want, f"{fn.__name__}: index-fed result differs from direct"


def test_index_manifest_records_params(spark, sf_dir, tmp_path):
    from csv_crm_upload_spark.operators.manifest import read_manifest

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "dedup_idx")
    dd.save_dedup_index(docs, idx, n=3, threshold=0.5)
    m = read_manifest(idx)
    assert (m["epoch"], m["shingle_n"], m["threshold"]) == (0, 3, 0.5)
    assert (m["minhash_k"], m["lsh_bands"]) == (dd.MINHASH_K, dd.LSH_BANDS)


def test_incremental_pair_index_equals_rebuild(spark, sf_dir, tmp_path):
    """Append half the corpus to an index built on the other half: the
    loaded pair table must EQUAL a full one-shot rebuild (signatures are
    pure per-doc functions, so the incremental candidate join loses
    nothing), and graph consumers fed from it must match inline."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    part_a = docs.filter(F.col("doc_id") % 2 == 0)
    part_b = docs.filter(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "inc_idx")
    full = str(tmp_path / "full_idx")
    dd.save_dedup_index(part_a, inc)
    dd.update_dedup_index(part_b, inc)
    dd.save_dedup_index(docs, full)

    got = sorted(map(tuple, dd.load_dedup_index(spark, inc).collect()))
    want = sorted(map(tuple, dd.load_dedup_index(spark, full).collect()))
    assert got == want
    assert got == sorted(map(tuple, dd.d_minhash_lsh_pairs(docs).collect()))

    # a graph consumer fed from the incrementally-built index == inline
    fed = sorted(
        map(
            tuple,
            dd.d_dup_clusters(docs, pairs=dd.load_dedup_index(spark, inc)).collect(),
        )
    )
    inline = sorted(map(tuple, dd.d_dup_clusters(docs).collect()))
    assert fed == inline

    # empty append is a committed no-op
    from csv_crm_upload_spark.operators.manifest import read_manifest

    before = read_manifest(inc)["epoch"]
    dd.update_dedup_index(docs.filter("doc_id < 0"), inc)
    assert read_manifest(inc)["epoch"] == before


def test_crashed_update_self_heals(spark, sf_dir, tmp_path):
    """Orphan epoch dirs (a crash AFTER data writes but BEFORE the
    manifest swap) must be invisible to readers and removed by the next
    update, which then commits cleanly."""
    import os

    from pyspark.sql import functions as F

    from csv_crm_upload_spark.operators.manifest import read_manifest

    docs = load_table(spark, sf_dir, "documents")
    part_a = docs.filter(F.col("doc_id") % 2 == 0)
    part_b = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "crash_idx")
    dd.save_dedup_index(part_a, idx)
    baseline = sorted(map(tuple, dd.load_dedup_index(spark, idx).collect()))

    # simulate the crash: garbage epoch-1 dirs exist, manifest still at 0
    for sub in ("pairs", "signatures", "bands"):
        os.makedirs(f"{idx}/{sub}/epoch=1", exist_ok=True)
        with open(f"{idx}/{sub}/epoch=1/part-00000.parquet", "w") as f:
            f.write("not parquet")

    # readers resolve through the manifest: orphans invisible
    assert sorted(map(tuple, dd.load_dedup_index(spark, idx).collect())) == baseline

    # the next update removes the orphans and commits epoch 1 for real
    dd.update_dedup_index(part_b, idx)
    assert read_manifest(idx)["epoch"] == 1
    healed = sorted(map(tuple, dd.load_dedup_index(spark, idx).collect()))
    assert healed == sorted(map(tuple, dd.d_minhash_lsh_pairs(docs).collect()))


def test_probe_during_pair_index_update_sees_old_or_new(spark, sf_dir, tmp_path):
    """A reader racing update_dedup_index must see the pre-append or the
    post-append pair set, never a partial epoch (manifest-resolved)."""
    import threading

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    part_a = docs.filter(F.col("doc_id") % 2 == 0)
    part_b = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "race_idx")
    dd.save_dedup_index(part_a, idx)
    old = sorted(map(tuple, dd.load_dedup_index(spark, idx).collect()))

    errs = []

    def updater():
        try:
            dd.update_dedup_index(part_b, idx)
        except Exception as e:
            errs.append(e)

    t = threading.Thread(target=updater)
    t.start()
    seen = []
    while t.is_alive():
        seen.append(sorted(map(tuple, dd.load_dedup_index(spark, idx).collect())))
    t.join()
    assert not errs, errs
    new = sorted(map(tuple, dd.load_dedup_index(spark, idx).collect()))
    assert new != old
    bad = [i for i, s in enumerate(seen) if s != old and s != new]
    assert not bad, f"{len(bad)} probes saw a mixed snapshot (of {len(seen)})"
