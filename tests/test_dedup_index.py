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
        dd.dd4_source_neardup_rates,
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


def test_index_build_caps_hot_buckets(spark, tmp_path):
    """One planted mega-bucket (a template cluster far larger than the
    cap) must NOT go quadratic in the index build: with max_bucket below
    the cluster size, none of its intra-cluster pairs reach the artifact
    — while an honest small near-dup pair elsewhere in the corpus is
    still found. The cap rides the manifest; appends respect it measured
    over COMBINED bucket size."""
    from csv_crm_upload_spark.operators.manifest import read_manifest

    # 40 near-identical template docs (same text => same band buckets)
    template = "terms of service apply to all users of this web site always"
    rows = [
        (i, template, "en", "tmpl", len(template)) for i in range(40)
    ]
    # one honest near-dup pair with distinct content
    base = (
        "the quick brown fox jumps over the lazy dog in the quiet park "
        "while birds sing softly above the green meadow near the bridge"
    )
    a = base + " today"
    b = base + " tonight"
    rows += [(100, a, "en", "web", len(a)), (101, b, "en", "web", len(b))]
    rows += [(200, "completely unrelated prose about distributed query engines", "en", "web", 58)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])

    idx = str(tmp_path / "hot_idx")
    dd.save_dedup_index(docs, idx, max_bucket=10)
    assert read_manifest(idx)["max_bucket"] == 10
    pairs = {(r["doc_a"], r["doc_b"]) for r in dd.load_dedup_index(spark, idx).collect()}
    assert (100, 101) in pairs  # honest pair survives
    assert not any(p[0] < 40 and p[1] < 40 for p in pairs)  # mega-bucket dropped

    # append growing the combined bucket past the cap: still no template
    # pairs are generated (cap measured over old + new membership)
    extra = spark.createDataFrame(
        [(300 + i, template, "en", "tmpl", len(template)) for i in range(5)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    dd.update_dedup_index(extra, idx)
    pairs2 = {(r["doc_a"], r["doc_b"]) for r in dd.load_dedup_index(spark, idx).collect()}
    assert not any({p[0], p[1]} <= set(range(40)) | set(range(300, 305)) for p in pairs2 if p != (100, 101))

    # uncapped build at the same path would have found the template pairs
    # (sanity that the test corpus really is a mega-bucket)
    uncapped = dd.d_minhash_lsh_pairs(docs)
    assert uncapped.filter("doc_a < 40 and doc_b < 40").count() > 100


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


def test_signature_memo_is_bounded_and_reused(spark, sf_dir):
    """The round-5 warm-bench anomaly regression pin: repeated
    d_minhash_lsh_pairs calls must NOT accumulate persisted signature
    tables (the old leak), must REUSE the memoized table across
    semantically-equal fresh plans, and clear_signature_memo must drop
    everything."""
    from csv_crm_upload_spark.analytics import dedup as dd
    from csv_crm_upload_spark.sources.tables import load_table

    dd.clear_signature_memo()
    docs = load_table(spark, sf_dir, "documents")
    base = {tuple(r) for r in dd.d_minhash_lsh_pairs(docs).collect()}
    for _ in range(3):  # repeated + fresh-plan calls: memo stays bounded
        again = load_table(spark, sf_dir, "documents")
        got = {tuple(r) for r in dd.d_minhash_lsh_pairs(again).collect()}
        assert got == base
    assert len(dd._SIG_MEMO) == 1  # one corpus -> one entry, no growth
    # a different (documents, n) key adds an entry; cap holds at MAX
    dd.d_minhash_lsh_pairs(docs, n=2).collect()
    dd.d_minhash_lsh_pairs(docs.limit(50), n=2).collect()
    assert len(dd._SIG_MEMO) <= dd._SIG_MEMO_MAX
    dd.clear_signature_memo()
    assert not dd._SIG_MEMO
