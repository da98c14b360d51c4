"""Composed corpus-preparation pipeline: every stage must agree with
its standalone (oracle-verified) operator, and the composition must be
deterministic and index-fed-equal."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics import dedup as dd
from csv_crm_upload_spark.analytics.textstats import mix2_quality_weighted_sample
from csv_crm_upload_spark.plans.corpus_prep import prepare_training_corpus, split_expr
from csv_crm_upload_spark.sources.tables import load_table


def test_stages_agree_with_standalone_operators(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    manifest = prepare_training_corpus(docs).persist()
    try:
        got_ids = {r["doc_id"] for r in manifest.select("doc_id").collect()}

        # dedup stage: canonical survivors of the LSH clustering
        labels = dd.d_component_labels(docs)
        dropped = {
            r["doc_id"]
            for r in labels.filter(F.col("doc_id") != F.col("component")).collect()
        }
        # quality stage: the mix2 keep set
        mix_kept = {r["doc_id"] for r in mix2_quality_weighted_sample(docs).collect()}
        assert got_ids == (mix_kept - dropped)

        # split stage: every row matches the pure-hash assignment
        mismatch = manifest.filter(F.col("split") != split_expr()).count()
        assert mismatch == 0

        # packing stage: offsets are contiguous prefix sums per stream
        # and bin_id = offset // budget
        import pandas as pd

        pdf = manifest.orderBy("split", "source", "doc_id").toPandas()
        for (_s, _src), g in pdf.groupby(["split", "source"]):
            expect = 0
            for _, row in g.iterrows():
                assert row["stream_offset"] == expect
                assert row["bin_id"] == expect // 512
                expect += row["n_tokens"]
    finally:
        manifest.unpersist()


def test_index_fed_composition_matches_inline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "pairs_idx")
    dd.save_dedup_index(docs, idx)
    inline = sorted(map(tuple, prepare_training_corpus(docs).collect()))
    fed = sorted(
        map(
            tuple,
            prepare_training_corpus(docs, pairs=dd.load_dedup_index(spark, idx)).collect(),
        )
    )
    assert fed == inline


def test_sharded_packing_deterministic_and_stream_scoped(spark, sf_dir):
    """With n_shards, every (split, source, shard) stream packs
    independently from offset 0, and a rerun is bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    a = prepare_training_corpus(docs, n_shards=4)
    b = prepare_training_corpus(docs, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    starts = (
        a.groupBy("split", "source", "shard")
        .agg(F.min("stream_offset").alias("first_off"))
        .filter(F.col("first_off") != 0)
        .count()
    )
    assert starts == 0


def test_written_corpus_layout_and_idempotence(spark, sf_dir, tmp_path):
    """write_training_corpus lands trainer-readable files: manifest
    parquet + packed rows WITH text hive-partitioned by (split, source).
    No split crosses a directory, split scans prune at plan time, and a
    re-run overwrites to the identical artifact."""
    import os

    from csv_crm_upload_spark.plans.corpus_prep import write_training_corpus

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_out")
    write_training_corpus(docs, path)

    # physical layout: split directories, each containing source dirs
    splits = {d for d in os.listdir(f"{path}/corpus") if d.startswith("split=")}
    assert splits == {"split=train", "split=val", "split=test"}
    for s in splits:
        subs = [d for d in os.listdir(f"{path}/corpus/{s}") if d.startswith("source=")]
        assert subs, f"{s} has no source partitions"

    manifest = spark.read.parquet(f"{path}/manifest")
    corpus = spark.read.parquet(f"{path}/corpus")
    assert corpus.count() == manifest.count()
    # every packed row carries text and its manifest row's packing fields
    assert {"doc_id", "split", "source", "text", "bin_id", "stream_offset"} <= set(
        corpus.columns
    )
    assert corpus.filter(F.col("text").isNull()).count() == 0

    # no split crosses a directory: rows under split=train are train rows
    train = spark.read.parquet(f"{path}/corpus/split=train")
    assert train.count() == manifest.filter("split = 'train'").count()
    assert set(train.columns) & {"split"} == set()  # split IS the directory

    # split-filtered scans prune partitions at plan time
    pruned = corpus.filter(F.col("split") == "train")
    pruned.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan

    # re-run: identical artifact (deterministic end to end)
    before = sorted(map(tuple, corpus.drop("text").collect()))
    write_training_corpus(docs, path)
    after = sorted(
        map(tuple, spark.read.parquet(f"{path}/corpus").drop("text").collect())
    )
    assert after == before


def test_prep2_stage_effects(spark, sf_dir):
    """The v2 composition's stage fingerprints: only NB-predicted-en
    docs survive, token counts reflect the CLEANED text (never more
    than the raw count), the quality/split gates match their standalone
    operators, and packing never crosses a split boundary."""
    from pyspark.sql import functions as F

    from csv_crm_upload_spark.analytics.nbayes import nb_inline_predictions
    from csv_crm_upload_spark.plans.corpus_prep import prepare_training_corpus_v2
    from csv_crm_upload_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = prepare_training_corpus_v2(docs)
    rows = out.collect()
    assert rows, "pipeline must keep something"

    en_ids = {
        r["doc_id"]
        for r in nb_inline_predictions(docs).filter(F.col("cand") == "en").collect()
    }
    assert {r["doc_id"] for r in rows} <= en_ids, "langid filter must hold"

    raw_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    assert all(r["n_tokens"] <= raw_tokens[r["doc_id"]] for r in rows), (
        "cleaned token counts cannot exceed raw"
    )
    # at least one surviving doc actually lost spans to the cleaner
    assert any(r["n_tokens"] < raw_tokens[r["doc_id"]] for r in rows)

    # bins are per-(split, source) streams: same bin id never spans splits
    seen = {}
    for r in rows:
        key = (r["split"], r["source"], r["bin_id"])
        seen.setdefault(key, set()).add(r["split"])
    assert all(len(v) == 1 for v in seen.values())


def test_prep3_cascade_invariants(spark, sf_dir):
    """prep3 (FineWeb-style cascade): every stage must actually bite on
    the fixture (non-vacuous), and the largest-remainder apportionment
    must redistribute EXACTLY the survivor count — sum(alloc_docs) ==
    sum(n_docs), every alloc within 1 of N*weight."""
    from csv_crm_upload_spark.analytics.dedup import (
        d_minhash_lsh_pairs,
        xsd1_exact_substring_dedup,
    )
    from csv_crm_upload_spark.analytics.textstats import gq1_gopher_quality
    from csv_crm_upload_spark.plans.corpus_prep import prepare_training_corpus_v3
    from csv_crm_upload_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    rows = prepare_training_corpus_v3(docs).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_alloc = sum(r["alloc_docs"] for r in rows)
    assert n_alloc == n_docs, "apportionment must be exact"
    assert 0 < n_docs < n_raw, "cascade must keep some and drop some"
    # each gate bites on its own
    n_gq = gq1_gopher_quality(docs).filter("keep").count()
    assert n_gq < n_raw, "Gopher gate vacuous"
    assert (
        xsd1_exact_substring_dedup(docs).filter("dup_fraction > 0.5").count() > 0
    ), "ExactSubstr gate vacuous"
    assert d_minhash_lsh_pairs(docs).count() > 0, "near-dup blacklist vacuous"
    # allocation tracks the weights: |alloc - N*w| < 1 + slack from the
    # 6-dp weight rounding
    for r in rows:
        assert abs(r["alloc_docs"] - n_docs * r["weight"]) <= 1.0 + n_docs * 1e-5
