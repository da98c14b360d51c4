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
