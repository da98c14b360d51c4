"""Distributed full-corpus k-means: structural invariants + determinism
(value parity vs DuckDB is covered by the oracle suite — this op is
oracle-paired despite being iterative)."""

from __future__ import annotations

from csv_crm_upload_spark.analytics.clustering import kmeans1_topic_clusters
from csv_crm_upload_spark.sources.tables import load_table


def test_kmeans_partitions_whole_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans1_topic_clusters(emb, k=8, iters=2).collect()
    assert 1 <= len(out) <= 8
    assert {r["cluster_id"] for r in out} <= set(range(8))
    assert sum(r["n_members"] for r in out) == emb.count()
    for r in out:
        assert -1.0 <= r["mean_sim"] <= 1.0  # unit-norm corpus: dot ∈ [-1, 1]


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans1_topic_clusters(emb, k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans1_topic_clusters(emb, k=4, iters=2).collect()))
    assert a == b


def test_kmeans_single_cluster_degenerate(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans1_topic_clusters(emb, k=1, iters=1).collect()
    assert len(out) == 1
    assert out[0]["cluster_id"] == 0
    assert out[0]["n_members"] == emb.count()
