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


def test_index_params_sidecar(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "dedup_idx")
    dd.save_dedup_index(docs, idx, n=3, threshold=0.5)
    p = spark.read.parquet(f"{idx}/params").first()
    assert (p["shingle_n"], p["threshold"], p["minhash_k"], p["lsh_bands"]) == (
        3,
        0.5,
        dd.MINHASH_K,
        dd.LSH_BANDS,
    )
