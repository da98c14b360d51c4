"""Corpus index maintenance riding the service ticker: a shard dropped
into the watch directory is folded into ALL registered persisted
indexes on the next tick via their O(new docs) update paths — after
which it is BM25-searchable, ANN-searchable, and dedup-visible. Quiet
ticks are free, restarts don't re-fold (cursor), and the new epochs
contain ONLY the appended rows (the O(new docs) evidence)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics import dedup as dd
from csv_crm_upload_spark.analytics import ivf as _ivf
from csv_crm_upload_spark.analytics import ivfpq as _ivfpq
from csv_crm_upload_spark.analytics import pq as _pq
from csv_crm_upload_spark.analytics import retrieval as rtr
from csv_crm_upload_spark.sources.tables import load_table
from csv_crm_upload_spark.streaming.index_service import CorpusIndexService


def _epochs(path):
    from csv_crm_upload_spark.operators.manifest import read_manifest

    return read_manifest(path)["epoch"]


def test_dropped_shard_indexed_on_next_tick(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    docs_a = docs.filter(F.col("doc_id") % 2 == 0)
    docs_b = docs.filter(F.col("doc_id") % 2 == 1)
    emb_a = emb.filter(F.col("vec_id") % 2 == 0)
    emb_b = emb.filter(F.col("vec_id") % 2 == 1)

    text_idx = str(tmp_path / "text_idx")
    dedup_idx = str(tmp_path / "dedup_idx")
    ivf_idx = str(tmp_path / "ivf_idx")
    pq_idx = str(tmp_path / "pq_idx")
    ivfpq_idx = str(tmp_path / "ivfpq_idx")
    rtr.save_text_index(docs_a, text_idx, n_buckets=16)
    dd.save_dedup_index(docs_a, dedup_idx)
    _ivf.save_index(emb_a, ivf_idx, n_cells=8)
    _pq.save_pq_index(emb_a, pq_idx, m=8, n_codes=16)
    _ivfpq.save_ivfpq_index(emb_a, ivfpq_idx, n_cells=8, m=8, n_codes=16)

    docs_drop = str(tmp_path / "docs_drop")
    emb_drop = str(tmp_path / "emb_drop")
    os.makedirs(docs_drop)
    os.makedirs(emb_drop)
    svc = CorpusIndexService(
        spark,
        docs_dir=docs_drop,
        emb_dir=emb_drop,
        text_index=text_idx,
        dedup_index=dedup_idx,
        ivf_index=ivf_idx,
        pq_index=pq_idx,
        ivfpq_index=ivfpq_idx,
    )

    # tick with nothing landed: free and a no-op
    assert svc.tick() == {"docs": [], "embeddings": []}
    assert all(
        _epochs(p) == 0 for p in (text_idx, dedup_idx, ivf_idx, pq_idx, ivfpq_idx)
    )

    # a corpus append lands as one shard per drop dir
    docs_b.write.parquet(f"{docs_drop}/shard_b")
    emb_b.write.parquet(f"{emb_drop}/shard_b")
    folded = svc.tick()
    assert folded["docs"] and folded["embeddings"]
    assert all(
        _epochs(p) == 1 for p in (text_idx, dedup_idx, ivf_idx, pq_idx, ivfpq_idx)
    )

    # BM25: the freshened index answers exactly like an inline pass over
    # the FULL corpus (the appended docs are searchable)
    indexed = sorted(
        map(tuple, rtr.bm25_search_indexed(spark, text_idx).collect()),
        key=lambda t: (t[0], t[-1]),
    )
    inline = sorted(
        map(tuple, rtr.bm25_search(docs).collect()), key=lambda t: (t[0], t[-1])
    )
    assert indexed == inline

    # dedup: the pair table equals the inline derivation over the full
    # corpus — appended docs participate in near-dup pairs
    got_pairs = sorted(map(tuple, dd.load_dedup_index(spark, dedup_idx).collect()))
    want_pairs = sorted(map(tuple, dd.d_minhash_lsh_pairs(docs).collect()))
    assert got_pairs == want_pairs

    # ANN: appended vec_ids are reachable through every vector index
    ivf_hits = _ivf.knn_ivf(emb, k=5, nprobe=8, index_path=ivf_idx)
    assert ivf_hits.filter(F.col("vec_id") % 2 == 1).count() > 0
    pq_hits = _pq.pq_search_indexed(spark, pq_idx, emb, k=5)
    assert pq_hits.filter(F.col("vec_id") % 2 == 1).count() > 0
    ivfpq_hits = _ivfpq.ivfpq_search(spark, ivfpq_idx, emb, k=5, nprobe=8)
    assert ivfpq_hits.filter(F.col("vec_id") % 2 == 1).count() > 0

    # O(new docs): the appended epoch holds ONLY the shard's rows —
    # the indexed corpus was not re-hashed/re-encoded
    new_ids = {r["doc_id"] for r in docs_b.select("doc_id").collect()}
    sig1 = {
        r["doc_id"]
        for r in spark.read.parquet(f"{dedup_idx}/signatures/epoch=1").collect()
    }
    assert sig1 == new_ids
    new_vecs = {r["vec_id"] for r in emb_b.select("vec_id").collect()}
    for idx, sub in ((ivf_idx, "cells"), (pq_idx, "codes"), (ivfpq_idx, "codes")):
        got = {
            r["vec_id"] for r in spark.read.parquet(f"{idx}/{sub}/epoch=1").collect()
        }
        assert got == new_vecs, f"{idx}/{sub} epoch-1 is not shard-only"

    # second tick: nothing new, nothing re-folded
    assert svc.tick() == {"docs": [], "embeddings": []}
    assert all(
        _epochs(p) == 1 for p in (text_idx, dedup_idx, ivf_idx, pq_idx, ivfpq_idx)
    )

    # service restart: the cursor survives, the shard is not re-folded
    svc2 = CorpusIndexService(
        spark,
        docs_dir=docs_drop,
        emb_dir=emb_drop,
        text_index=text_idx,
        dedup_index=dedup_idx,
        ivf_index=ivf_idx,
        pq_index=pq_idx,
        ivfpq_index=ivfpq_idx,
    )
    assert svc2.tick() == {"docs": [], "embeddings": []}
    assert all(
        _epochs(p) == 1 for p in (text_idx, dedup_idx, ivf_idx, pq_idx, ivfpq_idx)
    )


def test_index_service_rides_upload_service_ticker(spark, sf_dir, tmp_path):
    """run_upload_service(index_service=...) folds a landed shard as part
    of its maintenance tick — corpus freshness without a manual step."""
    from csv_crm_upload_spark.operators.store import CustomerStore
    from csv_crm_upload_spark.streaming.pipeline import run_upload_service

    docs = load_table(spark, sf_dir, "documents")
    docs_a = docs.filter(F.col("doc_id") % 2 == 0)
    docs_b = docs.filter(F.col("doc_id") % 2 == 1)
    text_idx = str(tmp_path / "text_idx")
    rtr.save_text_index(docs_a, text_idx, n_buckets=16)

    docs_drop = str(tmp_path / "docs_drop")
    os.makedirs(docs_drop)
    docs_b.write.parquet(f"{docs_drop}/shard_b")
    svc = CorpusIndexService(spark, docs_dir=docs_drop, text_index=text_idx)

    store = CustomerStore(spark, str(tmp_path / "store"))  # empty: no uploads
    run_upload_service(
        store,
        "http://127.0.0.1:9",  # never contacted — pending set is empty
        max_cycles=1,
        sleep=lambda s: None,
        tick_sleep=lambda s: None,
        index_service=svc,
    )
    assert _epochs(text_idx) == 1
    indexed = sorted(
        map(tuple, rtr.bm25_search_indexed(spark, text_idx).collect()),
        key=lambda t: (t[0], t[-1]),
    )
    inline = sorted(
        map(tuple, rtr.bm25_search(docs).collect()), key=lambda t: (t[0], t[-1])
    )
    assert indexed == inline
