"""Epoch compaction (OPTIMIZE) for the five persisted indexes: appends
keep writes O(new docs) but each leaves an epoch dir, so probe cost
grows with the append count; compaction folds the live chain back to
ONE epoch with the same atomic manifest commit — results must be
IDENTICAL before and after, old epochs invisible, double-compaction a
no-op, and the index service auto-compacts past its threshold."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics import dedup as dd
from csv_crm_upload_spark.analytics import ivf as _ivf
from csv_crm_upload_spark.analytics import ivfpq as _ivfpq
from csv_crm_upload_spark.analytics import pq as _pq
from csv_crm_upload_spark.analytics import retrieval as rtr
from csv_crm_upload_spark.operators.manifest import read_manifest
from csv_crm_upload_spark.sources.tables import load_table


def _thirds(df, key):
    return [df.filter(F.col(key) % 3 == i) for i in range(3)]


def test_text_index_compaction_preserves_search(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    a, b, c = _thirds(docs, "doc_id")
    idx = str(tmp_path / "text_idx")
    rtr.save_text_index(a, idx, n_buckets=16)
    rtr.update_text_index(b, idx)
    rtr.update_text_index(c, idx)
    before = sorted(map(tuple, rtr.bm25_search_indexed(spark, idx).collect()))
    assert read_manifest(idx)["epoch"] == 2

    assert rtr.compact_text_index(spark, idx) is True
    m = read_manifest(idx)
    assert m["epoch"] == 3 and m["base_epoch"] == 3
    after = sorted(map(tuple, rtr.bm25_search_indexed(spark, idx).collect()))
    assert after == before
    # one live postings dir; pre-compaction epochs ignored by readers
    assert os.path.isdir(f"{idx}/postings/epoch=3")
    assert rtr.compact_text_index(spark, idx) is False  # already compact

    # appends keep working after compaction
    before_n = rtr.read_index_stats(spark, idx)["n_docs"]
    extra = docs.limit(0)
    rtr.update_text_index(extra, idx)  # empty: no-op
    assert rtr.read_index_stats(spark, idx)["n_docs"] == before_n


def test_dedup_index_compaction_preserves_pairs_and_appends(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    a, b, c = _thirds(docs, "doc_id")
    idx = str(tmp_path / "dedup_idx")
    dd.save_dedup_index(a, idx)
    dd.update_dedup_index(b, idx)
    before = sorted(map(tuple, dd.load_dedup_index(spark, idx).collect()))

    assert dd.compact_dedup_index(spark, idx) is True
    m = read_manifest(idx)
    assert m["epoch"] == m["base_epoch"] == 2
    assert sorted(map(tuple, dd.load_dedup_index(spark, idx).collect())) == before

    # an append AFTER compaction still sees the compacted signatures:
    # the final pair set equals a full one-shot derivation
    dd.update_dedup_index(c, idx)
    got = sorted(map(tuple, dd.load_dedup_index(spark, idx).collect()))
    want = sorted(map(tuple, dd.d_minhash_lsh_pairs(docs).collect()))
    assert got == want


def test_vector_index_compaction_preserves_search(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    a, b, c = _thirds(emb, "vec_id")

    ivf_idx = str(tmp_path / "ivf")
    _ivf.save_index(a, ivf_idx, n_cells=8)
    _ivf.update_index(b, ivf_idx)
    _ivf.update_index(c, ivf_idx)
    before = sorted(
        map(tuple, _ivf.knn_ivf(emb, k=5, nprobe=8, index_path=ivf_idx).collect())
    )
    assert _ivf.compact_index(spark, ivf_idx) is True
    assert read_manifest(ivf_idx)["base_epoch"] == 3
    after = sorted(
        map(tuple, _ivf.knn_ivf(emb, k=5, nprobe=8, index_path=ivf_idx).collect())
    )
    assert after == before

    pq_idx = str(tmp_path / "pq")
    _pq.save_pq_index(a, pq_idx, m=8, n_codes=16)
    _pq.update_pq_index(b, pq_idx)
    before = sorted(map(tuple, _pq.pq_search_indexed(spark, pq_idx, emb).collect()))
    assert _pq.compact_pq_index(spark, pq_idx) is True
    after = sorted(map(tuple, _pq.pq_search_indexed(spark, pq_idx, emb).collect()))
    assert after == before
    assert _pq.compact_pq_index(spark, pq_idx) is False

    ivfpq_idx = str(tmp_path / "ivfpq")
    _ivfpq.save_ivfpq_index(a, ivfpq_idx, n_cells=8, m=8, n_codes=16)
    _ivfpq.update_ivfpq_index(b, ivfpq_idx)
    before = sorted(
        map(tuple, _ivfpq.ivfpq_search(spark, ivfpq_idx, emb, nprobe=8).collect())
    )
    assert _ivfpq.compact_ivfpq_index(spark, ivfpq_idx) is True
    after = sorted(
        map(tuple, _ivfpq.ivfpq_search(spark, ivfpq_idx, emb, nprobe=8).collect())
    )
    assert after == before
    # the compacted codes keep the cell_id layout (probe pruning intact)
    assert any(
        d.startswith("cell_id=")
        for d in os.listdir(f"{ivfpq_idx}/codes/epoch=2")
    )


def test_index_service_auto_compacts_past_threshold(spark, sf_dir, tmp_path):
    from csv_crm_upload_spark.streaming.index_service import CorpusIndexService

    docs = load_table(spark, sf_dir, "documents")
    a, b, c = _thirds(docs, "doc_id")
    idx = str(tmp_path / "text_idx")
    rtr.save_text_index(a, idx, n_buckets=16)

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    svc = CorpusIndexService(spark, docs_dir=drop, text_index=idx, compact_after=2)

    b.write.parquet(f"{drop}/shard_b")
    svc.tick()
    assert read_manifest(idx)["epoch"] == 1  # 1 append: under threshold
    assert read_manifest(idx).get("base_epoch", 0) == 0

    c.write.parquet(f"{drop}/shard_c")
    svc.tick()  # 2nd append hits compact_after=2 → auto-OPTIMIZE
    m = read_manifest(idx)
    assert m["epoch"] == 3 and m["base_epoch"] == 3
    got = sorted(map(tuple, rtr.bm25_search_indexed(spark, idx).collect()))
    want = sorted(map(tuple, rtr.bm25_search(docs).collect()))
    assert got == want


def test_text_and_dedup_rebuild_over_live_index_is_atomic(spark, sf_dir, tmp_path):
    """save_* over a LIVE index advances epoch + base_epoch in one
    commit (the vector indexes' rebuild pattern, uniformly applied):
    pre-rebuild epochs become invisible and results equal a fresh
    build."""
    docs = load_table(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)

    t_idx = str(tmp_path / "text")
    rtr.save_text_index(half, t_idx, n_buckets=16)
    rtr.save_text_index(docs, t_idx, n_buckets=16)  # rebuild over live
    m = read_manifest(t_idx)
    assert m["epoch"] == 1 and m["base_epoch"] == 1
    got = sorted(map(tuple, rtr.bm25_search_indexed(spark, t_idx).collect()))
    want = sorted(map(tuple, rtr.bm25_search(docs).collect()))
    assert got == want
    assert rtr.read_index_stats(spark, t_idx)["n_docs"] == docs.filter(
        F.col("text").isNotNull()
    ).count()

    d_idx = str(tmp_path / "dedup")
    dd.save_dedup_index(half, d_idx)
    dd.save_dedup_index(docs, d_idx)  # rebuild over live
    m = read_manifest(d_idx)
    assert m["epoch"] == 1 and m["base_epoch"] == 1
    got = sorted(map(tuple, dd.load_dedup_index(spark, d_idx).collect()))
    want = sorted(map(tuple, dd.d_minhash_lsh_pairs(docs).collect()))
    assert got == want  # no epoch-0 pairs leak in


def test_rebuild_preserves_streaming_txn_guard(spark, sf_dir, tmp_path):
    """A rebuild over a live index must PRESERVE last_txn: streaming
    batches folded before the rebuild still no-op on replay afterwards
    (re-folding them would double-index docs the rebuild already
    contains)."""
    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "text")
    rtr.save_text_index(half_a, idx, n_buckets=16)
    rtr.update_text_index(half_b, idx, txn=("stream", 7))
    assert read_manifest(idx)["last_txn"] == {"stream": 7}

    rtr.save_text_index(docs, idx, n_buckets=16)  # rebuild over live
    m = read_manifest(idx)
    assert m["last_txn"] == {"stream": 7}  # guard survives the rebuild
    epoch = m["epoch"]
    rtr.update_text_index(half_b, idx, txn=("stream", 7))  # replay
    assert read_manifest(idx)["epoch"] == epoch  # no double-index


def test_vacuum_removes_only_unreferenced_epochs(spark, sf_dir, tmp_path):
    """After append + compaction, service.vacuum() deletes the stale
    pre-compaction epochs but keeps the live chain AND the pinned
    quantizer epochs — results unchanged, second vacuum removes
    nothing."""
    from csv_crm_upload_spark.streaming.index_service import CorpusIndexService

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    t_idx = str(tmp_path / "text")
    v_idx = str(tmp_path / "ivfpq")
    rtr.save_text_index(docs.filter(F.col("doc_id") % 2 == 0), t_idx, n_buckets=16)
    rtr.update_text_index(docs.filter(F.col("doc_id") % 2 == 1), t_idx)
    _ivfpq.save_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 0), v_idx, n_cells=8)
    _ivfpq.update_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 1), v_idx)
    rtr.compact_text_index(spark, t_idx)
    _ivfpq.compact_ivfpq_index(spark, v_idx)

    text_before = sorted(map(tuple, rtr.bm25_search_indexed(spark, t_idx).collect()))
    ann_before = sorted(
        map(tuple, _ivfpq.ivfpq_search(spark, v_idx, emb, nprobe=8).collect())
    )

    svc = CorpusIndexService(
        spark, docs_dir=str(tmp_path / "unused_drop"), text_index=t_idx,
        ivfpq_index=v_idx,
    )
    removed = svc.vacuum()
    assert removed, "stale pre-compaction epochs should be deleted"
    # live chain intact, pinned quantizers intact
    m_t, m_v = read_manifest(t_idx), read_manifest(v_idx)
    assert os.path.isdir(f"{t_idx}/postings/epoch={m_t['epoch']}")
    assert os.path.isdir(f"{v_idx}/centroids/epoch={m_v['centroid_epoch']}")
    assert not os.path.isdir(f"{t_idx}/postings/epoch=0")
    assert not os.path.isdir(f"{v_idx}/codes/epoch=0")

    assert sorted(map(tuple, rtr.bm25_search_indexed(spark, t_idx).collect())) == text_before
    assert (
        sorted(map(tuple, _ivfpq.ivfpq_search(spark, v_idx, emb, nprobe=8).collect()))
        == ann_before
    )
    assert svc.vacuum() == []  # nothing stale remains
