"""Persisted n-gram LM (analytics/ngramlm.py): every indexed probe ≡ its
inline operator (ppl1/ppl2/kn1), additive incremental ≡ rebuild,
streaming txn replay no-op, sum-merge compaction identity, service-tick
fold, readable empty model. The contracts every other artifact pins,
applied to the 12th."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.ngramlm import (
    compact_ngramlm_model,
    kn1_model_logloss,
    load_bigram_counts,
    load_unigram_counts,
    ppl1_model_logloss,
    ppl2_model_logloss,
    save_ngramlm_model,
    update_ngramlm_model,
)
from csv_crm_upload_spark.analytics.textstats import (
    kn1_kneser_ney_logloss,
    ppl1_unigram_logloss,
    ppl2_bigram_logloss,
)
from csv_crm_upload_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _probe_rows(df):
    """Collect a persisted-LM probe result for comparison against its
    inline twin: the probe carries one extra column (`n_oov`, last) that
    the inline operator doesn't have — on a self-probe it must be 0 for
    every doc, and the remaining columns must match the inline rows."""
    rows = df.collect()
    assert all(r["n_oov"] == 0 for r in rows)
    return sorted(tuple(r)[:-1] for r in rows)


def _counts(spark, path):
    return (
        sorted(map(tuple, load_unigram_counts(spark, path).collect())),
        sorted(map(tuple, load_bigram_counts(spark, path).collect())),
    )


def test_model_probes_equal_inline_operators(spark, sf_dir, tmp_path):
    """Over the indexed corpus itself, each persisted-LM probe must be
    value-identical to its inline twin — same tokenization, same fixed
    double expression tree, same decimal weighted sums; the only
    difference is WHERE the corpus statistics come from."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "lm")
    save_ngramlm_model(docs, path)
    assert _probe_rows(ppl1_model_logloss(docs, path)) == _rows(
        ppl1_unigram_logloss(docs)
    )
    assert _probe_rows(ppl2_model_logloss(docs, path)) == _rows(
        ppl2_bigram_logloss(docs)
    )
    assert _probe_rows(kn1_model_logloss(docs, path)) == _rows(
        kn1_kneser_ney_logloss(docs)
    )


def test_incremental_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Counts are additive and every KN statistic derives from the
    SUMMED table, so folding shards one at a time must reproduce the
    rebuild bit-exactly — both count tables AND the three probes (the
    type-count statistics N1+/|types| are the sharp edge: a per-epoch
    type count would overstate types spanning epochs)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)

    inc = str(tmp_path / "inc")
    save_ngramlm_model(a, inc)
    update_ngramlm_model(b, inc)
    update_ngramlm_model(c, inc)

    full = str(tmp_path / "full")
    save_ngramlm_model(docs, full)

    assert _counts(spark, inc) == _counts(spark, full)
    assert _probe_rows(kn1_model_logloss(docs, inc)) == _rows(
        kn1_kneser_ney_logloss(docs)
    )
    assert _probe_rows(ppl2_model_logloss(docs, inc)) == _rows(
        ppl2_bigram_logloss(docs)
    )


def test_txn_replay_noop_and_empty_delta(spark, sf_dir, tmp_path):
    from csv_crm_upload_spark.operators.manifest import read_manifest

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "lm")
    save_ngramlm_model(a, path)
    update_ngramlm_model(b, path, txn=("stream", 7))
    assert read_manifest(path)["epoch"] == 1
    before = _counts(spark, path)
    # replayed batch: same (app, batch) no-ops
    update_ngramlm_model(b, path, txn=("stream", 7))
    assert read_manifest(path)["epoch"] == 1
    assert _counts(spark, path) == before
    # empty delta: clean no-op before any write
    update_ngramlm_model(docs.filter(F.lit(False)), path)
    assert read_manifest(path)["epoch"] == 1


def test_compaction_sum_merges_and_preserves_model(spark, sf_dir, tmp_path):
    """OPTIMIZE must SUM-merge BOTH tables (a union-only compactor would
    double-store cross-epoch types AND double-count their instances):
    post-compact the chain is one epoch, both summed tables are
    unchanged, and the probes still equal inline."""
    from csv_crm_upload_spark.operators.manifest import read_manifest

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "lm")
    save_ngramlm_model(a, path)
    update_ngramlm_model(b, path)
    update_ngramlm_model(c, path)
    before = _counts(spark, path)

    assert compact_ngramlm_model(spark, path) is True
    m = read_manifest(path)
    assert m["epoch"] == m["base_epoch"] == 3
    assert _counts(spark, path) == before
    assert _probe_rows(kn1_model_logloss(docs, path)) == _rows(
        kn1_kneser_ney_logloss(docs)
    )
    assert compact_ngramlm_model(spark, path) is False  # already compact


def test_service_tick_folds_ngramlm_model(spark, sf_dir, tmp_path):
    """A shard dropped into the watch dir is folded into the LM on the
    next tick (txn-guarded), after which the probes see the full corpus
    exactly like a rebuild."""
    from csv_crm_upload_spark.operators.manifest import read_manifest
    from csv_crm_upload_spark.streaming.index_service import CorpusIndexService

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "lm")
    save_ngramlm_model(a, path)

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    b.write.parquet(f"{drop}/shard_b")
    svc = CorpusIndexService(spark, docs_dir=drop, ngram_model=path)
    assert svc.tick()["docs"] == [f"{drop}/shard_b"]
    assert read_manifest(path)["last_txn"]["tick-docs"] == 1
    assert _probe_rows(ppl1_model_logloss(docs, path)) == _rows(
        ppl1_unigram_logloss(docs)
    )
    # quiet tick: no re-fold
    assert svc.tick() == {"docs": [], "embeddings": [], "events": []}
    assert read_manifest(path)["epoch"] == 1


def test_null_text_corpus_build_yields_readable_empty_model(spark, tmp_path):
    """A corpus of NULL-text docs writes data-file-less partitioned dirs
    for BOTH tables; the explicit read schemas must make that a readable
    EMPTY model (probes yield nothing, later appends work) instead of a
    schema-inference abort — and a single-token corpus must land an
    empty BIGRAM table beside a live unigram table."""
    null_docs = spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, None, "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    path = str(tmp_path / "lm_empty")
    save_ngramlm_model(null_docs, path)
    assert load_unigram_counts(spark, path).count() == 0
    assert load_bigram_counts(spark, path).count() == 0
    assert ppl1_model_logloss(null_docs, path).count() == 0

    # single-token docs: unigrams live, bigrams still a readable empty dir
    single = spark.createDataFrame(
        [(10, "hello", "en", "s", 5), (11, "hello", "en", "s", 5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    update_ngramlm_model(single, path)
    assert load_unigram_counts(spark, path).count() == 1
    assert load_bigram_counts(spark, path).count() == 0
    assert _probe_rows(ppl1_model_logloss(single, path)) == _rows(
        ppl1_unigram_logloss(single)
    )

def test_foreign_probe_surfaces_oov_instead_of_silent_drop(spark, sf_dir, tmp_path):
    """A probe set containing tokens the model never saw must NOT
    silently shrink n_tokens/total_bits (the understated-log-loss trap):
    the unseen mass lands in the explicit `n_oov` column, in-vocabulary
    tokens still score exactly, and an all-OOV doc appears with zero
    covered tokens rather than vanishing from the result."""
    train = spark.createDataFrame(
        [(1, "alpha beta alpha", "en", "s", 16), (2, "beta gamma", "en", "s", 10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    path = str(tmp_path / "lm")
    save_ngramlm_model(train, path)

    probe = spark.createDataFrame(
        [
            (10, "alpha zzz beta", "en", "s", 14),  # 1 OOV of 3 tokens
            (11, "qqq rrr", "en", "s", 7),  # all OOV
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    r1 = {r["doc_id"]: r for r in ppl1_model_logloss(probe, path).collect()}
    assert r1[10]["n_tokens"] == 2 and r1[10]["n_oov"] == 1
    assert r1[10]["total_bits"] > 0.0
    assert r1[11]["n_tokens"] == 0 and r1[11]["n_oov"] == 2
    assert r1[11]["total_bits"] == 0.0

    # bigram probes: doc 10 has bigrams (alpha,zzz),(zzz,beta) — both OOV
    # as bigrams even though 2 of 3 unigrams are known
    r2 = {r["doc_id"]: r for r in ppl2_model_logloss(probe, path).collect()}
    assert r2[10]["n_bigrams"] == 0 and r2[10]["n_oov"] == 2
    rk = {r["doc_id"]: r for r in kn1_model_logloss(probe, path).collect()}
    assert rk[10]["n_bigrams"] == 0 and rk[10]["n_oov"] == 2

    # a probe that mixes seen and unseen bigrams scores the seen ones
    probe2 = spark.createDataFrame(
        [(20, "alpha beta nope", "en", "s", 15)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    r3 = ppl2_model_logloss(probe2, path).collect()[0]
    assert r3["n_bigrams"] == 1 and r3["n_oov"] == 1 and r3["total_bits"] > 0.0


def test_unseen_invocab_bigrams_score_via_smoothing(spark, tmp_path):
    """The point of add-1 / Kneser-Ney smoothing is finite probability
    for bigrams the model never saw but whose tokens it knows; a probe
    must score those via the smoothed formula (c_bg -> 0) and reserve
    n_oov for truly unscoreable bigrams (r8 advice). Train bigrams:
    (alpha,beta), (beta,alpha), (beta,gamma); vocab {alpha,beta,gamma},
    V = 3, n_types = 3."""
    import math

    train = spark.createDataFrame(
        [(1, "alpha beta alpha", "en", "s", 16), (2, "beta gamma", "en", "s", 10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    path = str(tmp_path / "lm")
    save_ngramlm_model(train, path)

    probe = spark.createDataFrame(
        [
            # (gamma,alpha): unseen bigram, both in vocab; gamma was
            # never a PREFIX (c_prev=0) — Laplace floors at 1/(0+V)
            (30, "gamma alpha", "en", "s", 11),
            # (alpha,gamma): unseen bigram; alpha IS a prefix
            # (c(alpha,·)=1, N1+(alpha,·)=1) and gamma IS a continuation
            # (N1+(·,gamma)=1) — KN backs off to λ(alpha)·p_cont(gamma)
            (31, "alpha gamma", "en", "s", 11),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    r2 = {r["doc_id"]: r for r in ppl2_model_logloss(probe, path).collect()}
    assert r2[30]["n_bigrams"] == 1 and r2[30]["n_oov"] == 0
    assert abs(r2[30]["total_bits"] - math.log2(3.0)) < 1e-6  # -log2(1/(0+3))
    assert r2[31]["n_bigrams"] == 1 and r2[31]["n_oov"] == 0
    # c(alpha,·)=1 (alpha->beta once): -log2((0+1)/(1+3)) = 2 bits
    assert abs(r2[31]["total_bits"] - 2.0) < 1e-6

    rk = {r["doc_id"]: r for r in kn1_model_logloss(probe, path).collect()}
    # (gamma,alpha): gamma never a prefix -> no backoff weight -> OOV
    assert rk[30]["n_bigrams"] == 0 and rk[30]["n_oov"] == 1
    assert rk[30]["total_bits"] == 0.0
    # (alpha,gamma): max(0-0.75,0)/1 + (0.75*1/1)*(1/3) = 0.25 -> 2 bits
    assert rk[31]["n_bigrams"] == 1 and rk[31]["n_oov"] == 0
    assert abs(rk[31]["total_bits"] - 2.0) < 1e-6
