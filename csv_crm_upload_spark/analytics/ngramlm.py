"""Persisted n-gram language model — the twelfth artifact under the
shared epoch-manifest protocol (operators/manifest.py): the corpus's
unigram + bigram count tables, maintained incrementally, powering the
whole LM-scoring family (ppl1 unigram log-loss, ppl2 Laplace bigram
log-loss, kn1 interpolated Kneser-Ney) WITHOUT re-counting the corpus
per probe. This is the production split of the inline operators: the
inline forms re-derive the LM from the scored corpus every call (their
oracle design); at 100 TB a pipeline counts once, folds appends, and
scores any probe set against the stored statistics.

Layout (the substr-index conventions — epoch-RANGED ADDITIVE counts):
  unigrams/epoch=E/tbucket=B/  (tok_h, n)        token-instance counts
  bigrams/epoch=E/bbucket=B/   (bg_h, prev_h, w_h, n)  bigram-instance
                               counts keyed by the md5-60 bigram hash,
                               carrying BOTH half hashes so the prefix
                               marginals (c_prev, N1+(prev,*)) and the
                               continuation counts (N1+(*,w)) Kneser-Ney
                               needs are RE-COMBINES of this one table
  MANIFEST                     epoch / base_epoch / n_buckets (+ last_txn)

Stored keys are 60-bit token/bigram HASHES, not text: 8 bytes per
distinct type, the substr-index trade — a collision can only MERGE two
types' counts, and over the fixtures every indexed probe is
value-identical to the inline operator (test-pinned).

Counts are ADDITIVE, so appends are O(new docs) with NO reconciliation:
a type's corpus-wide count is the SUM of its per-epoch counts, and every
DERIVED statistic (vocabulary size, prefix marginals, continuation type
counts, bigram type total) is computed from the SUMMED table — which is
why incremental ≡ rebuild holds bit-exactly for all three probes.
Probes aggregate the live [base_epoch, epoch] range; OPTIMIZE sum-merges
the chain back to one epoch (exact by additivity).

Maintenance contract (shared with every other artifact):
  * build  — save_ngramlm_model: atomic rebuild-over-live
  * append — update_ngramlm_model: O(new docs), additive fold
  * OPTIMIZE — compact_ngramlm_model (sum-merged, not just unioned)
  * gc     — rides CorpusIndexService.vacuum via INDEX_LAYOUTS

Reference: csv-crm-upload has no LM surface; this extends the
training-ops mandate (SURVEY.md §2 addendum) the way BM25/NB/BPE/PCA do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.fanout import cluster_for_write, fan_out
from csv_crm_upload_spark.analytics.textstats import _word_ngrams, norm_tokens
from csv_crm_upload_spark.functions.hashing import md5_60

DEFAULT_N_BUCKETS = 16
NGRAMLM_SUBDIRS = ["unigrams", "bigrams"]

#: derived-key format stamp (manifest.check_key_format — the substr
#: gram_format lesson generalized, r9): tok_h = md5-60 of norm_tokens
#: tokens; bg_h = md5-60 of the \x01-joined bigram. Bump when the
#: tokenization, the bigram join byte, or the hash changes.
KEY_FORMAT = "normtok-md560-x01bigram-v1"

#: explicit read schemas (data + partition columns): a corpus of
#: NULL-text docs (or, for bigrams, all-single-token docs) writes a
#: data-file-less partitioned dir that schema inference cannot read —
#: the explicit schema makes it a readable empty model instead (the
#: substr-index review lesson applied from day one)
_UNIGRAMS_SCHEMA = "tok_h long, n long, tbucket int, epoch int"
_BIGRAMS_SCHEMA = "bg_h long, prev_h long, w_h long, n long, bbucket int, epoch int"


def _read_unigrams(spark, path: str):
    return spark.read.schema(_UNIGRAMS_SCHEMA).parquet(f"{path}/unigrams")


def _read_bigrams(spark, path: str):
    return spark.read.schema(_BIGRAMS_SCHEMA).parquet(f"{path}/bigrams")


def _lm_counts(
    documents: DataFrame, n_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """((tok_h, n, tbucket), (bg_h, prev_h, w_h, n, bbucket)) — the given
    documents' token- and bigram-instance counts, derived from the SAME
    tokenization every text operator shares (textstats.norm_tokens /
    _word_ngrams — one definition, so the model can never desynchronize
    from the inline LM operators or the DuckDB oracles)."""
    base = fan_out(documents.filter(F.col("text").isNotNull()))
    uni = (
        base.select(F.explode(norm_tokens()).alias("tok"))
        .select(md5_60(F.col("tok")).alias("tok_h"))
        .groupBy("tok_h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("tbucket", F.pmod(F.col("tok_h"), F.lit(n_buckets)))
    )
    bg = F.col("bg")
    bi = (
        base.select(F.explode(_word_ngrams(norm_tokens(), 2)).alias("bg"))
        .select(
            md5_60(bg).alias("bg_h"),
            md5_60(F.split(bg, "\x01").getItem(0)).alias("prev_h"),
            md5_60(F.split(bg, "\x01").getItem(1)).alias("w_h"),
        )
        .groupBy("bg_h", "prev_h", "w_h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("bbucket", F.pmod(F.col("bg_h"), F.lit(n_buckets)))
    )
    return uni, bi


def save_ngramlm_model(
    documents: DataFrame, path: str, n_buckets: int = DEFAULT_N_BUCKETS
) -> None:
    """Count the corpus once. Rebuild over a LIVE model is atomic
    (epoch + base_epoch advance in one manifest commit; prior last_txn
    preserved — the streaming replay guard)."""
    from csv_crm_upload_spark.operators.manifest import commit_manifest, rebuild_epoch

    new_epoch, prior = rebuild_epoch(path)
    uni, bi = _lm_counts(documents, n_buckets)
    cluster_for_write(uni, "tbucket").write.mode("overwrite").partitionBy(
        "tbucket"
    ).parquet(f"{path}/unigrams/epoch={new_epoch}")
    cluster_for_write(bi, "bbucket").write.mode("overwrite").partitionBy(
        "bbucket"
    ).parquet(f"{path}/bigrams/epoch={new_epoch}")
    commit_manifest(
        path,
        {
            **prior,
            "epoch": new_epoch,
            "base_epoch": new_epoch,
            "n_buckets": n_buckets,
            "key_format": KEY_FORMAT,
        },
    )


def load_unigram_counts(spark, path: str) -> DataFrame:
    """The corpus-wide (tok_h, n) table — the live epoch range SUMMED per
    token (additive ⇒ exactly a rebuild's table; manifest-resolved, so a
    racing update or compaction is invisible — old-or-new, never
    partial)."""
    from csv_crm_upload_spark.operators.manifest import check_key_format, read_manifest

    m = read_manifest(path)
    check_key_format(m, path, KEY_FORMAT, missing_ok=True)
    epoch, base = m["epoch"], m.get("base_epoch", 0)
    return (
        _read_unigrams(spark, path)
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .groupBy("tok_h")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def load_bigram_counts(spark, path: str) -> DataFrame:
    """The corpus-wide (bg_h, prev_h, w_h, n) table, summed over the live
    epoch range. prev_h/w_h are functions of bg_h (max is a no-op merge
    of identical values — never a cross-type mix absent a 60-bit
    collision)."""
    from csv_crm_upload_spark.operators.manifest import check_key_format, read_manifest

    m = read_manifest(path)
    check_key_format(m, path, KEY_FORMAT, missing_ok=True)
    epoch, base = m["epoch"], m.get("base_epoch", 0)
    return (
        _read_bigrams(spark, path)
        .filter((F.col("epoch") >= base) & (F.col("epoch") <= epoch))
        .groupBy("bg_h")
        .agg(
            F.max("prev_h").alias("prev_h"),
            F.max("w_h").alias("w_h"),
            F.sum("n").cast("long").alias("n"),
        )
    )


def update_ngramlm_model(
    new_documents: DataFrame, path: str, txn: tuple[str, int] | None = None
) -> None:
    """Fold a corpus APPEND: count ONLY the new documents and commit the
    deltas as a new epoch — additivity makes every summed table (and
    every statistic derived from it) EXACTLY what a rebuild over the
    full corpus would produce (test-pinned). Precondition (as for any
    index append): new doc_ids are not already counted."""
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
    remove_orphan_epochs(path, NGRAMLM_SUBDIRS, epoch)
    uni, bi = _lm_counts(new_documents, m["n_buckets"])
    uni = uni.localCheckpoint(eager=True)
    bi = bi.localCheckpoint(eager=True)
    if not uni.limit(1).count():
        return  # no non-NULL text in the delta — clean no-op
    cluster_for_write(uni, "tbucket").write.mode("overwrite").partitionBy(
        "tbucket"
    ).parquet(f"{path}/unigrams/epoch={epoch + 1}")
    cluster_for_write(bi, "bbucket").write.mode("overwrite").partitionBy(
        "bbucket"
    ).parquet(f"{path}/bigrams/epoch={epoch + 1}")
    commit_manifest(path, with_txn({**m, "epoch": epoch + 1}, txn))


def compact_ngramlm_model(spark, path: str) -> bool:
    """OPTIMIZE: SUM-merge the live chain of BOTH tables into one epoch
    (exact by additivity — a union-only compactor would double-store
    types seen in several epochs) in one atomic manifest commit.
    Returns False when already compact."""
    from csv_crm_upload_spark.operators.manifest import (
        check_key_format,
        commit_manifest,
        read_manifest,
        remove_orphan_epochs,
    )

    m = read_manifest(path)
    check_key_format(m, path, KEY_FORMAT, missing_ok=True)
    epoch, base = m["epoch"], m.get("base_epoch", 0)
    if epoch == base:
        return False
    remove_orphan_epochs(path, NGRAMLM_SUBDIRS, epoch)
    live = lambda df: df.filter(
        (F.col("epoch") >= base) & (F.col("epoch") <= epoch)
    )
    nxt = epoch + 1
    (
        live(_read_unigrams(spark, path))
        .groupBy("tok_h")
        .agg(F.sum("n").cast("long").alias("n"))
        .withColumn("tbucket", F.pmod(F.col("tok_h"), F.lit(m["n_buckets"])))
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(f"{path}/unigrams/epoch={nxt}")
    )
    (
        live(_read_bigrams(spark, path))
        .groupBy("bg_h")
        .agg(
            F.max("prev_h").alias("prev_h"),
            F.max("w_h").alias("w_h"),
            F.sum("n").cast("long").alias("n"),
        )
        .withColumn("bbucket", F.pmod(F.col("bg_h"), F.lit(m["n_buckets"])))
        .write.mode("overwrite")
        .partitionBy("bbucket")
        .parquet(f"{path}/bigrams/epoch={nxt}")
    )
    commit_manifest(path, {**m, "epoch": nxt, "base_epoch": nxt})
    return True


# ---------------------------------------------------------------------------
# probes — the three LM scores against the PERSISTED statistics. Each is
# the inline operator's formula verbatim (same fixed double expression
# tree, same 9-dp → DECIMAL(20,12) weighted-sum discipline), with the
# corpus statistics read from the model instead of re-counted; over the
# indexed corpus itself each is value-identical to its inline twin
# (test-pinned). Plan shape: the probe side contributes one map-only
# token/bigram pass + one (doc, key) combining agg; the model side is
# bucket-partitioned summed counts; joins are keyed on the 60-bit
# hashes; the scalar statistics (totals, vocab size, type count) are
# 1-row broadcasts.
# ---------------------------------------------------------------------------


def ppl1_model_logloss(documents: DataFrame, path: str) -> DataFrame:
    """Per-doc unigram log-loss of `documents` under the PERSISTED LM —
    textstats.ppl1_unigram_logloss with stored counts. Probe tokens the
    model never saw have no finite bits (count 0 → log2(0)); instead of
    silently dropping them from n_tokens/total_bits (which understates
    the loss for non-indexed probe sets), the LEFT join surfaces them in
    an explicit `n_oov` column: n_tokens/total_bits cover exactly the
    in-vocabulary tokens, n_oov counts the excluded ones, so a self-probe
    (the indexed corpus, where n_oov is provably 0) is value-identical to
    the inline twin modulo the extra column, and a foreign probe cannot
    misreport coverage."""
    spark = documents.sparkSession
    toks = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(norm_tokens()).alias("tok")
    )
    per_doc = toks.groupBy("doc_id", md5_60(F.col("tok")).alias("tok_h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    counts = load_unigram_counts(spark, path).withColumnRenamed("n", "n_tok")
    total = counts.agg(F.sum("n_tok").alias("n_total"))
    seen = F.col("n_tok").isNotNull()
    bits = F.round(
        -F.log2(F.col("n_tok").cast("double") / F.col("n_total")), 9
    ).cast("decimal(20,12)")
    contrib = F.when(seen, F.col("c").cast("decimal(12,0)") * bits)
    return (
        per_doc.join(counts, "tok_h", "left")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum(F.when(seen, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            F.coalesce(F.sum(contrib).cast("double"), F.lit(0.0)).alias(
                "total_bits"
            ),
            F.coalesce(F.sum(F.when(~seen, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_oov"),
        )
        .orderBy("doc_id")
    )


def _probe_bigrams(documents: DataFrame) -> DataFrame:
    """(doc_id, bg_h, p_h, w_h, c) — the probe's bigram instance counts
    with both component hashes derived by the \\x01-SPLIT of the joined
    gram: the ONE convention the whole LM family shares (_lm_counts'
    stored prev_h/w_h, the inline operators' prefix marginals, and the
    DuckDB oracles all split the gram the same way), so a probe's
    component hashes can never desynchronize from the model's stored
    ones. A token CONTAINING \\x01 mis-segments — identically in every
    path and both engines, the documented price of the join byte."""
    bg = F.col("bg")
    return (
        fan_out(documents.filter(F.col("text").isNotNull()))
        .select("doc_id", F.explode(_word_ngrams(norm_tokens(), 2)).alias("bg"))
        .groupBy(
            "doc_id",
            md5_60(bg).alias("bg_h"),
            md5_60(F.split(bg, "\x01").getItem(0)).alias("p_h"),
            md5_60(F.split(bg, "\x01").getItem(1)).alias("w_h"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def ppl2_model_logloss(documents: DataFrame, path: str) -> DataFrame:
    """Per-doc Laplace bigram log-loss under the PERSISTED LM —
    textstats.ppl2_bigram_logloss with stored counts: the prefix
    marginal c(prev,·) is a re-combine of the stored bigram table and
    the vocabulary size V is the stored unigram table's row count.

    Unseen bigrams whose BOTH tokens are in-vocabulary score via the
    smoothed formula itself — c(prev,w) coalesced to 0, c(prev,·)
    coalesced to 0 (a vocab token never seen as a prefix still gets the
    Laplace floor 1/(0+V)) — because add-1 smoothing exists precisely to
    give unseen-but-in-vocab bigrams finite probability; excluding them
    understated a foreign probe's loss (r8 advice). `n_oov` counts only
    bigrams the model truly cannot score: either token absent from the
    stored vocabulary (V doesn't cover it). On a self-probe every bigram
    is seen and both tokens are in-vocab, so this is value-identical to
    the inline twin (test-pinned)."""
    spark = documents.sparkSession
    per_doc = _probe_bigrams(documents)
    bgc = load_bigram_counts(spark, path).select(
        "bg_h", F.col("n").alias("c_bg")
    )
    prev_counts = (
        load_bigram_counts(spark, path)
        .groupBy(F.col("prev_h").alias("p_h"))
        .agg(F.sum("n").alias("c_prev"))
    )
    uni = load_unigram_counts(spark, path)
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    prev_iv = uni.select(
        F.col("tok_h").alias("p_h"), F.lit(True).alias("prev_iv")
    )
    w_iv = uni.select(F.col("tok_h").alias("w_h"), F.lit(True).alias("w_iv"))
    scoreable = F.coalesce(F.col("prev_iv"), F.lit(False)) & F.coalesce(
        F.col("w_iv"), F.lit(False)
    )
    bits = F.round(
        -F.log2(
            (F.coalesce(F.col("c_bg"), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v")).cast(
                "double"
            )
        ),
        9,
    ).cast("decimal(20,12)")
    contrib = F.when(scoreable, F.col("c").cast("decimal(12,0)") * bits)
    return (
        per_doc.join(bgc, "bg_h", "left")
        .join(prev_counts, "p_h", "left")
        .join(prev_iv, "p_h", "left")
        .join(w_iv, "w_h", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum(F.when(scoreable, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.coalesce(F.sum(contrib).cast("double"), F.lit(0.0)).alias(
                "total_bits"
            ),
            F.coalesce(F.sum(F.when(~scoreable, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_oov"),
        )
        .orderBy("doc_id")
    )


def kn1_model_logloss(documents: DataFrame, path: str) -> DataFrame:
    """Per-doc interpolated Kneser-Ney bigram log-loss under the
    PERSISTED LM — textstats.kn1_kneser_ney_logloss with every
    statistic (c(prev,w), c(prev,·), N1+(prev,·), N1+(·,w), |types|)
    derived from the stored SUMMED bigram table, D = 0.75.

    Unseen bigrams score via KN's own backoff whenever the model CAN
    back off — prev seen as a prefix (c(prev,·) > 0, so the discount
    mass λ(prev) is defined) and w seen as a continuation
    (N1+(·,w) > 0, so p_cont(w) > 0): c(prev,w) coalesces to 0 and the
    discounted term floors at 0 via GREATEST, leaving
    λ(prev)·p_cont(w) — the backoff mass KN reserves for exactly these
    bigrams; excluding them discarded the smoothing and understated a
    foreign probe's loss (r8 advice). `n_oov` counts only bigrams the
    model truly cannot score finitely: prev never a prefix (no backoff
    weight) or w never a continuation (p_cont = 0 ⇒ −log2 = ∞). On a
    self-probe every bigram is seen, which implies both joins hit, so
    this is value-identical to the inline twin (test-pinned)."""
    spark = documents.sparkSession
    per_doc = _probe_bigrams(documents)
    bgc = load_bigram_counts(spark, path)
    prev_stats = bgc.groupBy(F.col("prev_h").alias("p_h")).agg(
        F.sum("n").alias("c_prev"), F.count(F.lit(1)).alias("n1p_prev")
    )
    cont_counts = bgc.groupBy("w_h").agg(F.count(F.lit(1)).alias("n1p_w"))
    n_types = bgc.agg(F.count(F.lit(1)).alias("n_types"))
    c_bg0 = F.coalesce(F.col("c_bg"), F.lit(0)).cast("double")
    p_kn = (
        F.greatest(c_bg0 - F.lit(0.75), F.lit(0.0))
        / F.col("c_prev").cast("double")
    ) + (
        (
            (F.lit(0.75) * F.col("n1p_prev").cast("double"))
            / F.col("c_prev").cast("double")
        )
        * (F.col("n1p_w").cast("double") / F.col("n_types").cast("double"))
    )
    scoreable = F.col("c_prev").isNotNull() & F.col("n1p_w").isNotNull()
    bits = F.round(-F.log2(p_kn), 9).cast("decimal(20,12)")
    contrib = F.when(scoreable, F.col("c").cast("decimal(12,0)") * bits)
    return (
        per_doc.join(bgc.select("bg_h", F.col("n").alias("c_bg")), "bg_h", "left")
        .join(prev_stats, "p_h", "left")
        .join(cont_counts, "w_h", "left")
        .crossJoin(F.broadcast(n_types))
        .groupBy("doc_id")
        .agg(
            F.coalesce(F.sum(F.when(scoreable, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.coalesce(F.sum(contrib).cast("double"), F.lit(0.0)).alias(
                "total_bits"
            ),
            F.coalesce(F.sum(F.when(~scoreable, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("n_oov"),
        )
        .orderBy("doc_id")
    )
