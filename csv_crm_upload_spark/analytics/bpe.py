"""Distributed BPE tokenizer training (fixed merge steps) — the
vocabulary-induction step of a training-data pipeline (Sennrich et al.
2016, arXiv:1508.07909): learn the S most frequent adjacent-symbol
merges over the corpus vocabulary.

Spark shape (the reason BPE distributes well):
  * training runs over the VOCABULARY (distinct word, frequency) — one
    combining shuffle collapses the corpus to its word list, and every
    later step touches only that vocab table (mem-bounded: vocab grows
    ~log corpus);
  * each merge step is one map pass (bigram explode over the spaced
    symbol string) + one combining groupBy to pair counts, then a
    1-ROW driver collect of the argmax pair — the bounded
    scalar-per-iteration pattern of kmeans1/pr1;
  * applying a merge is a literal string replace riding the next scan —
    no join, no shuffle.

Cross-engine determinism (oracle-paired, like kmeans1): the greedy
leftmost non-overlapping merge is exactly `replace()` semantics on a
LEADING-space symbol encoding (' l o w'; the pattern ' x y' consumes
its own leading space so a replacement can never overlap the next
match — both engines' replace scans left-to-right and resumes after
the replacement); argmax ties break (count DESC, left, right) in both
engines; counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csv_crm_upload_spark.analytics.textstats import norm_tokens


def _spaced_symbols(word: F.Column) -> F.Column:
    """' l o w' — every character prefixed by a space (the leading-space
    encoding the merge replace depends on)."""
    return F.regexp_replace(word, "(.)", " $1")


def bpe1_merge_steps(documents: DataFrame, steps: int = 3) -> DataFrame:
    """The first `steps` BPE merges learned from the documents corpus —
    (step, left, right, n_occurrences): at each step the most frequent
    adjacent symbol pair across the frequency-weighted vocabulary is
    merged everywhere and the next step recounts.

    n_occurrences is the pair count that drove the argmax: adjacent
    symbol pairs counted the way Sennrich's get_stats counts them
    (every adjacent position, so 'a a a' counts (a,a) twice), weighted
    by word frequency; the APPLY is greedy leftmost non-overlapping,
    also per the reference implementation.
    """
    base = (
        documents.filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(F.explode(norm_tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_spaced_symbols(F.col("word")).alias("s"), "freq")
    ).persist()
    vocab = base
    try:
        merges: list[tuple[int, str, str, int]] = []
        for step in range(1, steps + 1):
            syms = F.split(F.substring(F.col("s"), 2, 1 << 30), " ")
            starts = F.sequence(F.lit(1), F.size(syms) - 1)
            pair = F.concat_ws(
                "\x01",
                F.element_at(syms, F.col("i")),
                F.element_at(syms, F.col("i") + 1),
            )
            best = (
                vocab.filter(F.size(syms) >= 2)
                .select("freq", F.explode(starts).alias("i"), F.col("s"))
                .select("freq", pair.alias("pair"))
                .groupBy("pair")
                .agg(F.sum("freq").cast("bigint").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "pair")
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right = best[0]["pair"].split("\x01")
            merges.append((step, left, right, int(best[0]["cnt"])))
            vocab = vocab.select(
                F.replace(
                    F.col("s"),
                    F.lit(f" {left} {right}"),
                    F.lit(f" {left}{right}"),
                ).alias("s"),
                "freq",
            )
        spark = documents.sparkSession
        return spark.createDataFrame(
            merges, "step int, left string, right string, n_occurrences bigint"
        )
    finally:
        base.unpersist()


def bpe2_segment(
    documents: DataFrame,
    steps: int = 3,
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Tokenizer INFERENCE: apply ordered BPE merges (greedy leftmost
    non-overlapping — the same replace encoding as training) to every
    word occurrence and report per-doc segmentation stats —
    (doc_id, n_words, n_chars_tokenized, n_tokens): n_tokens is the
    doc's symbol count under the trained tokenizer (== n_chars before
    any merge; each applied merge occurrence removes one symbol), the
    compression readout a tokenizer sweep grades.

    `rules` is the train-once/apply-many path: pass the (left, right)
    list a prior `bpe1_merge_steps(...).collect()` learned (in step
    order) and NO training pass runs — the corpus is scanned exactly
    once. When omitted, the first `steps` merges are (re)learned from
    `documents` first — the self-contained oracle-paired form.

    Scale shape: training (when it runs) is bpe1 (vocab-bounded);
    application is MAP-ONLY — chained literal replaces riding the doc
    scan, then one combining groupBy(doc_id). The merge rules ride into
    the plan as literals (the broadcast-centroid pattern of kmeans)."""
    if rules is None:
        rules = [
            (r["left"], r["right"])
            for r in bpe1_merge_steps(documents, steps).orderBy("step").collect()
        ]
    words = documents.filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select("doc_id", F.explode(norm_tokens()).alias("word"))
    s = _spaced_symbols(F.col("word"))
    for left, right in rules:
        s = F.replace(s, F.lit(f" {left} {right}"), F.lit(f" {left}{right}"))
    toks = F.split(F.substring(s, 2, 1 << 30), " ")
    return (
        words.select(
            "doc_id",
            F.length("word").alias("n_chars"),
            F.size(toks).alias("n_toks"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_chars").cast("bigint").alias("n_chars_tokenized"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def bpe3_vocab_coverage(
    documents: DataFrame,
    steps: int = 3,
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Tokenizer coverage readout — the acceptance metric of a tokenizer
    sweep: of all word OCCURRENCES in the corpus, how many are fully
    merged to a single vocabulary symbol by the learned merges
    (`n_fully_merged`), with the corpus-wide coverage rate. A tokenizer
    whose top merges cover little of the corpus wastes sequence length.

    One row: (n_words, n_fully_merged, coverage_rate ROUND 6 — integer
    ratio, engine-exact). `rules` as in bpe2_segment: pass pre-learned
    merges to skip the training pass. Application is map-only chained
    replaces riding the scan; the readout is one 1-row aggregate."""
    if rules is None:
        rules = [
            (r["left"], r["right"])
            for r in bpe1_merge_steps(documents, steps).orderBy("step").collect()
        ]
    words = documents.filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select(F.explode(norm_tokens()).alias("word"))
    s = _spaced_symbols(F.col("word"))
    for left, right in rules:
        s = F.replace(s, F.lit(f" {left} {right}"), F.lit(f" {left}{right}"))
    n_toks = F.size(F.split(F.substring(s, 2, 1 << 30), " "))
    return words.select(
        (n_toks == 1).cast("int").alias("full")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("full").cast("long").alias("n_fully_merged"),
        F.round(
            F.sum("full").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("coverage_rate"),
    )
