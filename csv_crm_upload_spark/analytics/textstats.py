"""Text analysis over the `documents` table — language-ID heuristic,
quality scoring, token counting, document fingerprinting. All pure Column
expressions (JVM-side, codegen'd): no Python UDFs in any hot path, so
these scan-shaped jobs stay embarrassingly parallel at 100 TB.

Cross-engine notes: token splitting uses a regex both Spark and DuckDB
implement identically; fingerprints are md5 of normalized text (identical
hex in both engines); ratios are rounded to fixed decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic English stopword markers for the lang-ID heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _tokens(col: str = "text") -> F.Column:
    """Whitespace tokenization of trimmed text; empty text → empty array."""
    t = F.trim(F.col(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def t1_token_count(documents: DataFrame) -> DataFrame:
    """Whitespace + word-regex token counts per document."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        # BPE-ish: words, numbers, or single non-space symbols
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "n_bpeish_tokens"
        ),
        F.length("text").alias("n_chars_actual"),
    )


def t2_quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean token length — and a composite score. Mirrors the classic
    C4/Gopher-style filters in spirit; thresholds are illustrative."""
    toks = _tokens()
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), 0))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(EN_STOPWORDS)))
    punct_ratio = F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 6)
    mean_tok_len = F.round(
        (n_chars - n_tokens + 1).cast("double") / F.greatest(n_tokens, F.lit(1)), 6
    )
    score = F.round(
        F.when(n_tokens < 5, 0.0)
        .otherwise(
            F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * (F.lit(1.0) - punct_ratio)
        ),
        6,
    )
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
        score.alias("quality_score"),
    )


def t3_lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-marker language heuristic: English-stopword token ratio;
    >= 0.08 → 'en' else 'other'. (The corpus vocabulary is synthetic, so
    this demonstrates the operator shape — ratio + threshold argmax — not
    linguistic accuracy.)"""
    toks = _tokens()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(EN_STOPWORDS)))
    ratio = F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 6)
    return documents.select(
        "doc_id",
        "lang",
        ratio.alias("en_stopword_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def t4_fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 over whitespace-normalized
    lowercased text — the exact-dedup key and the cheap shard-stable
    content id at scale."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return documents.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.substring(F.md5(normalized), 1, 8).alias("fingerprint_short"),
    )
