"""Distributed BPE training: exact merge sequence on the Sennrich
example corpus, overlap counting vs greedy apply, early stop."""

from __future__ import annotations

from csv_crm_upload_spark.analytics.bpe import bpe1_merge_steps


def _docs(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_bpe_learns_sennrich_example_merges(spark):
    """vocab {low:5, lower:2, newest:6, widest:3} — step 1 ties (e,s)
    and (s,t) at 9, lexicographic tie-break picks (e,s); step 2 merges
    the new 'es' symbol with t (multi-char merge chaining); step 3 ties
    (l,o)/(o,w) at 7, picks (l,o)."""
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    out = [tuple(r) for r in bpe1_merge_steps(_docs(spark, [corpus])).collect()]
    assert out == [(1, "e", "s", 9), (2, "es", "t", 9), (3, "l", "o", 7)]


def test_bpe_counts_overlapping_pairs_but_applies_greedily(spark):
    """'aaaa' x3: (a,a) counts 9 (3 adjacent positions x freq 3 — the
    Sennrich overlapping count), but the merge applies leftmost
    non-overlapping, leaving 'aa aa'; step 2 merges (aa,aa); then the
    vocab is a single symbol and training stops early."""
    out = [tuple(r) for r in bpe1_merge_steps(_docs(spark, ["aaaa aaaa aaaa"])).collect()]
    assert out == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


def test_bpe_empty_corpus_yields_no_merges(spark):
    out = bpe1_merge_steps(_docs(spark, ["x", "y"])).collect()
    assert out == []  # single-char words: no pairs anywhere


def test_bpe_segment_compression_on_sennrich_corpus(spark):
    """After merges (e,s), (es,t), (l,o): low → 'lo w' (2), lower →
    'lo w e r' (4), newest → 'n e w est' (4), widest → 'w i d est' (4);
    16 words, 79 chars, 54 tokens."""
    from csv_crm_upload_spark.analytics.bpe import bpe2_segment

    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    out = [tuple(r) for r in bpe2_segment(_docs(spark, [corpus])).collect()]
    assert out == [(0, 16, 79, 5 * 2 + 2 * 4 + 6 * 4 + 3 * 4)]


def test_bpe_segment_with_saved_rules_skips_training(spark):
    """train-once/apply-many: passing pre-learned rules yields the same
    segmentation as the self-training path — and applies the rules
    as-given (no retrain pass over the corpus)."""
    from csv_crm_upload_spark.analytics.bpe import bpe2_segment

    docs = _docs(spark, ["newest widest low lower newest"])
    rules = [
        (r["left"], r["right"])
        for r in bpe1_merge_steps(docs).orderBy("step").collect()
    ]
    retrained = {tuple(r) for r in bpe2_segment(docs).collect()}
    saved = {tuple(r) for r in bpe2_segment(docs, rules=rules).collect()}
    assert saved == retrained
    # rules applied verbatim on a DIFFERENT corpus (no retraining: the
    # merges learned above, not this corpus's own best pairs, decide)
    other = _docs(spark, ["est est"])
    out = {tuple(r) for r in bpe2_segment(other, rules=rules).collect()}
    # 'est' under rules (e,s),(es,t),(l,o): e s t -> es t -> est = 1 token
    assert out == {(0, 2, 6, 2)}


def test_bpe_segment_degenerate_corpus_matches_early_stop(spark):
    """A corpus admitting fewer merges than `steps` (here 1 < 3): bpe2
    must apply the learned prefix and still return per-doc rows — the
    ADVICE-flagged case where the unrolled oracle used to annihilate."""
    from csv_crm_upload_spark.analytics.bpe import bpe2_segment

    docs = _docs(spark, ["ab ab"])
    assert [tuple(r) for r in bpe1_merge_steps(docs).collect()] == [(1, "a", "b", 2)]
    # both words collapse to the single merged token 'ab'
    assert [tuple(r) for r in bpe2_segment(docs).collect()] == [(0, 2, 4, 2)]
