"""Multinomial Naive Bayes langid: perfect separation on disjoint
vocabularies, prior-driven tie behavior, determinism."""

from __future__ import annotations

from csv_crm_upload_spark.analytics.nbayes import nb1_langid_confusion


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_nb_separates_disjoint_vocabularies(spark):
    """Two classes with disjoint token sets classify perfectly — the
    confusion matrix is exactly diagonal."""
    rows = [(i, "alpha beta gamma alpha", "aa", "s", 0) for i in range(10)] + [
        (100 + i, "delta epsilon zeta zeta", "bb", "s", 0) for i in range(10)
    ]
    out = sorted(tuple(r) for r in nb1_langid_confusion(_docs(spark, rows)).collect())
    assert out == [("aa", "aa", 10), ("bb", "bb", 10)]


def test_nb_prior_decides_unseen_heavy_docs(spark):
    """A doc made only of tokens both classes share lands on the class
    the prior + shared-token mass favors (training is self-consistent:
    every doc, including this one, is in the training set)."""
    shared = "omega omega omega"
    rows = (
        [(i, "alpha beta " + shared, "aa", "s", 0) for i in range(12)]
        + [(100 + i, "delta zeta " + shared, "bb", "s", 0) for i in range(4)]
        + [(200, shared, "bb", "s", 0)]  # neutral doc, true class bb
    )
    out = {(r["lang"], r["pred_lang"]): r["n_docs"]
           for r in nb1_langid_confusion(_docs(spark, rows)).collect()}
    # the neutral doc: shared tokens slightly favor aa (12 of 16 shared
    # occurrences) AND the prior favors aa — predicted aa, a bb->aa cell
    assert out[("bb", "aa")] == 1
    assert out[("aa", "aa")] == 12
    assert out[("bb", "bb")] == 4


def test_nb_deterministic_across_runs(spark, sf_dir):
    from csv_crm_upload_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, nb1_langid_confusion(docs).collect()))
    b = sorted(map(tuple, nb1_langid_confusion(docs).collect()))
    assert a == b


def test_nb_holdout_generalizes_on_separable_corpus(spark):
    """Disjoint-vocabulary classes: the model trained on the hash-gated
    train split classifies every holdout doc correctly."""
    from csv_crm_upload_spark.analytics.nbayes import nb2_holdout_accuracy

    rows = [(i, "alpha beta gamma", "aa", "s", 0) for i in range(0, 400, 2)] + [
        (i, "delta epsilon zeta", "bb", "s", 0) for i in range(1, 400, 2)
    ]
    out = nb2_holdout_accuracy(_docs(spark, rows)).collect()
    assert out, "hash gate must route some docs to holdout"
    for r in out:
        assert r["n_correct"] == r["n_docs"], (r["split"], r["n_correct"], r["n_docs"])
