"""Distributed logistic regression: learning on a separable planted
corpus, determinism, and the bounded-driver iteration shape."""

from __future__ import annotations

from csv_crm_upload_spark.analytics.logreg import lr1_quality_classifier


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def _planted(spark):
    """en docs are stopword-dense, others stopword-free — linearly
    separable on the stopword_ratio feature alone."""
    en = "the of and to in is it the a of"
    other = "spark join filter merge table scan shuffle sort agg write"
    rows = [(i, en, "en", "s", len(en)) for i in range(20)] + [
        (100 + i, other, "de", "s", len(other)) for i in range(20)
    ]
    return _docs(spark, rows)


def test_logreg_learns_separable_stopword_signal(spark):
    docs = _planted(spark)
    w = {r["feature"]: r["weight"] for r in lr1_quality_classifier(docs, iters=20).collect()}
    assert w["stopword_ratio"] > 0, w  # English stopword density predicts en
    # the learned gate actually separates the two classes:
    # z = w·x with x = (1, stop_ratio, len_capped, avg_tok_len)
    x_en = (1.0, 1.0, 10 / 256, (30 / 10) / 64)
    x_de = (1.0, 0.0, 10 / 256, (58 / 10) / 64)
    feats = ["intercept", "stopword_ratio", "len_capped", "avg_tok_len"]
    z_en = sum(w[f] * v for f, v in zip(feats, x_en))
    z_de = sum(w[f] * v for f, v in zip(feats, x_de))
    assert z_en > 0 > z_de, (z_en, z_de)


def test_logreg_deterministic_across_runs(spark):
    docs = _planted(spark)
    a = sorted(map(tuple, lr1_quality_classifier(docs, iters=3).collect()))
    b = sorted(map(tuple, lr1_quality_classifier(docs, iters=3).collect()))
    assert a == b


def test_logreg_zero_iters_returns_zero_weights(spark):
    docs = _planted(spark)
    out = lr1_quality_classifier(docs, iters=0).collect()
    assert {r["weight"] for r in out} == {0.0}
    assert len(out) == 4


def test_logreg_inference_separates_planted_corpus(spark):
    """lr2 on the separable corpus at iters=20: every en doc predicted
    en, every de doc predicted not-en, and mean_p orders the classes."""
    from csv_crm_upload_spark.analytics.logreg import lr2_classifier_scores

    out = {r["lang"]: r for r in lr2_classifier_scores(_planted(spark), iters=20).collect()}
    assert out["en"]["n_docs"] == 20 and out["en"]["n_pred_en"] == 20
    assert out["de"]["n_docs"] == 20 and out["de"]["n_pred_en"] == 0
    assert out["en"]["mean_p"] > 0.5 > out["de"]["mean_p"]


def test_auc_separable_corpus_and_rank_sum_identity(spark):
    """auc1: on a corpus where the 'en' label tracks the stopword
    feature, the trained gate must score better than chance; and the
    reported AUC must equal an independent numpy computation of the
    same tie-broken rank-sum statistic from the model's own scores."""
    from csv_crm_upload_spark.analytics.logreg import (
        _feature_frame,
        auc1_classifier_auc,
        train_weights,
    )

    en = "the a of and to in is it data table row"
    other = "zq xw vv kj pp mm nn rr ss tt uu"
    rows = [(i, en + f" d{i}", "en", "s", 44) for i in range(20)] + [
        (100 + i, other + f" e{i}", "de", "s", 32) for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = auc1_classifier_auc(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pos"] == 20 and r["n_neg"] == 20
    assert 0.9 <= r["auc"] <= 1.0, f"separable corpus must score high, got {r['auc']}"

    # independent recomputation from the model's own scores
    import math

    w = train_weights(docs)
    feats = _feature_frame(docs).collect()
    scored = sorted(
        (
            round(1.0 / (1.0 + math.exp(-(w[0] * f["x0"] + w[1] * f["x1"]
                                          + w[2] * f["x2"] + w[3] * f["x3"]))), 9),
            f["doc_id"],
            f["y"],
        )
        for f in feats
    )
    rsum = sum(i + 1 for i, (_, _, y) in enumerate(scored) if y == 1.0)
    P = N = 20
    want = round((2 * rsum - P * (P + 1)) / (2.0 * P * N), 6)
    assert r["auc"] == want

    # one-class corpus: excluded, not 0/0
    assert auc1_classifier_auc(docs.filter("lang = 'en'")).count() == 0


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    """cal1: bins are deciles of the predicted probability (0..9), every
    scored doc lands in exactly one bin (n sums to the live corpus
    count), mean_p lies inside its bin's [lo, hi] decile interval
    (clamped top bin aside), and abs_gap is |mean_p - pos_rate|."""
    from pyspark.sql import functions as F

    from csv_crm_upload_spark.analytics.logreg import cal1_calibration_bins

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = cal1_calibration_bins(docs).collect()
    live = docs.filter(F.col("text").isNotNull()).count()
    assert sum(r["n"] for r in rows) == live
    for r in rows:
        assert 0 <= r["bin"] <= 9
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0 if r["bin"] < 9 else 1.0 + 1e-9
        assert lo - 1e-6 <= r["mean_p"] <= hi + 1e-6, r
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert r["abs_gap"] == abs(r["mean_p"] - r["pos_rate"])


def test_cal2_brier_decomposition_invariants(spark, sf_dir):
    """Murphy decomposition sanity over the live corpus: components are
    non-negative with uncertainty = ybar(1-ybar) <= 0.25, the raw Brier
    dominates the binned decomposition (BS_raw = rel - res + unc +
    within-bin variance >= rel - res + unc), Cauchy-Schwarz bounds
    ECE^2 <= reliability, n counts every scored doc, and an empty
    corpus emits no row."""
    from pyspark.sql import functions as F

    from csv_crm_upload_spark.analytics.logreg import cal2_brier_decomposition

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = cal2_brier_decomposition(docs).first()
    live = docs.filter(F.col("text").isNotNull()).count()
    assert r["n"] == live
    assert r["reliability"] >= 0.0 and r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25
    assert 0.0 <= r["brier"] <= 1.0
    # residual = within-bin variance - 2*within-bin covariance of (p,y);
    # for 0.1-wide bins it is bounded well under 0.06 in magnitude
    assert abs(r["brier"] - (r["reliability"] - r["resolution"] + r["uncertainty"])) < 0.06
    assert r["ece"] * r["ece"] <= r["reliability"] + 1e-5  # Jensen; 6-dp rounding slack

    # bin-constant corpus (identical text -> identical p -> one bin):
    # the Murphy identity BS = rel - res + unc holds EXACTLY
    text = "the of and to spark join"
    const = _docs(
        spark,
        [(i, text, ("en" if i % 2 else "de"), "s", len(text)) for i in range(10)],
    )
    c = cal2_brier_decomposition(const).first()
    assert abs(c["brier"] - (c["reliability"] - c["resolution"] + c["uncertainty"])) < 2e-6

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert cal2_brier_decomposition(empty).count() == 0
