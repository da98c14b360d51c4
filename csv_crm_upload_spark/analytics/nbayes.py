"""Multinomial Naive Bayes language identification — the classic
token-count classifier (Laplace-smoothed, log-space) trained AND applied
in one distributed pass: the langid / domain-id gate of a training-data
pipeline when a linear model over hand features (logreg.py) is too
coarse.

Spark shape:
  * training is two combining aggregations — per-(lang, token) counts
    and per-lang totals (the model IS these tables; no iterations);
  * scoring joins each doc's token counts against the per-class
    conditionals: the doc side shuffles ONCE on token, the class side
    is class-count-bounded; class totals/priors (L rows) broadcast;
  * the argmax is a per-doc window — state is L rows per doc.
At many classes the doc×class expansion is bounded by joining SEEN
(token, class) pairs only and correcting with the class's default
unseen score — noted here, not needed at L = 5.

Cross-engine determinism (oracle-paired): every log2 conditional is
rounded to 9 dp per DISTINCT (token, class) — the ppl1 discipline —
then multiplied by integer counts into DECIMAL(20,12) so per-doc score
sums are exact; argmax ties break to the lexicographically smallest
class in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nb1_langid_confusion(documents: DataFrame) -> DataFrame:
    """Train Laplace-smoothed multinomial NB on (lang | tokens) over the
    full corpus, classify every doc, and return the confusion matrix —
    (lang, pred_lang, n_docs). The diagonal mass is the self-consistency
    readout (how separable the corpus's classes are under their own
    token statistics)."""
    toks = F.split(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")), " ")
    base = documents.filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select("doc_id", "lang", F.explode(toks).alias("tok"))

    # model: per-(lang, tok) counts, per-lang token totals + doc priors
    clt = base.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c_lt"))
    class_stats = (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_l"),
            F.countDistinct("doc_id").alias("docs_l"),
        )
    )
    vocab_n = base.select("tok").distinct().count()  # scalar V (bounded)
    n_docs = documents.filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).count()

    dtc = base.groupBy("doc_id", "lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    langs = class_stats.select(
        F.col("lang").alias("cand"),
        "n_l",
        F.round(F.log2(F.col("docs_l").cast("double") / F.lit(float(n_docs))), 9).alias(
            "prior"
        ),
    )
    cond = clt.select(F.col("lang").alias("cand"), "tok", "c_lt")
    logp = F.round(
        F.log2(
            (F.coalesce(F.col("c_lt"), F.lit(0)) + 1).cast("double")
            / (F.col("n_l") + F.lit(vocab_n)).cast("double")
        ),
        9,
    )
    scored = (
        dtc.crossJoin(F.broadcast(langs))
        .join(cond, ["cand", "tok"], "left")
        .groupBy("doc_id", "lang", "cand", "prior")
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(12,0)") * logp.cast("decimal(20,12)")
            ).alias("ll")
        )
        .select(
            "doc_id",
            "lang",
            "cand",
            (F.col("prior").cast("decimal(20,12)") + F.col("ll")).cast("double").alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand"))
    pred = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        pred.groupBy("lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )
