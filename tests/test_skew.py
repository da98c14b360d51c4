"""Skew utilities: salted join and two-phase agg must be result-identical
to their plain counterparts on skewed data, and the salted plan must
actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_crm_upload_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # 5000 rows on hot key 1, a few on others
    hot = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(50).select((F.col("id") % 7 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionAll(cold)


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b"), (99, "unused")], ["k", "label"])
    plain = big.join(small, "k").groupBy("k", "label").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(2, "a")], ["k", "label"])
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", n_salts=4, how="left")
    assert plain.count() == salted.count()
    assert salted.filter(F.col("label").isNull()).count() == plain.filter(F.col("label").isNull()).count()


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    twop = two_phase_agg(df, "k", "v", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, twop.collect()))


def test_salted_count_distinct_is_exact_under_skew(spark):
    """Distincts don't combine, so this is the aggregate two_phase_agg
    can't cover: the value-hash salt partitions the distinct set, and
    the result must EQUAL plain COUNT(DISTINCT) — while stage 1
    partitions on (key, _salt), spreading the hot key."""
    import re

    from csv_crm_upload_spark.operators.skew import salted_count_distinct

    df = _skewed(spark).withColumn("item", F.pmod(F.col("v") * 31, 409))
    got = {
        (r["k"], r["n_distinct"])
        for r in salted_count_distinct(df, ["k"], "item").collect()
    }
    want = {
        (r["k"], r["n_distinct"])
        for r in df.groupBy("k")
        .agg(F.count_distinct("item").cast("long").alias("n_distinct"))
        .collect()
    }
    assert got == want and len(got) > 1

    plan = (
        salted_count_distinct(df, ["k"], "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert re.search(r"hashpartitioning\(k#\d+L?, _salt#\d+", plan), plan[:1200]


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed(spark)
    from csv_crm_upload_spark.operators.skew import _salt_col

    salts = (
        df.filter(F.col("k") == 1)
        .withColumn("_salt", _salt_col(df, "k", 8))
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key's rows land in all salt buckets


def test_salted_join_shuffles_on_key_plus_salt(spark, sf_dir):
    """The whole point of salted_join: with broadcast disabled (forcing
    the shuffle-join path salting exists for), the join exchanges hash
    on (key, _salt) — the hot key fans out over n_salts tasks — and the
    small side carries the explode-replication."""
    import io
    import contextlib

    from csv_crm_upload_spark.analytics.tpch import skw2_salted_join_revenue
    from csv_crm_upload_spark.sources.tables import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = skw2_salted_join_revenue(
            load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        import re

        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        salted = [p for p in parts if "o_custkey" in p and "_salt" in p]
        assert len(salted) >= 2, f"join sides not partitioned on (key, _salt):\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
