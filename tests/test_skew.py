"""salted_join must be result-identical to a plain join while
physically spreading a hot key over many salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.skew import SALT_COL, salted_join


def _skewed(spark):
    # 10k rows of one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(100).select(
        (F.col("id") + 2).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(50).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return hot.unionByName(tail), dim


def test_salted_inner_join_matches_plain(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, ["k"], salt_buckets=8).groupBy("k").count()
    assert {(r.k, r["count"]) for r in plain.collect()} == {
        (r.k, r["count"]) for r in salted.collect()
    }


def test_salted_left_join_keeps_unmatched_probe_rows(spark):
    fact, dim = _skewed(spark)
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, ["k"], "left", salt_buckets=8)
    assert plain.count() == salted.count()
    assert (
        salted.filter(F.col("name").isNull()).count()
        == plain.filter(F.col("name").isNull()).count()
    )


def test_hot_key_spreads_across_buckets(spark):
    fact, _ = _skewed(spark)
    from pyspark.sql import functions as F2

    salt = F2.pmod(
        F2.xxhash64(F2.col("k"), F2.monotonically_increasing_id()), F2.lit(8)
    )
    n = fact.filter(F2.col("k") == 1).select(salt.alias(SALT_COL)).distinct().count()
    assert n == 8  # the hot key occupies every bucket
