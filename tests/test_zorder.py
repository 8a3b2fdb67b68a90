"""Z-order clustering: interleave correctness, locality, layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_sql,
    zvalue,
)


def test_zvalue_known_interleave(spark):
    # a=0b11, b=0b01 @ 2 bits → z = a0<<0 | b0<<1 | a1<<2 | b1<<3
    #                            = 1 | 2 | 4 | 0 = 7
    row = spark.range(1).select(
        zvalue([F.lit(3), F.lit(1)], bits=2).alias("z")
    ).first()
    assert row.z == 7


def test_zvalue_matches_sql_rendering(spark):
    df = spark.range(500).select(
        (F.col("id") % 37).alias("a"), (F.col("id") % 23).alias("b")
    )
    got = df.select(
        "a", "b", zvalue([F.col("a"), F.col("b")], 10).alias("z")
    )
    via_sql = df.selectExpr(
        "a", "b", f"{zorder_sql(['a', 'b'], 10)} as z"
    )
    assert got.exceptAll(via_sql).count() == 0
    assert via_sql.exceptAll(got).count() == 0


def test_zvalue_overflow_guard(spark):
    try:
        zvalue([F.lit(1)] * 7, bits=10)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_cluster_by_zorder_locality(spark):
    """After z-clustering a uniform 64x64 grid into 16 partitions,
    each partition's bounding box must be FAR tighter than the naive
    row-major layout's (whose boxes span the full y range)."""
    n = 64
    df = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("x"),
        (F.col("id") % n).alias("y"),
    )
    clustered = cluster_by_zorder(
        df, [F.col("x"), F.col("y")], bits=6, num_partitions=16
    )
    boxes = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert len(boxes) == 16
    # perfect z-order on a 64x64 grid / 16 partitions → 16x16-ish
    # tiles; allow slack for range-boundary sampling
    for r in boxes:
        assert r.dx <= 32 and r.dy <= 32, (r.pid, r.dx, r.dy)
