"""Runtime Bloom-filter semi-join (operators/bloomjoin).

Contract under test:
- ZERO false negatives: every build key passes the Bloom test (a
  Bloom filter may only err toward keeping rows).
- Exactness end-to-end: bloom_semi_join ≡ plain left_semi join,
  including when the bitmap is deliberately undersized (high FPR).
- The pre-filter actually prunes: on a disjoint probe set the Bloom
  stage kills almost everything before the verifying join.
- Bounded build: the bitmap length is set by configuration, not by
  build-side cardinality.
- The probe-side plan keeps the Bloom test as a Filter (xxhash64 +
  element_at) with no extra shuffle before it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.bloomjoin import (
    bloom_filter_rows,
    bloom_semi_join,
    build_bloom_bitmap,
)


def _build(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], "user_id long")


def _probe(spark, n):
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        (F.col("id") * 7919 % 5000).alias("user_id"),
    )


def test_no_false_negatives(spark):
    build = _build(spark, range(0, 5000, 13))
    bitmap = build_bloom_bitmap(build, "user_id")
    kept = bloom_filter_rows(build, bitmap, "user_id").count()
    assert kept == build.count()  # every member must pass


def test_exact_vs_plain_semi_join(spark):
    probe = _probe(spark, 20_000)
    build = _build(spark, range(100, 900, 3))
    got = sorted(
        r.row_id for r in bloom_semi_join(probe, build, "user_id").collect()
    )
    want = sorted(
        r.row_id
        for r in probe.join(
            build.distinct(), "user_id", "left_semi"
        ).collect()
    )
    assert got == want
    assert len(got) > 0


def test_exact_even_when_bitmap_saturated(spark):
    # 64-bit bitmap for 300 keys: FPR near 1 — the verifying join
    # must still deliver the exact semi-join result
    probe = _probe(spark, 5_000)
    build = _build(spark, range(0, 300))
    got = bloom_semi_join(probe, build, "user_id", num_bits=64).collect()
    want = probe.join(build.distinct(), "user_id", "left_semi").collect()
    assert sorted(r.row_id for r in got) == sorted(r.row_id for r in want)


def test_prefilter_prunes_disjoint_probe(spark):
    # probe keys 10000..19999, build keys 0..999: nothing matches, and
    # the Bloom stage alone should kill >99% at the default sizing
    probe = spark.range(10_000, 20_000).select(
        F.col("id").alias("user_id")
    )
    build = _build(spark, range(0, 1000))
    bitmap = build_bloom_bitmap(build, "user_id")
    survivors = bloom_filter_rows(probe, bitmap, "user_id").count()
    assert survivors < 100  # expected FPR ~0.1% of 10k -> ~10
    assert bloom_semi_join(probe, build, "user_id").count() == 0


def test_bitmap_size_is_config_bound(spark):
    big_build = spark.range(200_000).select(F.col("id").alias("user_id"))
    bitmap = build_bloom_bitmap(big_build, "user_id", num_bits=1 << 12)
    assert len(bitmap) == (1 << 12) // 64  # 64 longs, not 200k entries


def test_null_keys_never_match(spark):
    probe = spark.createDataFrame(
        [(1, None), (2, 5)], "row_id long, user_id long"
    )
    build = _build(spark, [5])
    rows = bloom_semi_join(probe, build, "user_id").collect()
    assert [r.row_id for r in rows] == [2]


def test_probe_plan_filters_before_exchange(spark):
    probe = _probe(spark, 1_000)
    build = _build(spark, range(50))
    plan = bloom_semi_join(probe, build, "user_id")._jdf.queryExecution() \
        .executedPlan().toString()
    # the Bloom membership test must appear as a plain Filter on the
    # probe side (xxhash64 positions + element_at into the literal
    # bitmap), i.e. applied before any join exchange
    assert "xxhash64" in plan
    assert "element_at" in plan
