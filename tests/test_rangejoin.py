"""Interval/range join: bucketized equi-join semantics + plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.rangejoin import interval_join


def _fixtures(spark):
    facts = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0)),   # on iv0 start: inside
            (2, datetime(2024, 1, 2, 12, 0)),  # inside iv0 AND iv1
            (3, datetime(2024, 1, 3, 0, 0)),   # == iv0 end: excluded
            (4, datetime(2024, 2, 1, 0, 0)),   # matches nothing
        ],
        "fact_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1), datetime(2024, 1, 3)),
            (1, datetime(2024, 1, 2), datetime(2024, 1, 4)),
        ],
        "iv_id long, s timestamp, e timestamp",
    )
    return facts, iv


def test_interval_join_half_open_and_overlap(spark):
    facts, iv = _fixtures(spark)
    out = interval_join(facts, iv, "ts", "s", "e", bucket_width_seconds=86_400)
    got = sorted((r.fact_id, r.iv_id) for r in out.collect())
    # fact 2 matches BOTH overlapping intervals; end bound is exclusive
    assert got == [(1, 0), (2, 0), (2, 1), (3, 1)]


def test_interval_join_left_keeps_unmatched(spark):
    facts, iv = _fixtures(spark)
    out = interval_join(
        facts, iv, "ts", "s", "e", bucket_width_seconds=86_400, how="left"
    )
    unmatched = out.filter(F.col("iv_id").isNull()).collect()
    assert [r.fact_id for r in unmatched] == [4]
    # matched multiplicity unchanged by the left form
    assert out.filter(F.col("iv_id").isNotNull()).count() == 4


def test_interval_join_wide_interval_spans_buckets(spark):
    """An interval far wider than the bucket must still match every
    covered fact exactly once (explode covers all buckets; facts have
    one bucket so no dedup is ever needed)."""
    facts = spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + i, 6, 0)) for i in range(20)],
        "fact_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(0, datetime(2024, 1, 3), datetime(2024, 1, 15))],
        "iv_id long, s timestamp, e timestamp",
    )
    out = interval_join(facts, iv, "ts", "s", "e", bucket_width_seconds=86_400)
    assert out.count() == 12  # facts on days 3..14 inclusive (half-open end)


def test_interval_join_plan_no_nested_loop(spark):
    """The whole point: the range predicate must NOT plan as
    BroadcastNestedLoopJoin/CartesianProduct — the bucket equi-key
    drives a hash join."""
    from rust_dms_cdc_operator_spark.plans.inspect import formatted_plan

    facts, iv = _fixtures(spark)
    out = interval_join(facts, iv, "ts", "s", "e", bucket_width_seconds=86_400)
    plan = formatted_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_interval_join_rejects_bad_how(spark):
    facts, iv = _fixtures(spark)
    try:
        interval_join(facts, iv, "ts", "s", "e", how="full")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_interval_join_property_vs_bruteforce(spark):
    """Hypothesis: random facts and random (possibly overlapping,
    possibly empty-window) intervals — bucketized join == brute-force
    cross+filter, for every generated scenario batched into ONE job."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    TS = st.integers(min_value=0, max_value=3_000)  # seconds domain
    FACT = st.tuples(st.integers(0, 999), TS)
    IV = st.tuples(st.integers(0, 99), TS, st.integers(0, 600))

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(
        st.lists(FACT, min_size=1, max_size=40),
        st.lists(IV, min_size=1, max_size=12),
    )
    def run(facts_raw, ivs_raw):
        base = 1_700_000_000  # arbitrary epoch anchor
        facts = spark.createDataFrame(
            [(fid, base + ts) for fid, ts in facts_raw],
            "fact_id long, epoch long",
        ).selectExpr("fact_id", "to_timestamp(epoch) as ts").distinct()
        ivs = spark.createDataFrame(
            [(iid, base + s, base + s + span) for iid, s, span in ivs_raw],
            "iv_id long, es long, ee long",
        ).selectExpr(
            "iv_id", "to_timestamp(es) as s", "to_timestamp(ee) as e"
        ).distinct()
        fast = interval_join(facts, ivs, "ts", "s", "e",
                             bucket_width_seconds=256)
        brute = facts.crossJoin(ivs).filter(
            (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
        )
        assert fast.exceptAll(brute).count() == 0
        assert brute.exceptAll(fast).count() == 0

    run()
