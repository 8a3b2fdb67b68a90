"""IncrementalAggView: refresh cost bounded by churn (only touched
buckets recompute), carry-forward by reference, dropped-bucket
handling, exact parity with a full recompute at every epoch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
    BucketedParquetState,
)
from rust_dms_cdc_operator_spark.streaming.ivm import IncrementalAggView


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k long, grp string, v long, seq long, Op string"
    )


def _mk(spark, tmp_path, num_buckets=16):
    state = BucketedParquetState(
        str(tmp_path / "state"), ["k"], num_buckets=num_buckets
    )
    view = IncrementalAggView(
        state,
        str(tmp_path / "view"),
        ["grp"],
        {"n": ("count", "*"), "total": ("sum", "v"), "hi": ("max", "v")},
    )
    return state, view


def _expect(state, spark):
    return {
        (r.grp, r.n, r.total, r.hi)
        for r in state.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def _got(view, spark):
    return {
        (r.grp, r.n, r.total, r.hi)
        for r in view.result(spark).collect()
    }


def test_refresh_parity_and_incrementality(spark, tmp_path):
    state, view = _mk(spark, tmp_path)
    rows1 = [(k, "a" if k % 2 else "b", k * 10, 1, "U") for k in range(40)]
    state.merge_batch(_batch(spark, rows1), order_cols=["seq"])
    s1 = view.refresh(spark)
    assert s1["buckets_recomputed"] > 0
    assert _got(view, spark) == _expect(state, spark)

    # second epoch touches exactly one key -> at most one bucket
    state.merge_batch(
        _batch(spark, [(7, "a", 999, 2, "U")]), order_cols=["seq"]
    )
    s2 = view.refresh(spark)
    assert s2["buckets_recomputed"] == 1
    assert _got(view, spark) == _expect(state, spark)

    # no-op refresh: nothing stale
    s3 = view.refresh(spark)
    assert s3["buckets_recomputed"] == 0
    assert _got(view, spark) == _expect(state, spark)


def test_deletes_and_dropped_buckets(spark, tmp_path):
    state, view = _mk(spark, tmp_path, num_buckets=4)
    rows = [(k, "g", k, 1, "U") for k in range(12)]
    state.merge_batch(_batch(spark, rows), order_cols=["seq"])
    view.refresh(spark)
    # delete every key: buckets vanish from the state manifest
    dels = [(k, "g", k, 2, "D") for k in range(12)]
    state.merge_batch(_batch(spark, dels), order_cols=["seq"])
    stats = view.refresh(spark)
    assert stats["buckets_dropped"] + stats["buckets_recomputed"] > 0
    assert view.result(spark).count() == 0


def test_unsupported_measure_rejected(spark, tmp_path):
    state = BucketedParquetState(str(tmp_path / "s"), ["k"])
    with pytest.raises(ValueError, match="not decomposable"):
        IncrementalAggView(
            state, str(tmp_path / "v"), ["grp"], {"a": ("avg", "v")}
        )


def test_unrefreshed_view_raises(spark, tmp_path):
    state, view = _mk(spark, tmp_path)
    with pytest.raises(FileNotFoundError, match="never been refreshed"):
        view.result(spark)
