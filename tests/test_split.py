"""Deterministic split / stratified sampling (operators/split.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.split import (
    stratified_sample,
    with_split,
)

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_partition_invariant(spark, ids):
    a = {r.doc_id: r.split for r in with_split(ids, "doc_id", FRACS).collect()}
    b = {
        r.doc_id: r.split
        for r in with_split(ids.repartition(13), "doc_id", FRACS).collect()
    }
    assert a == b
    # membership is a pure function of the id: a subset sees the same
    # assignments (no leakage when the corpus changes around an id)
    sub = ids.filter(F.col("doc_id") % 7 == 0)
    c = {r.doc_id: r.split for r in with_split(sub, "doc_id", FRACS).collect()}
    assert all(a[k] == v for k, v in c.items())


def test_split_fractions_approximate(spark, ids):
    counts = (
        with_split(ids, "doc_id", FRACS)
        .groupBy("split").count().collect()
    )
    got = {r["split"]: r["count"] / 5000 for r in counts}
    assert abs(got["train"] - 0.8) < 0.03
    assert abs(got["val"] - 0.1) < 0.02
    assert abs(got["test"] - 0.1) < 0.02


def test_split_rejects_over_unity(spark, ids):
    with pytest.raises(ValueError, match="> 1"):
        with_split(ids, "doc_id", {"a": 0.9, "b": 0.2})


def test_split_independent_salts(spark, ids):
    """Different salts make independent decisions — the val sets of
    two salted splits must not coincide."""
    a = {r.doc_id for r in with_split(ids, "doc_id", FRACS, salt="s1")
         .filter("split = 'val'").collect()}
    b = {r.doc_id for r in with_split(ids, "doc_id", FRACS, salt="s2")
         .filter("split = 'val'").collect()}
    overlap = len(a & b) / max(1, len(a))
    assert 0.0 < overlap < 0.5  # ~10% expected under independence


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.1})
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert abs(counts["en"] / 2000 - 0.5) < 0.05
    assert abs(counts["de"] / 2000 - 0.1) < 0.03
    again = stratified_sample(df.repartition(7), "doc_id", "lang",
                              {"en": 0.5, "de": 0.1})
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # unknown stratum with default_rate=0 drops everything
    none = stratified_sample(df, "doc_id", "lang", {"xx": 1.0})
    assert none.count() == 0


def test_sample_filter_is_scan_local(spark):
    """The sampling predicate must stay a row-local filter — no
    shuffle, no join in the plan."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
