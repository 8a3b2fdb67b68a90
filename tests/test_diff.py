"""Datadiff operator tests (SURVEY §2.5 V1-V3) over the driver
testdata at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.chunk import with_chunk_id, with_global_rank
from rust_dms_cdc_operator_spark.operators.diff import (
    chunked_hash_diff,
    count_diff,
    row_diff,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _mutate(orders, n_changed=7, n_deleted=3):
    """Deterministically perturb a copy: bump price for keys ≡0 (mod 97)
    capped at n_changed, drop the n_deleted smallest keys ≡1 (mod 501)."""
    changed_keys = [r.o_orderkey for r in (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .orderBy("o_orderkey").limit(n_changed).collect()
    )]
    deleted_keys = [r.o_orderkey for r in (
        orders.filter(F.col("o_orderkey") % 501 == 1)
        .orderBy("o_orderkey").limit(n_deleted).collect()
    )]
    mutated = orders.filter(~F.col("o_orderkey").isin(deleted_keys)).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey").isin(changed_keys), F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    return mutated, changed_keys, deleted_keys


def test_global_rank_is_exact_permutation(spark, orders):
    ranked = with_global_rank(orders, ["o_orderkey"])
    n = orders.count()
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.min("_rank").alias("lo"),
        F.max("_rank").alias("hi"),
        F.countDistinct("_rank").alias("d"),
    ).first()
    assert (stats.n, stats.lo, stats.hi, stats.d) == (n, 1, n, n)
    # rank order == key order
    bad = ranked.filter(
        (F.col("_rank") == 1) & (F.col("o_orderkey") != orders.agg(F.min("o_orderkey")).first()[0])
    ).count()
    assert bad == 0


def test_chunk_sizes(spark, orders):
    chunked = with_chunk_id(orders, ["o_orderkey"], chunk_size=100)
    sizes = chunked.groupBy("chunk_id").count()
    n = orders.count()
    full, partial = divmod(n, 100)
    assert sizes.filter(F.col("count") == 100).count() == full
    assert sizes.filter(F.col("count") != 100).count() == (1 if partial else 0)


def test_count_diff(spark, orders):
    report = count_diff(orders, orders.limit(100)).first()
    assert report.source_rows == orders.count()
    assert report.target_rows == 100
    assert not report.counts_match
    assert count_diff(orders, orders).first().counts_match


def test_identical_tables_produce_no_mismatched_chunks(spark, orders):
    assert chunked_hash_diff(orders, orders, ["o_orderkey"], 100).count() == 0


def test_chunked_hash_diff_localizes_mutations(spark, orders):
    # value mutations only: chunk boundaries stay aligned, so mismatches
    # are exactly the chunks containing changed keys
    mutated, changed, _ = _mutate(orders, n_deleted=0)
    diff = chunked_hash_diff(orders, mutated, ["o_orderkey"], chunk_size=100)
    rows = diff.collect()
    assert 0 < len(rows) <= len(changed)
    # every changed key's chunk must be reported (chunk = rank of key on source side)
    ranked = with_chunk_id(orders, ["o_orderkey"], 100)
    flagged = {r.chunk_id for r in rows}
    hot = {
        r.chunk_id
        for r in ranked.filter(F.col("o_orderkey").isin(changed)).collect()
    }
    assert hot <= flagged


def test_row_diff_classifies(spark, orders):
    mutated, changed, deleted = _mutate(orders)
    # also inject a target-only row
    extra = orders.limit(1).withColumn("o_orderkey", F.lit(10_000_000))
    mutated = mutated.unionByName(extra)
    out = row_diff(orders, mutated, ["o_orderkey"])
    got = {(r.o_orderkey, r.diff_status) for r in out.collect()}
    expect = (
        {(k, "different") for k in changed}
        | {(k, "source_only") for k in deleted}
        | {(10_000_000, "target_only")}
    )
    assert got == expect


def test_start_position_resume(spark, orders):
    mutated, _, _ = _mutate(orders)
    full = chunked_hash_diff(orders, mutated, ["o_orderkey"], 100)
    first_bad = full.agg(F.min("chunk_id")).first()[0]
    resumed = chunked_hash_diff(
        orders, mutated, ["o_orderkey"], 100, start_position=(first_bad + 1) * 100
    )
    assert resumed.filter(F.col("chunk_id") <= first_bad).count() == 0


def test_global_rank_string_key_fallback(spark):
    """Non-numeric leading key exercises the range-boundary fallback."""
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    keyed = c.withColumn("k", F.concat(F.lit("key-"), F.lpad("c_custkey", 8, "0")))
    ranked = with_global_rank(keyed, ["k"])
    n = keyed.count()
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.min("_rank").alias("lo"),
        F.max("_rank").alias("hi"),
        F.countDistinct("_rank").alias("d"),
    ).first()
    assert (stats.n, stats.lo, stats.hi, stats.d) == (n, 1, n, n)
    # string key order == custkey order, so rank must equal custkey rank
    mism = (
        ranked.withColumn(
            "_expected",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("c_custkey")
            ),
        )
        .filter(F.col("_rank") != F.col("_expected"))
        .count()
    )
    assert mism == 0


def test_global_rank_grouped_restarts_per_group(spark, orders):
    """group_cols ranks each side independently in one pass."""
    a = orders.limit(200).withColumn("_side", F.lit("a"))
    b = orders.limit(150).withColumn("_side", F.lit("b"))
    ranked = with_global_rank(a.unionByName(b), ["o_orderkey"], group_cols=["_side"])
    per = ranked.groupBy("_side").agg(
        F.count("*").alias("n"),
        F.min("_rank").alias("lo"),
        F.max("_rank").alias("hi"),
        F.countDistinct("_rank").alias("d"),
    ).collect()
    got = {r["_side"]: (r.n, r.lo, r.hi, r.d) for r in per}
    assert got == {"a": (200, 1, 200, 200), "b": (150, 1, 150, 150)}
