"""Leaf/cache lifecycle at the public-API layer (round 13, r12
verdict item 6): materialize_leaf blocks must be releasable by the
CALLER — production sessions don't run bench.py's whole-session
sweep — and a query that went through materialize_leaf +
release_leaves() + clearCache() must leave no persistent RDDs behind.
materialize_cache keeps lineage, so its blocks must survive eviction
semantics (recomputable) and clearCache() must fully release them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.session import (
    materialize_cache,
    materialize_leaf,
    release_leaves,
    release_persistent_rdds,
)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _clean(spark) -> None:
    spark.catalog.clearCache()
    release_leaves()
    release_persistent_rdds(spark)


def test_leaf_blocks_released_by_caller(spark):
    _clean(spark)
    assert _n_persistent(spark) == 0
    leaf = materialize_leaf(spark.range(500).selectExpr("id", "id % 3 as k"))
    assert leaf.count() == 500
    # the checkpoint's block set is live after the action...
    assert _n_persistent(spark) >= 1
    # ...and the caller-owned release path frees it without a
    # whole-session sweep
    assert release_leaves() >= 1
    assert _n_persistent(spark) == 0


def test_leaf_rejects_unbounded_streams(spark):
    with pytest.raises(ValueError, match="materialize_cache"):
        materialize_leaf(spark.range(10), bounded=False)


def test_query_action_leaves_no_persistent_rdds(spark, tmp_path):
    """Public-API contract: run a capped graph query end-to-end (it
    routes its pair stream through materialize_leaf), then the
    caller's release pair (clearCache + release_leaves) restores a
    clean session — nothing persists until the harness sweep."""
    from rust_dms_cdc_operator_spark.operators.dedup import minhash_lsh_pairs
    from rust_dms_cdc_operator_spark.operators.graph import pagerank_undirected

    _clean(spark)
    docs = spark.createDataFrame(
        [(i, f"text {i % 7} shared tokens between documents") for i in range(64)],
        "doc_id long, text string",
    )
    pairs = materialize_leaf(
        minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=2)
    )
    pr = pagerank_undirected(pairs, iters=2, assume_distinct=True)
    pr.write.format("noop").mode("overwrite").save()
    assert _n_persistent(spark) >= 1
    spark.catalog.clearCache()  # operator-owned persists (adjacency, deg)
    release_leaves()  # checkpoint block sets
    assert _n_persistent(spark) == 0


def test_cache_keeps_lineage_and_clears(spark):
    _clean(spark)
    df = spark.range(200).selectExpr("id", "id % 5 as k")
    c = materialize_cache(df)
    # eager: materialized before any consumer
    assert c.storageLevel.useMemory
    assert c.groupBy("k").agg(F.count("*")).count() == 5
    spark.catalog.clearCache()
    assert _n_persistent(spark) == 0
    # lineage kept: the frame still computes after release
    assert c.count() == 200


def test_release_persistent_rdds_refuses_active_streams(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.range(5).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema("id long")
        .parquet(str(src))
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        with pytest.raises(RuntimeError, match="active streaming"):
            release_persistent_rdds(spark)
    finally:
        stream.stop()
        stream.awaitTermination()
    release_persistent_rdds(spark)  # clean again once stopped
