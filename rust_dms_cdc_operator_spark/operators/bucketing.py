"""Bucketed co-located joins — shuffle elimination for repeated joins.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
CDC state ⋈ CDC state for the datadiff, dedup-pairs ⋈ labels) is the
hash-exchange of BOTH sides. If a table is written bucketed on its
join key (``DataFrameWriter.bucketBy`` — Spark's native Hive-style
bucketing), every future join or aggregation on that key plans with
ZERO Exchange on that side: the scan itself reports
``HashPartitioning(key, n)`` and sort-merge join consumes it in
place. Write once, save a shuffle on every subsequent query — the
standard warehouse trick for state tables that are joined every batch.

Local testing uses the session's default warehouse dir; on a cluster
the same API writes to the metastore-backed location. Both sides must
use the SAME bucket count for co-located execution (Spark ≥3.1 can
coalesce mismatched counts when one divides the other —
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally per-bucket
    sorted) managed table. Sorting by the join key as well lets
    sort-merge join skip its per-task sort — scan → join directly."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def join_cobucketed(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed`
    on the same keys/bucket count. The physical plan must contain NO
    Exchange for either side (gated in tests/test_plans.py) — the
    bucketed scans already satisfy the join's distribution."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
