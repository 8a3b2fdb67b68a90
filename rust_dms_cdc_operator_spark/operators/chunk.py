"""Chunking / global ordering (SURVEY §2.3 C1-C3).

The reference slices DataFrames into 10k-row chunks with
``df.slice`` in a driver loop (/root/reference/src/postgres/
postgres_operator_impl.rs:246-302). In Spark the equivalent primitive
is a *global rank in PK order* — but a naive
``row_number() OVER (ORDER BY pk)`` collapses to a single partition
and dies at scale. ``with_global_rank`` computes the exact same rank
with bounded parallelism:

1. range-repartition on the key (one shuffle, balanced by sampling),
2. per-partition ``row_number`` (parallel window, no extra shuffle on
   data beyond the pid hash),
3. add the cumulative offset of preceding partitions (tiny driver-side
   count map, broadcast back).

This is the scan-friendly version of the reference's OFFSET/LIMIT
paging — two shuffles total regardless of table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_COL = "_rank"
CHUNK_COL = "chunk_id"


def with_global_rank(
    df: DataFrame, order_cols: Sequence[str], rank_col: str = RANK_COL
) -> DataFrame:
    """Exact 1-based global rank in ``order_cols`` order, computed
    scalably (no single-partition window)."""
    num_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    parted = df.repartitionByRange(num_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.localCheckpoint(eager=False)

    counts = parted.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offset_df = F.broadcast(
        parted.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )

    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        parted.withColumn("_local_rn", F.row_number().over(w))
        .join(offset_df, "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local_rn")).cast("long"))
        .drop("_pid", "_local_rn", "_offset")
    )


def with_chunk_id(
    df: DataFrame,
    order_cols: Sequence[str],
    chunk_size: int,
    chunk_col: str = CHUNK_COL,
) -> DataFrame:
    """C1: assign ``floor((rank-1)/chunk_size)`` chunk buckets in key
    order — the Spark form of the reference's 10k-row insert slices and
    of pgdatadiff's comparison chunks."""
    ranked = with_global_rank(df, order_cols)
    return ranked.withColumn(
        chunk_col, F.floor((F.col(RANK_COL) - 1) / F.lit(chunk_size)).cast("long")
    )
