"""Chunking / global ordering (SURVEY §2.3 C1-C3).

The reference slices DataFrames into 10k-row chunks with
``df.slice`` in a driver loop (/root/reference/src/postgres/
postgres_operator_impl.rs:246-302). In Spark the equivalent primitive
is a *global rank in PK order* — but a naive
``row_number() OVER (ORDER BY pk)`` collapses to a single partition
and dies at scale. ``with_global_rank`` computes the exact same rank
with bounded parallelism via **boundary broadcast**:

1. derive ``num_buckets`` ordered boundary literals for the leading
   order column — for numeric/temporal keys a single
   ``percentile_approx`` aggregation (map-side partial agg over the
   pruned key column: no shuffle of data, tiny collect); for other
   types a range-repartition pass over the key columns whose
   per-partition minima are the boundaries;
2. every row's bucket is ``#boundaries <= key`` — a deterministic,
   monotone literal expression, so exact per-bucket counts can be
   (re)computed from the data itself by any pass;
3. main pass: per-(group, bucket) exact counts aggregate into
   cumulative offsets (a tiny ≤ groups×buckets frame, single-partition
   window) broadcast-joined back; one hash shuffle of the data on
   (group, bucket); per-bucket ``row_number`` (parallel window) plus
   the bucket's offset = exact global rank.

No checkpoint/materialization, no lineage break — the plan is plain
shuffles + a broadcast of a few hundred rows, AQE-friendly and
fault-tolerant at 100 TB. Boundary quality only affects balance,
never correctness: counts are always exact per bucket, and skewed
buckets merely spill in the window sort.

``group_cols`` generalizes to *per-group* exact ranks (rank restarts
per group) while sharing one boundary set and ONE shuffle for all
groups — the datadiff uses this to rank both comparison sides in a
single pass instead of running the machinery twice. Group values must
be non-null (they are engine-internal literal tags).
"""

from __future__ import annotations

import operator
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RANK_COL = "_rank"
CHUNK_COL = "chunk_id"
BUCKET_COL = "_rank_bucket"

# cap on boundary literals: keeps the bucket expression small even on a
# cluster whose defaultParallelism is in the tens of thousands; the
# per-bucket window spills to disk if a bucket outgrows executor memory
MAX_RANK_BUCKETS = 512


def _key_struct(order_cols: Sequence[str]) -> Column:
    """Lexicographic sort key as a struct with canonical field names
    (struct comparison in Spark requires matching field names/types)."""
    return F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(order_cols)])


def _monotone_double(col: str, dtype: T.DataType) -> Column | None:
    """A monotone numeric image of the column, if one exists. Ties
    introduced by the mapping are harmless — they only coarsen bucket
    boundaries (equal keys stay in one bucket)."""
    if isinstance(dtype, T.NumericType):
        return F.col(col).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, T.TimestampType):
        return F.col(col).cast("double")
    if isinstance(dtype, T.TimestampNTZType):
        return F.col(col).cast("timestamp").cast("double")
    return None


def _numeric_boundaries(
    df: DataFrame, num_expr: Column, num_parts: int
) -> list[float]:
    """Approximate quantile boundaries of the leading key column via
    one aggregation — partial-aggregated scan, no shuffle of rows."""
    probs = [i / num_parts for i in range(1, num_parts)]
    # low accuracy on purpose: boundaries only affect balance, never
    # rank correctness, and a cheaper sketch keeps the boundary job short
    row = df.agg(
        F.percentile_approx(num_expr, probs, 1_000).alias("_b")
    ).first()
    bounds = row["_b"] if row and row["_b"] else []
    return sorted({b for b in bounds if b is not None})


def _range_boundaries(
    df: DataFrame, order_cols: Sequence[str], num_parts: int
) -> list:
    """Fallback for non-numeric keys: range-repartition the pruned key
    columns; each partition's minimum key is a boundary. Equal keys
    land in one range partition, so the minima tile the key space."""
    key = _key_struct(order_cols)
    rows = (
        df.select(*order_cols)
        .repartitionByRange(num_parts, *order_cols)
        .select(F.spark_partition_id().alias("_pid"), key.alias("_k"))
        .groupBy("_pid")
        .agg(F.min("_k").alias("_min"))
        .collect()
    )
    rows.sort(key=lambda r: r["_pid"])
    return [r["_min"] for r in rows[1:]]


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = RANK_COL,
    group_cols: Sequence[str] = (),
    weight_col: str | None = None,
    prefix_col: str = "_prefix_sum",
) -> DataFrame:
    """Exact 1-based global rank in ``order_cols`` order (restarting
    per ``group_cols`` group), computed scalably — no single-partition
    window, no materialization.

    With ``weight_col``, also emits ``prefix_col`` = the EXCLUSIVE
    global prefix sum of the weights in the same order (the running
    total before this row) from the same single shuffle — the
    primitive behind sequence packing (cumulative token budgets),
    byte-offset assignment, and any "running total in key order" at
    scale. Same mechanics as the rank: per-bucket window sums plus
    driver-collected per-bucket totals as a literal lookup."""
    spark = df.sparkSession
    num_parts = min(
        max(spark.sparkContext.defaultParallelism, 2), MAX_RANK_BUCKETS
    )
    group_cols = list(group_cols)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    c0 = order_cols[0]

    num_expr = _monotone_double(c0, dtypes[c0])
    if num_expr is not None:
        bounds = _numeric_boundaries(df, num_expr, num_parts)
        cmp_key = num_expr
        boundary_lits = [F.lit(b) for b in bounds]
    else:
        bounds = _range_boundaries(df, order_cols, num_parts)
        cmp_key = _key_struct(order_cols)
        boundary_lits = [
            F.struct(
                *[
                    F.lit(b[i]).cast(dtypes[c]).alias(f"k{i}")
                    for i, c in enumerate(order_cols)
                ]
            )
            for b in bounds
        ]

    bucket: Column = (
        reduce(
            operator.add,
            [
                F.coalesce((cmp_key >= b).cast("int"), F.lit(0))
                for b in boundary_lits
            ],
        )
        if boundary_lits
        else F.lit(0)
    )

    bucketed = df.withColumn(BUCKET_COL, bucket)

    # Exact per-(group, bucket) counts from ONE pruned, map-side
    # partial-agged pass (only ≤ groups × buckets combined rows cross
    # the wire), collected and prefix-summed on the driver — bounded by
    # MAX_RANK_BUCKETS regardless of data size. The cumulative offsets
    # then enter the main plan as a LITERAL array lookup, so the data
    # DAG is just: scan → one (group, bucket) shuffle → window — no
    # offsets window stage, no broadcast exchange, no join. (Round-1
    # plan audit: at small scale every saved stage is ~0.2-0.3 s; at
    # 100 TB the saved broadcast-join of the data frame is real too.)
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if weight_col:
        aggs.append(F.sum(F.col(weight_col)).alias("_wsum"))
    cnt_rows = (
        df.select(*group_cols, bucket.alias(BUCKET_COL), *( [weight_col] if weight_col else [] ))
        .groupBy(*group_cols, BUCKET_COL)
        .agg(*aggs)
        .collect()
    )
    n_buckets = len(boundary_lits) + 1

    def _prefix_arrays(field: str) -> dict[tuple, list[int]]:
        per_group: dict[tuple, list[int]] = {}
        for r in cnt_rows:
            g = tuple(r[c] for c in group_cols)
            per_group.setdefault(g, [0] * n_buckets)[r[BUCKET_COL]] = int(
                r[field] or 0
            )
        out: dict[tuple, list[int]] = {}
        for g, vals in per_group.items():
            acc, offs = 0, []
            for v in vals:
                offs.append(acc)
                acc += v
            out[g] = offs
        return out

    def _offset_lookup(offset_arrays: dict[tuple, list[int]]) -> Column:
        if not offset_arrays:
            return F.lit(0)
        idx = (F.col(BUCKET_COL) + 1).cast("int")
        out: Column | None = None
        for g, offs in offset_arrays.items():
            # long literals: a python int < 2^31 would otherwise become
            # IntegerType and the later `offset + row_number` addition
            # would wrap in 32-bit past ~2e9 rows, before any cast
            pick = F.element_at(
                F.array(*[F.lit(o).cast("long") for o in offs]), idx
            )
            if not group_cols:
                return pick
            cond = reduce(
                operator.and_,
                [F.col(c) == F.lit(v) for c, v in zip(group_cols, g)],
            )
            out = pick if out is None else F.when(cond, pick).otherwise(out)
        return out

    w = Window.partitionBy(*group_cols, BUCKET_COL).orderBy(
        *[F.col(c) for c in order_cols]
    )
    result = bucketed.withColumn("_local_rn", F.row_number().over(w)).withColumn(
        rank_col,
        (_offset_lookup(_prefix_arrays("_cnt")) + F.col("_local_rn")).cast("long"),
    )
    if weight_col:
        # null weights count as 0 (a bare `- weight` would null the
        # whole prefix for that row, silently dropping its assignment)
        wt = F.coalesce(F.col(weight_col).cast("long"), F.lit(0).cast("long"))
        running = F.sum(wt).over(w.rowsBetween(Window.unboundedPreceding, 0))
        result = result.withColumn(
            prefix_col,
            (_offset_lookup(_prefix_arrays("_wsum")) + running - wt).cast(
                "long"
            ),
        )
    return result.drop(BUCKET_COL, "_local_rn")


def with_chunk_id(
    df: DataFrame,
    order_cols: Sequence[str],
    chunk_size: int,
    chunk_col: str = CHUNK_COL,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """C1: assign ``floor((rank-1)/chunk_size)`` chunk buckets in key
    order — the Spark form of the reference's 10k-row insert slices and
    of pgdatadiff's comparison chunks."""
    ranked = with_global_rank(df, order_cols, group_cols=group_cols)
    return ranked.withColumn(
        chunk_col, F.floor((F.col(RANK_COL) - 1) / F.lit(chunk_size)).cast("long")
    )
