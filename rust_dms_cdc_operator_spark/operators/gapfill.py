"""Time-series gap-fill: densify a keyed time series onto a regular
spine and carry the last observation forward (LOCF) — the hypertable
rollup companion (TimescaleDB's time_bucket_gapfill / locf shape)
Spark has no built-in for.

Composition of built-ins only:
  1. spine = distinct keys x sequence(start, end, step) exploded —
     the key set is one small distinct (dimension-sized), the spine a
     generated array per key, never a shuffle of the facts;
  2. left join facts (pre-bucketed) onto the spine — hash equi-join on
     (key, bucket), broadcastable when the spine is small;
  3. LOCF = last(value, ignorenulls=True) over a per-key time-ordered
     running window — ONE hash exchange on the key, the same shape as
     any keyed window; no SinglePartition anywhere.

At 100 TB the spine is |keys| x |buckets| rows — gap-fill is only
meaningful when that product is tractable (dashboards, feature
backfills); the facts are pre-aggregated to one row per (key, bucket)
BEFORE the join, so the heavy table crosses the shuffle exactly once
at its compacted size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_spine(
    keys: DataFrame,
    start: str,
    end: str,
    step_seconds: int,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Dense (key x regular timestamp) grid: every key from ``keys``
    (a distinct key DataFrame) paired with every step in
    [start, end] inclusive (matching ``sequence`` semantics)."""
    seq = F.sequence(
        F.to_timestamp(F.lit(start)),
        F.to_timestamp(F.lit(end)),
        F.expr(f"make_dt_interval(0, 0, 0, {step_seconds})"),
    )
    return keys.withColumn(ts_col, F.explode(seq))


def gapfill_locf(
    facts: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    start: str,
    end: str,
    step_seconds: int,
    zero_cols: list[str] | None = None,
) -> DataFrame:
    """Densify ``facts`` (already one row per (key, bucket) with
    ``ts_col`` bucketed to the spine's step) onto the [start, end]
    grid, carrying ``value_cols`` forward per key (null until a key's
    first observation) and zero-filling ``zero_cols`` (counts)."""
    keys = facts.select(*key_cols).distinct()
    spine = time_spine(keys, start, end, step_seconds, ts_col=ts_col)
    joined = spine.join(facts, [*key_cols, ts_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out
