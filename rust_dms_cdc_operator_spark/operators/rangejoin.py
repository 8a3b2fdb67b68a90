"""Range (interval) join: match fact rows to interval rows where
``start <= ts < end`` — the join shape Spark has no native operator
for (a bare range predicate plans as BroadcastNestedLoopJoin or a
cartesian product, both quadratic).

The scale path is BUCKETIZATION: quantize time into fixed-width
buckets, explode each interval into the buckets it overlaps, and
equi-join fact.bucket == interval.bucket before applying the exact
range predicate as a post-filter. Each fact row lands in exactly ONE
bucket, so no dedup is needed; each interval duplicates into
ceil(span / width) + 1 buckets — pick ``bucket_width_seconds`` on the
order of the typical interval span so the blow-up stays ~2-3x. The
equi-join hashes both sides on the bucket id: shuffle-partitioned,
AQE-skew-splittable, broadcastable when the interval side is a
dimension — all the machinery a nested-loop join forfeits.

At 100 TB: facts shuffle once on bucket (or not at all when the
exploded interval side broadcasts, the common case — intervals are
dimension-sized); memory per task is one bucket's intervals, never
the whole interval table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_seconds: int = 604_800,
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join ``facts`` to ``intervals`` on
    ``start_col <= ts_col < end_col`` (half-open, the event-time
    convention) via bucketed equi-join.

    ``how`` supports ``inner`` and ``left`` (facts outside every
    interval survive with null interval columns). Interval columns
    must not collide with fact column names (select/alias first).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")

    fact_bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_width_seconds)
    # explode each interval into every bucket it overlaps; the end
    # bound is half-open but an interval ending exactly on a bucket
    # boundary still owns that boundary instant's bucket - 1, so use
    # (end - 1s) for the last covered bucket
    iv_first = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_width_seconds)
    iv_last = F.floor(
        (F.unix_timestamp(F.col(end_col)) - 1) / bucket_width_seconds
    )
    exploded = intervals.withColumn(
        "_rj_bucket", F.explode(F.sequence(iv_first, iv_last))
    )
    if broadcast_intervals:
        exploded = F.broadcast(exploded)

    keyed = facts.withColumn("_rj_bucket", fact_bucket)
    on = [
        keyed["_rj_bucket"] == exploded["_rj_bucket"],
        F.col(ts_col) >= F.col(start_col),
        F.col(ts_col) < F.col(end_col),
    ]
    joined = keyed.join(exploded, on, how)
    return joined.drop(keyed["_rj_bucket"]).drop(exploded["_rj_bucket"])
