"""As-of (time-travel) join — the time-series primitive Spark lacks.

``asof_join(left, right, ...)`` attaches, to every left row, the
latest right row with the same key whose timestamp is ``<=`` the left
timestamp (backward as-of; the semantics of DuckDB/pandas
``ASOF JOIN`` and kdb's ``aj``). The canonical uses here: enrich CDC
events with the dimension state that was current WHEN THE EVENT
HAPPENED (not today's state), price/telemetry alignment, and
point-in-time-correct feature joins for training data (no leakage
from the future).

Spark-first shape — the UNION-WINDOW form, not a range join:

1. union the two inputs with a side tag (right rows carry their
   payload, left rows carry NULLs);
2. ONE window per key ordered by (ts, side, order tiebreak):
   ``last(payload, ignorenulls)`` over unbounded-preceding carries the
   most recent right payload forward to each left row;
3. keep the left rows.

Cost: one hash shuffle on the key + one window — linear, no
candidate explosion. A range-join formulation (left ⋈ right on key
AND r.ts <= l.ts, then argmax) is quadratic per key in the worst
case and needs a dedicated range-join optimizer to be viable;
the union-window form needs nothing beyond stock exchange+window.
Right rows sort BEFORE left rows at equal timestamps, so a
same-instant right row is visible (inclusive ``<=``, matching
DuckDB's ASOF semantics).

Skew note: a hot key funnels its full history into one window task —
for Zipfian keys compose with the bucketing/salting levers, or
pre-compact the right side per (key, coarse time bucket) first. The
default engine usage (PK-keyed CDC enrichment) has per-key histories
bounded by churn, where the single window is the right plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (visible first at a tie), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    tolerance_expr: F.Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the latest
    ``right`` row's ``value_cols`` (suffixed) with ``right_ts <=
    left_ts`` on the same ``on`` keys; NULLs where no prior right row
    exists.

    ``value_cols`` defaults to every right column that is neither a
    key nor the timestamp. ``tolerance_expr`` (e.g.
    ``F.expr("INTERVAL 1 HOUR")``) voids matches older than
    ``left_ts - tolerance`` — the pandas ``merge_asof(tolerance=)``
    contract — applied AFTER the carry-forward, so it is a filter on
    the matched timestamp, not a join-condition explosion.

    Ties: right rows at the exact left timestamp ARE visible
    (inclusive). Among right rows sharing (key, ts), the LAST by
    input order of ``value_cols`` carry wins — pre-compact the right
    side if that order matters; the engine's CDC sources always carry
    a unique (file, row) replay order upstream.
    """
    on = list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    value_cols = list(value_cols)

    r = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in value_cols]).alias("_asof_payload"),
    )
    l_cols = [F.col(c) for c in left.columns]
    lf = left.select(
        *l_cols,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None)
        .cast(r.schema["_asof_payload"].dataType)
        .alias("_asof_payload"),
    )
    # right rows lack the left-only columns: NULL-fill via unionByName
    u = r.unionByName(lf, allowMissingColumns=True)
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(F.col("_asof_ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *u.columns,
        F.last("_asof_payload", ignorenulls=True).over(w).alias("_m"),
        F.last(
            F.when(F.col(_SIDE) == 0, F.col("_asof_ts")), ignorenulls=True
        ).over(w).alias("_m_ts"),
    ).filter(F.col(_SIDE) == 1)
    matched = F.col("_m")
    if tolerance_expr is not None:
        in_tol = F.col("_m_ts") >= (F.col("_asof_ts") - tolerance_expr)
        matched = F.when(in_tol, matched)
    out_vals = [
        matched.getField(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.select(*left.columns, *out_vals)
