"""SCD Type-2 history from CDC events — compaction's sibling.

``compact_cdc`` answers "what is the row NOW"; ``build_history``
answers "what was the row at any point in time": every CDC event
becomes a versioned row with a validity interval
``[valid_from, valid_to)``, closed by the key's next event; a delete
event closes the interval without opening a new one. This is the
standard warehouse slowly-changing-dimension-2 shape, and the batch
analogue of the streaming state store's epoch time travel
(``BucketedParquetState.read(epoch=)`` travels by COMMIT, this
travels by EVENT TIME).

Spark-first shape: ONE window per PK ordered by the replay order —
``lead(order_key)`` closes each interval, ``row_number`` (descending)
marks currency. One hash shuffle, linear, whole-stage codegen; the
same single-exchange discipline as compaction (tests/test_plans.py).

Reference parity note: the reference keeps no history — its replay
(cdc_operator.rs:155-217) overwrites in place. History is what the
reference's users lose by replaying into a mutable table; a Spark
engine gets it for one extra column set, so it is exposed as a
first-class operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.functions.dmscols import DMS_OP_COL


def build_history(
    cdc: DataFrame,
    pk_cols: Sequence[str],
    order_col: str,
    op_col: str = DMS_OP_COL,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
    tiebreak_cols: Sequence[str] | None = None,
) -> DataFrame:
    """SCD2 history: one output row per NON-DELETE event, valid from
    its own ``order_col`` until the key's next event (NULL = still
    open). ``is_current`` marks rows whose interval is open AND not
    closed by a delete.

    Delete events emit no row themselves; they close the previous
    version's interval (its ``valid_to`` = delete time) and leave the
    key with no current row — exactly the lifecycle the imperative
    replay applies destructively.

    ``tiebreak_cols`` extend the window ordering when ``order_col``
    (typically event time) is not unique per key — pass a unique id so
    same-instant events order deterministically; the interval bounds
    stay in ``order_col`` units either way. One window, one shuffle.
    """
    pk = [F.col(c) for c in pk_cols]
    order = [F.col(order_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*pk).orderBy(*order)
    nxt = F.lead(F.col(order_col)).over(w)
    out = cdc.select(
        *cdc.columns,
        F.col(order_col).alias(valid_from),
        # the key's next event (ANY op — a delete closes the interval
        # like an update does) bounds this version's validity
        nxt.alias(valid_to),
        nxt.isNull().alias(current_col),
    )
    # delete events emit no version row; a trailing delete leaves the
    # key with no current row (its previous version was closed above)
    return out.filter(F.col(op_col) != "D").drop(op_col)
