"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stateful logic the built-in aggregations can't
express (per-key custom accumulators, decaying counters, cross-event
feature state). State lives in Spark's state store (checkpointed,
partitioned by key — scales horizontally like any keyed state);
batches arrive Arrow-vectorized per key group.

``running_profile`` is the reference shape: per key it maintains
(event count, value sum, last event time) across microbatches and
emits the updated profile every batch — the building block for
online feature tables over CDC/event streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("events_n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_ts", T.StringType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_ts", T.StringType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, vsum, last = state.get if state.exists else (0, 0.0, "")
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        mx = str(pdf["ts"].max())
        last = max(last, mx)
    state.update((n, vsum, last))
    yield pd.DataFrame(
        {"key": [key[0]], "events_n": [n], "value_sum": [vsum], "last_ts": [last]}
    )


def running_profile(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, value sum, last ts) over a stream of
    (key, ts string, value double) — one state entry per key, updated
    and emitted each microbatch the key appears in."""
    keyed = events.selectExpr(
        f"{key_col} as key", "cast(ts as string) as ts", "value"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("events_n", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)
# the open session carries across microbatches as (start, end, count);
# timestamps ride as ISO strings (lexicographically ordered, exactly
# reversible at microsecond precision)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_start", T.StringType()),
        T.StructField("open_end", T.StringType()),
        T.StructField("open_n", T.LongType()),
    ]
)


def _make_session_update(gap_seconds: float):
    gap = pd.Timedelta(seconds=gap_seconds)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_start, s_end, s_n = state.get
            open_start = pd.Timestamp(s_start)
            open_end = pd.Timestamp(s_end)
            open_n = int(s_n)
        else:
            open_start = open_end = None
            open_n = 0

        rows: list[tuple] = []
        ts_all = pd.concat([p["ts"] for p in pdfs]).sort_values()
        for ts in ts_all:
            if open_start is None:
                open_start = open_end = ts
                open_n = 1
            elif ts - open_end >= gap:
                # half-open interval: an event at exactly end+gap
                # STARTS a new session (Spark session_window semantics)
                rows.append((key[0], open_start, open_end, open_n, True))
                open_start = open_end = ts
                open_n = 1
            else:
                open_end = max(open_end, ts)
                open_n += 1
        if open_start is not None:
            # provisional: re-emitted (possibly extended) next batch;
            # an upsert sink keyed on (user_id, session_start) converges
            rows.append((key[0], open_start, open_end, open_n, False))
            state.update(
                (open_start.isoformat(), open_end.isoformat(), open_n)
            )
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_start", "session_end", "events_n", "closed"],
        )

    return _update


def sessionize_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Custom stateful streaming sessionization via
    ``applyInPandasWithState`` — the operator shape Spark's built-in
    ``session_window`` can't replace once per-session custom logic
    (abandonment features, mid-session emission, decaying scores) is
    needed. State is ONE open session per key — O(active keys), not
    O(events) — and closed sessions emit exactly once; the still-open
    session re-emits each batch it grows, so an upsert sink keyed on
    (user_id, session_start) converges to the batch answer.

    Cross-batch correctness assumes per-key event-time-ordered arrival
    (the replay contract: one sorted source file per microbatch, or an
    upstream watermark+sort); late events inside a batch are handled by
    the in-batch sort."""
    keyed = events.selectExpr(
        f"{key_col} as user_id", f"{ts_col} as ts"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_session_update(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    stream,
    key_cols,
    event_time_col: str,
    delay: str = "10 minutes",
):
    """Streaming exact-dedup: emit the FIRST arrival of each key and
    drop re-deliveries within the watermark horizon — the streaming
    form of operators.dedup.exact_dedup for documents/events arriving
    continuously (at-least-once sources re-deliver; this bounds the
    dedup state by time instead of holding every key forever).

    ``dropDuplicatesWithinWatermark`` keys the state store by
    ``key_cols`` and expires entries once the watermark passes their
    event time + delay — state stays O(keys per horizon), the property
    that keeps 24/7 dedup viable at firehose rates.
    """
    return stream.withWatermark(
        event_time_col, delay
    ).dropDuplicatesWithinWatermark([*key_cols])
