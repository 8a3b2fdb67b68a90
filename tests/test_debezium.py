"""Debezium-envelope source adapter (sources/debezium.py): envelope →
engine CDC contract mapping on hand-built JSONL."""

from __future__ import annotations

import json

from pyspark.sql import types as T

ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _write_jsonl(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_envelope_mapping_and_compact(spark, tmp_path):
    from rust_dms_cdc_operator_spark.sources.debezium import (
        debezium_compact,
        read_debezium_jsonl,
    )

    events = [
        # snapshot read -> I
        {"after": {"id": 1, "name": "a"}, "op": "r", "ts_ms": 100},
        # create -> I
        {"after": {"id": 2, "name": "b"}, "op": "c", "ts_ms": 200},
        # update -> U (after image wins)
        {"before": {"id": 2, "name": "b"},
         "after": {"id": 2, "name": "b2"}, "op": "u", "ts_ms": 300},
        # delete -> D, row from BEFORE image (after is null)
        {"before": {"id": 1, "name": "a"}, "op": "d", "ts_ms": 400},
        # truncate/message events carry no row: dropped
        {"op": "t", "ts_ms": 500},
        {"op": "m", "ts_ms": 600},
    ]
    p = str(tmp_path / "dbz.jsonl")
    _write_jsonl(p, events)

    cdc = read_debezium_jsonl(spark, p, ROW)
    got = {(r.id, r.Op): r.name for r in cdc.collect()}
    assert got == {(1, "I"): "a", (2, "I"): "b", (2, "U"): "b2", (1, "D"): "a"}

    final = {r.id: r.name for r in
             debezium_compact(spark, p, ROW, ["id"]).collect()}
    # id 1 deleted last; id 2 survives with the update's after image
    assert final == {2: "b2"}
    assert "Op" not in debezium_compact(spark, p, ROW, ["id"]).columns


def test_late_delete_then_reinsert(spark, tmp_path):
    from rust_dms_cdc_operator_spark.sources.debezium import debezium_compact

    events = [
        {"after": {"id": 5, "name": "x"}, "op": "c", "ts_ms": 100},
        {"before": {"id": 5, "name": "x"}, "op": "d", "ts_ms": 200},
        {"after": {"id": 5, "name": "x2"}, "op": "c", "ts_ms": 300},
    ]
    p = str(tmp_path / "dbz2.jsonl")
    _write_jsonl(p, events)
    final = {r.id: r.name for r in
             debezium_compact(spark, p, ROW, ["id"]).collect()}
    assert final == {5: "x2"}


def test_debezium_compact_property(spark, tmp_path):
    """Property check vs a python dict replay over random op
    sequences: final state == sequential apply of c/u/d in ts order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rust_dms_cdc_operator_spark.sources.debezium import debezium_compact

    ops = st.lists(
        st.tuples(
            st.sampled_from(["c", "u", "d"]),
            st.integers(min_value=1, max_value=4),   # key
            st.sampled_from(["a", "b", "c"]),        # value
        ),
        min_size=0,
        max_size=10,
    )

    counter = iter(range(10_000))

    @settings(max_examples=12, deadline=None, derandomize=True)
    @given(ops)
    def check(seq):
        events = []
        state = {}
        for ts, (op, k, v) in enumerate(seq, start=1):
            row = {"id": k, "name": v}
            if op == "d":
                events.append({"before": row, "op": "d", "ts_ms": ts})
                state.pop(k, None)
            else:
                events.append({"after": row, "op": op, "ts_ms": ts})
                state[k] = v
        p = str(tmp_path / f"prop{next(counter)}.jsonl")
        _write_jsonl(p, events)
        if not events:
            return
        got = {
            r.id: r.name
            for r in debezium_compact(spark, p, ROW, ["id"]).collect()
        }
        assert got == state

    check()

def test_same_millisecond_ties_break_on_file_order(spark, tmp_path):
    """Regression (round-4 advice): same-key events within one ts_ms
    millisecond — common in bursts — must compact deterministically by
    TRUE file order (later line / later file wins), not nondeterministically."""
    import json

    from rust_dms_cdc_operator_spark.sources.debezium import debezium_compact

    d = tmp_path / "ties"
    d.mkdir()
    # one file, three same-key events in the same millisecond:
    # the LAST LINE must win
    with open(d / "a.jsonl", "w") as f:
        for v in ("first", "middle", "last_in_a"):
            f.write(json.dumps(
                {"after": {"id": 1, "name": v}, "op": "u", "ts_ms": 77}
            ) + "\n")
    got = {r.id: r.name for r in debezium_compact(spark, str(d), ROW, ["id"]).collect()}
    assert got == {1: "last_in_a"}

    # a lexicographically later file, same millisecond: file order wins
    with open(d / "b.jsonl", "w") as f:
        f.write(json.dumps(
            {"after": {"id": 1, "name": "last_in_b"}, "op": "u", "ts_ms": 77}
        ) + "\n")
    got = {r.id: r.name for r in debezium_compact(spark, str(d), ROW, ["id"]).collect()}
    assert got == {1: "last_in_b"}
