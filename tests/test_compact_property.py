"""Property-based check of the core CDC semantics (W1).

Hypothesis generates random event sequences (I/U/D over a small key
space); a pure-Python sequential replay — the reference's imperative
apply order (cdc_operator.rs:155-217) — produces the expected final
state; the Spark window compaction must agree. All generated scenarios
are unioned into ONE DataFrame keyed by scenario id and compacted in a
single Spark job (pk = (scenario, key)), so the property runs at
fixture speed instead of one Spark job per example.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_dms_cdc_operator_spark.operators.compact import compact_cdc

OPS = st.sampled_from(["I", "U", "D"])
EVENT = st.tuples(OPS, st.integers(min_value=0, max_value=7), st.text("ab", max_size=2))
SCENARIO = st.lists(EVENT, min_size=0, max_size=30)


def python_replay(events: list[tuple[str, int, str]]) -> dict[int, str]:
    """The reference's sequential row-by-row apply: I/U upsert, D
    deletes (exact semantics of postgres_operator_impl.rs:310-436 with
    the engine's documented Op == 'D' equality choice)."""
    state: dict[int, str] = {}
    for op, key, val in events:
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@settings(max_examples=3, deadline=None)
@given(st.lists(SCENARIO, min_size=40, max_size=40))
def test_window_compaction_equals_sequential_replay(spark, scenarios):
    rows = []
    expected: dict[tuple[int, int], str] = {}
    for sid, events in enumerate(scenarios):
        for seq, (op, key, val) in enumerate(events):
            rows.append((sid, op, key, val, seq))
        for key, val in python_replay(events).items():
            expected[(sid, key)] = val
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "sc int, Op string, k int, v string, seq long"
    )
    out = compact_cdc(df, ["sc", "k"], order_cols=["seq"])
    got = {(r.sc, r.k): r.v for r in out.collect()}
    assert got == expected
