"""Oracle parity for the two event-time queries at all three driver
scale factors (VERDICT r3 item 5): tumbling-window counts and
sessionization must agree with DuckDB bit-for-bit at sf0.001/0.01/0.1,
not just at the driver's correctness scale — the queries are the ones
most exposed to fixture-encoding drift (see fixtures.normalized_ts).
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb
import pytest

from rust_dms_cdc_operator_spark.inventory_llm import (
    ORACLE_SQL_LLM,
    q_events_sessionize,
    q_events_tumbling_counts,
)

SCALES = ["sf0.001", "sf0.01"]
if os.environ.get("SPARK_GRAFT_TEST_SF01", "1") != "0":
    SCALES.append("sf0.1")

QUERIES = {
    "events_tumbling_counts": q_events_tumbling_counts,
    "events_sessionize": q_events_sessionize,
}


def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<nan>" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


@pytest.mark.parametrize("sf", SCALES)
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_event_time_oracle_parity(spark, name: str, sf: str) -> None:
    sf_dir = f"/root/testdata/{sf}"
    if not os.path.isdir(sf_dir):
        pytest.skip(f"testdata not present at {sf_dir}")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{sf_dir}/events.parquet'"
    )
    sdf = QUERIES[name](spark, sf_dir)
    cols = sorted(c.lower() for c in sdf.columns)
    rel = con.sql(ORACLE_SQL_LLM[name])
    assert sorted(c.lower() for c in rel.columns) == cols

    def rows(colnames, data):
        order = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
        return sorted(tuple(_canon(r[i]) for i in order) for r in data)

    s = rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    d = rows(rel.columns, rel.fetchall())
    assert len(s) == len(d), f"{name}@{sf}: rowcount {len(s)} vs {len(d)}"
    assert s == d, f"{name}@{sf}: value mismatch"
