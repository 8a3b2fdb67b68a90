"""Pre-flight contract checks against the driver testdata.

Round-3 lesson: the driver regenerated ``events.parquet`` with ``ts``
as ``timestamp[us]`` where earlier rounds wrote int64 epoch-nanos, and
the drift surfaced only deep inside the oracle run. These tests read
just the parquet footers (pyarrow, no Spark job) so the next fixture
drift fails in milliseconds with a pointed message, and a synthetic
drifted file proves the legacy branch of ``fixtures.normalized_ts``
still works.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rust_dms_cdc_operator_spark import fixtures

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata not present at {SF_DIR}"
)


@pytest.mark.parametrize("table", sorted(fixtures.EXPECTED_COLUMNS))
def test_fixture_columns(table: str) -> None:
    path = f"{SF_DIR}/{table}.parquet"
    assert os.path.exists(path), f"fixture table missing: {path}"
    names = pq.read_schema(path).names
    assert names == fixtures.EXPECTED_COLUMNS[table], (
        f"{table} fixture columns drifted: engine expects "
        f"{fixtures.EXPECTED_COLUMNS[table]}, file has {names} — update "
        "fixtures.EXPECTED_COLUMNS and audit readers of the changed columns"
    )


def test_events_ts_encoding_supported() -> None:
    """The engine supports exactly two ts encodings; anything else must
    fail HERE (seconds), not mid-oracle-run (minutes)."""
    t = pq.read_schema(f"{SF_DIR}/events.parquet").field("ts").type
    ok = t in (pa.int64(), pa.timestamp("us"), pa.timestamp("ns")) or (
        isinstance(t, pa.TimestampType)
    )
    assert ok, (
        f"events.ts drifted to unsupported encoding {t}; extend "
        "fixtures.normalized_ts before anything downstream runs"
    )


def test_read_events_normalizes_current_fixture(spark) -> None:
    ev = fixtures.read_events(spark, SF_DIR)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.limit(1).count() == 1


def test_read_events_normalizes_legacy_nanos(spark, tmp_path) -> None:
    """Write an int64-epoch-nanos events file (the round-1/2 driver
    encoding) and check the fallback branch still truncates to the
    same microseconds the current encoding yields."""
    cur = pq.read_table(f"{SF_DIR}/events.parquet").slice(0, 100)
    us = cur.column("ts").cast(pa.int64())  # timestamp[us] → epoch-us
    nanos = pa.compute.multiply(us, 1000)
    legacy = cur.set_column(
        cur.schema.get_field_index("ts"), "ts", nanos.cast(pa.int64())
    )
    pq.write_table(legacy, str(tmp_path / "events.parquet"))

    got = fixtures.read_events(spark, str(tmp_path))
    want = fixtures.read_events(spark, SF_DIR).limit(100)
    assert dict(got.dtypes)["ts"] == "timestamp"
    assert [r.ts for r in got.orderBy("event_id").collect()] == [
        r.ts for r in want.orderBy("event_id").collect()
    ]


def test_events_stream_schema_matches_batch(spark) -> None:
    assert fixtures.events_stream_schema(spark, SF_DIR) == (
        spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    )
