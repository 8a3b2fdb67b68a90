"""Pure-Python manifest tests (SURVEY §2.1 S2-S6; FIXTURES.md A.4)."""

from __future__ import annotations

from datetime import datetime

import pytest

from rust_dms_cdc_operator_spark.payloads import (
    CdcSnapshotPayload,
    LoadMode,
    TableMode,
    resolve_table_mode,
)
from rust_dms_cdc_operator_spark.sources.manifest import (
    ParquetFile,
    build_manifest,
    classify_and_order,
    date_start_key,
    filter_by_date_window,
    table_prefix,
)
from tests import cdc_fixtures


def test_classification():
    assert ParquetFile("a/LOAD00000001.parquet").is_load_file()
    assert ParquetFile("a/LOAD00000001.parquet").is_first_load_file()
    assert ParquetFile("a/LOAD00000002.parquet").is_load_file()
    assert not ParquetFile("a/LOAD00000002.parquet").is_first_load_file()
    assert not ParquetFile("a/2026/08/01/20260801-1.parquet").is_load_file()
    # substring semantics per s3_operator.rs:43-45
    assert ParquetFile("a/xLOADy.parquet").is_load_file()


def test_prefix_and_start_key():
    assert table_prefix("pre", "db", "sch", "t") == "pre/db/sch/t/"
    assert table_prefix("", "db", "sch", "t") == "db/sch/t/"
    # zero-padded month/day (s3_operator.rs:145-154)
    assert (
        date_start_key("pre", "db", "sch", "t", "2026-08-01")
        == "pre/db/sch/t/2026/08/01/"
    )


def test_date_window_exclusive_bounds_and_load_always_kept():
    mk = lambda key, ts: ParquetFile(key, ts)
    start, stop = datetime(2026, 8, 1), datetime(2026, 8, 3)
    files = [
        mk("t/LOAD00000001.parquet", datetime(2020, 1, 1)),  # old LOAD kept
        mk("t/2026/07/31/a.parquet", datetime(2026, 7, 31)),  # before start
        mk("t/2026/08/01/b.parquet", start),  # == start → excluded (exclusive)
        mk("t/2026/08/02/c.parquet", datetime(2026, 8, 2)),  # in window
        mk("t/2026/08/03/d.parquet", stop),  # == stop → excluded
        mk("t/2026/08/04/e.parquet", datetime(2026, 8, 4)),  # after stop
    ]
    kept = filter_by_date_window(files, start, stop)
    assert [f.key for f in kept] == [
        "t/LOAD00000001.parquet",
        "t/2026/08/02/c.parquet",
    ]
    # no stop → everything after start
    kept = filter_by_date_window(files, start, None)
    assert len(kept) == 4


def test_load_first_ordering_and_strict_mode():
    files = [
        ParquetFile("t/2026/08/01/b.parquet"),
        ParquetFile("t/LOAD00000002.parquet"),
        ParquetFile("t/2026/08/02/c.parquet"),
        ParquetFile("t/LOAD00000001.parquet"),
    ]
    ordered = classify_and_order(files)
    assert [f.key for f in ordered] == [
        "t/LOAD00000001.parquet",
        "t/LOAD00000002.parquet",
        "t/2026/08/01/b.parquet",
        "t/2026/08/02/c.parquet",
    ]
    # literal reference snapshot behavior: CDC dropped (s3_operator.rs:178-184)
    strict = classify_and_order(files, strict_reference_mode=True)
    assert [f.key for f in strict] == [
        "t/LOAD00000001.parquet",
        "t/LOAD00000002.parquet",
    ]


def test_mode_dispatch(tmp_path):
    root = str(tmp_path)
    cdc_fixtures.write_customers_cdc(root)

    date_aware = build_manifest(
        mode=LoadMode.DATE_AWARE,
        root=root,
        database=cdc_fixtures.DB,
        schema=cdc_fixtures.SCHEMA,
        table="customers_cdc",
        start_date="2000-01-01",
    )
    assert len(date_aware) == 3
    assert date_aware[0].is_first_load_file()

    full_load = build_manifest(
        mode="full-load-only",
        root=root,
        database=cdc_fixtures.DB,
        schema=cdc_fixtures.SCHEMA,
        table="customers_cdc",
    )
    assert [f.file_name for f in full_load] == ["LOAD00000001.parquet"]

    absolute = build_manifest(
        mode=LoadMode.ABSOLUTE_PATH, root=root, absolute_path="x/y.parquet"
    )
    assert [f.key for f in absolute] == ["x/y.parquet"]


def test_date_aware_accepts_reference_zulu_format(tmp_path):
    """The reference documents %Y-%m-%dT%H:%M:%SZ dates (main.rs
    --start-date). Python 3.11+ parses the Z as tz-aware; comparisons
    against naive-UTC mtimes must still work (round-1 ADVICE)."""
    root = str(tmp_path)
    cdc_fixtures.write_customers_cdc(root)
    zulu = build_manifest(
        mode=LoadMode.DATE_AWARE,
        root=root,
        database=cdc_fixtures.DB,
        schema=cdc_fixtures.SCHEMA,
        table="customers_cdc",
        start_date="2000-01-01T00:00:00Z",
        stop_date="2100-01-01T00:00:00Z",
    )
    naive = build_manifest(
        mode=LoadMode.DATE_AWARE,
        root=root,
        database=cdc_fixtures.DB,
        schema=cdc_fixtures.SCHEMA,
        table="customers_cdc",
        start_date="2000-01-01",
    )
    assert [f.key for f in zulu] == [f.key for f in naive]
    # explicit-offset form normalizes to the same UTC instant
    from rust_dms_cdc_operator_spark.sources.manifest import parse_naive_utc

    assert parse_naive_utc("2024-01-02T03:00:00+01:00") == parse_naive_utc(
        "2024-01-02T02:00:00Z"
    )


def test_date_aware_requires_start_date(tmp_path):
    with pytest.raises(ValueError, match="start_date"):
        build_manifest(mode=LoadMode.DATE_AWARE, root=str(tmp_path), table="t")
    with pytest.raises(ValueError, match="start_date"):
        CdcSnapshotPayload(bucket_name="b", schema_name="s")


def test_table_mode_resolution():
    assert resolve_table_mode(["a"], []) is TableMode.INCLUDE
    assert resolve_table_mode([], ["b"]) is TableMode.EXCLUDE
    assert resolve_table_mode([], []) is TableMode.ALL
    # included wins when both set (snapshot_payload.rs:78-86)
    assert resolve_table_mode(["a"], ["b"]) is TableMode.INCLUDE


def test_list_s3_pagination_contract():
    """The ListObjectsV2 walker (s3_operator.rs:210-248 parity) against
    a fake client implementing the boto3 response contract: StartAfter
    forwarded on the FIRST call only, ContinuationToken threaded across
    pages, Contents accumulated in order, tz-aware LastModified
    normalized to naive UTC. Closes the round-5 'boto3 path never
    executed' gap without a network."""
    from datetime import timezone

    from rust_dms_cdc_operator_spark.sources.manifest import list_s3

    pages = [
        {
            "Contents": [
                {
                    "Key": "db/s/t/LOAD00000001.parquet",
                    "LastModified": datetime(
                        2026, 8, 1, 12, 0, tzinfo=timezone.utc
                    ),
                },
                {
                    "Key": "db/s/t/2026/08/02/a.parquet",
                    "LastModified": datetime(
                        2026, 8, 2, 1, 0, tzinfo=timezone.utc
                    ),
                },
            ],
            "IsTruncated": True,
            "NextContinuationToken": "tok-1",
        },
        {
            "Contents": [
                {
                    "Key": "db/s/t/2026/08/03/b.parquet",
                    "LastModified": datetime(
                        2026, 8, 3, 1, 0, tzinfo=timezone.utc
                    ),
                },
            ],
            "IsTruncated": False,
        },
    ]

    class FakeClient:
        def __init__(self):
            self.calls = []

        def list_objects_v2(self, **kwargs):
            self.calls.append(dict(kwargs))
            return pages[len(self.calls) - 1]

    fake = FakeClient()
    got = list_s3("bkt", "db/s/t/", start_after="db/s/t/0", client=fake)
    assert [f.key for f in got] == [
        "db/s/t/LOAD00000001.parquet",
        "db/s/t/2026/08/02/a.parquet",
        "db/s/t/2026/08/03/b.parquet",
    ]
    # naive-UTC normalization (manifest comparisons are naive)
    assert got[0].last_modified == datetime(2026, 8, 1, 12, 0)
    assert got[0].last_modified.tzinfo is None
    # first call: Bucket + Prefix + StartAfter, no token
    assert fake.calls[0] == {
        "Bucket": "bkt", "Prefix": "db/s/t/", "StartAfter": "db/s/t/0",
    }
    # second call threads the continuation token
    assert fake.calls[1]["ContinuationToken"] == "tok-1"


def test_list_s3_empty_bucket():
    from rust_dms_cdc_operator_spark.sources.manifest import list_s3

    class Empty:
        def list_objects_v2(self, **kwargs):
            return {"IsTruncated": False}

    assert list_s3("bkt", "p/", client=Empty()) == []
