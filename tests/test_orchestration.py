"""End-to-end orchestration: snapshot a multi-table DMS drop to a
parquet target, then validate — through the library API and the CLI."""

from __future__ import annotations

import json

from rust_dms_cdc_operator_spark.cli import main as cli_main
from rust_dms_cdc_operator_spark.payloads import (
    CdcSnapshotPayload,
    CdcValidatePayload,
    LoadMode,
)
from rust_dms_cdc_operator_spark.snapshot import ParquetTarget, snapshot
from rust_dms_cdc_operator_spark.validate import drill_down, validate
from tests import cdc_fixtures


def _drop(root: str) -> dict:
    return {
        "customers_cdc": cdc_fixtures.write_customers_cdc(root),
        "orders_cdc": cdc_fixtures.write_orders_cdc(root),
        "geo_cdc": cdc_fixtures.write_geo_cdc(root),
    }


def test_snapshot_all_tables(spark, tmp_path):
    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    payload = CdcSnapshotPayload(
        bucket_name="local",
        schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB,
        mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    pks = {t: f["pk"] for t, f in fx.items()}
    written = snapshot(spark, payload, ParquetTarget(tgt), root, pks)
    assert set(written) == set(fx)
    # replayed state matches each fixture's sequential-replay oracle
    for t, f in fx.items():
        got = spark.read.parquet(written[t])
        assert got.count() == len(f["expected"])


def test_snapshot_include_exclude(spark, tmp_path):
    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    base = dict(
        bucket_name="local",
        schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB,
        mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    inc = snapshot(
        spark,
        CdcSnapshotPayload(**base, included_tables=["geo_cdc"]),
        ParquetTarget(tgt + "_inc"), root, {},
    )
    assert set(inc) == {"geo_cdc"}
    exc = snapshot(
        spark,
        CdcSnapshotPayload(**base, excluded_tables=["geo_cdc"]),
        ParquetTarget(tgt + "_exc"), root, {},
    )
    assert set(exc) == {"customers_cdc", "orders_cdc"}


def test_snapshot_partial_failure_commits_others(spark, tmp_path):
    """buffer_unordered drain semantics (round 11, verdict item 8;
    cdc_operator.rs:244-249): one table's future failing mid-fan-out
    must not abort — or roll back — its siblings. Wound one table
    (corrupt LOAD parquet), snapshot the schema, and require the
    other two tables committed + readable while the failure surfaces
    with the wounded table's name and exception."""
    import glob

    import pytest as _pytest

    from rust_dms_cdc_operator_spark.snapshot import SnapshotPartialFailure

    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    load = glob.glob(
        f"{root}/{cdc_fixtures.DB}/{cdc_fixtures.SCHEMA}/orders_cdc/"
        "LOAD*.parquet"
    )
    assert load, "fixture layout changed"
    with open(load[0], "wb") as f:
        f.write(b"this is not parquet")
    payload = CdcSnapshotPayload(
        bucket_name="local",
        schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB,
        mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    pks = {t: f["pk"] for t, f in fx.items()}
    with _pytest.raises(SnapshotPartialFailure) as exc_info:
        snapshot(spark, payload, ParquetTarget(tgt), root, pks)
    err = exc_info.value
    assert set(err.failures) == {"orders_cdc"}
    assert set(err.results) == {"customers_cdc", "geo_cdc"}
    # the committed siblings are real, complete state tables
    for t in err.results:
        got = spark.read.parquet(err.results[t])
        assert got.count() == len(fx[t]["expected"])


def test_snapshot_over_file_uri_matches_local(spark, tmp_path):
    """The S3 read-path contract: the same drop snapshotted through a
    scheme-qualified root (``file://`` → JVM Hadoop FileSystem — the
    identical code path an ``s3a://`` run takes for listing, sizing,
    discovery, and the rank join) must produce byte-identical state to
    the plain local-path run."""
    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    payload = CdcSnapshotPayload(
        bucket_name="local",
        schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB,
        mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    pks = {t: f["pk"] for t, f in fx.items()}
    local = snapshot(spark, payload, ParquetTarget(tgt), root, pks)
    uri = snapshot(
        spark,
        payload,
        ParquetTarget("file://" + str(tmp_path / "state_uri")),
        "file://" + root,
        pks,
    )
    assert set(local) == set(uri) == set(fx)
    for t in fx:
        a = sorted(str(r) for r in spark.read.parquet(local[t]).collect())
        b = sorted(str(r) for r in spark.read.parquet(uri[t]).collect())
        assert a == b, t


def test_validate_reports(spark, tmp_path):
    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    payload = CdcSnapshotPayload(
        bucket_name="local", schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB, mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    pks = {t: f["pk"] for t, f in fx.items()}
    written = snapshot(spark, payload, ParquetTarget(tgt), root, pks)

    cust = spark.read.parquet(written["customers_cdc"])
    # identical → clean report
    rep = validate(
        spark,
        CdcValidatePayload(schema_name="public", chunk_size=50),
        {"customers_cdc": (cust, cust, ["id"])},
    )["customers_cdc"]
    assert rep.ok and rep.counts_match

    # corrupt one row → count matches, chunks don't; drill-down finds it
    from pyspark.sql import functions as F

    bad = cust.withColumn(
        "name", F.when(F.col("id") == 5, "TAMPERED").otherwise(F.col("name"))
    )
    rep2 = validate(
        spark,
        CdcValidatePayload(schema_name="public", chunk_size=50),
        {"customers_cdc": (cust, bad, ["id"])},
    )["customers_cdc"]
    assert rep2.counts_match and not rep2.ok
    assert len(rep2.mismatched_chunks) == 1
    rows = drill_down(cust, bad, ["id"]).collect()
    assert [(r.id, r.diff_status) for r in rows] == [(5, "different")]


def test_cli_end_to_end(spark, tmp_path, capsys):
    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    rc = cli_main([
        "validate",
        "--local-root", root,
        "--target-parquet-root", tgt,
        "--database-name", cdc_fixtures.DB,
        "--database-schema", cdc_fixtures.SCHEMA,
        "--start-date", "2000-01-01",
        "--primary-keys", json.dumps({t: f["pk"] for t, f in fx.items()}),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out["snapshot"]) == set(fx)
    assert all(v["ok"] for v in out["validate"].values())


def test_cli_conflicting_flags(tmp_path, capsys):
    assert cli_main(["validate", "--only-datadiff", "--only-snapshot"]) == 2
    # error text matches the reference panic (cdc_operator_payload.rs:72-74)
    assert (
        "Cannot run both only_datadiff and only_snapshot at the same time"
        in capsys.readouterr().err
    )
    assert cli_main([
        "validate", "--included-tables", "a", "--excluded-tables", "b",
    ]) == 2
    assert cli_main(["snapshot", "--only-datadiff"]) == 2


def test_cli_snapshot_command(spark, tmp_path, capsys):
    """`snapshot` == the reference's `validate --only-snapshot`: writes
    state tables, runs no datadiff."""
    root, tgt = str(tmp_path / "drop2"), str(tmp_path / "state2")
    fx = _drop(root)
    rc = cli_main([
        "snapshot",
        "--local-root", root,
        "--target-parquet-root", tgt,
        "--database-name", cdc_fixtures.DB,
        "--database-schema", cdc_fixtures.SCHEMA,
        "--start-date", "2000-01-01",
        "--primary-keys", json.dumps({t: f["pk"] for t, f in fx.items()}),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out["snapshot"]) == set(fx)
    assert "validate" not in out


def test_cli_snapshot_partial_failure_exit_code(spark, tmp_path, capsys):
    """CLI surface of SnapshotPartialFailure (round 11): a wounded
    table is reported per-table on stderr and in the JSON, committed
    siblings stay in the result, and the exit code is 1 — the
    reference's drain-then-report shape, not a traceback."""
    import glob

    root, tgt = str(tmp_path / "drop3"), str(tmp_path / "state3")
    fx = _drop(root)
    load = glob.glob(
        f"{root}/{cdc_fixtures.DB}/{cdc_fixtures.SCHEMA}/geo_cdc/"
        "LOAD*.parquet"
    )
    with open(load[0], "wb") as f:
        f.write(b"broken")
    rc = cli_main([
        "snapshot",
        "--local-root", root,
        "--target-parquet-root", tgt,
        "--database-name", cdc_fixtures.DB,
        "--database-schema", cdc_fixtures.SCHEMA,
        "--start-date", "2000-01-01",
        "--primary-keys", json.dumps({t: f["pk"] for t, f in fx.items()}),
    ])
    assert rc == 1
    captured = capsys.readouterr()
    out = json.loads(captured.out)
    assert set(out["snapshot"]) == {"customers_cdc", "orders_cdc"}
    assert set(out["snapshot_failures"]) == {"geo_cdc"}
    assert "snapshot of table geo_cdc failed" in captured.err


def test_cli_interactive_mode_builds_reference_payload():
    """The interactive config mirrors the reference client's inquire
    prompts (main.rs:167-287): same labels, defaults on empty answers,
    CamelCase mode names accepted."""
    from rust_dms_cdc_operator_spark.cli import build_parser, interactive_args

    answers = iter([
        "my-bucket",            # S3 Bucket name
        "",                     # S3 Prefix -> default data/landing/rds/mydb
        "", "",                 # source/target postgres urls -> defaults
        "",                     # Database Schema -> public
        "t1,t2",                # Tables to include
        "",                     # Tables to exclude
        "FullLoadOnly",         # Mode (CamelCase, as the reference accepts)
        "2024-02-14T10:00:00Z", # Start date (reference's documented format)
        "",                     # Stop date
        "500",                  # chunk size
        "",                     # max connections -> 100
        "",                     # start position -> 0
        "", "",                 # local-root / parquet-root
        "y",                    # only datadiff
        "",                     # only snapshot
        "", "",                 # TLS confirms
    ])
    prompts: list[str] = []

    def ask(label: str) -> str:
        prompts.append(label)
        return next(answers)

    argv = interactive_args(ask)
    assert prompts[0] == "S3 Bucket name [bucket_name]: "
    assert "Number of rows to compare (in batches) [1000]: " in prompts
    args = build_parser().parse_args(argv)
    assert args.command == "validate"
    assert args.bucket_name == "my-bucket"
    assert args.s3_prefix == "data/landing/rds/mydb"
    assert args.database_schema == "public"
    assert args.included_tables == "t1,t2"
    assert args.mode == "full-load-only"
    assert args.start_date == "2024-02-14T10:00:00Z"
    assert args.chunk_size == 500
    assert args.max_connections == 100
    assert args.only_datadiff and not args.only_snapshot

    # the interactive path must resolve to the SAME CdcSnapshotPayload
    # as the equivalent explicit-flags invocation (the r3 verdict's
    # done-bar for inquire-mode parity)
    from rust_dms_cdc_operator_spark.cli import snapshot_payload_from_args

    flag_args = build_parser().parse_args([
        "validate",
        "--bucket-name", "my-bucket",
        "--s3-prefix", "data/landing/rds/mydb",
        "--database-schema", "public",
        "--included-tables", "t1,t2",
        "--mode", "full-load-only",
        "--start-date", "2024-02-14T10:00:00Z",
        "--chunk-size", "500",
        "--only-datadiff",
    ])
    assert snapshot_payload_from_args(args) == snapshot_payload_from_args(
        flag_args
    )


def test_resume_snapshot_heals_crashed_swap(spark, tmp_path):
    """Crash between rename-aside and rename-in leaves no live dir;
    the next resume run must restore from the complete copy instead of
    failing on a missing directory (round-2 review finding)."""
    import os
    import shutil

    from rust_dms_cdc_operator_spark.snapshot import resume_snapshot

    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    pks = {t: f["pk"] for t, f in fx.items()}
    base = dict(
        bucket_name="local", schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB, mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    snapshot(spark, CdcSnapshotPayload(**base), ParquetTarget(tgt), root, pks)
    path = os.path.join(tgt, cdc_fixtures.SCHEMA, "customers_cdc")
    want = spark.read.parquet(path).count()
    # simulate the crash: live state renamed aside, new copy not in
    os.rename(path, f"{path}.old")
    resumed = resume_snapshot(
        spark, CdcSnapshotPayload(**base), ParquetTarget(tgt), root, pks,
        since="2100-01-01",  # no new files: pure heal pass
    )
    assert resumed == {}
    assert spark.read.parquet(path).count() == want
    assert not os.path.exists(f"{path}.old")
    # other crash flavor: only the .resume copy (with _SUCCESS) exists
    shutil.move(path, f"{path}.resume")
    resume_snapshot(
        spark, CdcSnapshotPayload(**base), ParquetTarget(tgt), root, pks,
        since="2100-01-01",
    )
    assert spark.read.parquet(path).count() == want


def test_resume_snapshot_over_file_uri(spark, tmp_path):
    """Incremental resume through a scheme-qualified root: discovery,
    the exclusive `since` window, and the rename-aside swap all run
    through the Hadoop FileSystem branch (fsio), including directory
    renames — the piece plain os.* cannot do on s3a."""
    import os

    from rust_dms_cdc_operator_spark.snapshot import resume_snapshot
    from tests.cdc_fixtures import write_customers_cdc

    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = {"customers_cdc": write_customers_cdc(root)}
    pks = {t: f["pk"] for t, f in fx.items()}
    base = dict(
        bucket_name="local", schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB, mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    snapshot(
        spark, CdcSnapshotPayload(**base),
        ParquetTarget("file://" + tgt), "file://" + root, pks,
    )
    path = os.path.join(tgt, cdc_fixtures.SCHEMA, "customers_cdc")
    before = {str(r) for r in spark.read.parquet(path).collect()}
    # age every existing file, then drop one new CDC event
    table_dir = os.path.join(
        root, cdc_fixtures.DB, cdc_fixtures.SCHEMA, "customers_cdc"
    )
    for dirpath, _d, files in os.walk(table_dir):
        for f in files:
            os.utime(os.path.join(dirpath, f), (1000, 1000))
    import pyarrow as pa
    import pyarrow.parquet as pq

    new_dir = os.path.join(table_dir, "2031", "01", "01")
    os.makedirs(new_dir, exist_ok=True)
    any_row = spark.read.parquet(path).first().asDict()
    cols = {
        "Op": ["D"],
        "_dms_ingestion_timestamp": ["2031-01-01 00:00:00"],
    }
    for k, v in any_row.items():
        if k not in cols:
            cols[k] = [v]
    new_file = os.path.join(new_dir, "20310101-1.parquet")
    pq.write_table(pa.table(cols), new_file)
    # the date window filters on last_modified: place it after `since`
    t2031 = 1_925_000_000  # 2031-01-02
    os.utime(new_file, (t2031, t2031))

    resumed = resume_snapshot(
        spark, CdcSnapshotPayload(**base),
        ParquetTarget("file://" + tgt), "file://" + root, pks,
        since="2030-01-01",
    )
    assert set(resumed) == {"customers_cdc"}
    after = {str(r) for r in spark.read.parquet(path).collect()}
    assert len(after) == len(before) - 1  # the delete applied
    assert not os.path.exists(f"{path}.old") and not os.path.exists(
        f"{path}.resume"
    )


def test_conn_config_tls_properties():
    """X3 parity: accept_invalid_certs maps to the pg-JDBC
    non-validating TLS factory; explicit properties win."""
    from rust_dms_cdc_operator_spark.payloads import ConnConfig

    plain = ConnConfig(url="jdbc:postgresql://h/db")
    assert plain.jdbc_properties() == {}
    lax = ConnConfig(url="jdbc:postgresql://h/db", accept_invalid_certs=True)
    assert lax.jdbc_properties() == {
        "ssl": "true",
        "sslfactory": "org.postgresql.ssl.NonValidatingFactory",
    }
    override = ConnConfig(
        url="jdbc:postgresql://h/db",
        accept_invalid_certs=True,
        properties={"sslfactory": "custom.Factory", "user": "u"},
    )
    got = override.jdbc_properties()
    assert got["sslfactory"] == "custom.Factory" and got["user"] == "u"


def test_resume_snapshot_incremental(spark, tmp_path):
    """Initial snapshot up to a cutoff + resume_snapshot(since=cutoff)
    must equal one full replay — and the resume must only read the new
    CDC files (LOAD excluded, untouched tables skipped)."""
    import calendar
    import os
    from datetime import datetime

    from rust_dms_cdc_operator_spark.snapshot import resume_snapshot

    root, tgt_full, tgt_inc = (
        str(tmp_path / "drop"), str(tmp_path / "full"), str(tmp_path / "inc")
    )
    fx = _drop(root)
    pks = {t: f["pk"] for t, f in fx.items()}

    # pin file mtimes: LOAD + first-day CDC old, second-day CDC new
    def _epoch(y):
        return calendar.timegm(datetime(y, 1, 1).timetuple())

    old, new = _epoch(2001), _epoch(2003)
    for dirpath, _dn, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            ts = new if "/2026/08/02/" in p.replace(os.sep, "/") else old
            os.utime(p, (ts, ts))

    base = dict(
        bucket_name="local",
        schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB,
        mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    full = snapshot(
        spark, CdcSnapshotPayload(**base), ParquetTarget(tgt_full), root, pks
    )
    snapshot(
        spark, CdcSnapshotPayload(**base, stop_date="2002-01-01"),
        ParquetTarget(tgt_inc), root, pks,
    )
    resumed = resume_snapshot(
        spark, CdcSnapshotPayload(**base), ParquetTarget(tgt_inc), root,
        pks, since="2002-01-01",
    )
    # only customers_cdc has a second-day CDC file in the fixtures
    assert "customers_cdc" in resumed
    for t in fx:
        want = {
            r["id" if "id" in pks[t] else pks[t][0]]: r
            for r in spark.read.parquet(f"{tgt_full}/{cdc_fixtures.SCHEMA}/{t}").collect()
        }
        got = {
            r["id" if "id" in pks[t] else pks[t][0]]: r
            for r in spark.read.parquet(f"{tgt_inc}/{cdc_fixtures.SCHEMA}/{t}").collect()
        }
        assert got == want, t


def test_cdc_engine_facade(spark, tmp_path):
    """CdcEngine.snapshot/validate — the two-method library surface
    (SURVEY §3.3) — runs the same code path as the function API and
    validates its own output as identical."""
    from rust_dms_cdc_operator_spark import (
        CdcEngine,
        CdcValidatePayload,
    )

    root, tgt = str(tmp_path / "drop"), str(tmp_path / "state")
    fx = _drop(root)
    payload = CdcSnapshotPayload(
        bucket_name="local",
        schema_name=cdc_fixtures.SCHEMA,
        database_name=cdc_fixtures.DB,
        mode=LoadMode.DATE_AWARE,
        start_date="2000-01-01",
    )
    eng = CdcEngine(spark)
    written = eng.snapshot(
        payload, root, tgt, {t: f["pk"] for t, f in fx.items()}
    )
    assert set(written) == set(fx)
    tables = {
        t: (
            spark.read.parquet(written[t]),
            spark.read.parquet(written[t]),
            fx[t]["pk"],
        )
        for t in fx
    }
    reports = eng.validate(CdcValidatePayload(schema_name=cdc_fixtures.SCHEMA), tables)
    assert set(reports) == set(fx)
    assert all(r.counts_match for r in reports.values())
    assert all(not r.mismatched_chunks for r in reports.values())
