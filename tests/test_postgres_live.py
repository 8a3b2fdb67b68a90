"""Live-Postgres contract tests for the SQL this engine emits.

Round-1 verdict: the pg_index PK query (S14) and the ON CONFLICT
merge SQL had never executed against real Postgres (the DuckDB JDBC
stand-in has no pg_index). This container ships PostgreSQL 15
binaries, so these tests initdb a scratch cluster (as an unprivileged
user — postgres refuses root), drive it over a unix socket with psql,
and execute every statement shape the catalog (sources/catalog.py)
and sink (sinks/ddl.py) generate — including the mixed-case
identifiers the round-1 ADVICE flagged.

No JDBC jar for Postgres is present, so the Spark-side bulk writer is
exercised against DuckDB JDBC elsewhere (tests/test_jdbc_sink.py);
here the contract under test is the SQL text itself.
"""

from __future__ import annotations

import shutil
import subprocess
import uuid

import pytest

from rust_dms_cdc_operator_spark.sinks.ddl import (
    create_schema_sql,
    create_table_sql,
    delete_sql,
    drop_schema_sql,
    insert_sql,
    qualify,
    staging_delete_sql,
    staging_merge_sql,
    upsert_sql,
)
from rust_dms_cdc_operator_spark.sources.catalog import (
    primary_key_sql,
    table_columns_sql,
    tables_in_schema_sql,
)

PORT = "54331"

pytestmark = pytest.mark.skipif(
    not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")),
    reason="postgres binaries unavailable",
)


def _su_nobody(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "nobody", "-s", "/bin/sh", "-c", cmd],
        capture_output=True, text=True, cwd="/tmp",
    )


@pytest.fixture(scope="module")
def pg():
    # not tmp_path_factory: pytest's tmp root is 0700-root and the
    # server must run as an unprivileged user
    import pathlib  # noqa: PLC0415

    base = pathlib.Path(f"/tmp/pglive-{uuid.uuid4().hex[:8]}")
    base.mkdir(mode=0o777)
    base.chmod(0o777)
    data = base / "data"
    r = _su_nobody(f"initdb -D {data} -U postgres --no-sync")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = _su_nobody(
        f"pg_ctl -D {data} -l {base}/log -w "
        f"-o '-k {base} -p {PORT} -c listen_addresses=' start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    yield str(base)
    _su_nobody(f"pg_ctl -D {data} -m immediate stop")
    shutil.rmtree(base, ignore_errors=True)


def _psql(pg_dir: str, sql: str, params: list[str] | None = None) -> str:
    """Run one statement; return stdout (tuples-only). Raises on SQL
    error so a syntax wart in generated SQL fails the test loudly."""
    cmd = ["psql", "-h", pg_dir, "-p", PORT, "-U", "postgres", "-X",
           "-v", "ON_ERROR_STOP=1", "-At", "-c", sql]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp")
    assert r.returncode == 0, f"SQL failed: {sql}\n{r.stderr}"
    return r.stdout.strip()


def _exec_param(pg_dir: str, sql: str, rows: list[tuple]) -> None:
    """Client-side binding stand-in for the %s-parameterized DML: the
    engine binds via JDBC; here values are spliced as quoted literals
    purely to execute the statement shape."""
    for row in rows:
        lits = [
            "NULL" if v is None
            else str(v) if isinstance(v, (int, float))
            else "'" + str(v).replace("'", "''") + "'"
            for v in row
        ]
        stmt = sql
        for lit in lits:
            stmt = stmt.replace("%s", lit, 1)
        _psql(pg_dir, stmt)


def test_s14_pg_index_primary_key_query(pg):
    """The pg_index ⋈ pg_attribute PK query (catalog.py, mirroring
    reference table_query.rs:48-61) against real catalogs, composite
    PK and mixed-case identifiers included."""
    _psql(pg, create_schema_sql("cat_s"))
    _psql(pg, create_table_sql(
        {"id": "bigint", "region": "text", "val": "text"},
        ["id", "region"], "cat_s", "orders",
    ))
    got = _psql(pg, primary_key_sql("cat_s", "orders")).splitlines()
    assert sorted(got) == ["id", "region"]

    _psql(pg, create_table_sql({"Id": "bigint", "Name": "text"}, ["Id"],
                               "cat_s", "MixedCase"))
    assert _psql(pg, primary_key_sql("cat_s", "MixedCase")) == "Id"
    # no PK -> empty result, not an error
    _psql(pg, create_table_sql({"x": "int"}, [], "cat_s", "nopk"))
    assert _psql(pg, primary_key_sql("cat_s", "nopk")) == ""


def test_s13_s15_catalog_queries(pg):
    _psql(pg, create_schema_sql("cat2"))
    _psql(pg, create_table_sql(
        {"a": "bigint", "b": "numeric(12,2)", "tags": "text[]"}, ["a"],
        "cat2", "t1",
    ))
    _psql(pg, create_table_sql({"x": "int"}, [], "cat2", "t2"))
    cols = _psql(pg, table_columns_sql("cat2", "t1")).splitlines()
    assert cols == ["a|bigint", "b|numeric", "tags|ARRAY"]
    tables = _psql(pg, tables_in_schema_sql("cat2")).splitlines()
    assert sorted(tables) == ["t1", "t2"]
    only = _psql(pg, tables_in_schema_sql("cat2", included=["t2"]))
    assert only == "t2"
    rest = _psql(pg, tables_in_schema_sql("cat2", excluded=["t2"]))
    assert rest == "t1"


def test_catalog_to_partitioned_scan_bounds(pg):
    """Catalog→diff composition, the PG-specific half: S14 resolves
    the PK live, then the partition-bounds query (jdbc_source.py —
    what spark.read.jdbc's range partitions are derived from) runs
    against the same live table, mixed-case PK included. (The Spark
    read itself is exercised against DuckDB JDBC in
    test_pipeline_jdbc.py — no Postgres JDBC jar ships here.)"""
    from rust_dms_cdc_operator_spark.sources.jdbc_source import (
        partition_bounds_sql,
    )

    _psql(pg, create_schema_sql("cat3"))
    _psql(pg, create_table_sql(
        {"Seq": "bigint", "v": "text"}, ["Seq"], "cat3", "Events",
    ))
    _psql(
        pg,
        'INSERT INTO "cat3"."Events" SELECT g, g::text FROM '
        "generate_series(10, 500) AS g",
    )
    pk = _psql(pg, primary_key_sql("cat3", "Events")).splitlines()
    assert pk == ["Seq"]
    bounds = _psql(pg, partition_bounds_sql("cat3", "Events", pk[0]))
    assert bounds == "10|500"
    # empty table: NULL bounds (jdbc_source falls back to one reader)
    _psql(pg, create_table_sql({"id": "bigint"}, ["id"], "cat3", "empty"))
    assert _psql(pg, partition_bounds_sql("cat3", "empty", "id")) == "|"


def test_s8_staging_merge_and_delete(pg):
    """The full staged upsert+delete flow (sinks/postgres.py order of
    operations) with mixed-case columns — the exact combination the
    round-1 ADVICE predicted would fail under inconsistent quoting."""
    _psql(pg, create_schema_sql("mrg"))
    cols = {"Id": "bigint", "firstName": "text"}
    _psql(pg, create_table_sql(cols, ["Id"], "mrg", "Users"))
    _exec_param(pg, insert_sql("mrg", "Users", list(cols)),
                [(1, "alice"), (2, "bob")])

    staging = qualify("mrg", "Users__stage")
    _psql(pg, f"CREATE TABLE {staging} (\"Id\" bigint, \"firstName\" text)")
    _exec_param(pg, f"INSERT INTO {staging} VALUES (%s, %s)",
                [(2, "bob2"), (3, "carol")])
    _psql(pg, staging_merge_sql("mrg", "Users", staging, list(cols), ["Id"]))
    got = _psql(pg, 'SELECT "Id", "firstName" FROM mrg."Users" ORDER BY "Id"')
    assert got.splitlines() == ["1|alice", "2|bob2", "3|carol"]

    delstage = qualify("mrg", "Users__delstage")
    _psql(pg, f"CREATE TABLE {delstage} (\"Id\" bigint)")
    _exec_param(pg, f"INSERT INTO {delstage} VALUES (%s)", [(1,)])
    _psql(pg, staging_delete_sql("mrg", "Users", delstage, ["Id"]))
    got = _psql(pg, 'SELECT "Id" FROM mrg."Users" ORDER BY "Id"')
    assert got.splitlines() == ["2", "3"]


def test_sequence_diff_live(pg):
    """pgdatadiff's only_sequences surface (reference pins it false,
    cdc_operator.rs:271-272): the pg_sequences catalog query against a
    real sequence — NULL last_value before first nextval, advanced
    value after — composed with the pure comparison half
    (validate.sequence_diff_maps)."""
    from rust_dms_cdc_operator_spark.sources.catalog import sequences_sql
    from rust_dms_cdc_operator_spark.validate import sequence_diff_maps

    _psql(pg, create_schema_sql("seqs"))
    _psql(pg, 'CREATE SEQUENCE "seqs"."order_id_seq"')
    _psql(pg, 'CREATE SEQUENCE "seqs"."Mixed_Seq"')
    # never-advanced sequences report NULL last_value
    got = dict(
        line.split("|")
        for line in _psql(pg, sequences_sql("seqs")).splitlines()
    )
    assert got == {"order_id_seq": "", "Mixed_Seq": ""}

    _psql(pg, "SELECT nextval('\"seqs\".\"order_id_seq\"')")
    _psql(pg, "SELECT nextval('\"seqs\".\"order_id_seq\"')")
    got = dict(
        line.split("|")
        for line in _psql(pg, sequences_sql("seqs")).splitlines()
    )
    assert got["order_id_seq"] == "2"

    def parse(raw: dict[str, str]) -> dict[str, int | None]:
        return {k: (int(v) if v else None) for k, v in raw.items()}

    # source = this cluster; simulate a lagging target
    reports = sequence_diff_maps(
        parse(got), {"order_id_seq": 1, "Mixed_Seq": None}
    )
    assert not reports["order_id_seq"].ok
    assert reports["order_id_seq"].source_last_value == 2
    assert reports["order_id_seq"].target_last_value == 1
    assert reports["Mixed_Seq"].ok  # both never-advanced
    # one-sided sequence is never ok — even never-advanced (NULL
    # last_value must not compare equal to absence)
    lonely = sequence_diff_maps({"s": 5}, {})
    assert not lonely["s"].ok and lonely["s"].target_last_value is None
    assert not sequence_diff_maps({"s": None}, {})["s"].ok


def test_row_dml_statements_execute(pg):
    """upsert_sql / delete_sql (the row-parameterized forms) and
    schema drop execute cleanly."""
    _psql(pg, create_schema_sql("dml"))
    _psql(pg, create_table_sql({"k": "bigint", "v": "text"}, ["k"], "dml", "t"))
    up = upsert_sql("dml", "t", ["k", "v"], ["k"])
    _exec_param(pg, up, [(1, "x"), (1, "y"), (2, "z")])
    assert _psql(pg, 'SELECT v FROM dml.t WHERE k = 1') == "y"
    _exec_param(pg, delete_sql("dml", "t", ["k"]), [(2,)])
    assert _psql(pg, "SELECT count(*) FROM dml.t") == "1"
    _psql(pg, drop_schema_sql("dml"))
    assert _psql(
        pg,
        "SELECT count(*) FROM information_schema.schemata "
        "WHERE schema_name = 'dml'",
    ) == "0"


def test_full_lifecycle_snapshot_state_merge_validate(pg, spark):
    """The reference's whole §3.1 lifecycle (cdc_operator.rs:26-293)
    as ONE test against real PostgreSQL 15: DMS drop → snapshot replay
    → full load into PG (generated DDL + insert shapes) → incremental
    CDC through BOTH resume_snapshot and the manifest-committed
    BucketedParquetState → staged upsert/delete application → validate
    (V1 counts + V2 chunked hashes + V3 drill-down) source-vs-target,
    with an injected target corruption caught and pinpointed.

    The Spark-side JDBC bulk writer itself is live-tested against
    DuckDB JDBC (test_jdbc_sink.py — no Postgres JDBC jar ships in
    this container); here every generated SQL statement executes
    against real Postgres via psql with client-side binding, which is
    the same statement shapes the JDBC path emits."""
    import calendar
    import os
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from rust_dms_cdc_operator_spark.operators.compact import compact_cdc
    from rust_dms_cdc_operator_spark.payloads import (
        CdcSnapshotPayload,
        LoadMode,
    )
    from rust_dms_cdc_operator_spark.snapshot import (
        ParquetTarget,
        resume_snapshot,
        snapshot,
    )
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )
    from rust_dms_cdc_operator_spark.validate import drill_down, validate_table

    root = f"/tmp/e2e-drop-{uuid.uuid4().hex[:8]}"
    db, schema_name, table = "mydb", "live", "items"
    tdir = os.path.join(root, db, schema_name, table)
    os.makedirs(os.path.join(tdir, "2026/08/02"))

    def write_file(rel, ops, ids, names, qtys, mtime):
        path = os.path.join(tdir, rel)
        pq.write_table(
            pa.table(
                {
                    "Op": ops,
                    "_dms_ingestion_timestamp": [mtime] * len(ops),
                    "id": ids,
                    "name": names,
                    "qty": qtys,
                }
            ),
            path,
        )
        os.utime(path, (mtime, mtime))

    write_file(
        "LOAD00000001.parquet",
        ["I"] * 5, list(range(1, 6)),
        [f"it'{i}" for i in range(1, 6)], [10 * i for i in range(1, 6)],
        mtime=calendar.timegm(datetime(2026, 8, 1, 12, 0).timetuple()),
    )
    write_file(
        "2026/08/02/20260802-010000000.parquet",
        ["U", "D", "I"], [2, 3, 6], ["two-v2", "gone", "six"], [22, 0, 60],
        mtime=calendar.timegm(datetime(2026, 8, 2, 1, 0).timetuple()),
    )

    payload = CdcSnapshotPayload(
        bucket_name=root, schema_name=schema_name, database_name=db,
        mode=LoadMode.DATE_AWARE, start_date="2026-08-01",
    )
    out_root = f"/tmp/e2e-state-{uuid.uuid4().hex[:8]}"
    paths = snapshot(
        spark, payload, ParquetTarget(out_root), root,
        primary_keys={table: ["id"]},
    )
    state1 = spark.read.parquet(paths[table]).select("id", "name", "qty")
    want1 = {(1, "it'1", 10), (2, "two-v2", 22), (4, "it'4", 40),
             (5, "it'5", 50), (6, "six", 60)}
    assert {tuple(r) for r in state1.collect()} == want1

    # ---- full load into real PG through the generated DDL + inserts
    cols = {"id": "bigint", "name": "text", "qty": "bigint"}
    _psql(pg, create_schema_sql(schema_name))
    _psql(pg, create_table_sql(cols, ["id"], schema_name, table))
    _exec_param(pg, insert_sql(schema_name, table, list(cols)),
                [tuple(r) for r in state1.collect()])

    def read_target():
        raw = _psql(
            pg, f'SELECT id, name, qty FROM {schema_name}.{table}'
        ).splitlines()
        rows = [
            (int(i), n, int(q))
            for i, n, q in (line.split("|") for line in raw)
        ]
        return spark.createDataFrame(rows, "id long, name string, qty long")

    rep = validate_table(state1, read_target(), table, ["id"], chunk_size=2)
    assert rep.ok and rep.counts_match and not rep.mismatched_chunks

    # ---- incremental CDC: a later drop file, replayed two ways
    write_file(
        "2026/08/02/20260802-020000000.parquet",
        ["U", "D", "I"], [6, 1, 7], ["six-v2", "bye", "seven"], [66, 0, 70],
        mtime=calendar.timegm(datetime(2026, 8, 2, 2, 0).timetuple()),
    )
    # exclusive bound between the two CDC file stamps (path-date
    # pruning, reference semantics)
    since = "2026-08-02T01:30:00"
    paths2 = resume_snapshot(
        spark, payload, ParquetTarget(out_root), root,
        primary_keys={table: ["id"]}, since=since,
    )
    state2 = spark.read.parquet(paths2[table]).select("id", "name", "qty")
    want2 = {(2, "two-v2", 22), (4, "it'4", 40), (5, "it'5", 50),
             (6, "six-v2", 66), (7, "seven", 70)}
    assert {tuple(r) for r in state2.collect()} == want2

    # same events through the manifest-committed streaming state store
    store = BucketedParquetState(
        f"/tmp/e2e-bstate-{uuid.uuid4().hex[:8]}", ["id"], num_buckets=4
    )
    for rel in (
        "LOAD00000001.parquet",
        "2026/08/02/20260802-010000000.parquet",
        "2026/08/02/20260802-020000000.parquet",
    ):
        batch = spark.read.parquet(os.path.join(tdir, rel))
        store.merge_batch(batch, order_cols=["_dms_ingestion_timestamp"])
    got_store = {
        tuple(r)
        for r in store.read(spark).select("id", "name", "qty").collect()
    }
    assert got_store == want2

    # ---- apply the incremental delta to PG: staged upsert + delete
    delta = compact_cdc(
        spark.read.parquet(
            os.path.join(tdir, "2026/08/02/20260802-020000000.parquet")
        ),
        ["id"], order_cols=["_dms_ingestion_timestamp"], op_col="__keep_d__",
    )
    ups = [
        (r.id, r.name, r.qty)
        for r in delta.filter(F.col("Op") != "D").collect()
    ]
    dels = [(r.id,) for r in delta.filter(F.col("Op") == "D").collect()]
    _exec_param(pg, upsert_sql(schema_name, table, list(cols), ["id"]), ups)
    _exec_param(pg, delete_sql(schema_name, table, ["id"]), dels)

    rep2 = validate_table(state2, read_target(), table, ["id"], chunk_size=2)
    assert rep2.ok and rep2.source_rows == rep2.target_rows == 5

    # ---- corruption is caught (V2) and pinpointed (V3)
    _psql(pg, f"UPDATE {schema_name}.{table} SET qty = 9999 WHERE id = 4")
    rep3 = validate_table(state2, read_target(), table, ["id"], chunk_size=2)
    assert not rep3.ok and rep3.counts_match and rep3.mismatched_chunks
    bad = drill_down(state2, read_target(), ["id"]).collect()
    assert {r.id for r in bad} == {4}
