"""Full pipeline against a live JDBC database (SURVEY §3.1 + §3.2):
DMS parquet drop → snapshot (manifest → replay → DDL + bulk insert
into the database) → validate (V1 count + V2 chunked hash between the
engine's replayed state and the database read back over JDBC) →
corrupt one row server-side → validate flags exactly that table.

This is the reference's end-to-end story (S3 → Postgres → pgdatadiff)
with every moving part real; DuckDB stands in for Postgres behind the
same generic-JDBC sink. Subprocess-isolated for the driver-jar
classpath (see test_jdbc_sink.py).
"""

from __future__ import annotations

import glob
import subprocess
import sys

import pytest

JARS = glob.glob("/root/.cache/coursier/**/duckdb_jdbc*.jar", recursive=True)

SCRIPT = r"""
import sys, os, tempfile
sys.path.insert(0, "/root/repo")
import pyarrow as pa
import pyarrow.parquet as pq
from rust_dms_cdc_operator_spark.session import get_spark
from rust_dms_cdc_operator_spark.sinks.postgres import PostgresSink
from rust_dms_cdc_operator_spark.snapshot import JdbcTarget, snapshot
from rust_dms_cdc_operator_spark.payloads import CdcSnapshotPayload, CdcValidatePayload, LoadMode
from rust_dms_cdc_operator_spark.validate import validate
from rust_dms_cdc_operator_spark.operators.compact import replay_manifest
from rust_dms_cdc_operator_spark.sources.manifest import build_manifest

jar = sys.argv[1]
work = tempfile.mkdtemp()
root = os.path.join(work, "drop")
db = os.path.join(work, "tgt.duckdb")

def write(table, rel, cols):
    p = os.path.join(root, "mydb", "public", table, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table(cols), p)

# two tables; no array columns (JDBC array binding is driver-specific)
for t, base in (("customer", 0), ("account", 1000)):
    write(t, "LOAD00000001.parquet", {
        "id": list(range(base, base + 50)),
        "name": [f"{t}-{i}" for i in range(50)],
        "amount": [float(i) * 1.5 for i in range(50)],
    })
    write(t, "2026/08/02/20260802-000001.parquet", {
        "Op": ["U", "D", "I"],
        "_dms_ingestion_timestamp": ["2026-08-02 00:00:01"] * 3,
        "id": [base + 1, base + 2, base + 77],
        "name": [f"{t}-upd", f"{t}-dead", f"{t}-new"],
        "amount": [9.9, 0.0, 7.7],
    })

spark = get_spark(
    app_name="pipeline-it", master="local[2]", shuffle_partitions=2,
    extra_conf={"spark.jars": jar},
)
sink = PostgresSink(f"jdbc:duckdb:{db}", properties={"driver": "org.duckdb.DuckDBDriver"})
payload = CdcSnapshotPayload(
    bucket_name="", schema_name="public", database_name="mydb",
    mode=LoadMode.DATE_AWARE, start_date="2026-08-01",
)
pks = {"customer": ["id"], "account": ["id"]}
written = snapshot(spark, payload, JdbcTarget(sink), root, primary_keys=pks)
assert set(written) == {"customer", "account"}, written

def engine_state(t):
    files = build_manifest(
        mode=LoadMode.DATE_AWARE, root=root, database="mydb",
        schema="public", table=t, start_date="2026-08-01",
    )
    return replay_manifest(spark, root, files, pks[t])

def db_state(t):
    return spark.read.jdbc(sink.url, f"public.{t}", properties=sink.properties)

tables = {t: (engine_state(t), db_state(t), pks[t]) for t in pks}
reports = validate(spark, CdcValidatePayload(schema_name="public", chunk_size=10), tables)
assert all(r.ok for r in reports.values()), {t: vars(r) for t, r in reports.items()}
# expected net state: 50 - 1 delete + 1 insert = 50 rows
assert reports["customer"].target_rows == 50, reports["customer"]

# corrupt one row in ONE table server-side; only that table may flag
sink.run_sql(spark, "UPDATE public.account SET amount = amount + 1 WHERE id = 1005")
tables = {t: (engine_state(t), db_state(t), pks[t]) for t in pks}
reports = validate(spark, CdcValidatePayload(schema_name="public", chunk_size=10), tables)
assert reports["customer"].ok, vars(reports["customer"])
assert not reports["account"].ok, vars(reports["account"])
assert len(reports["account"].mismatched_chunks) == 1, reports["account"]

# catalog-driven composition (S15 discovery + injected PK resolver +
# PK-partitioned source reads): same verdicts, parallel source scans
from rust_dms_cdc_operator_spark.sources.jdbc_source import (
    catalog_validate,
    read_table_partitioned,
)

part = read_table_partitioned(
    spark, sink.url, "public", "customer", ["id"],
    properties=sink.properties, num_partitions=4,
)
assert part.rdd.getNumPartitions() == 4, part.rdd.getNumPartitions()
assert part.count() == 50

reports = catalog_validate(
    spark, sink.url, "public",
    targets={t: engine_state(t) for t in pks},
    properties=sink.properties,
    payload=CdcValidatePayload(schema_name="public", chunk_size=10),
    pk_resolver=lambda s, u, sc, t, p: ["id"],  # DuckDB has no pg_index
    num_partitions=4,
)
assert set(reports) == {"customer", "account"}, reports
assert reports["customer"].ok, vars(reports["customer"])
assert not reports["account"].ok, vars(reports["account"])  # still corrupted

# CLI surface: `validate --only-datadiff --source-jdbc-url` = the
# reference's live-DB datadiff against the engine's parquet state
from rust_dms_cdc_operator_spark.snapshot import ParquetTarget
from rust_dms_cdc_operator_spark.cli import main as cli_main
import io, json as _json
from contextlib import redirect_stdout

state_root = os.path.join(work, "state")
snapshot(spark, payload, ParquetTarget(state_root), root, primary_keys=pks)
buf = io.StringIO()
with redirect_stdout(buf):
    rc = cli_main([
        "validate", "--only-datadiff",
        "--source-jdbc-url", sink.url,
        "--jdbc-properties", _json.dumps(sink.properties),
        "--target-parquet-root", state_root,
        "--database-schema", "public",
        "--primary-keys", _json.dumps(pks),
        "--chunk-size", "10",
    ])
assert rc == 0, rc
out = _json.loads(buf.getvalue())
assert out["validate"]["customer"]["ok"] is True, out
assert out["validate"]["account"]["ok"] is False, out  # corrupted above

print("PIPELINE-JDBC-IT-PASS")
"""


@pytest.mark.skipif(not JARS, reason="no DuckDB JDBC jar in this container")
def test_snapshot_validate_pipeline_against_jdbc(tmp_path):
    script = tmp_path / "pipeline_it.py"
    script.write_text(SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), JARS[0]],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "PIPELINE-JDBC-IT-PASS" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
