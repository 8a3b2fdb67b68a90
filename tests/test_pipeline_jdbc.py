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
import os
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


SF01_SCRIPT = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
import duckdb

from rust_dms_cdc_operator_spark.session import get_spark
from rust_dms_cdc_operator_spark.sinks.postgres import PostgresSink
from rust_dms_cdc_operator_spark.snapshot import JdbcTarget, snapshot
from rust_dms_cdc_operator_spark.payloads import CdcSnapshotPayload, LoadMode
from rust_dms_cdc_operator_spark.validate import validate_table, drill_down
from rust_dms_cdc_operator_spark.operators.compact import compact_cdc, replay_manifest
from rust_dms_cdc_operator_spark.sources.manifest import build_manifest
from pyspark.sql import functions as F

jar = sys.argv[1]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
src = os.path.join(sf_dir, "events.parquet")
work = tempfile.mkdtemp()
root = os.path.join(work, "drop")
db_file = os.path.join(work, "tgt.duckdb")
tdir = os.path.join(root, "mydb", "public", "events")
os.makedirs(os.path.join(tdir, "2026/08/02"))

timers = {}
def clock(name):
    class _C:
        def __enter__(self): self.t0 = time.time()
        def __exit__(self, *a): timers[name] = round(time.time() - self.t0, 2)
    return _C()

# DMS drop built FROM the real sf0.1 events table: LOAD = 90% of keys;
# one CDC delta carrying 10k inserts (the held-out keys), 10k updates
# (value bumped), 10k deletes
con = duckdb.connect()
cols = "event_id, ts, user_id, event_type, value, props"
with clock("build_drop"):
    con.sql(
        f"COPY (SELECT {cols} FROM '{src}' WHERE event_id % 10 != 0 "
        f"ORDER BY event_id) TO '{tdir}/LOAD00000001.parquet' (FORMAT PARQUET)"
    )
    stamp = "'2026-08-02 00:00:01' AS _dms_ingestion_timestamp"
    con.sql(
        "COPY ("
        f"SELECT 'I' AS Op, {stamp}, {cols} FROM '{src}' WHERE event_id % 10 = 0 "
        "UNION ALL "
        f"SELECT 'U', '2026-08-02 00:00:01', event_id, ts, user_id, event_type, "
        f"value + 1.0, props FROM '{src}' WHERE event_id % 10 = 1 "
        "UNION ALL "
        f"SELECT 'D', '2026-08-02 00:00:01', {cols} FROM '{src}' WHERE event_id % 10 = 2"
        f") TO '{tdir}/2026/08/02/20260802-000001.parquet' (FORMAT PARQUET)"
    )

spark = get_spark(
    app_name="pipeline-sf01", master="local[8]", shuffle_partitions=8,
    extra_conf={"spark.jars": jar},
)
sink = PostgresSink(
    f"jdbc:duckdb:{db_file}",
    properties={"driver": "org.duckdb.DuckDBDriver"},
)
pks = {"events": ["event_id"]}

# phase 1 — full-load snapshot into the live DB (DDL + bulk insert);
# only the LOAD file exists from the DB's point of view, so the CDC
# delta below exercises the STAGED merge path, not a rebuild
payload = CdcSnapshotPayload(
    bucket_name="", schema_name="public", database_name="mydb",
    mode=LoadMode.FULL_LOAD_ONLY,
)
with clock("snapshot_full_load"):
    written = snapshot(spark, payload, JdbcTarget(sink), root, primary_keys=pks)
assert written == {"events": "public.events"}, written

# phase 2 — staged CDC apply: compact the delta per key, then ON
# CONFLICT merge the upserts and a staged keyed delete (S8)
delta_raw = spark.read.parquet(f"{tdir}/2026/08/02/20260802-000001.parquet")
delta = compact_cdc(
    delta_raw, ["event_id"], order_cols=["_dms_ingestion_timestamp"],
    op_col="__keep_d__",
).persist()
data_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
with clock("staged_merge"):
    sink.upsert(
        delta.filter(F.col("Op") != "D").select(*data_cols),
        "public", "events", ["event_id"],
    )
    sink.delete(
        delta.filter(F.col("Op") == "D").select("event_id"),
        "public", "events", ["event_id"],
    )

# phase 3 — validate: engine-side replay of the FULL manifest vs the
# merged DB state, V1 counts + V2 chunked hashes
files = build_manifest(
    mode=LoadMode.DATE_AWARE, root=root, database="mydb",
    schema="public", table="events", start_date="2026-08-01",
)
state = replay_manifest(spark, root, files, ["event_id"]).persist()
db_state = spark.read.jdbc(sink.url, "public.events", properties=sink.properties)
with clock("validate"):
    rep = validate_table(state, db_state, "events", ["event_id"], chunk_size=5000)
assert rep.ok and rep.counts_match and not rep.mismatched_chunks, vars(rep)
assert rep.source_rows == rep.target_rows == 90000, vars(rep)

# corruption check: one server-side flip is caught and pinpointed
sink.run_sql(spark, "UPDATE public.events SET value = value + 1 WHERE event_id = 11")
rep2 = validate_table(state, db_state, "events", ["event_id"], chunk_size=5000)
assert not rep2.ok and len(rep2.mismatched_chunks) == 1, vars(rep2)
bad = drill_down(state, db_state, ["event_id"]).collect()
assert [r.event_id for r in bad] == [11], bad

timers["rows"] = 90000
print("PIPELINE-SF01-WALL " + json.dumps(timers))
print("PIPELINE-SF01-PASS")
"""


SF1_SCRIPT = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
import duckdb

from rust_dms_cdc_operator_spark.session import get_spark
from rust_dms_cdc_operator_spark.sinks.postgres import PostgresSink
from rust_dms_cdc_operator_spark.snapshot import JdbcTarget, snapshot
from rust_dms_cdc_operator_spark.payloads import CdcSnapshotPayload, LoadMode
from rust_dms_cdc_operator_spark.validate import validate_table, drill_down
from rust_dms_cdc_operator_spark.operators.compact import compact_cdc, replay_manifest
from rust_dms_cdc_operator_spark.sources.manifest import build_manifest
from pyspark.sql import functions as F

jar, sf1_dir = sys.argv[1], sys.argv[2]
src = os.path.join(sf1_dir, "events.parquet")
src_glob = f"{src}/*.parquet" if os.path.isdir(src) else src
work = tempfile.mkdtemp()
root = os.path.join(work, "drop")
db_file = os.path.join(work, "tgt.duckdb")
tdir = os.path.join(root, "mydb", "public", "events")
os.makedirs(tdir)

timers = {}
def clock(name):
    class _C:
        def __enter__(self): self.t0 = time.time()
        def __exit__(self, *a): timers[name] = round(time.time() - self.t0, 2)
    return _C()

# DMS drop FROM the native-sf1 events table (~1M rows): LOAD = 90% of
# keys, then THREE daily CDC epochs, each its own dated delta file —
# the reference's steady-state shape (one full load, then repeated
# incremental applies), so the staged merge runs per EPOCH, not once.
#   epoch 1 (08/02): I half of the held-out keys, U %10==1 (+1.0), D %10==2
#   epoch 2 (08/03): I other half,               U %10==3 (+2.0), D %10==4
#   epoch 3 (08/04): U %10==0 (+5.0, hits epoch-1/2 inserts),     D %10==6
con = duckdb.connect()
cols = "event_id, ts, user_id, event_type, value, props"
EPOCHS = [
    ("2026/08/02/20260802-000001.parquet", "'2026-08-02 00:00:01'",
     "event_id % 10 = 0 AND event_id % 20 = 0", "event_id % 10 = 1", 1.0,
     "event_id % 10 = 2"),
    ("2026/08/03/20260803-000001.parquet", "'2026-08-03 00:00:01'",
     "event_id % 10 = 0 AND event_id % 20 != 0", "event_id % 10 = 3", 2.0,
     "event_id % 10 = 4"),
    ("2026/08/04/20260804-000001.parquet", "'2026-08-04 00:00:01'",
     "FALSE", "event_id % 10 = 0", 5.0, "event_id % 10 = 6"),
]
with clock("build_drop"):
    con.sql(
        f"COPY (SELECT {cols} FROM '{src_glob}' WHERE event_id % 10 != 0 "
        f"ORDER BY event_id) TO '{tdir}/LOAD00000001.parquet' (FORMAT PARQUET)"
    )
    for rel, stamp, ins, upd, bump, dele in EPOCHS:
        os.makedirs(os.path.join(tdir, os.path.dirname(rel)), exist_ok=True)
        con.sql(
            "COPY ("
            f"SELECT 'I' AS Op, {stamp} AS _dms_ingestion_timestamp, {cols} "
            f"FROM '{src_glob}' WHERE {ins} "
            "UNION ALL "
            f"SELECT 'U', {stamp}, event_id, ts, user_id, event_type, "
            f"value + {bump}, props FROM '{src_glob}' WHERE {upd} "
            "UNION ALL "
            f"SELECT 'D', {stamp}, {cols} FROM '{src_glob}' WHERE {dele}"
            f") TO '{tdir}/{rel}' (FORMAT PARQUET)"
        )
# expected per-epoch stats, derived from the source itself
n_by_mod = dict(con.sql(
    f"SELECT event_id % 10, count(*) FROM '{src_glob}' GROUP BY 1"
).fetchall())
n_load = sum(v for k, v in n_by_mod.items() if k != 0)
n_ins1 = con.sql(
    f"SELECT count(*) FROM '{src_glob}' "
    "WHERE event_id % 10 = 0 AND event_id % 20 = 0"
).fetchone()[0]
n_ins2 = n_by_mod[0] - n_ins1
expected_rows = [
    n_load + n_ins1 - n_by_mod[2],
    n_load + n_ins1 + n_ins2 - n_by_mod[2] - n_by_mod[4],
    n_load + n_by_mod[0] - n_by_mod[2] - n_by_mod[4] - n_by_mod[6],
]

spark = get_spark(
    app_name="pipeline-sf1", master="local[16]", shuffle_partitions=16,
    extra_conf={"spark.jars": jar},
)
sink = PostgresSink(
    f"jdbc:duckdb:{db_file}",
    properties={"driver": "org.duckdb.DuckDBDriver"},
)
pks = {"events": ["event_id"]}

# phase 1 — full-load snapshot (DDL + bulk insert of ~900k rows)
payload = CdcSnapshotPayload(
    bucket_name="", schema_name="public", database_name="mydb",
    mode=LoadMode.FULL_LOAD_ONLY,
)
with clock("snapshot_full_load"):
    written = snapshot(spark, payload, JdbcTarget(sink), root, primary_keys=pks)
assert written == {"events": "public.events"}, written

def db_scalar(sql):
    # DuckDB's count(*) is HUGEINT -> DecimalType over JDBC; normalize
    return int(spark.read.jdbc(
        sink.url, f"({sql}) q", properties=sink.properties
    ).collect()[0][0])

assert db_scalar("SELECT count(*) FROM public.events") == n_load

# phase 2 — staged CDC apply per EPOCH; after each merge, assert the
# epoch's net stats against source-derived expectations
data_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
epoch_stats = []
for i, (rel, _stamp, _i, _u, _b, _d) in enumerate(EPOCHS):
    delta_raw = spark.read.parquet(f"{tdir}/{rel}")
    delta = compact_cdc(
        delta_raw, ["event_id"], order_cols=["_dms_ingestion_timestamp"],
        op_col="__keep_d__",
    ).persist()
    n_up = delta.filter(F.col("Op") != "D").count()
    n_del = delta.filter(F.col("Op") == "D").count()
    with clock(f"staged_merge_epoch{i + 1}"):
        sink.upsert(
            delta.filter(F.col("Op") != "D").select(*data_cols),
            "public", "events", ["event_id"],
        )
        sink.delete(
            delta.filter(F.col("Op") == "D").select("event_id"),
            "public", "events", ["event_id"],
        )
    delta.unpersist()
    rows_after = db_scalar("SELECT count(*) FROM public.events")
    assert rows_after == expected_rows[i], (i, rows_after, expected_rows[i])
    epoch_stats.append(
        {"epoch": i + 1, "upserts": n_up, "deletes": n_del,
         "rows_after": rows_after}
    )
# epoch-3 updates must have hit the keys epochs 1-2 INSERTED (value+5
# on top of the source value for every surviving %10==0 key)
bumped = db_scalar(
    "SELECT count(*) FROM public.events WHERE event_id % 10 = 0"
)
assert bumped == n_by_mod[0], (bumped, n_by_mod[0])

# phase 3 — validate the full replayed manifest vs the merged DB
files = build_manifest(
    mode=LoadMode.DATE_AWARE, root=root, database="mydb",
    schema="public", table="events", start_date="2026-08-01",
)
state = replay_manifest(spark, root, files, ["event_id"]).persist()
db_state = spark.read.jdbc(sink.url, "public.events", properties=sink.properties)
with clock("validate"):
    rep = validate_table(state, db_state, "events", ["event_id"], chunk_size=50000)
assert rep.ok and rep.counts_match and not rep.mismatched_chunks, vars(rep)
assert rep.source_rows == rep.target_rows == expected_rows[-1], vars(rep)

# corruption check at scale: one flipped row in ~950k is pinpointed
sink.run_sql(spark, "UPDATE public.events SET value = value + 1 WHERE event_id = 11")
rep2 = validate_table(state, db_state, "events", ["event_id"], chunk_size=50000)
assert not rep2.ok and len(rep2.mismatched_chunks) == 1, vars(rep2)
bad = drill_down(state, db_state, ["event_id"]).collect()
assert [r.event_id for r in bad] == [11], bad

timers["epoch_stats"] = epoch_stats
print("PIPELINE-SF1-WALL " + json.dumps(timers))
print("PIPELINE-SF1-PASS")
"""

SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR", "/tmp/spark-graft-sf1-native"
)


@pytest.mark.skipif(not JARS, reason="no DuckDB JDBC jar in this container")
@pytest.mark.skipif(
    not os.path.isdir(SF1_DIR),
    reason="native sf1 dataset not generated (bench.py creates it)",
)
def test_snapshot_staged_merge_validate_sf1(tmp_path):
    """Round-7 verdict item 6: the snapshot -> staged-merge -> validate
    chain at NATIVE sf1 (1M-row events) — the reference's end-to-end
    pipeline (cdc_operator.rs:26-252) at the scale tier above the
    sf0.1 test: a ~900k-row full load, then THREE daily CDC epochs
    applied through the staged ON CONFLICT merge + staged keyed
    delete, per-epoch net row counts asserted against source-derived
    expectations, then a clean V1+V2 validate (chunked hashes over
    ~950k rows) and a pinpointed one-row corruption. Skips when the
    native-sf1 dataset has not been generated."""
    script = tmp_path / "pipeline_sf1.py"
    script.write_text(SF1_SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), JARS[0], SF1_DIR],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert "PIPELINE-SF1-PASS" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    wall = next(
        l for l in proc.stdout.splitlines() if l.startswith("PIPELINE-SF1-WALL")
    )
    print(wall)


@pytest.mark.skipif(not JARS, reason="no DuckDB JDBC jar in this container")
def test_snapshot_staged_merge_validate_sf01(tmp_path):
    """Round-5 verdict item 6: the snapshot -> staged-merge -> validate
    chain at sf0.1 (100k-row events table), not fixture scale — DDL +
    bulk JDBC insert of 90k rows, a 30k-row CDC delta applied through
    the staged ON CONFLICT merge + staged keyed delete, then a clean
    V1+V2 validate (18 chunked hashes) and a pinpointed one-row
    corruption. Wall time per phase is printed as PIPELINE-SF01-WALL
    for the round record."""
    script = tmp_path / "pipeline_sf01.py"
    script.write_text(SF01_SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), JARS[0]],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert "PIPELINE-SF01-PASS" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    wall = next(
        l for l in proc.stdout.splitlines() if l.startswith("PIPELINE-SF01-WALL")
    )
    print(wall)
