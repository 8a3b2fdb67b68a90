"""JDBC sink integration (SURVEY §2.1 S7/S8/S9-S12) against a real
JDBC database.

The container has no Postgres server or driver, but it does carry a
DuckDB JDBC driver jar — and the sink is deliberately generic JDBC
(Postgres is only the default ``driver`` property), so the whole data
path (parallel batched append, staging upsert with
``ON CONFLICT (pk) DO UPDATE``, staged keyed ``DELETE .. USING``) can
be exercised end-to-end. DuckDB understands the identical SQL.

Runs in a subprocess because the driver jar must be on the JVM
classpath at session creation and the suite's shared session has
already been built without it.
"""

from __future__ import annotations

import glob
import subprocess
import sys

import pytest

JARS = glob.glob(
    "/root/.cache/coursier/**/duckdb_jdbc*.jar", recursive=True
)

SCRIPT = r"""
import sys, os, tempfile
sys.path.insert(0, "/root/repo")
from rust_dms_cdc_operator_spark.session import get_spark
from rust_dms_cdc_operator_spark.sinks.postgres import PostgresSink
from rust_dms_cdc_operator_spark.sinks.ddl import pg_type_for
from pyspark.sql import functions as F

jar = sys.argv[1]
db = os.path.join(tempfile.mkdtemp(), "sink.duckdb")
spark = get_spark(
    app_name="jdbc-sink-it",
    master="local[2]",
    shuffle_partitions=2,
    extra_conf={"spark.jars": jar},
)
sink = PostgresSink(
    f"jdbc:duckdb:{db}", properties={"driver": "org.duckdb.DuckDBDriver"}
)

c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
    "c_custkey", "c_name", "c_acctbal"
)
n = c.count()

# DDL path (S9/S10/S12)
sink.create_schema(spark, "tgt")
sink.create_table(
    spark,
    {f.name: pg_type_for(f.dataType) for f in c.schema.fields},
    ["c_custkey"],
    "tgt",
    "customer",
)

# S7 bulk insert
sink.insert(c.coalesce(1), "tgt", "customer")
back = spark.read.jdbc(
    sink.url, "tgt.customer", properties=sink.properties
)
assert back.count() == n, f"insert roundtrip {back.count()} != {n}"

# S8 upsert: bump acctbal for 10 keys, add 2 new keys
changed = (
    c.filter(F.col("c_custkey") <= 10)
    .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
)
new = c.limit(2).withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
sink.upsert(changed.unionByName(new).coalesce(1), "tgt", "customer", ["c_custkey"])
back = spark.read.jdbc(sink.url, "tgt.customer", properties=sink.properties)
assert back.count() == n + 2, f"upsert count {back.count()} != {n + 2}"
bumped = back.filter((F.col("c_custkey") <= 10)).join(
    c.filter(F.col("c_custkey") <= 10).select(
        "c_custkey", F.col("c_acctbal").alias("old")
    ),
    "c_custkey",
)
assert (
    bumped.filter(F.col("c_acctbal") != F.col("old") + 1000.0).count() == 0
), "upsert did not update in place"

# S13/S15 live catalog scans (information_schema is shared SQL surface)
from rust_dms_cdc_operator_spark.sources.catalog import (
    get_table_columns,
    get_tables_in_schema,
)

cols = get_table_columns(spark, sink.url, "tgt", "customer", sink.properties)
assert list(cols) == ["c_custkey", "c_name", "c_acctbal"], cols
tabs = get_tables_in_schema(spark, sink.url, "tgt", properties=sink.properties)
assert "customer" in tabs, tabs
assert get_tables_in_schema(
    spark, sink.url, "tgt", excluded=["customer"], properties=sink.properties
) == [t for t in tabs if t != "customer"]

# S8 delete
doomed = c.filter(F.col("c_custkey") <= 5)
n_del = doomed.count()
sink.delete(doomed, "tgt", "customer", ["c_custkey"])
back = spark.read.jdbc(sink.url, "tgt.customer", properties=sink.properties)
assert back.count() == n + 2 - n_del, f"delete count {back.count()}"

print("JDBC-SINK-IT-PASS")
"""


@pytest.mark.skipif(not JARS, reason="no DuckDB JDBC jar in this container")
def test_jdbc_sink_end_to_end_against_duckdb(tmp_path):
    script = tmp_path / "jdbc_it.py"
    script.write_text(SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), JARS[0]],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "JDBC-SINK-IT-PASS" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
