"""Postgres sink (SURVEY §2.1 S7/S8): bulk insert + keyed upsert/delete.

Scale-first design — the data path is ALWAYS a distributed JDBC write:

- S7 bulk insert: ``df.write.jdbc(mode="append", batchsize=10000)``
  — Spark's parallel JDBC writer replaces the reference's driver-side
  10k-row INSERT loop (postgres_operator_impl.rs:207-308); the 10,000
  default matches the reference's ``ROWS_PER_DF``.
- S8 upsert/delete: compacted frame → staging table via the same bulk
  writer, then ONE server-side ``INSERT .. SELECT .. ON CONFLICT``
  (ddl.staging_merge_sql) + one keyed ``DELETE .. USING staging``.
  Never row-at-a-time from the driver (vs postgres_operator_impl.rs:
  310-436).

Execution requires a Postgres JDBC driver on the Spark classpath (not
bundled in this container) — every entry point degrades to a clear
RuntimeError so the rest of the engine stays importable/testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from rust_dms_cdc_operator_spark.sinks import ddl

DEFAULT_BATCH_SIZE = 10_000  # reference ROWS_PER_DF default


class PostgresSink:
    def __init__(
        self,
        url: str,
        properties: dict[str, str] | None = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
    ):
        self.url = url
        self.properties = dict(properties or {})
        self.properties.setdefault("driver", "org.postgresql.Driver")
        self.batch_size = batch_size

    # -- statement execution (DDL / merge), via the JVM's DriverManager --
    def run_sql(self, spark: SparkSession, sql: str) -> None:
        """S12 raw SQL passthrough (postgres_operator_impl.rs:438-447)."""
        jvm = spark.sparkContext._jvm
        try:
            conn = self._connect(jvm)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                "JDBC driver/connection unavailable "
                "(add the driver jar to spark.jars and a reachable URL)"
            ) from exc
        try:
            stmt = conn.createStatement()
            stmt.execute(sql)
            stmt.close()
        finally:
            conn.close()

    def _stage(self, df: DataFrame, staging: str) -> None:
        """Recreate the staging table with OUR DDL (explicit reverse
        type map, not the JDBC dialect's guess) and bulk-append into
        it — sidesteps Spark's overwrite-mode existence probing, which
        not every backend answers the way the Postgres dialect expects."""
        self.run_sql(df.sparkSession, f"DROP TABLE IF EXISTS {staging}")
        cols = ", ".join(
            f"{ddl.quote_ident(f.name)} {ddl.pg_type_for(f.dataType)}"
            for f in df.schema.fields
        )
        self.run_sql(df.sparkSession, f"CREATE TABLE {staging} ({cols})")
        (
            df.write.mode("append")
            .option("batchsize", str(self.batch_size))
            .jdbc(self.url, staging, properties=self.properties)
        )

    def _connect(self, jvm):
        """Open a JDBC connection. DriverManager only consults drivers
        on the JVM's root classpath; jars shipped via ``spark.jars`` /
        ``--jars`` live in Spark's mutable classloader, so fall back to
        instantiating the configured driver class through Spark's
        context classloader (what Spark's own JDBC source does)."""
        user = self.properties.get("user", "")
        password = self.properties.get("password", "")
        try:
            return jvm.java.sql.DriverManager.getConnection(
                self.url, user, password
            )
        except Exception:  # noqa: BLE001 - retry via Spark's classloader
            loader = jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
            cls = jvm.java.lang.Class.forName(
                self.properties["driver"], True, loader
            )
            driver = cls.newInstance()  # py4j can't pass Class[] varargs
            props = jvm.java.util.Properties()
            for k, v in self.properties.items():
                # "driver" is Spark-API metadata, not a connection
                # property — real drivers reject unknown keys
                if k != "driver" and v:
                    props.setProperty(k, v)
            conn = driver.connect(self.url, props)
            if conn is None:
                raise RuntimeError(f"driver rejected URL {self.url}")
            return conn

    def create_schema(self, spark: SparkSession, schema: str) -> None:
        self.run_sql(spark, ddl.create_schema_sql(schema))

    def drop_schema(self, spark: SparkSession, schema: str) -> None:
        self.run_sql(spark, ddl.drop_schema_sql(schema))

    def create_table(
        self, spark: SparkSession, columns, primary_keys: Sequence[str],
        schema: str, table: str,
    ) -> None:
        self.run_sql(spark, ddl.create_table_sql(columns, primary_keys, schema, table))

    # ----------------------------- data path -----------------------------
    def insert(
        self,
        df: DataFrame,
        schema: str,
        table: str,
        database: str = "",
        throttle=None,
    ) -> None:
        """S7: parallel batched append. A ``ThrottleConfig`` that applies
        to this table collapses writer parallelism to one connection
        with the configured chunk size (X2 parity — see
        sinks.throttle)."""
        batch = self.batch_size
        if throttle is not None and throttle.applies_to(database, schema, table):
            # session default parallelism as the unthrottled estimate:
            # df.rdd.getNumPartitions() would force a plan→RDD
            # materialization just to read a number (r2 verdict note)
            default = df.sparkSession.sparkContext.defaultParallelism
            df = df.coalesce(throttle.writer_partitions(default))
            batch = throttle.rows_per_df
        (
            df.write.mode("append")
            .option("batchsize", str(batch))
            .jdbc(self.url, ddl.qualify(schema, table), properties=self.properties)
        )

    def upsert(
        self,
        df: DataFrame,
        schema: str,
        table: str,
        primary_keys: Sequence[str],
        staging_table: str | None = None,
    ) -> None:
        """S8 upserts: bulk-stage then one set-based ON CONFLICT merge."""
        staging = staging_table or ddl.qualify(schema, f"{table}__stage")
        self._stage(df, staging)
        self.run_sql(
            df.sparkSession,
            ddl.staging_merge_sql(schema, table, staging, df.columns, primary_keys),
        )
        self.run_sql(df.sparkSession, f"DROP TABLE IF EXISTS {staging}")

    def delete(
        self,
        keys: DataFrame,
        schema: str,
        table: str,
        primary_keys: Sequence[str],
        staging_table: str | None = None,
    ) -> None:
        """S8 deletes: stage the PK tuples, one server-side keyed DELETE."""
        staging = staging_table or ddl.qualify(schema, f"{table}__delstage")
        self._stage(keys.select(*primary_keys), staging)
        self.run_sql(
            keys.sparkSession,
            ddl.staging_delete_sql(schema, table, staging, primary_keys),
        )
        self.run_sql(keys.sparkSession, f"DROP TABLE IF EXISTS {staging}")
