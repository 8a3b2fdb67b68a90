"""Golden-string tests for DDL/DML and catalog SQL — the same strategy
as the reference's TableQuery tests (table_query.rs:103-195)."""

from __future__ import annotations

from pyspark.sql import types as T

from rust_dms_cdc_operator_spark.sinks.ddl import (
    create_schema_sql,
    create_table_sql,
    delete_sql,
    drop_schema_sql,
    insert_sql,
    pg_type_for,
    staging_merge_sql,
    upsert_sql,
)
from rust_dms_cdc_operator_spark.sources.catalog import (
    primary_key_sql,
    table_columns_sql,
    tables_in_schema_sql,
)


def test_schema_ddl():
    assert create_schema_sql("s") == 'CREATE SCHEMA IF NOT EXISTS "s"'
    assert drop_schema_sql("s") == 'DROP SCHEMA IF EXISTS "s" CASCADE'


def test_create_table_with_and_without_pk():
    cols = {"id": "bigint", "name": "text", "tags": "text[]"}
    assert create_table_sql(cols, ["id"], "s", "t") == (
        'CREATE TABLE IF NOT EXISTS "s"."t" '
        '("id" bigint, "name" text, "tags" text[], PRIMARY KEY ("id"))'
    )
    # no PK → no PK clause (table_query.rs:79-83)
    assert create_table_sql(cols, [], "s", "t") == (
        'CREATE TABLE IF NOT EXISTS "s"."t" ("id" bigint, "name" text, "tags" text[])'
    )
    # composite PK
    assert create_table_sql({"a": "bigint", "b": "int"}, ["a", "b"], "s", "t").endswith(
        'PRIMARY KEY ("a", "b"))'
    )


def test_create_table_from_struct_type_maps_spark_types():
    st = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("bal", T.DecimalType(12, 2)),
            T.StructField("score", T.DoubleType()),
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    assert create_table_sql(st, ["id"], "s", "t") == (
        'CREATE TABLE IF NOT EXISTS "s"."t" ("id" bigint, "bal" numeric(12,2), '
        '"score" double precision, "d" date, "ts" timestamp, "ok" boolean, '
        '"tags" text[], "blob" bytea, PRIMARY KEY ("id"))'
    )
    # reference's ARRAY → text[] rewrite applies to any element type
    assert pg_type_for(T.ArrayType(T.LongType())) == "text[]"


def test_dml_statements():
    assert insert_sql("s", "t", ["a", "b"]) == (
        'INSERT INTO "s"."t" ("a", "b") VALUES (%s, %s)'
    )
    assert upsert_sql("s", "t", ["a", "b", "c"], ["a"]) == (
        'INSERT INTO "s"."t" ("a", "b", "c") VALUES (%s, %s, %s) '
        'ON CONFLICT ("a") DO UPDATE SET "b" = EXCLUDED."b", "c" = EXCLUDED."c"'
    )
    # PK-only table: DO NOTHING (no columns left to update)
    assert upsert_sql("s", "t", ["a"], ["a"]).endswith('ON CONFLICT ("a") DO NOTHING')
    # no PK → degenerates to plain insert (reference upsert requires PK)
    assert upsert_sql("s", "t", ["a", "b"], []) == insert_sql("s", "t", ["a", "b"])
    # composite-PK delete (table_query.rs:37-47)
    assert delete_sql("s", "t", ["a", "b"]) == (
        'DELETE FROM "s"."t" WHERE ("a", "b") = (%s, %s)'
    )


def test_mixed_case_identifiers_quoted_everywhere():
    """A mixed-case column that succeeds at staging must also merge:
    every statement quotes identifiers identically (ADVICE round 1)."""
    sql = staging_merge_sql("s", "T", '"s"."T__stage"', ["Id", "firstName"], ["Id"])
    assert sql == (
        'INSERT INTO "s"."T" ("Id", "firstName") '
        'SELECT "Id", "firstName" FROM "s"."T__stage" '
        'ON CONFLICT ("Id") DO UPDATE SET "firstName" = EXCLUDED."firstName"'
    )
    assert create_table_sql({"Id": "bigint"}, ["Id"], "s", "T") == (
        'CREATE TABLE IF NOT EXISTS "s"."T" ("Id" bigint, PRIMARY KEY ("Id"))'
    )


def test_staging_merge():
    sql = staging_merge_sql("s", "t", '"s"."t__stage"', ["a", "b"], ["a"])
    assert sql == (
        'INSERT INTO "s"."t" ("a", "b") SELECT "a", "b" FROM "s"."t__stage" '
        'ON CONFLICT ("a") DO UPDATE SET "b" = EXCLUDED."b"'
    )


def test_catalog_sql():
    assert table_columns_sql("public", "c") == (
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_schema = 'public' AND table_name = 'c' "
        "ORDER BY ordinal_position"
    )
    assert "indisprimary" in primary_key_sql("public", "c")
    assert "'\"public\".\"c\"'::regclass" in primary_key_sql("public", "c")
    base = "SELECT table_name FROM information_schema.tables WHERE table_schema = 's'"
    assert tables_in_schema_sql("s") == base
    assert tables_in_schema_sql("s", included=["a", "b"]) == (
        base + " AND table_name IN ('a', 'b')"
    )
    assert tables_in_schema_sql("s", excluded=["x"]) == (
        base + " AND table_name NOT IN ('x')"
    )
    # include wins when both given (snapshot_payload.rs:78-86)
    assert "IN ('a')" in tables_in_schema_sql("s", included=["a"], excluded=["x"])


def test_catalog_sql_escapes_injection():
    """Config values cannot break out of literal position (ADVICE)."""
    evil = "x'; DROP TABLE users; --"
    sql = table_columns_sql(evil, "t")
    assert "DROP TABLE" in sql  # present, but inert inside the literal
    assert "'x''; DROP TABLE users; --'" in sql
    sql2 = tables_in_schema_sql("s", included=[evil])
    assert "'x''; DROP TABLE users; --'" in sql2


def test_throttle_config_env_parity():
    from rust_dms_cdc_operator_spark.sinks.throttle import throttle_config_from_env

    cfg = throttle_config_from_env({})
    assert not cfg.delay_enabled
    assert cfg.insert_delay_ms == 1000  # reference defaults
    assert cfg.rows_per_df == 10000

    cfg = throttle_config_from_env({
        "DELAYABLE_CONFIG": "db:public:big_table, db:public:other",
        "DELAY_INSERT": "true",
        "INSERT_DELAY": "250",
        "ROWS_PER_DF": "5000",
    })
    assert cfg.applies_to("db", "public", "big_table")
    assert cfg.applies_to("db", "public", "other")
    assert not cfg.applies_to("db", "public", "small_table")
    assert cfg.insert_delay_ms == 250
    assert cfg.rows_per_df == 5000
    assert cfg.writer_partitions(32) == 1
