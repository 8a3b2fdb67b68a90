"""Postgres DDL / DML text generation (SURVEY §2.1 S9-S11, §2.4 U1/D1).

Pure functions mirroring the reference's ``TableQuery`` SQL assembly
(/root/reference/src/postgres/table_query.rs:17-98) and upsert/delete
statement construction (postgres_operator_impl.rs:324-433), golden-
testable without a database — execution lives in ``sinks.postgres``.

Semantics reproduced:
- ``CREATE TABLE`` column order = source order; PK clause appended
  only when PK columns exist (table_query.rs:73-87);
- Postgres ``ARRAY`` types become ``text[]``
  (postgres_operator_impl.rs:37-49,81-85);
- ``INSERT ... ON CONFLICT (pk) DO UPDATE SET`` for updates
  (postgres_operator_impl.rs:389-417), plain INSERT otherwise;
- ``DELETE FROM s.t WHERE (pk,..) IN (...)`` keyed deletes
  (table_query.rs:37-47).

Deliberate change vs. the reference (SURVEY §7): statements are
PARAMETERIZED (%s placeholders) — no SQL-literal splicing of values
(vs postgres_row_struct.rs:36-38), so quoting/escaping bugs are
structurally impossible. The geometry rewrite (P9) stays a sink-side
expression (functions.dmscols.geometry_rewrite_expr).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import types as T

# Spark type → Postgres DDL type (reverse of the reference's
# information_schema-driven map, SURVEY §1.2)
_SPARK_TO_PG: list[tuple[type, str]] = [
    (T.LongType, "bigint"),
    (T.IntegerType, "integer"),
    (T.ShortType, "smallint"),
    (T.DoubleType, "double precision"),
    (T.FloatType, "real"),
    (T.BooleanType, "boolean"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp"),
    (T.TimestampNTZType, "timestamp"),
    (T.BinaryType, "bytea"),
    (T.StringType, "text"),
]


def pg_type_for(dtype: T.DataType) -> str:
    if isinstance(dtype, T.DecimalType):
        return f"numeric({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        # reference collapses all Postgres arrays to text[]
        return "text[]"
    for spark_t, pg in _SPARK_TO_PG:
        if isinstance(dtype, spark_t):
            return pg
    return "text"


def quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def quote_literal(value: str) -> str:
    """Escape a string for a single-quoted SQL literal context (the
    catalog queries interpolate config-supplied names into literals;
    the data path is parameterized and never needs this)."""
    return "'" + value.replace("'", "''") + "'"


def qualify(schema: str, table: str) -> str:
    """Quoted ``"schema"."table"``. Every statement this module emits
    quotes identifiers the same way, so a mixed-case or reserved-word
    column that succeeds at staging can never fail at merge (unquoted
    names would be case-folded by the server)."""
    return f"{quote_ident(schema)}.{quote_ident(table)}"


def create_schema_sql(schema: str) -> str:
    """table_query.rs:62-71."""
    return f"CREATE SCHEMA IF NOT EXISTS {quote_ident(schema)}"


def drop_schema_sql(schema: str) -> str:
    """table_query.rs:89-98."""
    return f"DROP SCHEMA IF EXISTS {quote_ident(schema)} CASCADE"


def create_table_sql(
    columns: Mapping[str, str] | T.StructType,
    primary_keys: Sequence[str],
    schema: str,
    table: str,
) -> str:
    """table_query.rs:73-87: ordered columns, optional PK clause.
    ``columns`` is either an ordered name→pg-type mapping (as the
    catalog returns) or a Spark StructType (mapped via pg_type_for)."""
    if isinstance(columns, T.StructType):
        items = [(f.name, pg_type_for(f.dataType)) for f in columns.fields]
    else:
        items = list(columns.items())
    cols = ", ".join(f"{quote_ident(name)} {typ}" for name, typ in items)
    pk = (
        f", PRIMARY KEY ({', '.join(quote_ident(c) for c in primary_keys)})"
        if primary_keys
        else ""
    )
    return f"CREATE TABLE IF NOT EXISTS {qualify(schema, table)} ({cols}{pk})"


def insert_sql(schema: str, table: str, columns: Sequence[str]) -> str:
    """Parameterized single-row INSERT (executemany/batch does the
    chunking the reference hand-rolls at postgres_operator_impl.rs:
    246-302)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    ph = ", ".join(["%s"] * len(columns))
    return f"INSERT INTO {qualify(schema, table)} ({cols}) VALUES ({ph})"


def upsert_sql(
    schema: str, table: str, columns: Sequence[str], primary_keys: Sequence[str]
) -> str:
    """INSERT .. ON CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col
    (postgres_operator_impl.rs:389-417). No PK → plain insert."""
    base = insert_sql(schema, table, columns)
    if not primary_keys:
        return base
    updates = ", ".join(
        f"{quote_ident(c)} = EXCLUDED.{quote_ident(c)}"
        for c in columns
        if c not in primary_keys
    )
    conflict = ", ".join(quote_ident(c) for c in primary_keys)
    if not updates:
        return f"{base} ON CONFLICT ({conflict}) DO NOTHING"
    return f"{base} ON CONFLICT ({conflict}) DO UPDATE SET {updates}"


def delete_sql(schema: str, table: str, primary_keys: Sequence[str]) -> str:
    """Keyed delete, composite-PK capable (table_query.rs:37-47)."""
    cols = ", ".join(quote_ident(c) for c in primary_keys)
    ph = ", ".join(["%s"] * len(primary_keys))
    return f"DELETE FROM {qualify(schema, table)} WHERE ({cols}) = ({ph})"


def staging_delete_sql(
    schema: str,
    table: str,
    staging_table: str,
    primary_keys: Sequence[str],
) -> str:
    """Set-based keyed delete from a staged PK table (the scale form
    of table_query.rs:37-47's keyed delete): one server-side statement,
    composite-PK capable. ``staging_table`` is used verbatim, like
    :func:`staging_merge_sql`."""
    on = " AND ".join(
        f"t.{quote_ident(c)} = s.{quote_ident(c)}" for c in primary_keys
    )
    return (
        f"DELETE FROM {qualify(schema, table)} t "
        f"USING {staging_table} s WHERE {on}"
    )


def staging_merge_sql(
    schema: str,
    table: str,
    staging_table: str,
    columns: Sequence[str],
    primary_keys: Sequence[str],
) -> str:
    """Set-based MERGE from a staging table — the scale path for S8:
    Spark bulk-writes the compacted frame to ``staging_table`` via JDBC
    (parallel, batched), then ONE server-side statement applies it.
    Row-at-a-time upserts (the reference's loop) never touch the data
    path.

    ``staging_table`` is used verbatim — callers pass an
    already-qualified/quoted name (PostgresSink builds it with
    ``qualify``)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    conflict = ", ".join(quote_ident(c) for c in primary_keys)
    updates = ", ".join(
        f"{quote_ident(c)} = EXCLUDED.{quote_ident(c)}"
        for c in columns
        if c not in primary_keys
    )
    action = f"DO UPDATE SET {updates}" if updates else "DO NOTHING"
    return (
        f"INSERT INTO {qualify(schema, table)} ({cols}) "
        f"SELECT {cols} FROM {staging_table} "
        f"ON CONFLICT ({conflict}) {action}"
    )
