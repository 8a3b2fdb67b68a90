"""Postgres catalog access (SURVEY §2.1 S13-S15).

SQL text mirrors the reference's catalog queries
(/root/reference/src/postgres/table_query.rs:17-61,
postgres_operator_impl.rs:65-168); execution goes through
``spark.read.jdbc`` when a JDBC URL + driver are available (gated —
this container has neither Postgres nor the driver jar, so the text
layer is what unit tests cover).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

from rust_dms_cdc_operator_spark.payloads import TableMode
from rust_dms_cdc_operator_spark.sinks.ddl import quote_ident, quote_literal


def table_columns_sql(schema: str, table: str) -> str:
    """table_query.rs:17-25 — ordered column name → data type.
    Config-supplied names land in string-literal position, escaped via
    quote_literal (the reference splices them raw)."""
    return (
        "SELECT column_name, data_type FROM information_schema.columns "
        f"WHERE table_schema = {quote_literal(schema)} "
        f"AND table_name = {quote_literal(table)} "
        "ORDER BY ordinal_position"
    )


def primary_key_sql(schema: str, table: str) -> str:
    """table_query.rs:48-61 — pg_index ⋈ pg_attribute on indisprimary.
    The regclass literal carries quoted identifiers, so mixed-case
    names resolve and quotes cannot escape the literal."""
    regclass = quote_literal(f"{quote_ident(schema)}.{quote_ident(table)}")
    return (
        "SELECT a.attname FROM pg_index i "
        "JOIN pg_attribute a ON a.attrelid = i.indrelid "
        "AND a.attnum = ANY(i.indkey) "
        f"WHERE i.indrelid = {regclass}::regclass AND i.indisprimary"
    )


def tables_in_schema_sql(
    schema: str,
    included: Sequence[str] = (),
    excluded: Sequence[str] = (),
) -> str:
    """postgres_operator_impl.rs:124-168 — include list wins, then
    exclude list, else all tables in the schema."""
    base = (
        "SELECT table_name FROM information_schema.tables "
        f"WHERE table_schema = {quote_literal(schema)}"
    )
    mode = (
        TableMode.INCLUDE if included else
        TableMode.EXCLUDE if excluded else TableMode.ALL
    )
    if mode is TableMode.INCLUDE:
        lst = ", ".join(quote_literal(t) for t in included)
        return f"{base} AND table_name IN ({lst})"
    if mode is TableMode.EXCLUDE:
        lst = ", ".join(quote_literal(t) for t in excluded)
        return f"{base} AND table_name NOT IN ({lst})"
    return base


def sequences_sql(schema: str) -> str:
    """Sequence name → last_value for a schema (``pg_sequences``,
    PG10+). Surface parity with the reference's pgdatadiff dependency:
    its DiffPayload exposes ``only_sequences`` (pinned false at
    cdc_operator.rs:271-272) whose implementation compares sequence
    last_value between the two databases; ``last_value`` is NULL until
    the sequence's first ``nextval``."""
    return (
        "SELECT sequencename AS sequence_name, last_value "
        f"FROM pg_sequences WHERE schemaname = {quote_literal(schema)}"
    )


def _jdbc_query(spark: SparkSession, url: str, query: str, properties: dict):
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def get_table_columns(
    spark: SparkSession, url: str, schema: str, table: str, properties: dict | None = None
) -> dict[str, str]:
    """S13: ordered name→type mapping (IndexMap semantics — insertion
    order preserved by the ORDER BY + python dict)."""
    rows = _jdbc_query(spark, url, table_columns_sql(schema, table), properties).collect()
    out = {r["column_name"]: r["data_type"] for r in rows}
    # reference rewrite: ARRAY → text[] (postgres_operator_impl.rs:81-85)
    return {k: ("text[]" if v == "ARRAY" else v) for k, v in out.items()}


def get_primary_key(
    spark: SparkSession, url: str, schema: str, table: str, properties: dict | None = None
) -> list[str]:
    """S14."""
    rows = _jdbc_query(spark, url, primary_key_sql(schema, table), properties).collect()
    return [r["attname"] for r in rows]


def get_schema_sequences(
    spark: SparkSession,
    url: str,
    schema: str,
    properties: dict | None = None,
) -> dict[str, int | None]:
    """Sequence name → last_value (None while never advanced)."""
    rows = _jdbc_query(spark, url, sequences_sql(schema), properties).collect()
    return {
        r["sequence_name"]: (
            None if r["last_value"] is None else int(r["last_value"])
        )
        for r in rows
    }


def get_tables_in_schema(
    spark: SparkSession,
    url: str,
    schema: str,
    included: Sequence[str] = (),
    excluded: Sequence[str] = (),
    properties: dict | None = None,
) -> list[str]:
    """S15."""
    rows = _jdbc_query(
        spark, url, tables_in_schema_sql(schema, included, excluded), properties
    ).collect()
    return sorted(r["table_name"] for r in rows)
