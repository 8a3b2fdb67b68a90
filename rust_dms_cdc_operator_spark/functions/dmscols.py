"""The DMS column protocol and scalar rewrites (SURVEY §1.3, §2.2).

- ``Op`` — one char ``I``/``U``/``D`` on every CDC row (reference
  detection: /root/reference/src/postgres/postgres_operator_impl.rs:
  337-342, 377). We match by equality, the DMS contract, not by
  ``contains`` (SURVEY §7 choice 5).
- ``_dms_ingestion_timestamp`` — dropped before all writes
  (postgres_operator_impl.rs:215-218, 319).
- Geometry sniff (P9): a string column whose value starts with
  ``MULTIPOLYGON(`` is wrapped ``ST_GeomFromText('<wkt>', 0)`` at the
  sink (postgres_geometry_type.rs:7-54); a ``POINT(`` value must NOT
  be rewritten (postgres_geometry_type_tests.rs:12-15).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DMS_OP_COL = "Op"
DMS_TS_COL = "_dms_ingestion_timestamp"


def drop_dms_columns(df: DataFrame) -> DataFrame:
    """P1: remove the two DMS protocol columns before any write
    (postgres_operator_impl.rs:213-218)."""
    return df.drop(DMS_OP_COL, DMS_TS_COL)


def insert_rows(df: DataFrame, op_col: str = DMS_OP_COL) -> DataFrame:
    """Rows that land as plain inserts."""
    return df.filter(F.col(op_col) == "I")


def update_rows(df: DataFrame, op_col: str = DMS_OP_COL) -> DataFrame:
    """P5: rows that take the ON CONFLICT update path
    (postgres_operator_impl.rs:377)."""
    return df.filter(F.col(op_col) == "U")


def delete_rows(df: DataFrame, op_col: str = DMS_OP_COL) -> DataFrame:
    """P4: rows that take the delete path
    (postgres_operator_impl.rs:337-342)."""
    return df.filter(F.col(op_col) == "D")


def geometry_rewrite_expr(col: Column) -> Column:
    """P9: sink-side literal wrapper for PostGIS MULTIPOLYGON WKT.

    The reference sniffs the first 30 chars for ``MULTIPOLYGON(``
    (postgres_geometry_type.rs:10,34-54) — prefix match is equivalent
    and stays in whole-stage codegen (no UDF).
    """
    return F.when(
        col.startswith("MULTIPOLYGON("),
        F.concat(F.lit("ST_GeomFromText('"), col, F.lit("', 0)")),
    ).otherwise(col)
