"""Lint the DuckDB oracle surface for cross-engine value-rendering traps.

Round-4 verdict item 6: a bare ``sum(INTEGER)`` in DuckDB returns HUGEINT
(Arrow decimal128), whose canonical rendering differs from Spark's BIGINT
even when the values are equal — this silently failed the driver's hash
compare for ``q12_shipmode_priority`` while the local gate masked it by
coercing both sides through ``float``.  Two defenses now:

1. ``canon_cell`` renders Decimals distinctly from int/float (regression
   tests below), so the local gate fails loudly on type skew.
2. This lint DESCRIBEs every oracle against the sf0.001 views and rejects
   any DECIMAL / HUGEINT result column outright — stronger than regex
   parsing the SQL for bare aggregates, because it checks what DuckDB
   actually infers.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
BANNED = ("DECIMAL", "HUGEINT")


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_query_has_an_oracle_or_is_documented():
    import __spark_entry__ as entry

    queries = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= queries, f"orphan oracles: {sorted(oracles - queries)}"


def test_no_decimal_or_hugeint_oracle_columns(con):
    bad: list[str] = []
    for name, sql in _oracles().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in BANNED):
                bad.append(f"{name}.{col}: {t}")
    assert not bad, (
        "oracle columns with engine-skewed types (wrap in CAST(... AS "
        "BIGINT/DOUBLE)): " + "; ".join(bad)
    )


def test_canon_cell_distinguishes_decimal_from_int():
    from tools.check_oracle import canon_cell

    assert canon_cell(Decimal("123")) != canon_cell(123)
    assert canon_cell(Decimal("123.000")) != canon_cell(123.0)


def test_canon_cell_normalizes_decimal_scale():
    from tools.check_oracle import canon_cell

    assert canon_cell(Decimal("1.50")) == canon_cell(Decimal("1.5"))
    assert canon_cell(Decimal("123.000")) == canon_cell(Decimal("123"))
    # no scientific notation leakage for large/small values
    assert canon_cell(Decimal("1230000000")).endswith("1230000000")
    assert canon_cell(Decimal("1.23E+9")).endswith("1230000000")
