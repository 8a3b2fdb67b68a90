"""Raw-SQL front-end parity: spark.sql over registered views returns
exactly what the DataFrame inventory query returns (same Catalyst
plan underneath), so SQL workloads migrate verbatim."""

from __future__ import annotations

from rust_dms_cdc_operator_spark.inventory import QUERIES
from rust_dms_cdc_operator_spark.sqlapi import register_tables

SF_DIR = "/root/testdata/sf0.001"


def test_register_and_q6_parity(spark):
    views = register_tables(spark, SF_DIR)
    assert "lineitem" in views and "documents" in views
    sql = spark.sql(
        """
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT))
                    AS DOUBLE) / 10000 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24
        """
    ).collect()
    df = QUERIES["q6_forecast_revenue"](spark, SF_DIR).collect()
    assert len(sql) == len(df) == 1
    assert abs(sql[0].revenue - df[0].revenue) < 1e-9


def test_sql_group_by_parity(spark):
    register_tables(spark, SF_DIR)
    sql = {
        (r.event_type, r.n)
        for r in spark.sql(
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1"
        ).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import functions as F

    df = {
        (r.event_type, r.n)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sql == df


def test_cli_query_subcommand():
    """`query --name list` prints the inventory; unknown names fail
    with exit 2 (subprocess-free: call main() directly)."""
    import contextlib
    import io

    from rust_dms_cdc_operator_spark.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["query", "--name", "list"])
    assert rc == 0
    names = buf.getvalue().split()
    assert "q1_pricing_summary" in names and len(names) >= 131

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = main(["query", "--name", "nope_not_real"])
    assert rc == 2 and "unknown query" in err.getvalue()


def test_cli_query_explain(spark):
    """`query --name X --explain` prints the formatted physical plan
    (scan/pushdown review without materializing rows)."""
    import contextlib
    import io

    from rust_dms_cdc_operator_spark.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "query", "--name", "s1_scan_projection",
            "--sf-dir", "/root/testdata/sf0.001", "--explain",
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "Physical Plan" in out and "Scan parquet" in out
    assert "PushedFilters" in out  # the point of the flag
