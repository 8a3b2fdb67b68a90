"""Raw-SQL query surface.

The engine's inventory is DataFrame-first (Catalyst sees the same
logical plan either way), but users migrating SQL workloads want to
point ``spark.sql`` at the same tables. ``register_tables`` publishes
every testdata table as a temp view (one ``spark.read.parquet`` each —
scans stay lazy, pushdown/pruning work identically through views),
after which any oracle_sql()-style ANSI query runs verbatim minus
engine dialect differences.

Parity contract: ``tests/test_sqlapi.py`` proves a raw-SQL TPC-H run
over these views is row-identical to the DataFrame inventory query —
same Catalyst plan class, two front-ends.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "partsupp",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> list[str]:
    """Create a temp view per parquet table under ``sf_dir``; returns
    the view names actually registered (missing files are skipped so
    partial fixture dirs still work). Existence probes route through
    :mod:`fsio` so scheme-qualified roots (s3a://, hdfs://) register
    the same way local paths do."""
    from rust_dms_cdc_operator_spark import fsio

    out = []
    for t in tables:
        path = fsio.join(sf_dir, f"{t}.parquet")
        if not fsio.exists(path):
            continue
        spark.read.parquet(path).createOrReplaceTempView(t)
        out.append(t)
    return out
