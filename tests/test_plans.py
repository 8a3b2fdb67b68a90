"""Plan-quality gates: filters push to the scan, projections prune
ReadSchema, small dims broadcast, compaction costs exactly one
shuffle, whole-stage codegen covers the hot path."""

from __future__ import annotations

import pytest

from rust_dms_cdc_operator_spark.inventory import QUERIES
from rust_dms_cdc_operator_spark.plans.inspect import (
    count_broadcast_joins,
    count_exchanges,
    has_whole_stage_codegen,
    pushed_filters,
    read_schemas,
)

SF_DIR = "/root/testdata/sf0.001"


def test_s1_filter_pushdown_and_column_pruning(spark):
    df = QUERIES["s1_scan_projection"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    schemas = read_schemas(df)
    assert len(schemas) == 1
    # only the 4 projected + 2 filter columns are read, nothing else
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"):
        assert col in schemas[0]
    for col in ("l_partkey", "l_suppkey", "l_returnflag", "l_tax"):
        assert col not in schemas[0]
    assert has_whole_stage_codegen(df)


def test_w1_compaction_single_shuffle(spark):
    df = QUERIES["w1_cdc_compact"](spark, SF_DIR)
    # one hash exchange on the PK feeds the window — no more
    assert count_exchanges(df) == 1


def test_q3_dimension_joins_broadcast(spark):
    df = QUERIES["q3_top_customers"](spark, SF_DIR)
    assert count_broadcast_joins(df) == 2
    # broadcast joins mean the only hash exchange is the final groupBy
    # (+ the top-k single partition)
    assert count_exchanges(df) <= 2


def test_q1_aggregation_plan(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    # partial (map-side) aggregation: exactly one exchange on group keys
    assert count_exchanges(df) == 1
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed  # date filter reaches the scan


def test_exact_dedup_single_shuffle(spark):
    df = QUERIES["dedup_exact"](spark, SF_DIR)
    assert count_exchanges(df) == 1
    schemas = read_schemas(df)
    # only text + doc_id are read
    assert "lang" not in schemas[0]


def test_d1_anti_join_no_extra_scan_columns(spark):
    df = QUERIES["d1_delete"](spark, SF_DIR)
    assert has_whole_stage_codegen(df)
