"""CDC replay correctness: Spark window compaction vs the sequential
pure-Python replay oracle (FIXTURES.md A.3 scenarios)."""

from __future__ import annotations

import pytest

from rust_dms_cdc_operator_spark.operators.compact import replay_manifest
from rust_dms_cdc_operator_spark.payloads import LoadMode
from rust_dms_cdc_operator_spark.sources.manifest import build_manifest
from tests import cdc_fixtures


def _replay(spark, root, table, pk, **kw):
    manifest = build_manifest(
        mode=LoadMode.DATE_AWARE,
        root=root,
        database=cdc_fixtures.DB,
        schema=cdc_fixtures.SCHEMA,
        table=table,
        start_date="2000-01-01",
    )
    return replay_manifest(spark, root, manifest, pk, **kw)


def test_customers_replay_matches_sequential_oracle(spark, tmp_path):
    root = str(tmp_path)
    fx = cdc_fixtures.write_customers_cdc(root)
    got = _replay(spark, root, fx["table"], fx["pk"])

    rows = {r["id"]: r.asDict() for r in got.collect()}
    exp = fx["expected"]
    assert set(rows) == set(exp)  # 100 - 3 deleted + 10 new - 1 del + 1 reinsert
    for i, erow in exp.items():
        grow = rows[i]
        assert grow["name"] == erow["name"]
        assert float(grow["balance"]) == float(erow["balance"])
        assert grow["score"] == erow["score"]
        assert grow["active"] == erow["active"]
        assert list(grow["tags"]) == erow["tags"]
    # spot-check the cross-file override semantics
    assert float(rows[100]["balance"]) == 1.23  # file-2 U over file-1 I
    assert 3 not in rows  # file-2 D over file-1 U
    assert float(rows[8]["balance"]) == 8.88  # re-insert after delete
    # DMS + bookkeeping columns must not leak into final state
    assert "Op" not in got.columns
    assert "_dms_ingestion_timestamp" not in got.columns
    assert not [c for c in got.columns if c.startswith("_cdc")]


def test_orders_composite_pk_last_writer_wins(spark, tmp_path):
    root = str(tmp_path)
    fx = cdc_fixtures.write_orders_cdc(root)
    got = _replay(spark, root, fx["table"], fx["pk"])

    rows = {(r["order_id"], r["line_no"]): r.asDict() for r in got.collect()}
    exp = fx["expected"]
    assert set(rows) == set(exp)
    # two U's for (1,1) in one file: the later row in the file wins
    assert rows[(1, 1)]["status"] == "delivered"
    assert float(rows[(1, 1)]["amount"]) == 9.00
    assert (2, 2) not in rows
    assert rows[(11, 1)]["status"] == "new"


def test_no_pk_full_load_only(spark, tmp_path):
    root = str(tmp_path)
    fx = cdc_fixtures.write_no_pk_cdc(root)
    manifest = build_manifest(
        mode=LoadMode.FULL_LOAD_ONLY,
        root=root,
        database=cdc_fixtures.DB,
        schema=cdc_fixtures.SCHEMA,
        table=fx["table"],
    )
    got = replay_manifest(spark, root, manifest, fx["pk"])
    assert got.count() == fx["expected_rows"]


def test_schema_drift_raises(spark, tmp_path):
    root = str(tmp_path)
    fx = cdc_fixtures.write_schema_drift(root)
    source_columns = [
        "id", "name", "balance", "score", "signup_date", "updated_at",
        "active", "tags",
    ]
    with pytest.raises(ValueError, match="schema drift"):
        _replay(
            spark, root, fx["table"], fx["pk"],
            source_columns=source_columns, merge_schema=True,
        )
    # the same columns without drift pass the check
    fx2 = cdc_fixtures.write_customers_cdc(root)
    _replay(
        spark, root, fx2["table"], fx2["pk"],
        source_columns=source_columns, merge_schema=True,
    )
