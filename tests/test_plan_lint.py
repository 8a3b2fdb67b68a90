"""Global plan lint: EVERY batch query's physical plan is swept for
scale anti-patterns. This is the repo-wide version of the targeted
gates in test_plans.py — a regression here means a new or edited
query re-introduced a pattern that dies at 100 TB.

- ``CartesianProduct``: forbidden everywhere (no exceptions — every
  pairwise operator in this repo is banded/bucketed/broadcast).
- ``BatchEvalPython`` (row-at-a-time Python UDF): forbidden
  everywhere — Python only ever appears Arrow-batched (MapInPandas /
  AggregateInPandas / ArrowEvalPython).
- ``BroadcastNestedLoopJoin``: allowed ONLY on the allowlist below,
  where the build side is provably O(1)/O(days)-sized (scalar
  aggregates, day spines, broadcast query sets) — a BNLJ against a
  growing side is a bug.

Streaming one-shots are excluded: building their DataFrame runs the
stream (they are availableNow queries), and their physical shape is
covered by test_streaming / test_ivm.
"""

from __future__ import annotations

import pytest

from rust_dms_cdc_operator_spark.inventory import QUERIES
from rust_dms_cdc_operator_spark.plans.inspect import formatted_plan

SF_DIR = "/root/testdata/sf0.001"

# BNLJ build sides, each O(1) rows or O(days): justified and stable
# Round 7 shrank this to the three joins whose build side is a
# genuinely BOUNDED dimension (not a scalar): every former scalar
# entry now combines via tagged-union aggregation (count_diff
# pattern: triangle_stats, events_funnel, events_join_size_estimate)
# or the literal-lookup collect (chunk-offset pattern: q11, q22,
# docs_bm25_search).
BNLJ_ALLOWED = {
    "sim_batch_topk",           # broadcast query-vector set (k rows)
    "events_dau_mau",           # day spine (O(days)) range join
    "sim_knn_classify",         # broadcast 50-query set (bounded)
}

SKIP = tuple(
    n
    for n in QUERIES
    if n.startswith("stream_") or n == "cdc_incremental_agg_view"
)


@pytest.fixture(scope="module")
def plans(spark):
    from rust_dms_cdc_operator_spark.inventory_llm import prepare_bench

    prepare_bench(spark, SF_DIR)
    out = {}
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        out[name] = formatted_plan(fn(spark, SF_DIR))
    return out


def test_no_cartesian_products_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], offenders


def test_no_row_at_a_time_python_udfs(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], offenders


def test_bnlj_only_on_allowlist(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == [], offenders


def test_no_hof_in_join_conditions(plans):
    """No interpreted higher-order function (aggregate/zip_with/
    transform over arrays) may appear inside a join condition.
    Catalyst pushes a post-join filter over such an expression into
    the join predicate, PREPENDED to the cheap conjuncts — so the
    HOF evaluates on every joined row instead of the survivors (the
    round-6 embedding_neardup_pairs find: the cosine ran on 400k
    block-joined rows instead of 4.9k gap survivors, 6x the query
    cost). The fix is structural — generate candidates narrow and
    attach the arrays by id ABOVE the join — so a regression here
    means a new query re-inlined payload arrays into candidate
    generation.

    The flagged shape is precisely the MIXED condition: an HOF
    sharing one join condition with cheap range conjuncts (an
    ``<`` / id-gap bound) — that is candidate generation evaluating
    the expensive expression pre-prune. An HOF ALONE in a fetch
    join's condition (narrow-then-fetch's top join) evaluates once
    per already-pruned candidate and is fine."""
    hof_markers = ("zip_with(", "aggregate(transform(")
    offenders = []
    for name, plan in plans.items():
        for line in plan.splitlines():
            stripped = line.strip()
            if not stripped.startswith("Join condition:"):
                continue
            if any(m in stripped for m in hof_markers) and " < " in stripped:
                offenders.append((name, stripped[:120]))
                break
    assert offenders == [], offenders


def test_allowlist_not_stale(plans):
    """Every allowlisted query still exists and still uses a BNLJ —
    prune the list when a plan improves."""
    for name in BNLJ_ALLOWED:
        assert name in plans, f"{name} vanished from the inventory"
        assert "BroadcastNestedLoopJoin" in plans[name], (
            f"{name} no longer plans a BNLJ — remove it from the allowlist"
        )
