"""Round 12 (verdict item 8): the bench's scale-grading taxonomy is a
CONTRACT, not a convention — every query lives in exactly one of
{deployment (default), EXACT_MODES, EXACT_REQUIRED}, and the tagged
sets must be real inventory keys (a renamed query silently dropping
out of its class would misgrade the artifact)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_classes_are_disjoint_inventory_subsets():
    bench = _bench()
    from rust_dms_cdc_operator_spark.inventory import QUERIES

    keys = set(QUERIES)
    assert bench.EXACT_MODES & bench.EXACT_REQUIRED == set()
    assert bench.EXACT_MODES <= keys, bench.EXACT_MODES - keys
    assert bench.EXACT_REQUIRED <= keys, bench.EXACT_REQUIRED - keys
    # the sf1 scale section also only names real queries, no dupes
    assert set(bench.SCALE_QUERIES) <= keys, (
        set(bench.SCALE_QUERIES) - keys
    )
    assert len(bench.SCALE_QUERIES) == len(set(bench.SCALE_QUERIES))
