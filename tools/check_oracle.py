"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry in Spark AND its ``oracle_sql()`` in DuckDB on the
same parquet, compare row count + column names + order-insensitive
canonical values. Usage:

    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]


Trained-artifact oracles are scale-parameterized (round 7): the five
ANN oracles (``sim_ivf_trained`` / ``sim_ivf_probe_partitioned``:
centroids; ``sim_pq_topk`` / ``sim_ivfpq_topk`` /
``sim_ivfpq_probe_partitioned``: PQ codebooks) embed the sf0.01
artifacts in their static driver strings, and at any other --sf-dir
this tool re-renders them from the per-sf trained/ JSON registry
(``inventory_llm.oracle_sql_overrides``; regenerate artifacts with
tools/gen_ivf_centroids.py / gen_pq_codebooks.py <sf_dir>). With
artifacts generated (sf0.001 / sf0.1 / spark-graft-sf1-native are
committed) all five hash-match at every scale — zero by-design
exclusions remain in the sweep.
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, Decimal):
        # Render Decimals distinctly from int/float so cross-engine type
        # skew (DuckDB HUGEINT/DECIMAL vs Spark BIGINT/DOUBLE) fails
        # loudly here instead of being masked and then failing only in
        # the driver's canonicalization (bit us on q12_shipmode_priority:
        # bare sum(CASE) is HUGEINT in DuckDB).  Trailing zeros are
        # normalized so scale differences within Decimal don't matter.
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return "dec:" + s
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from rust_dms_cdc_operator_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    import os

    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (e.g. the
        # native-sf1 set from tools/gen_native_sf.py): glob them so the
        # oracle sweep can run against any scale, not just the
        # single-file driver fixtures
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    # per-scale trained-artifact oracles: the five ANN oracles embed
    # sf0.01-trained literals in their static driver strings; at any
    # other --sf-dir, re-render them from the trained/ registry (if
    # generated for that tag) so the sweep is scale-independent
    from rust_dms_cdc_operator_spark.inventory import (
        oracle_sql_overrides,
    )

    overrides = oracle_sql_overrides(args.sf_dir)
    if overrides:
        print(f"(per-sf trained oracles: {sorted(overrides)})")
        oracles = {**oracles, **overrides}
    names = args.names or list(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle, rows-only)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        ok = True
        if sorted(c.lower() for c in s_cols) != sorted(d_cols):
            ok = False
            print(f"FAIL  {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
        elif len(s_rows) != len(d_rows):
            ok = False
            print(f"FAIL  {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
        else:
            cs = canon_rows([c.lower() for c in s_cols], s_rows)
            cd = canon_rows(d_cols, d_rows)
            if cs != cd:
                ok = False
                bad = next(i for i in range(len(cs)) if cs[i] != cd[i])
                print(f"FAIL  {name}: first differing row #{bad}:")
                print(f"      spark : {cs[bad]}")
                print(f"      duckdb: {cd[bad]}")
        if ok:
            print(f"OK    {name}: {len(s_rows)} rows  ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
