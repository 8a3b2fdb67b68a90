"""Round-12 optimization harness: time named queries through the noop
sink (guide §1.4) on the bench session and dump their formatted plans.

Usage:
    python tools/profile_queries.py [--plans-dir plans/r12] \
        [--suffix before] [--repeat 1] [--sf-dir /root/testdata/sf0.1] \
        name [name ...]

Each query runs exactly like bench.py does (same session, same noop
sink, cache cleared between queries, job description labeled per
guide §1.5); per-query wall + JVM cpu seconds print as one JSON line
at the end. With --plans-dir, each query's .explain("formatted") is
written to <plans-dir>/<name>_<suffix>.txt (the round-12 deliverable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from bench import _jvm_cpu_secs
    from rust_dms_cdc_operator_spark.inventory import QUERIES
    from rust_dms_cdc_operator_spark.inventory_llm import prepare_bench
    from rust_dms_cdc_operator_spark.session import (
        get_spark,
        release_persistent_rdds,
    )

    spark = get_spark(app_name="profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1).mapInPandas(lambda it: it, "id long").collect()
    from rust_dms_cdc_operator_spark.session import local_relation
    local_relation(spark, [(1,)], "x long").collect()
    prepare_bench(spark, args.sf_dir)

    out: dict[str, list] = {}
    for name in args.names:
        walls, cpus = [], []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [rep {i}]")
            c0 = _jvm_cpu_secs(spark)
            t0 = time.time()
            df = QUERIES[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            cpus.append(round(_jvm_cpu_secs(spark) - c0, 3))
            spark.catalog.clearCache()
            release_persistent_rdds(spark)
            spark.sparkContext.setJobDescription(None)
        out[name] = [walls, cpus]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            plan = spark._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            spark.catalog.clearCache()
        print(f"DONE {name}: wall={walls} cpu={cpus}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
