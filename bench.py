"""Benchmark the declared query inventory.

Runs every ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: total wall-clock + per-query seconds. Each query is fully
materialized through the "noop" sink (all compute, no collect/driver
materialization — the same shape a cluster job has).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from rust_dms_cdc_operator_spark.inventory import QUERIES
    from rust_dms_cdc_operator_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm the JVM/codegen paths once so per-query numbers are steady-state
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the Python worker pool the same way (daemon + worker fork is
    # a one-time session cost, not a per-query cost)
    spark.range(1).mapInPandas(lambda it: it, "id long").collect()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "inventory_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
