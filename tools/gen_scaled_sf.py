"""Generate a replication-scaled copy of an sf directory for scale
benching (the container ships sf0.001/0.01/0.1 only, and
/root/testdata is read-only).

Each table is unioned K times with per-replica offsets applied to its
key columns so join relationships survive (orders.o_custkey moves with
customer.c_custkey, lineitem.l_orderkey with orders.o_orderkey; the
small dims nation/region/supplier/part stay fixed, as in TPC-H).
Document/embedding ids shift; text gets a per-replica suffix so the
corpus is not 10x exact duplicates (which would turn dedup pair
outputs quadratic and measure a different workload).

This data is for TIMING scale checks only — correctness runs against
the driver's own tables.

SUPERSEDED for the bench's sf1 section by ``gen_native_sf.py``
(fresh rows from the observed distributions): replication makes the
pair-producing dedup/LSH workloads measure the copy artifact rather
than the data. This tool remains for quick K-fold inflation where
cross-replica relationships don't matter.

Usage: python tools/gen_scaled_sf.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (table, {column: offset_unit}) — offset_unit keys shift by
# replica_index * (max(key)+1) of the SOURCE table that owns the key
OFFSETS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "supplier": {},
    "part": {},
    "customer": {"c_custkey": "customer.c_custkey"},
    "orders": {"o_orderkey": "orders.o_orderkey", "o_custkey": "customer.c_custkey"},
    "lineitem": {"l_orderkey": "orders.o_orderkey"},
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}


def generate(spark, src_dir: str, dst_dir: str, k: int = 10) -> None:
    from pyspark.sql import functions as F

    strides: dict[str, int] = {}
    for ref in {u for m in OFFSETS.values() for u in m.values()}:
        table, col = ref.split(".")
        mx = (
            spark.read.parquet(f"{src_dir}/{table}.parquet")
            .agg(F.max(col))
            .first()[0]
        )
        strides[ref] = int(mx) + 1

    os.makedirs(dst_dir, exist_ok=True)
    for table, offmap in OFFSETS.items():
        src = spark.read.parquet(f"{src_dir}/{table}.parquet")
        if not offmap:  # fixed dims: copy once
            src.write.mode("overwrite").parquet(f"{dst_dir}/{table}.parquet")
            continue
        replicas = []
        for i in range(k):
            r = src
            for col, ref in offmap.items():
                r = r.withColumn(col, F.col(col) + F.lit(i * strides[ref]))
            if table == "documents" and i > 0:
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{dst_dir}/{table}.parquet")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-graft-sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from rust_dms_cdc_operator_spark.session import get_spark

    spark = get_spark(app_name="gen-scaled-sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    generate(spark, src, dst, k)
    print(f"wrote {dst} (K={k} from {src})")


if __name__ == "__main__":
    main()
