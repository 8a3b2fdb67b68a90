"""Regenerate the trained-IVF centroid literals embedded in
inventory_llm.py's sim_ivf_trained oracle.

The correctness driver compares Spark vs DuckDB at sf0.01, and the
oracle SQL must be a static string — so the seed-42 centroids for
sf0.01 are trained here once and pasted as a module constant.
Training (bounded ordered sample + driver-local Lloyd since round 7)
is a pure function of data + seed — independent of partition layout
and cpu count, so the live-trained query reproduces these values on
any cluster configuration. (The previous pyspark.ml KMeans trainer
was measured layout-DEPENDENT at sf1: 16-thread sweeps could not
reproduce 4-thread artifacts.)

Usage: python tools/gen_ivf_centroids.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from rust_dms_cdc_operator_spark.operators.similarity import (
    train_ivf_centroids,
)
from rust_dms_cdc_operator_spark.session import get_spark


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gen-ivf-centroids")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        (F.col("vec_id") > 0) & (F.col("vec_id") <= 2048)
    )
    cents = train_ivf_centroids(e, "embedding", n_lists=8, seed=42)
    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag == "sf0.01":
        # the driver scale keeps python constants (static oracle string)
        print("_IVF_TRAINED_CENTROIDS_SF001 = [")
        for c in cents:
            print(f"    {c},")
        print("]")
    else:
        # every other scale goes to the trained/ JSON registry that
        # inventory_llm.oracle_sql_overrides() renders per-sf oracles from
        from rust_dms_cdc_operator_spark.trained import save

        print("wrote", save("ivf", tag, cents))

    # density-query centroids under the corpus-scaled list rule
    # (inventory_llm._density_n_lists): only written when the rule
    # exceeds the shared 8-list artifact
    from rust_dms_cdc_operator_spark.inventory_llm import _density_n_lists

    n = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") > 0)
        .count()
    )
    nl = _density_n_lists(n)
    if nl != 8 and tag != "sf0.01":
        dtrain = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            (F.col("vec_id") > 0) & (F.col("vec_id") <= 4096)
        )
        dcents = train_ivf_centroids(
            dtrain, "embedding", n_lists=nl, seed=42, max_train=4096
        )
        from rust_dms_cdc_operator_spark.trained import save

        print("wrote", save("ivfd", tag, dcents))


if __name__ == "__main__":
    main()
