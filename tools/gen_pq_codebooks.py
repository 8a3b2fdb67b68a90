"""Regenerate the trained-PQ codebook literals embedded in the
sim_pq_topk oracle (pq_constants.py).

Same contract as gen_ivf_centroids.py: the correctness driver runs at
sf0.01 with a static oracle string, so the seed-42 per-subspace
codebooks for sf0.01 are trained here once and written as a module
constant; the live-trained query reproduces them deterministically
(same data + seed + round + floor-to-grid).

Usage: python tools/gen_pq_codebooks.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from rust_dms_cdc_operator_spark.operators.pq import train_pq_codebooks
from rust_dms_cdc_operator_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gen-pq-codebooks")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        (F.col("vec_id") > 0) & (F.col("vec_id") <= 2048)
    )
    books = train_pq_codebooks(e, "embedding", m=8, n_codes=16, seed=42)
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag != "sf0.01":
        # non-driver scales: trained/ JSON registry for per-sf oracles
        from rust_dms_cdc_operator_spark.trained import save

        print("wrote", save("pq", tag, books))
        return
    out = [
        '"""Seed-42 PQ codebooks (8 subspaces x 16 codes, int8 grid) for',
        "the sf0.01 embeddings table (0 < vec_id <= 2048) — regenerate",
        "with tools/gen_pq_codebooks.py. Embedded so the sim_pq_topk",
        "oracle SQL can name the exact integer centroids the",
        'live-trained query reproduces deterministically."""',
        "",
        "_PQ_CODEBOOKS_SF001 = [",
    ]
    for book in books:
        out.append("    [")
        for c in book:
            out.append(f"        {c},")
        out.append("    ],")
    out.append("]")
    with open("/root/repo/rust_dms_cdc_operator_spark/pq_constants.py", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote pq_constants.py ({len(books)} books)")


if __name__ == "__main__":
    main()
