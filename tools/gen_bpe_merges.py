"""Regenerate the trained BPE merge-list literals for the
docs_bpe_tokens oracle.

Same contract as gen_ivf_centroids.py / gen_pq_codebooks.py: the
correctness driver runs static oracle strings at sf0.01, so the
sf0.01 merges are written as a python constant (bpe_constants.py);
every other scale goes to the trained/ JSON registry that
inventory_llm.oracle_sql_overrides() renders per-sf oracles from.
Training is deterministic (capped word table with a total order,
tie-broken merge argmax), so regeneration is bit-stable.

Usage: python tools/gen_bpe_merges.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from rust_dms_cdc_operator_spark.operators.bpe import train_bpe
from rust_dms_cdc_operator_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gen-bpe-merges")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, "text", num_merges=200, max_word_types=100_000)
    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag == "sf0.01":
        out = [
            '"""Trained BPE merges (num_merges=200, max_word_types=100k)',
            "for the sf0.01 documents table — regenerate with",
            "tools/gen_bpe_merges.py. Embedded so the docs_bpe_tokens",
            "oracle SQL can replay the exact greedy rank-order apply the",
            'live-trained query reproduces deterministically."""',
            "",
            "_BPE_MERGES_SF001 = [",
        ]
        for a, b in merges:
            out.append(f"    ({a!r}, {b!r}),")
        out.append("]")
        with open(
            "/root/repo/rust_dms_cdc_operator_spark/bpe_constants.py", "w"
        ) as f:
            f.write("\n".join(out) + "\n")
        print(f"wrote bpe_constants.py ({len(merges)} merges)")
    else:
        from rust_dms_cdc_operator_spark.trained import save

        print("wrote", save("bpe", tag, [list(m) for m in merges]))


if __name__ == "__main__":
    main()
