"""Property-based check of the multi-index Hamming scheme: on random
corpora, the banded candidate enumeration must equal the brute-force
popcount answer exactly (pigeonhole completeness is a THEOREM for
distance < bands — any counterexample is an implementation bug).
All scenarios union into one corpus with scenario-scoped doc ids so
the property costs one Spark job, not one per example."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_dms_cdc_operator_spark.operators.dedup import (
    simhash_bits,
    simhash_hamming_pairs,
)

WORD = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "omega", "zeta", "kappa", "pi"]
)
DOC = st.lists(WORD, min_size=1, max_size=12).map(" ".join)
CORPUS = st.lists(DOC, min_size=2, max_size=10)


@settings(max_examples=3, deadline=None, derandomize=True)
@given(st.lists(CORPUS, min_size=8, max_size=8))
def test_banded_pairs_equal_bruteforce(spark, corpora):
    rows = []
    for s, docs in enumerate(corpora):
        for i, text in enumerate(docs):
            rows.append((s * 1000 + i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(
            df, "doc_id", "text", bits=60, bands=4, max_distance=3
        ).collect()
        # banding never crosses scenarios here unless signatures
        # genuinely collide across them — brute force must agree on
        # those pairs too, so no scenario filter is applied
    }
    sigs = {
        r.doc_id: r.simhash
        for r in simhash_bits(df, "doc_id", "text", bits=60).collect()
    }
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
    assert got == want
