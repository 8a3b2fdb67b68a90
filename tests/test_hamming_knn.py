"""simhash_hamming_pairs / simhash_bits: pigeonhole completeness vs a
brute-force popcount over all pairs, plus the new grouping-sets /
pivot / EWMA / version-diff query shapes on tiny inline data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.dedup import (
    simhash_bits,
    simhash_hamming_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base),  # exact duplicate of 1 -> hamming 0
        (3, base + "extra token tail"),  # near-dup of 1
        (4, "completely different subject matter entirely unrelated"),
        (5, "zebra yak xylophone walrus vulture tapir snake rabbit"),
    ] + [
        # filler corpus so banding has something to bucket
        (10 + i, f"filler document number {i} with shared filler words")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hamming_pairs_match_bruteforce(spark):
    d = _docs(spark)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(
            d, "doc_id", "text", bits=60, bands=4, max_distance=3
        ).collect()
    }
    sigs = {
        r.doc_id: r.simhash
        for r in simhash_bits(d, "doc_id", "text", bits=60).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    # pigeonhole with 4 bands is COMPLETE for distance <= 3: the banded
    # candidate set must equal the brute-force answer exactly
    assert got == want
    assert (1, 2, 0) in got  # the exact duplicate


def test_hamming_validation_errors(spark):
    d = _docs(spark)
    with pytest.raises(ValueError, match="multiple of 4"):
        simhash_bits(d, "doc_id", "text", bits=61)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_hamming_pairs(
            d, "doc_id", "text", bits=60, bands=4, max_distance=4
        )


def test_grouping_sets_bitmask(spark):
    df = spark.createDataFrame(
        [("s1", "en", 10), ("s1", "de", 20), ("s2", "en", 30)],
        "source string, lang string, n_chars long",
    )
    out = (
        df.groupingSets(
            [["source", "lang"], ["source"], []], "source", "lang"
        )
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_gid = {}
    for r in out:
        by_gid.setdefault(r.gid, []).append(r)
    # (source, lang) rows: gid 0; (source): lang aggregated -> gid 1;
    # grand total: both aggregated -> gid 3
    assert sorted(by_gid) == [0, 1, 3]
    assert len(by_gid[0]) == 3
    assert len(by_gid[1]) == 2
    total = by_gid[3][0]
    assert total.n == 3 and total.source is None and total.lang is None


def test_ewma_weights_single_series(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_ewma_smooth,
    )

    # 3 days of one event type: counts 2, 1, 3
    ts = (
        [datetime(2024, 1, 1, 1, 0, 0)] * 2
        + [datetime(2024, 1, 2, 1, 0, 0)]
        + [datetime(2024, 1, 3, 1, 0, 0)] * 3
    )
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(["click"] * 6),
            "value": pa.array([1.0] * 6),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        str(r.day): r.ewma
        for r in q_events_ewma_smooth(spark, str(tmp_path)).collect()
    }
    w = 0.7  # (7/10)^k kernel
    exp = {
        "2024-01-01": round(2.0, 6),
        "2024-01-02": round((1 + w * 2) / (1 + w), 6),
        "2024-01-03": round((3 + w * 1 + w * w * 2) / (1 + w + w * w), 6),
    }
    assert got == exp


def test_version_diff_statuses(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_version_diff,
    )

    ids = list(range(1, 40))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"text {i}" for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array([6] * len(ids), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {r.status: r.n_docs for r in q_docs_version_diff(spark, str(tmp_path)).collect()}
    # removed: %7==0 (7,14,21,28,35) = 5
    # changed: %5==0 and %7!=0 (5,10,15,20,25,30 minus 35) = 6
    # added: %13==0 (13,26,39) = 3
    assert got["removed"] == 5
    assert got["changed"] == 6
    assert got["added"] == 3
    assert got["unchanged"] == len(ids) - 5 - 6


def test_token_entropy_hand_check(spark, tmp_path):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_token_entropy,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a a a", "a b c d"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([7, 7], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy_bits)
        for r in q_docs_token_entropy(spark, str(tmp_path)).collect()
    }
    assert got[1] == (4, 1, 0.0)  # constant text: zero entropy
    assert got[2] == (4, 4, round(math.log2(4), 6))  # uniform: log2(n)


def test_quality_percentile_invariants(spark):
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_quality_percentile,
    )

    rows = q_docs_quality_percentile(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(0 <= r.pct_micro <= 1_000_000 for r in rows)
    assert all(1 <= r.decile <= 10 for r in rows)
    # within each source the max micro-percentile is exactly 1e6
    # (floor((n-1)*1e6/(n-1)) of the last row) unless the source has a
    # single doc
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.pct_micro)
    for src, ps in by_src.items():
        if len(ps) > 1:
            assert max(ps) == 1_000_000, src


def test_stream_dedup_matches_batch(spark):
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_exact,
        q_stream_dedup,
    )

    sf = "/root/testdata/sf0.001"
    batch = {
        (r.content_md5, r.kept_doc_id, r.n_copies)
        for r in q_dedup_exact(spark, sf).collect()
    }
    streamed = {
        (r.content_md5, r.kept_doc_id, r.n_copies)
        for r in q_stream_dedup(spark, sf).collect()
    }
    assert streamed == batch
