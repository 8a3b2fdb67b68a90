"""Unit tests for the training-data operator pack, on tiny hand-built
frames with hand-computable expected results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    with_media_columns,
)
from rust_dms_cdc_operator_spark.functions.text import (
    fingerprint_expr,
    langid_expr,
    quality_score_expr,
    regex_token_count,
)
from rust_dms_cdc_operator_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
)
from rust_dms_cdc_operator_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the cat sat on the mat", "a"),  # exact dup of 1
        (3, "the cat sat on the red mat", "a"),  # near dup
        (4, "der hund und die katze und das haus", "b"),
        (5, "completely unrelated words here banana", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_exact_dedup(spark, docs):
    out = {r.content_md5: r for r in exact_dedup(docs, "text", "doc_id").collect()}
    assert len(out) == 4  # 5 docs, one exact pair
    dup_group = [r for r in out.values() if r.n_copies == 2]
    assert len(dup_group) == 1
    assert dup_group[0].kept_doc_id == 1


def test_minhash_lsh_finds_exact_dup_not_unrelated(spark, docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", 8, 2).collect()
    }
    assert (1, 2) in pairs  # identical text ⇒ identical signature
    assert (4, 5) not in pairs  # disjoint vocabularies
    assert all(a < b for a, b in pairs)


def test_minhash_lsh_hot_bucket_cap(spark):
    """max_bucket semantics: the capped pair SET equals 'collides in
    >= 1 under-cap band bucket' (brute-force per-band replay), each
    pair appears exactly once, and the truncation census counts
    exactly the over-cap buckets. A 12-doc template clique floods one
    bucket per band; two small near-dup groups stay under the cap."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        lsh_bucket_truncation_census,
        minhash_signature_cols,
    )

    rows = [(i, "template body shared by every clique member") for i in range(12)]
    rows += [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta")]
    rows += [(200, "one two three four five"), (201, "one two three four five")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nh, bands, cap = 8, 2, 4

    # ground truth from the raw band keys
    wh, sig_cols = minhash_signature_cols(F.col("text"), nh)
    sigs = {
        r.doc_id: [r[f"mh_{i}"] for i in range(nh)]
        for r in df.select("doc_id", wh).select("doc_id", *sig_cols).collect()
    }
    rpb = nh // bands
    def bk(s, b):
        return tuple(s[b * rpb + r] for r in range(rpb))
    buckets = {}
    for d, s in sigs.items():
        for b in range(bands):
            buckets.setdefault((b, bk(s, b)), []).append(d)
    kept = {k: v for k, v in buckets.items() if len(v) <= cap}
    want = set()
    for members in kept.values():
        for i, a in enumerate(sorted(members)):
            for b in sorted(members)[i + 1:]:
                want.add((a, b))

    got = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", nh, bands, max_bucket=cap
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    assert len(got) == len(set(got))  # exactly-once emission
    # the 12-doc clique must have been truncated somewhere
    clique_pairs = {(a, b) for a in range(12) for b in range(12) if a < b}
    assert not (set(got) & clique_pairs)
    assert (100, 101) in set(got) and (200, 201) in set(got)

    cen = {
        r.band_idx: r
        for r in lsh_bucket_truncation_census(
            df, "doc_id", "text", nh, bands, max_bucket=cap
        ).collect()
    }
    for b in range(bands):
        hot = [k for k, v in buckets.items() if k[0] == b and len(v) > cap]
        assert cen[b].n_hot_buckets == len(hot)
        assert cen[b].n_doc_slots_hot == sum(
            len(buckets[k]) for k in hot
        )
        assert cen[b].n_buckets == sum(1 for k in buckets if k[0] == b)


def test_simhash_identity_and_locality(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash16(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[2]  # identical docs, identical signature
    assert 0 <= sh[1] < 2**16

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # near-dup closer in hamming space than unrelated doc
    assert hamming(sh[1], sh[3]) < hamming(sh[1], sh[5])


def test_ngram_jaccard(spark, docs):
    out = {
        (r.id_a, r.id_b): (r.inter_size, r.union_size)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", "src", n=3, max_id_gap=5
        ).collect()
    }
    # identical docs: identical shingle sets
    inter, union = out[(1, 2)]
    assert inter == union
    # near dup: 'the cat sat', 'cat sat on' shared; jaccard strictly between 0 and 1
    inter, union = out[(1, 3)]
    assert 0 < inter < union
    # unrelated same-block pair: zero intersection
    inter, union = out[(4, 5)]
    assert inter == 0


def test_cosine_topk_exact(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in got] == [1, 2, 3]
    assert got[0].cos_sim == 1.0
    assert got[2].cos_sim == 0.0


def test_lsh_bucket_topk_subset_of_exact(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[0][1]
    exact = {r.vec_id for r in cosine_topk(df, q, k=100).collect()}
    approx = lsh_bucket_topk(df, q, k=10, bits=4).collect()
    assert {r.vec_id for r in approx} <= exact
    # the query vector itself lands in its own bucket with cos 1.0
    assert approx[0].vec_id == 1
    assert approx[0].cos_sim == 1.0


def test_ivf_topk_probes_nearest_lists(spark):
    import random

    from rust_dms_cdc_operator_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(1, 201)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [rows[i][1] for i in range(8)]
    q = rows[0][1]
    got = ivf_topk(df, q, cents, k=5, nprobe=3).collect()
    # the query vector's own list is always probed -> cos 1.0 first
    assert got[0].vec_id == 1 and got[0].cos_sim == 1.0
    # IVF results are a subset of the exact scan, same scoring
    exact = {r.vec_id: r.cos_sim for r in cosine_topk(df, q, k=200).collect()}
    for r in got:
        assert exact[r.vec_id] == r.cos_sim
    # every returned vector is assigned to a probed list
    assign = df.select(
        "vec_id",
        ivf_assign(F.col("embedding"), cents).alias("list_id"),
    )
    assigned = {r.vec_id: r.list_id for r in assign.collect()}
    n_lists = len(set(assigned.values()))
    assert n_lists > 1  # centroids actually partition the space
    probed = {assigned[r.vec_id] for r in got}
    assert len(probed) <= 3


def _clustered_vectors(n_clusters=8, per_cluster=40, dim=16, noise=0.15):
    """Deterministic clustered embeddings: unit-ish cluster directions
    plus small noise — the regime IVF is built for (the synthetic
    embeddings table is near-uniform, where ANN recall is provably
    poor for every indexing scheme)."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 1
    for ci in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[ci] + noise * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    query = centers[0] + noise * rng.randn(dim)
    return rows, [float(x) for x in query]


def test_trained_ivf_recall(spark, tmp_path):
    """KMeans-trained centroids (seed-fixed) must give recall@10 >= 0.8
    vs the exact scan at nprobe=2 on clustered data, and the
    partitioned write must prune the scan to the probed lists."""
    from rust_dms_cdc_operator_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_partitioned,
        train_ivf_centroids,
        write_ivf_partitioned,
    )

    rows, query = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(df, "embedding", n_lists=8, seed=42)
    exact = [r.vec_id for r in cosine_topk(df, query, k=10).collect()]
    approx = [
        r.vec_id for r in ivf_topk(df, query, cents, k=10, nprobe=2).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, recall

    # materialized assignment: probe prunes partitions at the scan
    path = str(tmp_path / "ivf_table")
    write_ivf_partitioned(df, path, cents)
    part = ivf_topk_partitioned(spark, path, query, cents, k=10, nprobe=2)
    assert [r.vec_id for r in part.collect()] == approx
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_list" in plan.replace("#", " #").replace(
        "ivf_list #", "ivf_list#"
    ) or "ivf_list" in plan.split("PartitionFilters")[1].split("]")[0], plan


def test_trained_centroids_deterministic(spark):
    """Same data + seed -> identical rounded centroids ACROSS
    PARTITION LAYOUTS (the property the per-sf trained oracles
    depend on: a sweep at local[16] must reproduce artifacts trained
    at local[4]). Round 7 measured that pyspark.ml KMeans violates
    this — k-means|| init samples per partition and the aggregation
    sums floats in partition order — which is why the trainer is now
    a bounded ordered sample + driver-local Lloyd."""
    from rust_dms_cdc_operator_spark.operators.similarity import (
        train_ivf_centroids,
    )

    rows, _ = _clustered_vectors(n_clusters=4, per_cluster=20)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = train_ivf_centroids(df.repartition(1), "embedding",
                            n_lists=4, seed=42)
    b = train_ivf_centroids(df.repartition(7, "vec_id"), "embedding",
                            n_lists=4, seed=42)
    c = train_ivf_centroids(df.coalesce(2), "embedding",
                            n_lists=4, seed=42)
    assert a == b == c


def test_embedding_neardup_pairs(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),  # exact dup of 1, same block
        (3, [0.0, 1.0], 0),
        (4, [1.0, 0.0], 1),  # dup of 1 but different block: not a candidate
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r.id_a, r.id_b): r.cos_sim for r in embedding_neardup_pairs(
        df, "vec_id", "embedding", block_col="label", min_cosine=0.99
    ).collect()}
    assert out == {(1, 2): 1.0}


def test_embedding_neardup_no_block_is_not_cartesian(spark):
    """block_col=None must keep crossJoin-free plans: the id-gap bound
    becomes an explode(sequence) equi-join with identical results to
    the quadratic definition (all pairs with 0 < id_b-id_a <= gap)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 1.0]),
        (7, [1.0, 0.1]),   # gap 4 from 3: only candidate within gap=5
        (20, [1.0, 0.0]),  # beyond every gap window
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_neardup_pairs(
        df, "vec_id", "embedding", block_col=None, max_id_gap=5,
        min_cosine=-1.0,
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    got = {(r.id_a, r.id_b): r.cos_sim for r in pairs.collect()}
    # quadratic reference semantics, computed in python
    import itertools
    from rust_dms_cdc_operator_spark.operators.similarity import _py_cosine
    want = {
        (a_id, b_id): round(_py_cosine(a_v, b_v), 6)
        for (a_id, a_v), (b_id, b_v) in itertools.combinations(rows, 2)
        if 0 < b_id - a_id <= 5
    }
    assert got == want


def test_redact_pii(spark):
    from rust_dms_cdc_operator_spark.functions.text import redact_pii_expr

    rows = [
        (1, "mail me at jo.doe+x@corp.example.org today"),
        (2, "see https://a.example.com/p?q=1#frag for docs"),
        (3, "call +1 (555) 010-7788 or 0030 210 1234567 now"),
        (4, "userinfo url http://u@host.example/x stays one URL"),
        (5, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.t for r in df.select(
        "doc_id", redact_pii_expr(F.col("text")).alias("t")
    ).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "see <URL> for docs"
    assert got[3] == "call <PHONE> or <PHONE> now"
    assert "@" not in got[4] and "<URL>" in got[4]
    assert got[5] == "nothing sensitive here"


def test_batch_cosine_topk_matches_per_query(spark):
    """The batched two-stage ranking must equal k independent
    cosine_topk scans, per query, including tie order."""
    import random

    from rust_dms_cdc_operator_spark.operators.similarity import (
        batch_cosine_topk,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cands = df.filter("vec_id >= 3")
    out = batch_cosine_topk(cands, queries, k=5, shards=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos_sim))
    for qid, vec in [(r[0], r[1]) for r in rows[:3]]:
        want = [
            (i + 1, r.vec_id, r.cos_sim)
            for i, r in enumerate(cosine_topk(cands, vec, k=5).collect())
        ]
        assert sorted(got[qid]) == want, qid


def test_contamination_hits(spark):
    from rust_dms_cdc_operator_spark.operators.dedup import contamination_hits

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely novel content with no overlap at all here"),
            (3, "short text"),  # < n words -> no grams -> never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we ask whether the quick brown fox jumps over obstacles")],
        "doc_id long, text string",
    )
    out = contamination_hits(corpus, bench, n=5)
    got = {r.doc_id: r.n_hits for r in out.collect()}
    # doc 1 shares 'the quick brown fox jumps' and 'quick brown fox
    # jumps over' with the benchmark; docs 2 and 3 are clean
    assert got == {1: 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench grams broadcast, no corpus shuffle


def test_langid_and_quality(spark, docs):
    out = {r.doc_id: r.pred for r in docs.select(
        "doc_id", langid_expr(F.col("text")).alias("pred")
    ).collect()}
    assert out[1] == "en"
    assert out[4] == "de"
    q = {r.doc_id: r.q for r in docs.select(
        "doc_id", quality_score_expr(F.col("text")).alias("q")
    ).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert q[1] > q[5]  # stopword-rich text scores higher


def test_token_count_and_fingerprint(spark, docs):
    t = {r.doc_id: r.n for r in docs.select(
        "doc_id", regex_token_count(F.col("text")).alias("n")
    ).collect()}
    assert t[1] == 6
    fp = {r.doc_id: r.f for r in docs.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("f")
    ).collect()}
    assert fp[1] == fp[2]  # identical docs
    assert len(fp[1]) == 32  # md5 hex


def test_multimodal_plumbing(spark, docs):
    media = with_media_columns(docs, "doc_id", "text", kind="text-blob")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    assert feats[1].n_bytes == len("the cat sat on the mat")
    assert feats[1].first_byte == ord("t")
    assert feats[1].kind == "text-blob"


def test_multimodal_resize_and_frame_sampling(spark, docs):
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        resize_media,
        sample_frames,
        with_media_columns,
    )

    media = with_media_columns(docs, "doc_id", "text", kind="img")
    resized = resize_media(media, 64, 64)
    # contract-preserving: same fields/types (modulo nullability), so
    # stages compose
    assert resized.dtypes == media.dtypes
    r = {x.media_id: x for x in resized.collect()}
    assert r[1].payload.startswith(b"RSZ|64x64|")
    assert r[1].meta.kind == "img"
    assert r[1].meta.n_bytes == len(r[1].payload)

    frames = sample_frames(media, every_n_bytes=8, max_frames=3).collect()
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f.media_id, []).append(f)
    # doc 1 text is 22 bytes -> frames at offsets 0, 8, 16
    assert [f.frame_idx for f in sorted(by_doc[1], key=lambda f: f.frame_idx)] == [0, 1, 2]
    assert by_doc[1][0].frame == b"the cat "


def test_frame_sampling_edges(spark):
    """Vectorized offset arithmetic edge cases: null payload (no
    rows), empty payload (no rows), exact-multiple length (no phantom
    frame), cap at max_frames."""
    from pyspark.sql import types as T

    from rust_dms_cdc_operator_spark.functions.multimodal import sample_frames

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("n_bytes", T.LongType()),
                    ]
                ),
            ),
        ]
    )
    rows = [
        (1, None, ("x", 0)),
        (2, b"", ("x", 0)),
        (3, b"12345678", ("x", 8)),        # exactly one stride
        (4, b"123456789", ("x", 9)),       # one byte over: 2 frames
        (5, b"a" * 100, ("x", 100)),       # capped at max_frames
    ]
    out = sample_frames(
        spark.createDataFrame(rows, schema), every_n_bytes=8, max_frames=3
    ).collect()
    got = {}
    for f in out:
        got.setdefault(f.media_id, []).append((f.frame_idx, bytes(f.frame)))
    assert 1 not in got and 2 not in got
    assert got[3] == [(0, b"12345678")]
    assert sorted(got[4]) == [(0, b"12345678"), (1, b"9")]
    assert len(got[5]) == 3


def test_unigram_logppl(spark, docs):
    """Corpus-unigram perplexity: common-token docs score lower than
    rare-token docs; token-free docs get n_tokens=0 and NULL score;
    score formula checked exactly on a doc of known counts."""
    import math

    from rust_dms_cdc_operator_spark.operators.perplexity import unigram_logppl

    with_empty = docs.union(
        spark.createDataFrame([(9, "!!! ???", "c")], docs.schema)
    )
    out = {r.doc_id: r for r in unigram_logppl(with_empty, "doc_id", "text").collect()}
    assert len(out) == 6
    assert out[9].n_tokens == 0 and out[9].log_ppl is None
    # docs 1 and 2 are identical -> identical scores; doc 5's rare
    # tokens make it the highest-perplexity text doc
    assert out[1].log_ppl == out[2].log_ppl
    text_scores = {i: out[i].log_ppl for i in (1, 2, 3, 4, 5)}
    assert max(text_scores, key=text_scores.get) == 5
    # exact check for doc 1 against an independent recomputation of
    # the corpus unigram counts
    import re as _re
    from collections import Counter

    rows = with_empty.select("text").collect()
    alltoks = [t for r in rows for t in _re.findall("[a-z0-9]+", r.text)]
    cnt = Counter(alltoks)
    d1 = _re.findall("[a-z0-9]+", "the cat sat on the mat")
    want = round(
        math.log(len(alltoks)) - sum(math.log(cnt[t]) for t in d1) / len(d1), 6
    )
    assert abs(out[1].log_ppl - want) < 1e-9, (out[1].log_ppl, want)


def test_incremental_dedup(spark):
    from rust_dms_cdc_operator_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame(
        [(10, "a"), (12, "a"), (14, "b"), (16, "c")],
        "doc_id long, text string",
    )
    old = spark.createDataFrame(
        [(1, "b"), (2, "z")], "doc_id long, text string"
    )
    out = incremental_dedup(new, old, "doc_id", "text")
    # 'a': first-of-batch (10, not 12); 'b': already ingested; 'c': new
    assert {r.doc_id for r in out.collect()} == {10, 16}
    # empty corpus degrades to within-batch exact dedup
    out2 = incremental_dedup(new, old.limit(0), "doc_id", "text")
    assert {r.doc_id for r in out2.collect()} == {10, 14, 16}


def test_top_ngrams_counts_and_tiebreak(spark):
    from rust_dms_cdc_operator_spark.operators.dedup import top_ngrams

    df = spark.createDataFrame(
        [("x y z x y z",), ("x y z",), ("a b c",)], "text string"
    )
    out = top_ngrams(df, "text", n=3, k=3).collect()
    # "x y z" occurs 2x in doc1 (overlapping) + 1x in doc2
    assert (out[0].gram, out[0].n_occurrences) == ("x y z", 3)
    # count ties break on the gram string ascending
    assert [(r.gram, r.n_occurrences) for r in out[1:]] == [
        ("a b c", 1), ("y z x", 1),
    ]
    # short texts (<n words) contribute nothing, not a crash
    short = spark.createDataFrame([("one two",), ("",)], "text string")
    assert top_ngrams(short, "text", n=3, k=5).count() == 0


def test_quantized_topk_semantics(spark):
    from rust_dms_cdc_operator_spark.operators.similarity import (
        cosine_topk,
        quantize_vec,
        quantized_topk,
    )
    from pyspark.sql import functions as F

    # clipping + floor semantics: out-of-range values saturate
    df = spark.createDataFrame(
        [(1, [2.0, -3.0, 0.5, -0.5, 0.0])], "vec_id long, embedding array<float>"
    )
    (qv,) = df.select(quantize_vec(F.col("embedding")).alias("q")).first()
    assert qv == [127, -127, 63, -64, 0]  # floor(0.5*127)=63, floor(-0.5*127)=-64

    # ranking sanity: on well-separated clustered vectors, quantized
    # MIPS finds the same neighborhood as exact cosine
    rows, query = _clustered_vectors(n_clusters=4, per_cluster=25, dim=16)
    data = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    exact = {r.vec_id for r in cosine_topk(data, query, k=10).collect()}
    quant = {r.vec_id for r in quantized_topk(data, query, k=10).collect()}
    assert len(exact & quant) >= 7  # high agreement, not bit-identity


def test_source_token_drift_semantics(spark):
    from rust_dms_cdc_operator_spark.operators.perplexity import (
        source_token_drift,
    )

    rows = [
        # two sources with IDENTICAL token distributions -> equal,
        # near-zero KL; one source of pure out-of-distribution tokens
        (1, "alpha beta gamma alpha", "a"),
        (2, "alpha beta gamma alpha", "b"),
        # mostly-exclusive vocabulary, one shared token: clearly OOD
        (3, "alpha zzz zzz zzz", "weird"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in source_token_drift(df).collect()}
    assert out["a"].n_tokens == 4 and out["b"].n_tokens == 4
    assert out["a"].kl_vs_corpus == out["b"].kl_vs_corpus
    # the OOD source diverges far more than the twins
    assert out["weird"].kl_vs_corpus > out["a"].kl_vs_corpus + 0.3
    assert out["weird"].kl_vs_corpus > 0.5
    # KL >= 0 always (within rounding)
    assert all(r.kl_vs_corpus >= -1e-6 for r in out.values())


def test_incremental_dedup_property(spark):
    """Property check vs a python set-based reference on random
    batch/corpus splits: output ids are exactly the min-id per fresh
    digest."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rust_dms_cdc_operator_spark.operators.dedup import incremental_dedup

    texts = st.sampled_from(["a", "b", "c", "d", "e"])

    @settings(max_examples=15, deadline=None, derandomize=True)
    @given(
        st.lists(texts, min_size=0, max_size=8),
        st.lists(texts, min_size=0, max_size=8),
    )
    def check(batch, corpus):
        new = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)] or [(0, "x")],
            "doc_id long, text string",
        )
        if not batch:
            new = new.limit(0)
        old = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(corpus)] or [(0, "x")],
            "doc_id long, text string",
        )
        if not corpus:
            old = old.limit(0)
        got = {r.doc_id for r in incremental_dedup(new, old, "doc_id", "text").collect()}
        seen = set(corpus)
        want = {}
        for i, t in enumerate(batch):
            if t not in seen and t not in want:
                want[t] = i
        assert got == set(want.values())

    check()


def test_candidate_budget_sample(spark):
    """Guardrail semantics: k = ceil(n/budget); sampled pair set is a
    deterministic subset keyed on md5(id_a|id_b) — identical across
    calls, partitionings, and engines; budget >= n is the identity."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        candidate_budget_sample,
    )

    pairs = spark.range(400).selectExpr(
        "id AS id_a", "id + 1000 AS id_b"
    ).repartition(8)
    # budget >= n: no sampling, all pairs survive
    assert candidate_budget_sample(pairs, 400).count() == 400
    # budget 50 over n=400: k=8, expect roughly n/8 survivors
    got = sorted(
        (r.id_a, r.id_b)
        for r in candidate_budget_sample(pairs, 50).collect()
    )
    assert 0 < len(got) < 150
    # deterministic: a re-run over a different partitioning agrees
    again = sorted(
        (r.id_a, r.id_b)
        for r in candidate_budget_sample(pairs.repartition(3), 50).collect()
    )
    assert got == again
    # python replay of the exact keying rule
    import hashlib

    def key(a, b):
        h = hashlib.md5(f"{a}|{b}".encode()).hexdigest()
        return int(h[:8], 16)

    want = sorted(
        (a, a + 1000) for a in range(400) if key(a, a + 1000) % 8 == 0
    )
    assert got == want

    import pytest

    with pytest.raises(ValueError):
        candidate_budget_sample(pairs, 0)


def test_verify_pairs_budget_cap(spark, docs):
    """max_candidates plumbs through both verify stages: capped output
    is exactly the uncapped output restricted to the keyed sample."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        containment_verify_pairs,
        jaccard_verify_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (1, 5), (2, 4)],
        "id_a long, id_b long",
    )
    full = {
        (r.id_a, r.id_b)
        for r in containment_verify_pairs(
            pairs, docs, min_containment=0.0
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in containment_verify_pairs(
            pairs, docs, min_containment=0.0, max_candidates=2
        ).collect()
    }
    assert capped < full  # strict subset: k=3 over 6 pairs samples
    jc = {
        (r.id_a, r.id_b)
        for r in jaccard_verify_pairs(
            pairs, docs, max_candidates=2
        ).collect()
    }
    assert jc == capped  # same keyed sample, same survivors


def test_jaccard_verify_pairs(spark, docs):
    from rust_dms_cdc_operator_spark.operators.dedup import (
        jaccard_verify_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {
        (r.id_a, r.id_b): (r.inter_size, r.union_size)
        for r in jaccard_verify_pairs(pairs, docs).collect()
    }
    # identical docs: full overlap
    inter, union = out[(1, 2)]
    assert inter == union > 0
    # near dup: partial overlap
    inter, union = out[(1, 3)]
    assert 0 < inter < union
    # LSH hash-luck collision of unrelated docs: verification kills it
    inter, union = out[(4, 5)]
    assert inter == 0

    # hashed-shingle fast path + threshold/prepass: identical pair
    # survives, near-dup and unrelated pairs are cut at 0.8
    thr = {
        (r.id_a, r.id_b)
        for r in jaccard_verify_pairs(
            pairs, docs, min_jaccard=0.8, hash_shingles=True
        ).collect()
    }
    assert thr == {(1, 2)}


def test_verify_tokens_strategy_matches_arrays(spark, docs):
    """Round 11: the shared-token intersection strategy must produce
    BIT-IDENTICAL rows to the array-intersect path for both verify
    shapes — including the zero-overlap pair that the tokens path
    reconstructs via LEFT join + coalesce, hashed and unhashed
    shingles, and the thresholded forms."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        containment_verify_pairs,
        jaccard_verify_pairs,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    for hashed in (False, True):
        for thr in (None, 0.5):
            a = sorted(
                tuple(r) for r in jaccard_verify_pairs(
                    pairs, docs, min_jaccard=thr, hash_shingles=hashed
                ).collect()
            )
            t = sorted(
                tuple(r) for r in jaccard_verify_pairs(
                    pairs, docs, min_jaccard=thr, hash_shingles=hashed,
                    strategy="tokens",
                ).collect()
            )
            assert a == t, (hashed, thr)
        ca = sorted(
            tuple(r) for r in containment_verify_pairs(
                pairs, docs, min_containment=0.5, hash_shingles=hashed
            ).collect()
        )
        ct = sorted(
            tuple(r) for r in containment_verify_pairs(
                pairs, docs, min_containment=0.5, hash_shingles=hashed,
                strategy="tokens",
            ).collect()
        )
        assert ca == ct, hashed


def test_containment_tokens_inner_restructure_edges(spark):
    """Round 13: with a positive threshold the tokens strategy joins
    inter-counts INNER and attaches sizes to the (cluster-bounded)
    matched stream instead of the full candidate stream, plus a
    zero-shingle-correction union. shingle_set is empty-safe (a text
    with fewer than n words shingles to the whole text), so sizes are
    >= 1 by construction, every zero-overlap pair fails
    inter >= min(size)*t, and the correction branch is provably empty
    — this test pins exactly those semantics on the shortest/empty
    texts the public surface can produce, against the arrays
    reference, including the pair orientation the normalization
    handles (id_a > id_b)."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        containment_verify_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),   # whole-text shingle (1 word < n)
            (2, "abcdefghij"),   # identical to 1 -> containment 1.0
            (3, ""),             # empty text -> [""] (size 1, not 0)
            (4, "xy"),           # short text -> ["xy"]
            (5, "zzz"),          # one shingle, shares nothing
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        # (1,2): duplicate, must pass; all others share zero tokens
        # and sizes >= 1, so every one must be DROPPED at t=0.9 —
        # (5,4) is deliberately reversed to exercise normalization
        [(1, 2), (1, 3), (3, 4), (2, 5), (5, 4)],
        "id_a long, id_b long",
    )
    for hashed in (False, True):
        ca = sorted(
            tuple(r) for r in containment_verify_pairs(
                pairs, docs, min_containment=0.9, hash_shingles=hashed
            ).collect()
        )
        ct = sorted(
            tuple(r) for r in containment_verify_pairs(
                pairs, docs, min_containment=0.9, hash_shingles=hashed,
                strategy="tokens",
            ).collect()
        )
        assert ca == ct, hashed
        kept = {(r[0], r[1]) for r in ct}
        assert kept == {(1, 2)}, kept
        sizes = {(r[0], r[1]): (r[3], r[4]) for r in ct}
        assert sizes[(1, 2)][0] >= 1 and sizes[(1, 2)][1] >= 1


def _golden_wav(channels=2, rate=11025, n_samples=123, junk_chunk=True):
    """Hand-built RIFF/WAVE bytes, ground truth for the parser."""
    import struct

    data = b"\x00" * (n_samples * channels * 2)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk:  # odd-sized chunk: exercises word alignment in the walk
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _golden_png(width=17, height=9):
    """A real, viewable 1-bit grayscale PNG from stdlib only."""
    import struct
    import zlib

    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_mediacodec_golden_bytes():
    """Byte-level ground truth for each stdlib decoder: hand-assembled
    WAV (with an odd-length junk chunk), a real zlib-compressed PNG,
    and netpbm headers with comments. A wrong endianness, offset, or
    chunk walk fails here without Spark in the loop."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    w = mc.decode(_golden_wav())
    assert (w["codec"], w["channels"], w["sample_rate_hz"]) == ("wav", 2, 11025)
    assert (w["n_samples"], w["duration_ms"]) == (123, 123 * 1000 // 11025)

    p = mc.decode(_golden_png())
    assert (p["codec"], p["width"], p["height"], p["channels"]) == (
        "png", 17, 9, 1,
    )

    ppm = mc.decode(b"P6\n# comment\n 640 480\n255\n" + b"\x00" * 10)
    assert (ppm["codec"], ppm["width"], ppm["height"], ppm["channels"]) == (
        "ppm", 640, 480, 3,
    )
    pgm = mc.decode(b"P5 12 34 255 ")
    assert (pgm["codec"], pgm["width"], pgm["height"], pgm["channels"]) == (
        "pgm", 12, 34, 1,
    )

    # BMP: BITMAPINFOHEADER (DIB size 40 at offset 14), 24-bit 13x7,
    # negative height = top-down
    bmp = (
        b"BM" + b"\x00" * 12
        + (40).to_bytes(4, "little")
        + (13).to_bytes(4, "little")
        + (-7 & 0xFFFFFFFF).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 10
    )
    b = mc.decode(bmp)
    assert (b["codec"], b["width"], b["height"], b["channels"]) == (
        "bmp", 13, 7, 3,
    )

    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    g = mc.decode(gif)
    assert (g["codec"], g["width"], g["height"], g["channels"]) == (
        "gif", 320, 200, 3,
    )

    # JPEG: APP0 + variable-length COM skipped, geometry read from
    # SOF0; progressive (SOF2) and fill-byte-padded markers also land
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xfe" + (2 + 5).to_bytes(2, "big") + b"hello"
        + b"\xff\xff\xff\xc0\x00\x11\x08"
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        + b"\xff\xd9"
    )
    j = mc.decode(jpg)
    assert (j["codec"], j["width"], j["height"], j["channels"]) == (
        "jpeg", 640, 480, 3,
    )
    jpg2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x15\x00\x2a\x01\x01\x11\x00"
    j2 = mc.decode(jpg2)
    assert (j2["codec"], j2["width"], j2["height"], j2["channels"]) == (
        "jpeg", 42, 21, 1,
    )

    # OS/2 BITMAPCOREHEADER BMP: uint16 geometry at 18/20, bits at 24
    core = (
        b"BM" + b"\x00" * 12
        + (12).to_bytes(4, "little")
        + (51).to_bytes(2, "little") + (19).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    )
    cb = mc.decode(core)
    assert (cb["codec"], cb["width"], cb["height"], cb["channels"]) == (
        "bmp", 51, 19, 3,
    )

    with pytest.raises(NotImplementedError):
        mc.decode(b"8BPS Photoshop is not wired without PIL")
    with pytest.raises(ValueError):
        mc.decode(b"\xff\xd8\xff\xdb\x00\x04\x00\x00\xff\xd9")  # no SOF
    with pytest.raises(ValueError):
        mc.decode(b"\xff\xd8\xff\xe0\x99\x99 truncated segment")
    with pytest.raises(NotImplementedError):
        # ancient/unknown DIB header size (16-byte OS/2 v2 subset)
        mc.decode(b"BM" + b"\x00" * 12 + (16).to_bytes(4, "little") + b"\x00" * 16)
    with pytest.raises(ValueError):
        mc.decode(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks
    with pytest.raises(ValueError):
        mc.decode(b"BM too short")  # truncated BMP header
    with pytest.raises(ValueError):
        mc.decode(b"GIF87a\x01")  # truncated GIF header


def test_decode_media_features_real_codecs(spark):
    """The Arrow mapInPandas decode path over REAL payloads: PNG and
    WAV blobs decode to actual geometry/audio facts; an unknown magic
    yields a NULL-codec row (poison-pill safe) instead of failing the
    batch. This is the 'one codec path without the stub flag' bar from
    the round-4 verdict."""
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        decode_media_features,
    )

    rows = [
        (1, _golden_png(33, 21), {"kind": "image", "n_bytes": None}),
        (2, _golden_wav(1, 8000, 4000, junk_chunk=False),
         {"kind": "audio", "n_bytes": None}),
        (3, b"\x00\x01garbage", {"kind": "blob", "n_bytes": None}),
        (4, _golden_wav(2, 44100, 44100), {"kind": "audio", "n_bytes": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.asDict() for r in
           decode_media_features(media).collect()}
    assert (got[1]["codec"], got[1]["width"], got[1]["height"]) == (
        "png", 33, 21,
    )
    assert got[1]["sample_rate_hz"] is None
    assert (got[2]["codec"], got[2]["sample_rate_hz"],
            got[2]["duration_ms"]) == ("wav", 8000, 500)
    assert got[3]["codec"] is None and got[3]["width"] is None
    assert (got[4]["channels"], got[4]["duration_ms"]) == (2, 1000)


def test_asof_join_hand_built(spark):
    """Backward as-of semantics on hand-computable frames: inclusive
    same-instant match, carry-forward across gaps, NULL before any
    right row, per-key isolation, and the tolerance cutoff."""
    from pyspark.sql import functions as F

    from rust_dms_cdc_operator_spark.operators.asof import asof_join

    quotes = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 20, 2.0), ("B", 15, 9.0)],
        "sym string, qts long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 5), ("A", 10), ("A", 25), ("B", 14), ("B", 100), ("C", 7)],
        "sym string, tts long",
    )
    got = {
        (r.sym, r.tts): r.px_asof
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="tts", right_ts="qts"
        ).collect()
    }
    assert got == {
        ("A", 5): None,     # before any quote
        ("A", 10): 1.0,     # same-instant quote IS visible (inclusive)
        ("A", 25): 2.0,     # latest prior, not first
        ("B", 14): None,    # other key's quotes invisible
        ("B", 100): 9.0,    # carry across a long gap
        ("C", 7): None,     # key with no right rows at all
    }

    # tolerance: the B@100 match is 85 ticks stale -> voided
    got_tol = {
        (r.sym, r.tts): r.px_asof
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
            tolerance_expr=F.lit(50),
        ).collect()
    }
    assert got_tol[("B", 100)] is None
    assert got_tol[("A", 25)] == 2.0  # 5 ticks stale, within tolerance


def test_asof_join_multiple_value_cols_and_left_passthrough(spark):
    """All non-key right columns attach by default (suffixed); every
    left column passes through untouched."""
    from rust_dms_cdc_operator_spark.operators.asof import asof_join

    dim = spark.createDataFrame(
        [(1, 100, "v1", 10.0), (1, 200, "v2", 20.0)],
        "k long, dts long, name string, score double",
    )
    fact = spark.createDataFrame(
        [(1, 150, "x"), (1, 250, "y")], "k long, fts long, tag string"
    )
    rows = {
        r.fts: (r.tag, r.name_asof, r.score_asof)
        for r in asof_join(
            fact, dim, on=["k"], left_ts="fts", right_ts="dts"
        ).collect()
    }
    assert rows == {150: ("x", "v1", 10.0), 250: ("y", "v2", 20.0)}


def test_bigram_logppl_penalizes_shuffled_order(spark):
    """The conditional model's whole point: same unigram bag, scrambled
    order → higher bigram perplexity. Docs 0-3 repeat a fixed phrase
    (typical bigrams); doc 9 uses the SAME words in scrambled order."""
    from rust_dms_cdc_operator_spark.operators.perplexity import (
        bigram_logppl,
        unigram_logppl,
    )

    phrase = "the quick brown fox jumps over the lazy dog"
    scrambled = "dog the over quick lazy brown the jumps fox"
    rows = [(i, phrase) for i in range(8)] + [(9, scrambled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logppl(docs).collect()}
    assert out[0].n_bigrams == 8
    assert out[9].log_ppl2 > out[0].log_ppl2  # order matters
    uni = {r.doc_id: r for r in unigram_logppl(docs).collect()}
    # unigram CANNOT separate them (identical bags)
    assert uni[9].log_ppl == uni[0].log_ppl


def test_bigram_logppl_short_docs_null(spark):
    from rust_dms_cdc_operator_spark.operators.perplexity import bigram_logppl

    docs = spark.createDataFrame(
        [(1, "word"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logppl(docs).collect()}
    assert out[1].n_bigrams == 0 and out[1].log_ppl2 is None
    assert out[2].n_bigrams == 0 and out[2].log_ppl2 is None
    assert out[3].n_bigrams == 1 and out[3].log_ppl2 is not None


def test_segment_dedup_first_occurrence_wins(spark):
    from rust_dms_cdc_operator_spark.operators.dedup import segment_dedup

    seg_a = "a b c"          # 3-word segments
    seg_b = "x y z"
    docs = spark.createDataFrame(
        [
            (1, f"{seg_a} {seg_b}"),        # owns both segments
            (2, f"{seg_a} p q r"),          # first segment repeated -> dropped
            (3, f"{seg_b}"),                # entirely boilerplate
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in segment_dedup(docs, "doc_id", "text", 3).collect()}
    assert (out[1].n_segs, out[1].n_kept) == (2, 2)
    assert out[1].clean_text == f"{seg_a} {seg_b}"
    assert (out[2].n_segs, out[2].n_kept) == (2, 1)
    assert out[2].clean_text == "p q r"      # reassembled without the dup
    assert (out[3].n_segs, out[3].n_kept) == (1, 0)
    assert out[3].clean_text is None         # fully deduped away


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment ~1.0,
    Jaccard far below any dedup threshold — the asymmetric criterion's
    reason to exist."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        containment_verify_pairs,
        jaccard_verify_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    cont = containment_verify_pairs(pairs, docs, min_containment=0.9).collect()
    assert len(cont) == 1 and cont[0].inter_size == cont[0].size_a
    jac = jaccard_verify_pairs(pairs, docs, min_jaccard=0.8).collect()
    assert jac == []  # jaccard misses the excerpt entirely


def test_segment_dedup_property_vs_python_replay(spark):
    """Hypothesis: random small corpora — the distributed segment
    dedup must equal a sequential python replay of the
    first-occurrence-wins rule, for every generated scenario."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rust_dms_cdc_operator_spark.operators.dedup import segment_dedup

    WORD = st.sampled_from(["a", "b", "c", "d"])
    DOC = st.lists(WORD, min_size=1, max_size=9)

    def python_replay(docs, seg_words):
        seen = set()
        out = {}
        for doc_id, words in docs:
            segs = [
                " ".join(words[i : i + seg_words])
                for i in range(0, len(words), seg_words)
            ]
            kept = []
            for s in segs:
                if s not in seen:
                    seen.add(s)
                    kept.append(s)
            out[doc_id] = (
                len(segs),
                len(kept),
                " ".join(kept) if kept else None,
            )
        return out

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(st.lists(DOC, min_size=1, max_size=12))
    def run(raw_docs):
        docs = [(i, words) for i, words in enumerate(raw_docs)]
        expected = python_replay(docs, 3)
        df = spark.createDataFrame(
            [(i, " ".join(w)) for i, w in docs], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_segs, r.n_kept, r.clean_text)
            for r in segment_dedup(df, "doc_id", "text", 3).collect()
        }
        assert got == expected

    run()


def test_mediacodec_tiff_webp_goldens():
    """Byte-level goldens for the TIFF IFD walk (both byte orders,
    SHORT and LONG tag encodings) and the three WebP chunk layouts
    (VP8X canvas, VP8L packed bits, lossy VP8 key frame)."""
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    def tiff(bo, width, height, spp=None, long_dims=False):
        tags = [(256, width), (257, height)]
        if spp is not None:
            tags.append((277, spp))
        n = len(tags)
        out = (b"II*\x00" if bo == "<" else b"MM\x00*")
        out += struct.pack(bo + "I", 8) + struct.pack(bo + "H", n)
        for tag, val in sorted(tags):
            if long_dims:
                out += struct.pack(bo + "HHI", tag, 4, 1)
                out += struct.pack(bo + "I", val)
            else:
                out += struct.pack(bo + "HHI", tag, 3, 1)
                out += struct.pack(bo + "H", val) + b"\x00\x00"
        return out + struct.pack(bo + "I", 0)

    for bo in ("<", ">"):
        t = mc.decode(tiff(bo, 800, 600, spp=3))
        assert (t["codec"], t["width"], t["height"], t["channels"]) == (
            "tiff", 800, 600, 3,
        )
    t = mc.decode(tiff("<", 70000, 50000, long_dims=True))
    assert (t["width"], t["height"], t["channels"]) == (70000, 50000, 1)
    with pytest.raises(ValueError):
        mc.decode(b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0)
                  + struct.pack("<I", 0))  # no geometry tags

    def riff(fourcc, chunk):
        body = fourcc + struct.pack("<I", len(chunk)) + chunk
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    vp8x = bytes([0x10]) + b"\x00\x00\x00" + (639).to_bytes(3, "little") \
        + (479).to_bytes(3, "little") + b"\x00" * 8
    w = mc.decode(riff(b"VP8X", vp8x))
    assert (w["codec"], w["width"], w["height"], w["channels"]) == (
        "webp", 640, 480, 4,
    )

    bits = (99 - 1) | ((77 - 1) << 14) | (1 << 28)  # 99x77 with alpha
    vp8l = bytes([0x2F]) + bits.to_bytes(4, "little") + b"\x00" * 8
    w = mc.decode(riff(b"VP8L", vp8l))
    assert (w["width"], w["height"], w["channels"]) == (99, 77, 4)

    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" \
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little") + b"\x00" * 8
    w = mc.decode(riff(b"VP8 ", vp8))
    assert (w["width"], w["height"], w["channels"]) == (320, 240, 3)

    # RIFF dispatch: WAVE still routes to the WAV parser
    assert mc.decode(_golden_wav())["codec"] == "wav"
    with pytest.raises(NotImplementedError):
        mc.decode(riff(b"XXXX", b"\x00" * 16))


def test_mediacodec_mp3_goldens():
    """Byte-level goldens for the MPEG audio frame walk: MPEG-1 and
    MPEG-2 Layer III geometry, VBR (bitrate varies per frame, stream
    facts don't), ID3v2 skip (incl. footer flag), ID3v1 trailer stop,
    truncated-final-frame accounting, and the full error contract."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    def frame(ver_b1, br_i, sr_i, pad=0, mode=0, ver=3):
        rate = mc._MP3_RATES[ver][sr_i]
        spf = 1152 if ver == 3 else 576
        fl = (spf // 8) * mc._MP3_BITRATES[ver][br_i] * 1000 // rate + pad
        hdr = bytes(
            [0xFF, ver_b1, (br_i << 4) | (sr_i << 2) | (pad << 1), mode << 6]
        )
        return hdr + b"\x00" * (fl - 4)

    # MPEG-1 L3, 128 kbps, 44100 Hz, stereo, 3 frames: 417-byte frames
    m = mc.decode(frame(0xFB, 9, 0) * 3)
    assert (m["codec"], m["channels"], m["sample_rate_hz"]) == (
        "mp3", 2, 44100,
    )
    assert (m["n_samples"], m["duration_ms"]) == (3456, 3456 * 1000 // 44100)
    assert m["width"] is None and m["height"] is None

    # VBR: bitrate changes per frame; rate/channels/version must not
    v = mc.parse_mp3(frame(0xFB, 9, 1) + frame(0xFB, 14, 1) + frame(0xFB, 1, 1))
    assert (v["n_samples"], v["sample_rate_hz"]) == (3456, 48000)

    # MPEG-2 L3 (576 samples/frame), 22050 Hz, mono, padded frames,
    # behind an ID3v2 tag WITH footer, ended by an ID3v1 'TAG' trailer
    id3 = b"ID3\x04\x00\x10" + bytes([0, 0, 0, 20]) + b"\x00" * 30
    m2 = mc.decode(id3 + frame(0xF3, 8, 0, pad=1, mode=3, ver=2) * 2
                   + b"TAG" + b"\x00" * 125)
    assert (m2["channels"], m2["sample_rate_hz"], m2["n_samples"]) == (
        1, 22050, 1152,
    )

    # truncated final frame: only complete frames count
    f1 = frame(0xFB, 9, 0)
    assert mc.parse_mp3(f1 * 2 + f1[:40])["n_samples"] == 2304

    with pytest.raises(NotImplementedError):
        mc.parse_mp3(bytes([0xFF, 0xFD, 0x94, 0x00]))  # Layer II
    with pytest.raises(ValueError):
        mc.parse_mp3(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 500)  # free format
    with pytest.raises(ValueError):
        mc.parse_mp3(bytes([0xFF, 0xFB, 0xF0, 0x00]))  # bitrate index 15
    with pytest.raises(ValueError):
        mc.parse_mp3(bytes([0xFF, 0xFB, 0x9C, 0x00]))  # sample-rate index 3
    with pytest.raises(ValueError):
        mc.parse_mp3(frame(0xFB, 9, 0) + frame(0xF3, 8, 0, ver=2))  # version flips
    with pytest.raises(ValueError):
        mc.parse_mp3(b"ID3\x04\x00\x00\xff\x00\x00\x00")  # non-syncsafe size
    with pytest.raises(ValueError):
        mc.parse_mp3(frame(0xFB, 9, 0)[:100])  # no complete frame
    with pytest.raises(NotImplementedError):
        mc.parse_mp3(b"not audio at all")


def test_parse_jpeg_property_random_segment_walks():
    """Property test: a JPEG whose SOF is preceded by ANY sequence of
    skippable marker segments (APPn/COM/DQT/DHT with random bodies,
    random fill-byte padding, random restart markers) must still
    yield the planted geometry; truncating the stream anywhere inside
    a segment must raise, never return garbage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    seg_markers = st.sampled_from(
        [0xE0, 0xE1, 0xEE, 0xFE, 0xDB, 0xC4]  # APP0/APP1/APPn/COM/DQT/DHT
    )
    segment = st.tuples(
        seg_markers, st.binary(min_size=0, max_size=40)
    )

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(
        segs=st.lists(segment, min_size=0, max_size=6),
        fills=st.integers(min_value=0, max_value=3),
        rsts=st.integers(min_value=0, max_value=2),
        w=st.integers(min_value=1, max_value=0xFFFF),
        h=st.integers(min_value=1, max_value=0xFFFF),
        ncomp=st.sampled_from([1, 3, 4]),
        sof=st.sampled_from([0xC0, 0xC1, 0xC2, 0xC3, 0xC9]),
    )
    def check(segs, fills, rsts, w, h, ncomp, sof):
        out = bytearray(b"\xff\xd8")
        for marker, body in segs:
            out += bytes([0xFF]) * fills + bytes([0xFF, marker])
            out += (len(body) + 2).to_bytes(2, "big") + body
        out += bytes([0xFF, 0xD0 + rsts])  # standalone restart marker
        comps = b"".join(
            bytes([i + 1, 0x11, 0x00]) for i in range(ncomp)
        )
        out += bytes([0xFF, sof]) + (8 + 3 * ncomp).to_bytes(2, "big")
        out += b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        out += bytes([ncomp]) + comps
        out += b"\xff\xd9"
        got = mc.parse_jpeg(bytes(out))
        assert (got["width"], got["height"], got["channels"]) == (
            w, h, ncomp,
        )
        # truncation inside the SOF segment must raise, not misparse
        import pytest

        with pytest.raises(ValueError):
            mc.parse_jpeg(bytes(out[: len(out) - 3 * ncomp - 8]))

    check()


def test_resize_netpbm_real_pixels():
    """Real nearest-neighbor resize over raw netpbm rasters: exact
    pixel-block duplication on 2x upscale, exact source-pixel picks
    on downscale, identity at same dims, 16-bit P5 samples moved as
    units, and parse_ppm closing the geometry loop."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    # 2x2 P6: R G / B W
    px = {"R": b"\xff\x00\x00", "G": b"\x00\xff\x00",
          "B": b"\x00\x00\xff", "W": b"\xff\xff\xff"}
    raster = px["R"] + px["G"] + px["B"] + px["W"]
    img = b"P6\n# c\n2 2\n255\n" + raster

    up = mc.resize_netpbm(img, 4, 4)
    assert up.startswith(b"P6\n4 4\n255\n")
    body = up[len(b"P6\n4 4\n255\n"):]
    rows = [body[i * 12:(i + 1) * 12] for i in range(4)]
    assert rows[0] == rows[1] == px["R"] * 2 + px["G"] * 2
    assert rows[2] == rows[3] == px["B"] * 2 + px["W"] * 2

    # identity: same dims reproduce the raster byte-for-byte
    same = mc.resize_netpbm(img, 2, 2)
    assert same == b"P6\n2 2\n255\n" + raster

    # downscale 2x2 -> 1x1 picks the (0,0) source pixel
    down = mc.resize_netpbm(img, 1, 1)
    assert down == b"P6\n1 1\n255\n" + px["R"]

    # geometry round-trip through the decoder
    d = mc.parse_ppm(up)
    assert (d["width"], d["height"], d["channels"]) == (4, 4, 3)

    # 16-bit P5: each sample is 2 raster bytes, moved as a unit
    g16 = b"P5 2 1 65535 " + b"\x12\x34" + b"\xab\xcd"
    r16 = mc.resize_netpbm(g16, 4, 1)
    assert r16 == b"P5\n4 1\n65535\n" + b"\x12\x34" * 2 + b"\xab\xcd" * 2

    with pytest.raises(ValueError):
        mc.resize_netpbm(b"P6\n2 2\n255\n" + raster[:-1], 2, 2)  # short raster
    with pytest.raises(ValueError):
        mc.resize_netpbm(img, 0, 4)
    with pytest.raises(NotImplementedError):
        mc.resize_netpbm(b"P3\n2 2\n255\n1 2 3", 1, 1)  # ASCII netpbm


def test_resize_media_real_netpbm_path(spark):
    """resize_media routes P5/P6 payloads through the REAL resampler
    (output re-decodes to the target geometry) while non-netpbm
    payloads keep the deterministic stub — one batch, both paths."""
    from pyspark.sql import types as T

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    img = b"P6\n8 6\n255\n" + bytes(range(256))[:144]
    rows = [
        (1, img, {"kind": "img", "n_bytes": len(img)}),
        (2, b"not an image", {"kind": "blob", "n_bytes": 12}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_media(media, 4, 3).collect()}
    d = mc.parse_ppm(bytes(out[1].payload))
    assert (d["width"], d["height"]) == (4, 3)
    assert bytes(out[2].payload).startswith(b"RSZ|4x3|")


def test_resample_wav_real_pcm():
    """Real PCM resample/downmix: exact frame duplication on 2x
    upsample, exact source-frame picks on downsample, integer-mean
    mono downmix, 8-bit width, parse_wav closing the loop, and the
    non-PCM refusal."""
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    def wav(frames, rate=8000, bits=16, channels=2):
        fmt = "<h" if bits == 16 else "<B"
        body = b"".join(
            struct.pack(fmt, s) for fr in frames for s in fr
        )
        block = channels * (bits // 8)
        return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                              rate * block, block, bits)
                + b"data" + struct.pack("<I", len(body)) + body)

    frames = [(0, 100), (1000, 2000), (-500, 500), (30000, -30000)]
    src = wav(frames)

    # 2x upsample duplicates each frame; parse_wav sees the new rate
    up = mc.resample_wav(src, 16000)
    d = mc.parse_wav(up)
    assert (d["sample_rate_hz"], d["n_samples"], d["channels"]) == (
        16000, 8, 2,
    )
    vals = struct.unpack("<16h", up[44:])
    assert vals == (0, 100, 0, 100, 1000, 2000, 1000, 2000,
                    -500, 500, -500, 500, 30000, -30000, 30000, -30000)

    # 2x downsample picks source frames 0 and 2
    down = mc.resample_wav(src, 4000)
    assert struct.unpack("<4h", down[44:]) == (0, 100, -500, 500)

    # mono downmix is the truncated integer channel mean
    m = mc.resample_wav(src, 8000, mono=True)
    dm = mc.parse_wav(m)
    assert (dm["channels"], dm["n_samples"]) == (1, 4)
    assert struct.unpack("<4h", m[44:]) == (50, 1500, 0, 0)

    # 8-bit unsigned path, identity rate
    src8 = wav([(7, 9), (200, 100)], bits=8)
    m8 = mc.resample_wav(src8, 8000, mono=True)
    assert mc.parse_wav(m8)["n_samples"] == 2
    assert m8[44:] == bytes([8, 150])

    with pytest.raises(NotImplementedError):
        # IEEE-float WAV (fmt 3) is not PCM
        bad = bytearray(src)
        bad[20:22] = struct.pack("<H", 3)
        mc.resample_wav(bytes(bad), 8000)
    with pytest.raises(ValueError):
        mc.resample_wav(src, 0)
    with pytest.raises(NotImplementedError):
        mc.resample_wav(b"\xff\xd8 not audio", 8000)


def test_resample_audio_media_paths(spark):
    """resample_audio_media: WAV payloads come out at the target
    rate/channels (verified through the real decode stage); non-audio
    payloads pass through byte-identical — never fabricated."""
    import struct

    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_media_features,
        resample_audio_media,
    )

    body = struct.pack("<8h", *range(8))  # 4 stereo frames
    src = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
           + b"data" + struct.pack("<I", len(body)) + body)
    rows = [
        (1, src, {"kind": "audio", "n_bytes": len(src)}),
        (2, b"plain bytes", {"kind": "blob", "n_bytes": 11}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resample_audio_media(media, 16000, mono=True)
    feats = {r.media_id: r for r in decode_media_features(out).collect()}
    assert (feats[1].sample_rate_hz, feats[1].channels,
            feats[1].n_samples) == (16000, 1, 8)
    raw = {r.media_id: bytes(r.payload) for r in out.collect()}
    assert raw[2] == b"plain bytes"


def test_split_netpbm_stream_real_frames():
    """Concatenated-netpbm splitting: exact frame boundaries across
    mixed P6/P5 frames (comments, 16-bit samples), max_frames early
    stop, and the strict truncation/garbage contract."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    f1 = b"P6\n# two by one\n2 1\n255\n" + b"\x01\x02\x03\x04\x05\x06"
    f2 = b"P5 3 1 255 " + b"\x0a\x0b\x0c"
    f3 = b"P5 1 2 65535 " + b"\x11\x22\x33\x44"  # 16-bit samples
    stream = f1 + f2 + f3

    got = mc.split_netpbm_stream(stream)
    assert got == [f1, f2, f3]
    for fr, (w, h) in zip(got, [(2, 1), (3, 1), (1, 2)]):
        d = mc.parse_ppm(fr)
        assert (d["width"], d["height"]) == (w, h)

    assert mc.split_netpbm_stream(stream, max_frames=2) == [f1, f2]

    with pytest.raises(ValueError):
        mc.split_netpbm_stream(stream[:-1])  # truncated final raster
    with pytest.raises(NotImplementedError):
        mc.split_netpbm_stream(f1 + b"JUNK")  # garbage at a boundary
    with pytest.raises(ValueError):
        mc.split_netpbm_stream(b"")


def test_split_media_frames_paths(spark):
    """split_media_frames: netpbm streams explode into REAL decodable
    frames; other payloads take the stride fallback; null payloads
    vanish."""
    from rust_dms_cdc_operator_spark.functions import mediacodec as mc
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        split_media_frames,
    )

    frame = b"P6\n4 4\n255\n" + bytes(range(48))
    stream = frame * 5
    rows = [
        (1, stream, {"kind": "video", "n_bytes": len(stream)}),
        (2, b"opaque-compressed-blob-" * 10, {"kind": "video", "n_bytes": 230}),
        (3, None, {"kind": "video", "n_bytes": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = split_media_frames(media, max_frames=3, fallback_stride=100)
    by = {}
    for r in out.collect():
        by.setdefault(r.media_id, []).append(r)
    assert sorted(by) == [1, 2]
    f1 = sorted(by[1], key=lambda r: r.frame_idx)
    assert len(f1) == 3  # capped below the 5 frames present
    assert all(bytes(r.frame) == frame for r in f1)
    d = mc.parse_ppm(bytes(f1[0].frame))
    assert (d["width"], d["height"]) == (4, 4)
    f2 = sorted(by[2], key=lambda r: r.frame_idx)
    assert [len(bytes(r.frame)) for r in f2] == [100, 100, 30]


def test_raw_transform_properties():
    """Property tests for the raw-format transforms: netpbm resize
    always re-decodes to the target geometry and is the identity at
    source dims; WAV resample at the source rate is byte-identical
    modulo the canonical header; NN double-resize to the same target
    equals single-resize (index maps compose through exact pixel
    copies when upscaling by an integer factor)."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    @settings(max_examples=40, deadline=None, derandomize=True)
    @given(
        w0=st.integers(min_value=1, max_value=12),
        h0=st.integers(min_value=1, max_value=12),
        w1=st.integers(min_value=1, max_value=20),
        h1=st.integers(min_value=1, max_value=20),
        k=st.integers(min_value=1, max_value=3),
        data=st.data(),
    )
    def check_img(w0, h0, w1, h1, k, data):
        raster = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=w0 * h0 * 3, max_size=w0 * h0 * 3,
                )
            )
        )
        img = b"P6\n%d %d\n255\n" % (w0, h0) + raster
        out = mc.resize_netpbm(img, w1, h1)
        d = mc.parse_ppm(out)
        assert (d["width"], d["height"]) == (w1, h1)
        assert mc.resize_netpbm(img, w0, h0).endswith(raster)
        # integer-factor upscale then identity-resize is stable
        up = mc.resize_netpbm(img, w0 * k, h0 * k)
        assert mc.resize_netpbm(up, w0 * k, h0 * k) == up

    check_img()

    @settings(max_examples=40, deadline=None, derandomize=True)
    @given(
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
        ch=st.integers(min_value=1, max_value=2),
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=2, max_size=40,
        ),
    )
    def check_wav(rate, ch, samples):
        n = len(samples) - len(samples) % ch
        body = struct.pack("<%dh" % n, *samples[:n])
        block = ch * 2
        src = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                             rate * block, block, 16)
               + b"data" + struct.pack("<I", len(body)) + body)
        same = mc.resample_wav(src, rate)
        assert same[44:] == body  # identity modulo canonical header
        d = mc.parse_wav(same)
        assert (d["sample_rate_hz"], d["channels"]) == (rate, ch)

    check_wav()


def _gif(frames, loop=None, gct_bits=None, delays=None):
    """Hand-assemble an animated GIF: optional global color table,
    optional Netscape loop extension, per-frame graphic-control
    delays, length-prefixed image data sub-blocks, trailer."""
    import struct

    packed = 0x80 | (gct_bits - 1) if gct_bits else 0
    out = bytearray(b"GIF89a" + struct.pack("<HH", 11, 7)
                    + bytes([packed, 0, 0]))
    if gct_bits:
        out += b"\x00" * (3 * (1 << gct_bits))
    if loop is not None:
        out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
                + struct.pack("<H", loop) + b"\x00")
    for i in range(frames):
        if delays:
            out += (b"\x21\xf9\x04\x00" + struct.pack("<H", delays[i])
                    + b"\x00\x00")
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 11, 7) + b"\x00"
        out += b"\x02" + bytes([2, 0x4C, 0x01]) + b"\x00"  # lzw min + data
    out += b"\x3b"
    return bytes(out)


def test_gif_frame_census_goldens():
    """Animated-GIF walk without LZW decode: frame counts, Netscape
    loop count, summed centisecond delays, color-table skips, the
    truncation tolerance, and the malformed-block contract."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    # 3 frames, loop forever, 10ms+20ms+30ms
    c = mc.gif_frame_census(_gif(3, loop=0, delays=[1, 2, 3]))
    assert c == {"n_frames": 3, "loop_count": 0,
                 "total_duration_ms": 60, "width": 11, "height": 7}

    # still GIF with a global color table: one frame, no animation
    s = mc.gif_frame_census(_gif(1, gct_bits=4))
    assert (s["n_frames"], s["loop_count"], s["total_duration_ms"]) == (
        1, None, 0,
    )

    # finite loop count
    assert mc.gif_frame_census(_gif(2, loop=5))["loop_count"] == 5

    # missing trailer tolerated (truncated upload), complete frames kept
    t = mc.gif_frame_census(_gif(2, delays=[4, 4])[:-1])
    assert t["n_frames"] == 2 and t["total_duration_ms"] == 80

    with pytest.raises(ValueError):
        mc.gif_frame_census(_gif(1)[:20])  # truncated mid-descriptor
    with pytest.raises(ValueError):
        g = bytearray(_gif(1))
        g[13] = 0x99  # unknown block id
        mc.gif_frame_census(bytes(g))
    with pytest.raises(ValueError):
        mc.gif_frame_census(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no frames
    with pytest.raises(NotImplementedError):
        mc.gif_frame_census(b"P6 1 1 255  ")


def test_gif_animation_census_wrapper(spark):
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        gif_animation_census,
    )

    rows = [
        (1, _gif(4, loop=0, delays=[5, 5, 5, 5]),
         {"kind": "image", "n_bytes": None}),
        (2, _gif(1), {"kind": "image", "n_bytes": None}),
        (3, b"not a gif", {"kind": "blob", "n_bytes": 9}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in gif_animation_census(media).collect()}
    assert sorted(got) == [1, 2]
    assert (got[1].n_frames, got[1].loop_count,
            got[1].total_duration_ms) == (4, 0, 200)
    assert (got[2].n_frames, got[2].loop_count) == (1, None)


def _apng(frames, plays, delays_cs):
    """Hand-assemble an APNG skeleton: signature, IHDR, acTL, one
    fcTL per frame (delay in centiseconds via den=100), IEND. Chunk
    CRCs are not validated by the walk, so zeros suffice."""
    import struct

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0))
    out += chunk(b"acTL", struct.pack(">II", frames, plays))
    for d in delays_cs:
        out += chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", 0, 9, 5, 0, 0, d, 100, 0, 0),
        )
    out += chunk(b"IEND", b"")
    return bytes(out)


def _multi_tiff(bo, pages, w=800, h=600):
    """Chained-IFD TIFF: each page's IFD carries width/height SHORT
    tags and links to the next."""
    import struct

    out = bytearray(b"II*\x00" if bo == "<" else b"MM\x00*")
    out += struct.pack(bo + "I", 8)  # first IFD right after header
    ifd_size = 2 + 12 * 2 + 4
    for p in range(pages):
        base = 8 + p * ifd_size
        out += struct.pack(bo + "H", 2)
        for tag, val in ((256, w), (257, h)):
            out += struct.pack(bo + "HHI", tag, 3, 1)
            out += struct.pack(bo + "H", val) + b"\x00\x00"
        nxt = 8 + (p + 1) * ifd_size if p + 1 < pages else 0
        out += struct.pack(bo + "I", nxt)
    return bytes(out)


def test_png_tiff_census_goldens():
    """APNG chunk census and TIFF page-chain census: frame/page
    counts, delay sums, loop semantics, stills, cycle detection."""
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    a = mc.png_animation_census(_apng(3, 0, [10, 20, 30]))
    assert a == {"n_frames": 3, "loop_count": 0,
                 "total_duration_ms": 600, "width": 9, "height": 5}

    # plain PNG: a still
    s = mc.png_animation_census(_golden_png())
    assert (s["n_frames"], s["loop_count"], s["total_duration_ms"]) == (
        1, None, 0,
    )

    for bo in ("<", ">"):
        t = mc.tiff_page_census(_multi_tiff(bo, 4))
        assert t == {"n_pages": 4, "width": 800, "height": 600,
                     "channels": 1}
    assert mc.tiff_page_census(_multi_tiff("<", 1))["n_pages"] == 1

    # IFD cycle must raise, not loop forever
    cyc = bytearray(_multi_tiff("<", 2))
    last_link = 8 + 2 * (2 + 12 * 2 + 4) - 4
    cyc[last_link : last_link + 4] = struct.pack("<I", 8)
    with pytest.raises(ValueError):
        mc.tiff_page_census(bytes(cyc))
    with pytest.raises(ValueError):
        mc.png_animation_census(_apng(2, 0, [5])[:30])  # chunk past end


def test_multi_image_census_wrapper(spark):
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        multi_image_census,
    )

    rows = [
        (1, _gif(3, loop=0, delays=[2, 2, 2]), {"kind": "image", "n_bytes": None}),
        (2, _apng(2, 5, [50, 50]), {"kind": "image", "n_bytes": None}),
        (3, _multi_tiff("<", 7), {"kind": "doc", "n_bytes": None}),
        (4, b"RIFF....WAVE", {"kind": "audio", "n_bytes": None}),  # no row
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in multi_image_census(media).collect()}
    assert sorted(got) == [1, 2, 3]
    assert (got[1].codec, got[1].n_frames, got[1].total_duration_ms) == (
        "gif", 3, 60,
    )
    assert (got[2].codec, got[2].n_frames, got[2].loop_count,
            got[2].total_duration_ms) == ("png", 2, 5, 1000)
    assert (got[3].codec, got[3].n_frames, got[3].loop_count) == (
        "tiff", 7, None,
    )


def _exif_jpeg(orientation=6, make="ACME", bo="<"):
    """JPEG with an APP1 EXIF segment: TIFF header + IFD0 carrying
    Orientation (SHORT), Make (ASCII at an offset), DateTime."""
    import struct

    dt = b"2024:01:02 03:04:05\x00"
    mk = make.encode() + b"\x00"
    # IFD0 at offset 8; value area after the IFD
    n_tags = 3
    ifd_end = 8 + 2 + 12 * n_tags + 4
    tiff = bytearray(b"II*\x00" if bo == "<" else b"MM\x00*")
    tiff += struct.pack(bo + "I", 8)
    tiff += struct.pack(bo + "H", n_tags)
    # Make (271): ASCII at offset ifd_end
    tiff += struct.pack(bo + "HHI", 271, 2, len(mk))
    tiff += struct.pack(bo + "I", ifd_end)
    # Orientation (274): SHORT inline
    tiff += struct.pack(bo + "HHI", 274, 3, 1)
    tiff += struct.pack(bo + "H", orientation) + b"\x00\x00"
    # DateTime (306): ASCII at offset ifd_end + len(mk)
    tiff += struct.pack(bo + "HHI", 306, 2, len(dt))
    tiff += struct.pack(bo + "I", ifd_end + len(mk))
    tiff += struct.pack(bo + "I", 0)  # no next IFD
    tiff += mk + dt
    app1 = b"Exif\x00\x00" + bytes(tiff)
    sof = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
           + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
           + b"\x01" + b"\x01\x11\x00")
    return (b"\xff\xd8" + b"\xff\xe1"
            + (len(app1) + 2).to_bytes(2, "big") + app1
            + sof + b"\xff\xd9")


def _id3_mp3(version=4, frames=(("TIT2", "Song"), ("TPE1", "Band"))):
    """MP3 payload that is just an ID3v2 tag (+ one audio frame):
    v2.4 syncsafe or v2.3 plain frame sizes, UTF-8 text."""
    import struct

    body = bytearray()
    for fid, text in frames:
        data = b"\x03" + text.encode("utf-8")
        if version >= 4:
            n = len(data)
            sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F])
        else:
            sz = struct.pack(">I", len(data))
        body += fid.encode() + sz + b"\x00\x00" + data
    n = len(body)
    hdr = (b"ID3" + bytes([version, 0, 0])
           + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F]))
    # one MPEG-1 L3 frame so the payload is also walkable audio
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413
    return bytes(hdr) + bytes(body) + frame


def test_jpeg_exif_and_id3_tags():
    """EXIF IFD0 extraction (both byte orders, inline SHORT +
    offset ASCII) and ID3v2.3/2.4 text frames (size encodings,
    UTF-8/UTF-16), plus the no-metadata and error contracts."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    for bo in ("<", ">"):
        e = mc.jpeg_exif(_exif_jpeg(orientation=6, make="ACME", bo=bo))
        assert e == {"make": "ACME", "orientation": 6,
                     "datetime": "2024:01:02 03:04:05"}, (bo, e)

    # stripped JPEG: empty dict, not an error
    jpg = (b"\xff\xd8\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
           + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
           + b"\x01\x01\x11\x00" + b"\xff\xd9")
    assert mc.jpeg_exif(jpg) == {}

    t4 = mc.id3v2_tags(_id3_mp3(4))
    assert t4 == {"title": "Song", "artist": "Band"}
    t3 = mc.id3v2_tags(_id3_mp3(3, (("TALB", "LP"), ("TYER", "1999"))))
    assert t3 == {"album": "LP", "date": "1999"}
    # UTF-16 with BOM (encoding byte 1)
    import struct as _s
    data = b"\x01" + "Tïtle".encode("utf-16")
    body = b"TIT2" + bytes([0, 0, 0, len(data)]) + b"\x00\x00" + data
    n = len(body)
    raw = (b"ID3\x04\x00\x00"
           + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F]) + body)
    assert mc.id3v2_tags(raw) == {"title": "Tïtle"}

    with pytest.raises(NotImplementedError):
        mc.id3v2_tags(b"\xff\xfb\x90\x00")  # tagless audio
    with pytest.raises(ValueError):
        bad = bytearray(_id3_mp3(4))
        bad[6] = 0xFF  # non-syncsafe tag size
        mc.id3v2_tags(bytes(bad))
    # the MP3 frame walk still reads the tagged payload
    assert mc.parse_mp3(_id3_mp3(4))["n_samples"] == 1152


def test_extract_media_metadata_wrapper(spark):
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_media_metadata,
    )

    rows = [
        (1, _exif_jpeg(orientation=8), {"kind": "image", "n_bytes": None}),
        (2, _id3_mp3(4), {"kind": "audio", "n_bytes": None}),
        (3, b"P6 1 1 255  ", {"kind": "image", "n_bytes": None}),  # no rows
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {(r.media_id, r.key): (r.source, r.value)
           for r in extract_media_metadata(media).collect()}
    assert got[(1, "orientation")] == ("exif", "8")
    assert got[(1, "make")] == ("exif", "ACME")
    assert got[(2, "title")] == ("id3", "Song")
    assert got[(2, "artist")] == ("id3", "Band")
    assert not any(mid == 3 for mid, _ in got)


def test_multimodal_pipeline_composition(spark):
    """The real multimodal ops compose: concatenated netpbm stream →
    split_media_frames → resize_media → image_channel_stats, with
    EXACT invariants — integer-factor NN upscale duplicates every
    pixel k² times, so per-channel means/min/max are IDENTICAL to the
    source frame's; each split frame re-decodes to its own
    geometry."""
    import pyspark.sql.functions as F

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        image_channel_stats,
        resize_media,
        split_media_frames,
    )

    f1 = b"P6\n2 2\n255\n" + bytes([10, 0, 0, 250, 0, 0,
                                    10, 100, 0, 250, 100, 200])
    f2 = b"P6\n3 1\n255\n" + bytes([5, 5, 5, 10, 10, 10, 30, 30, 30])
    media = spark.createDataFrame(
        [(7, f1 + f2, {"kind": "video", "n_bytes": None})], MEDIA_SCHEMA
    )
    frames = split_media_frames(media, max_frames=8)
    fmedia = frames.select(
        F.col("frame_idx").cast("long").alias("media_id"),
        F.col("frame").alias("payload"),
        F.struct(F.lit("image").alias("kind"),
                 F.lit(None).cast("long").alias("n_bytes")).alias("meta"),
    )
    resized = resize_media(fmedia, 6, 6)  # 2x2->6,6 and 3x1->6,6
    stats = {
        (r.media_id, r.channel): r
        for r in image_channel_stats(resized).collect()
    }
    # frame 0 is a 3x upscale of 2x2 (integer factor both axes):
    # means must equal the source's exactly
    src0 = mc.netpbm_channel_stats(f1)
    for c in range(3):
        assert stats[(0, c)].mean == src0[c]["mean"], c
        assert stats[(0, c)].min_val == src0[c]["min"]
        assert stats[(0, c)].max_val == src0[c]["max"]
    # frame 1 (3x1 -> 6x6): 2x/6x integer factors, same invariant
    src1 = mc.netpbm_channel_stats(f2)
    for c in range(3):
        assert stats[(1, c)].mean == src1[c]["mean"], c
    # every split frame re-decodes to its resized geometry
    from rust_dms_cdc_operator_spark.functions.multimodal import (
        decode_media_features,
    )

    dec = decode_media_features(resized).collect()
    assert {(r.width, r.height) for r in dec} == {(6, 6)}


def test_pcm_window_features_exact():
    """Windowed RMS/ZCR/peak over PCM: exact integer expectations on
    hand-computed windows, stereo integer-mean downmix, 8-bit
    centering, and the partial final window."""
    import math
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    def wav(samples, rate=1000, bits=16, channels=1):
        fmt = "<h" if bits == 16 else "<B"
        body = b"".join(struct.pack(fmt, s) for s in samples)
        block = channels * (bits // 8)
        return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                              rate * block, block, bits)
                + b"data" + struct.pack("<I", len(body)) + body)

    # mono 16-bit at 1000 Hz, 4 ms windows -> 4-frame windows
    w = mc.pcm_window_features(wav([3, -4, 0, 5, 6, -8]), window_ms=4)
    assert len(w) == 2
    assert (w[0]["n"], w[0]["zero_crossings"], w[0]["peak"]) == (4, 2, 5)
    assert w[0]["rms"] == math.sqrt(50 / 4)
    assert (w[1]["n"], w[1]["zero_crossings"], w[1]["peak"]) == (2, 1, 8)
    assert w[1]["rms"] == math.sqrt(100 / 2)

    # stereo downmix: (3,5),(-4,-2) -> mono 4,-3
    ws = mc.pcm_window_features(
        wav([3, 5, -4, -2], channels=2), window_ms=4
    )
    assert (ws[0]["peak"], ws[0]["zero_crossings"]) == (4, 1)
    assert ws[0]["rms"] == math.sqrt((16 + 9) / 2)

    # 8-bit unsigned centers at 128 so silence is 0
    w8 = mc.pcm_window_features(
        wav([128, 130, 126], bits=8), window_ms=4
    )
    assert (w8[0]["peak"], w8[0]["zero_crossings"]) == (2, 1)
    assert w8[0]["rms"] == math.sqrt(8 / 3)

    assert mc.pcm_window_features(wav([])) == []
    with pytest.raises(ValueError):
        mc.pcm_window_features(wav([1]), window_ms=0)
    with pytest.raises(NotImplementedError):
        mc.pcm_window_features(b"\x89PNG not audio")


def test_netpbm_channel_stats_exact():
    """Per-channel mean/min/max over raw rasters: exact values for
    8-bit RGB, big-endian 16-bit graymap, and the truncation
    contract."""
    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    img = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 200, 100, 0])
    s = mc.netpbm_channel_stats(img)
    assert s[0] == {"channel": 0, "mean": 105.0, "min": 10, "max": 200}
    assert s[1] == {"channel": 1, "mean": 60.0, "min": 20, "max": 100}
    assert s[2] == {"channel": 2, "mean": 15.0, "min": 0, "max": 30}

    g16 = b"P5 2 1 65535 " + b"\x01\x02" + b"\xff\xfe"  # BE: 258, 65534
    s16 = mc.netpbm_channel_stats(g16)
    assert s16 == [
        {"channel": 0, "mean": (258 + 65534) / 2, "min": 258, "max": 65534}
    ]

    with pytest.raises(ValueError):
        mc.netpbm_channel_stats(img[:-1])
    with pytest.raises(NotImplementedError):
        mc.netpbm_channel_stats(b"GIF89a not raw")


def test_audio_image_feature_wrappers(spark):
    """audio_window_features / image_channel_stats over a mixed
    batch: PCM and netpbm payloads explode into feature rows, the
    poison pill contributes none."""
    import struct

    from rust_dms_cdc_operator_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        audio_window_features,
        image_channel_stats,
    )

    body = struct.pack("<4h", 100, -100, 50, -50)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", len(body)) + body)
    img = b"P6\n1 2\n255\n" + bytes([1, 2, 3, 5, 6, 7])
    rows = [
        (1, wav, {"kind": "audio", "n_bytes": len(wav)}),
        (2, img, {"kind": "image", "n_bytes": len(img)}),
        (3, b"poison", {"kind": "blob", "n_bytes": 6}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    aw = audio_window_features(media, window_ms=1000).collect()
    assert len(aw) == 1 and aw[0].media_id == 1
    assert (aw[0].n_frames, aw[0].peak, aw[0].zero_crossings) == (4, 100, 3)

    st = {(r.media_id, r.channel): r for r in image_channel_stats(media).collect()}
    assert sorted(st) == [(2, 0), (2, 1), (2, 2)]
    assert (st[(2, 0)].mean, st[(2, 0)].min_val, st[(2, 0)].max_val) == (3.0, 1, 5)


def test_parse_mp3_property_random_frame_walks():
    """Property test: an MPEG-1/2 Layer III stream with ANY
    per-frame bitrate sequence (VBR), random padding bits, an
    optional ID3v2 tag of random syncsafe size, and random non-sync
    trailing bytes must yield frame-exact sample counts from the
    planted parameters; truncating inside the final frame must drop
    exactly that frame."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(
        ver=st.sampled_from([3, 2, 0]),  # MPEG-1 / MPEG-2 / MPEG-2.5
        sr_i=st.integers(min_value=0, max_value=2),
        mono=st.booleans(),
        brs=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=14),  # bitrate idx
                st.integers(min_value=0, max_value=1),   # padding bit
            ),
            min_size=1, max_size=6,
        ),
        id3_size=st.one_of(st.none(), st.integers(min_value=0, max_value=200)),
        trailer=st.binary(min_size=0, max_size=20).filter(
            lambda b: not (len(b) >= 2 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0)
        ),
    )
    def check(ver, sr_i, mono, brs, id3_size, trailer):
        rate = mc._MP3_RATES[ver][sr_i]
        spf = 1152 if ver == 3 else 576
        b1 = {3: 0xFB, 2: 0xF3, 0: 0xE3}[ver]
        out = bytearray()
        if id3_size is not None:
            out += b"ID3\x04\x00\x00"
            out += bytes([
                (id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
                (id3_size >> 7) & 0x7F, id3_size & 0x7F,
            ])
            out += b"\x7e" * id3_size
        for br_i, pad in brs:
            fl = (spf // 8) * mc._MP3_BITRATES[ver][br_i] * 1000 // rate + pad
            out += bytes([
                0xFF, b1,
                (br_i << 4) | (sr_i << 2) | (pad << 1),
                (3 << 6) if mono else 0,
            ])
            out += b"\x00" * (fl - 4)
        full_end = len(out)
        out += trailer
        got = mc.parse_mp3(bytes(out))
        assert (got["channels"], got["sample_rate_hz"]) == (
            1 if mono else 2, rate,
        )
        assert got["n_samples"] == spf * len(brs)
        assert got["duration_ms"] == spf * len(brs) * 1000 // rate
        # truncating inside the last frame drops exactly that frame
        if len(brs) > 1:
            cut = mc.parse_mp3(bytes(out[: full_end - 1]))
            assert cut["n_samples"] == spf * (len(brs) - 1)

    check()


def test_mediacodec_transforms_fuzz_exception_contract():
    """The same poison-pill contract for every NON-decode codec
    entry point added in round 6 (transforms, censuses, metadata):
    each is wrapped by an Arrow batch loop that catches ONLY
    UnknownMediaError/ValueError/struct.error — an IndexError
    escaping a truncated-input walk would kill the whole task.
    Seeded fuzz: valid-prefix + garbage, random truncations of VALID
    payloads (the nastiest real-world case), and pure noise, against
    all thirteen entry points (incl. the MP4 box walker, the EBML
    census, and the FLAC STREAMINFO parse)."""
    import random
    import struct

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    entry_points = [
        lambda p: mc.resize_netpbm(p, 3, 3),
        lambda p: mc.resample_wav(p, 16000, mono=True),
        lambda p: mc.split_netpbm_stream(p, max_frames=4),
        lambda p: mc.pcm_window_features(p, window_ms=10),
        lambda p: mc.netpbm_channel_stats(p),
        lambda p: mc.gif_frame_census(p),
        lambda p: mc.png_animation_census(p),
        lambda p: mc.tiff_page_census(p),
        lambda p: mc.jpeg_exif(p),
        lambda p: mc.id3v2_tags(p),
        lambda p: mc.mp4_box_census(p),
        lambda p: mc.mkv_census(p),
        lambda p: mc.parse_flac(p),
        lambda p: mc.dhash64(p),
    ]
    valid = [
        b"P6\n2 2\n255\n" + bytes(range(12)),
        b"P5 3 1 65535 " + bytes(6),
        _golden_wav(),
        _gif(2, loop=0, delays=[1, 1]),
        _apng(2, 0, [5, 5]),
        _multi_tiff("<", 3),
        _multi_tiff(">", 2),
        _exif_jpeg(),
        _id3_mp3(4),
        _id3_mp3(3),
        _mp4(n_audio=1),
        _mkv(n_audio=1),
        _flac(),
    ]
    magics = [
        b"P6", b"P5", b"RIFF", b"RIFFxxxxWAVE", b"GIF89a",
        b"\x89PNG\r\n\x1a\n", b"II*\x00", b"MM\x00*", b"\xff\xd8",
        b"ID3", b"", b"\x1a\x45\xdf\xa3", _mp4()[:8],
    ]
    rng = random.Random(99)
    for _ in range(8000):
        mode = rng.random()
        if mode < 0.45:
            payload = rng.choice(magics) + bytes(
                rng.getrandbits(8) for _ in range(rng.randint(0, 80))
            )
        elif mode < 0.85:
            v = rng.choice(valid)
            payload = v[: rng.randint(0, len(v))]  # truncation
        else:
            v = bytearray(rng.choice(valid))  # random corruption
            for _ in range(rng.randint(1, 4)):
                if v:
                    v[rng.randrange(len(v))] = rng.getrandbits(8)
            payload = bytes(v)
        for fn in entry_points:
            try:
                fn(payload)
            except (NotImplementedError, ValueError, struct.error):
                pass  # the contract: only these may surface


def test_mediacodec_fuzz_exception_contract():
    """Poison-pill contract: decode() may reject garbage ONLY with the
    exception types the Arrow batch loop catches (UnknownMediaError/
    ValueError/struct.error) — an IndexError or KeyError escaping a
    parser would kill a whole 100 TB decode task instead of yielding
    one NULL-codec row. Seeded 20k-case fuzz across every wired
    magic."""
    import random
    import struct

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    rng = random.Random(42)
    magics = [
        b"\xff\xd8", b"RIFF", b"BM", b"GIF87a", b"GIF89a", b"II*\x00",
        b"MM\x00*", b"\x89PNG\r\n\x1a\n", b"P6", b"P5",
        b"RIFFxxxxWEBP", b"RIFFxxxxWAVE", b"",
        b"ID3", b"\xff\xfb", b"\xff\xf3", b"\xff\xe2",
    ]
    for _ in range(20000):
        payload = rng.choice(magics) + bytes(
            rng.getrandbits(8) for _ in range(rng.randint(0, 60))
        )
        try:
            mc.decode(payload)
        except (NotImplementedError, ValueError, struct.error):
            pass  # the contract: only these may surface


def test_multimodal_wrapper_fuzz_poison_pills(spark):
    """Wrapper-level poison-pill gate: the Spark `mapInPandas` wrappers
    themselves (not just the mediacodec entry points they call) must
    survive any byte sequence. Round 6's entry-point fuzz missed a
    wrapper/codec catch-tuple mismatch: resample_audio_media caught
    only (NotImplementedError, ValueError) while resample_wav raises
    struct.error on a truncated fmt chunk — one bad row would have
    killed a whole 100 TB task. This gate pushes a corpus of valid
    payloads, their truncations (every fmt-chunk-relevant cut of a
    valid WAV included explicitly), and magic-prefixed garbage through
    EVERY multimodal wrapper and asserts each job completes."""
    import random
    import struct

    from rust_dms_cdc_operator_spark.functions import multimodal as mm

    wav = _golden_wav()
    fmt_at = wav.index(b"fmt ")
    corpus = [wav[:fmt_at + 8 + k] for k in range(0, 17)]  # fmt-body cuts
    valid = [
        wav,
        b"P6\n2 2\n255\n" + bytes(range(12)),
        _gif(2, loop=0, delays=[1, 1]),
        _apng(2, 0, [5, 5]),
        _multi_tiff("<", 2),
        _exif_jpeg(),
        _id3_mp3(4),
        _golden_png(),
    ]
    magics = [
        b"P6", b"P5", b"RIFF", b"RIFFxxxxWAVE", b"GIF89a",
        b"\x89PNG\r\n\x1a\n", b"II*\x00", b"MM\x00*", b"\xff\xd8",
        b"ID3", b"BM", b"",
    ]
    rng = random.Random(7)
    for _ in range(150):
        mode = rng.random()
        if mode < 0.4:
            corpus.append(rng.choice(magics) + bytes(
                rng.getrandbits(8) for _ in range(rng.randint(0, 60))))
        elif mode < 0.8:
            v = rng.choice(valid)
            corpus.append(v[: rng.randint(0, len(v))])
        else:
            v = bytearray(rng.choice(valid))
            for _ in range(rng.randint(1, 4)):
                if v:
                    v[rng.randrange(len(v))] = rng.getrandbits(8)
            corpus.append(bytes(v))
    corpus.extend(valid + [None])
    rows = [
        (i, p, {"kind": "blob", "n_bytes": len(p) if p else 0})
        for i, p in enumerate(corpus)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).coalesce(4)
    media.persist()
    wrappers = [
        lambda df: mm.decode_media_features(df),
        lambda df: mm.extract_media_features(df),
        lambda df: mm.resize_media(df, 3, 3),
        lambda df: mm.resample_audio_media(df, 16000, mono=True),
        lambda df: mm.audio_window_features(df, window_ms=10),
        lambda df: mm.image_channel_stats(df),
        lambda df: mm.gif_animation_census(df),
        lambda df: mm.extract_media_metadata(df),
        lambda df: mm.multi_image_census(df),
        lambda df: mm.split_media_frames(df, max_frames=3),
        lambda df: mm.sample_frames(df, every_n_bytes=64),
        lambda df: mm.video_container_census(df),
    ]
    for wrap in wrappers:
        assert wrap(media).count() >= 0  # completing IS the assertion
    media.unpersist()


def _brute_setsim(spark, docs, t, mode):
    """Python replay of the exact set-similarity census using the
    engine's own shingle construction — the ground truth the prefix
    filter must reproduce COMPLETELY (not a superset test: equality)."""
    import itertools
    from fractions import Fraction

    from rust_dms_cdc_operator_spark.operators.dedup import (
        hashed_shingle_set,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = {
        r.doc_id: set(r.sh)
        for r in df.select(
            "doc_id", hashed_shingle_set(F.col("text"), 3).alias("sh")
        ).collect()
    }
    fr = Fraction(t).limit_denominator(1_000_000)
    num, den = fr.numerator, fr.denominator
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        A, B = sh[a], sh[b]
        if not A or not B:
            continue
        inter = len(A & B)
        if mode == "jaccard":
            union = len(A | B)
            if inter * den >= union * num:
                out.add((a, b, inter, union))
        else:
            if inter * den >= min(len(A), len(B)) * num:
                ia, ib = (
                    (a, b) if (len(A), a) < (len(B), b) else (b, a)
                )
                out.add((ia, ib, inter, len(sh[ia]), len(sh[ib])))
    return out


def test_prefix_joins_equal_brute_force(spark):
    """Completeness + exactness of the PPJoin-style prefix filter:
    both joins EQUAL the all-pairs brute force (set equality — no
    LSH-style recall slack) on a seeded corpus of near-dups, excerpts
    (the containment shape Jaccard misses), and unrelated docs, at
    three thresholds including a boundary-exact tie."""
    import random

    from rust_dms_cdc_operator_spark.operators.dedup import (
        prefix_containment_join,
        prefix_jaccard_join,
    )

    rng = random.Random(4321)
    vocab = [f"w{i}" for i in range(25)]
    docs = []
    for i in range(35):
        base = rng.sample(vocab, rng.randint(3, 12))
        docs.append((i, " ".join(base)))
        if rng.random() < 0.6:
            v = list(base)
            if rng.random() < 0.5 and len(v) > 4:
                v = v[: rng.randint(2, len(v) - 1)]  # excerpt
            if rng.random() < 0.5:
                v[rng.randrange(len(v))] = rng.choice(vocab)
            docs.append((100 + i, " ".join(v)))
    docs += [(900, docs[0][1]), (901, docs[0][1])]  # identical dups
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.9, 0.8, 0.5):
        got_j = {
            (r.id_a, r.id_b, r.inter_size, r.union_size)
            for r in prefix_jaccard_join(df, min_jaccard=t).collect()
        }
        assert got_j == _brute_setsim(spark, docs, t, "jaccard"), t
        got_c = {
            (r.id_a, r.id_b, r.inter_size, r.size_a, r.size_b)
            for r in prefix_containment_join(
                df, min_containment=t
            ).collect()
        }
        assert got_c == _brute_setsim(spark, docs, t, "containment"), t
    spark.catalog.clearCache()


def test_prefix_containment_superset_of_lsh_census(spark):
    """The prefix containment census is exact and COMPLETE, so the
    LSH-proposed census (dedup_containment's shape) must be a subset
    of it — LSH can only miss pairs, never find extras the complete
    census lacks."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        containment_verify_pairs,
        minhash_lsh_pairs,
        prefix_containment_join,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lsh = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in containment_verify_pairs(
            minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=2),
            d, "doc_id", "text", n=3, min_containment=0.9,
            hash_shingles=True,
        ).collect()
    }
    full = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in prefix_containment_join(
            d, "doc_id", "text", n=3, min_containment=0.9,
            hash_shingles=True,
        ).collect()
    }
    assert lsh <= full
    spark.catalog.clearCache()


def test_prefix_join_threshold_validation():
    from rust_dms_cdc_operator_spark.operators.dedup import _frac

    import pytest

    assert _frac(0.9) == (9, 10)
    assert _frac(0.8) == (4, 5)
    assert _frac(1.0) == (1, 1)
    with pytest.raises(ValueError):
        _frac(0.0)
    with pytest.raises(ValueError):
        _frac(1.5)


def test_trained_registry_and_overrides():
    """Per-sf trained-artifact registry: sf0.01 resolves to the python
    constants the driver's static oracles embed; generated scales
    resolve to their JSON; unknown tags resolve to None and produce
    NO override (callers fall back to the static strings). The
    re-rendered oracle for a generated scale embeds that scale's
    centroids, not sf0.01's."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        oracle_sql_overrides,
    )
    from rust_dms_cdc_operator_spark.ivf_constants import (
        _IVF_TRAINED_CENTROIDS_SF001,
    )
    from rust_dms_cdc_operator_spark.trained import load_ivf, load_pq

    assert load_ivf("sf0.01") is _IVF_TRAINED_CENTROIDS_SF001
    assert load_ivf("no-such-sf") is None and load_pq("no-such-sf") is None
    assert oracle_sql_overrides("/root/testdata/sf0.01") == {}
    assert oracle_sql_overrides("/tmp/no-such-sf") == {}

    ov = oracle_sql_overrides("/root/testdata/sf0.1")
    assert sorted(ov) == [
        "dedup_semantic_pairs",
        "docs_bpe_fertility", "docs_bpe_tokens",
        "sim_ivf_occupancy",
        "sim_ivf_probe_partitioned", "sim_ivf_recall",
        "sim_ivf_trained",
        "sim_ivfpq_probe_partitioned", "sim_ivfpq_topk",
        "sim_knn_density", "sim_pq_topk",
    ]
    c01 = load_ivf("sf0.1")
    assert c01 is not None and c01 != _IVF_TRAINED_CENTROIDS_SF001
    assert str(c01[0][0]) in ov["sim_ivf_trained"]


def _mp4(dur_ms=1250, w=64, h=48, n_audio=1, mdat=12, brand=b"isom",
         timescale=1000, v1=False):
    """Minimal well-formed ISO-BMFF payload: ftyp + moov{mvhd,
    vide trak, n_audio soun traks} + mdat.  v1=True emits the 64-bit
    mvhd/tkhd variants so both version branches of the walker are
    golden-tested, not just fuzzed."""
    import struct

    def u32(n):
        return struct.pack(">I", n)

    def box(btype, body):
        return u32(8 + len(body)) + btype + body

    dur = dur_ms * timescale // 1000
    if v1:
        mvhd = box(b"mvhd", b"\x01\0\0\0" + b"\0" * 16 + u32(timescale)
                   + struct.pack(">Q", dur) + b"\0" * 80)
        tk_pre = b"\x01\0\0\0" + b"\0" * 16 + u32(1) + u32(0) \
            + struct.pack(">Q", dur)
    else:
        mvhd = box(b"mvhd", b"\0" * 12 + u32(timescale) + u32(dur)
                   + b"\0" * 80)
        tk_pre = b"\0" * 4 + b"\0" * 8 + u32(1) + u32(0) + u32(dur)

    def trak(wf, hf, tag):
        tkhd = box(b"tkhd", tk_pre + b"\0" * 16 + b"\0" * 36
                   + u32(wf * 65536) + u32(hf * 65536))
        hdlr = box(b"hdlr", b"\0" * 8 + tag + b"\0" * 12 + b"\0")
        return box(b"trak", tkhd + box(b"mdia", hdlr))

    moov = box(b"moov", mvhd + trak(w, h, b"vide")
               + b"".join(trak(0, 0, b"soun") for _ in range(n_audio)))
    return (box(b"ftyp", brand + u32(0x200)) + moov
            + box(b"mdat", b"\0" * mdat))


def test_mediacodec_mp4_goldens():
    """ISO-BMFF census goldens: both mvhd/tkhd version branches,
    non-trivial timescale arithmetic, multi-audio track inventory,
    and the honest-refusal/poison contract (no ftyp -> UnknownMedia;
    truncated or size-corrupt boxes -> ValueError, never IndexError)."""
    import random
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    for v1 in (False, True):
        c = mc.mp4_box_census(_mp4(dur_ms=1250, w=64, h=48, n_audio=2,
                                   mdat=12, v1=v1))
        assert c == {
            "major_brand": "isom", "n_tracks": 3, "n_video_tracks": 1,
            "n_audio_tracks": 2, "duration_ms": 1250, "width": 64,
            "height": 48, "mdat_bytes": 12,
        }
    # 90000 Hz MPEG timescale: duration_ms comes from dur/timescale
    c = mc.mp4_box_census(_mp4(dur_ms=2000, timescale=90000, n_audio=0))
    assert (c["duration_ms"], c["n_tracks"], c["n_audio_tracks"]) \
        == (2000, 1, 0)
    assert mc.mp4_box_census(_mp4(brand=b"qt  "))["major_brand"] == "qt  "

    with pytest.raises(NotImplementedError):
        mc.mp4_box_census(b"\x89PNG\r\n\x1a\n" + b"\0" * 32)  # not BMFF
    with pytest.raises(ValueError):
        mc.mp4_box_census(_mp4()[:40])  # truncated mid-moov
    bad = bytearray(_mp4())
    bad[16:20] = struct.pack(">I", 3)  # moov size < header
    with pytest.raises(ValueError):
        mc.mp4_box_census(bytes(bad))
    no_moov = _mp4()[:16] + _mp4()[-20:]  # ftyp + mdat only
    with pytest.raises(ValueError):
        mc.mp4_box_census(no_moov)

    # seeded fuzz: ftyp-prefixed garbage + truncations/bitflips of a
    # valid payload may refuse only via the batch-loop catch tuple
    rng = random.Random(99)
    valid = _mp4(n_audio=1)
    for _ in range(4000):
        mode = rng.random()
        if mode < 0.4:
            p = valid[:8] + bytes(rng.getrandbits(8)
                                  for _ in range(rng.randint(0, 80)))
        elif mode < 0.7:
            p = valid[: rng.randint(0, len(valid))]
        else:
            b = bytearray(valid)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] = rng.getrandbits(8)
            p = bytes(b)
        try:
            mc.mp4_box_census(p)
        except (NotImplementedError, ValueError, struct.error):
            pass


def test_video_container_census(spark):
    """Wrapper gate: well-formed MP4s yield one census row each with
    exact fields; non-BMFF and poisoned payloads contribute no rows
    and kill nothing (the exploding-op convention)."""
    from rust_dms_cdc_operator_spark.functions import multimodal as mm

    rows = [
        (0, _mp4(dur_ms=750, w=32, h=16, n_audio=0, mdat=5),
         {"kind": "video", "n_bytes": 0}),
        (1, _mp4(dur_ms=1500, w=128, h=96, n_audio=1, mdat=40, v1=True),
         {"kind": "video", "n_bytes": 0}),
        (2, b"GIF89a" + b"\0" * 30, {"kind": "image", "n_bytes": 0}),
        (3, _mp4()[:33], {"kind": "video", "n_bytes": 0}),
        (4, None, {"kind": "video", "n_bytes": 0}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict()
           for r in mm.video_container_census(media).collect()}
    assert sorted(got) == [0, 1]
    assert got[0]["duration_ms"] == 750 and got[0]["width"] == 32 \
        and got[0]["n_audio_tracks"] == 0 and got[0]["mdat_bytes"] == 5
    assert got[1]["height"] == 96 and got[1]["n_tracks"] == 2 \
        and got[1]["n_video_tracks"] == 1


def _mkv(dur=1500.0, scale=1_000_000, w=320, h=240, n_audio=1,
         void=5, doctype=b"matroska", f32=False, with_scale=True):
    """Python-side Matroska builder (independent of the JVM synth in
    q_mm_mkv_census): EBML header + Segment{Info, Tracks, Void}."""
    import struct

    def elem(eid_hex, body):
        assert len(body) < 127
        return bytes.fromhex(eid_hex) + bytes([0x80 | len(body)]) + body

    def elem2(eid_hex, body):  # 2-byte size varint
        return bytes.fromhex(eid_hex) \
            + (0x4000 | len(body)).to_bytes(2, "big") + body

    hdr = elem("1A45DFA3", elem("4282", doctype))
    info_kids = b""
    if with_scale:
        info_kids += elem("2AD7B1", scale.to_bytes(4, "big"))
    info_kids += elem("4489", struct.pack(">f" if f32 else ">d", dur))
    info = elem("1549A966", info_kids)
    vid = elem("E0", elem("B0", w.to_bytes(2, "big"))
               + elem("BA", h.to_bytes(2, "big")))
    te_v = elem("AE", elem("83", b"\x01") + vid)
    te_a = elem("AE", elem("83", b"\x02"))
    tracks = elem2("1654AE6B", te_v + te_a * n_audio)
    pad = elem("EC", b"\x00" * void)
    return hdr + elem2("18538067", info + tracks + pad)


def test_mediacodec_mkv_goldens():
    """EBML census goldens: double and float Duration encodings,
    TimestampScale default when Info omits it, webm DocType,
    multi-audio inventory, and the refusal contract (non-EBML magic
    -> UnknownMedia; truncation / unknown-size elements -> ValueError,
    never IndexError)."""
    import random
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    c = mc.mkv_census(_mkv(dur=1500.0, w=320, h=240, n_audio=2, void=7))
    assert c == {
        "doc_type": "matroska", "n_tracks": 3, "n_video_tracks": 1,
        "n_audio_tracks": 2, "duration_ms": 1500, "width": 320,
        "height": 240, "void_bytes": 7,
    }
    # 4-byte float Duration and a 1-ns TimestampScale
    c = mc.mkv_census(_mkv(dur=2_000_000_000.0, scale=1, f32=True,
                           n_audio=0))
    assert (c["duration_ms"], c["n_audio_tracks"]) == (2000, 0)
    # Info without TimestampScale: EBML default 1e6 ns applies
    c = mc.mkv_census(_mkv(dur=250.0, with_scale=False))
    assert c["duration_ms"] == 250
    assert mc.mkv_census(_mkv(doctype=b"webm"))["doc_type"] == "webm"

    with pytest.raises(NotImplementedError):
        mc.mkv_census(b"\x89PNG\r\n\x1a\n" + b"\0" * 32)
    with pytest.raises(ValueError):
        mc.mkv_census(_mkv()[:30])  # truncated mid-Info
    # unknown-size Segment (streamed Matroska): honest refusal
    seg = _mkv()
    idx = seg.index(bytes.fromhex("18538067")) + 4
    unk = bytearray(seg)
    unk[idx:idx + 2] = b"\x7f\xff"  # 2-byte all-ones size = unknown
    with pytest.raises(ValueError):
        mc.mkv_census(bytes(unk))

    rng = random.Random(99)
    valid = _mkv(n_audio=1)
    for _ in range(4000):
        mode = rng.random()
        if mode < 0.4:
            p = valid[:5] + bytes(rng.getrandbits(8)
                                  for _ in range(rng.randint(0, 80)))
        elif mode < 0.7:
            p = valid[: rng.randint(0, len(valid))]
        else:
            b = bytearray(valid)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] = rng.getrandbits(8)
            p = bytes(b)
        try:
            mc.mkv_census(p)
        except (NotImplementedError, ValueError, struct.error):
            pass


def test_mkv_container_census(spark):
    """Wrapper gate: well-formed Matroska payloads yield one census
    row each; non-EBML and poisoned payloads contribute no rows and
    kill nothing (the exploding-op convention)."""
    from rust_dms_cdc_operator_spark.functions import multimodal as mm

    rows = [
        (0, _mkv(dur=750.0, w=32, h=16, n_audio=0, void=3),
         {"kind": "video", "n_bytes": 0}),
        (1, _mkv(dur=1500.0, w=128, h=96, n_audio=2, void=0,
                 doctype=b"webm"),
         {"kind": "video", "n_bytes": 0}),
        (2, b"GIF89a" + b"\0" * 30, {"kind": "image", "n_bytes": 0}),
        (3, _mkv()[:25], {"kind": "video", "n_bytes": 0}),
        (4, None, {"kind": "video", "n_bytes": 0}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict()
           for r in mm.mkv_container_census(media).collect()}
    assert sorted(got) == [0, 1]
    assert got[0]["duration_ms"] == 750 and got[0]["width"] == 32 \
        and got[0]["n_audio_tracks"] == 0 and got[0]["void_bytes"] == 3
    assert got[1]["doc_type"] == "webm" and got[1]["n_tracks"] == 3 \
        and got[1]["height"] == 96


def _flac(sr=44100, ch=2, bps=16, total=132300, pad=None):
    """Python-side FLAC builder (independent of the JVM bit-packing
    in q_mm_decode_flac)."""
    packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    si = (b"\x10\x00\x10\x00" + b"\x00" * 6
          + packed.to_bytes(8, "big") + b"\x00" * 16)
    out = b"fLaC"
    if pad is None:
        out += b"\x80\x00\x00\x22" + si
    else:
        out += b"\x00\x00\x00\x22" + si
        out += b"\x81" + len(pad).to_bytes(3, "big") + pad
    return out


def test_mediacodec_flac_goldens():
    """FLAC STREAMINFO goldens: bit-field unpacking, last-block walk
    over a trailing PADDING block, and the refusal contract (non-FLAC
    magic -> UnknownMedia; truncation / zero rate / missing
    STREAMINFO -> ValueError, never IndexError)."""
    import random
    import struct

    import pytest

    from rust_dms_cdc_operator_spark.functions import mediacodec as mc

    c = mc.parse_flac(_flac(sr=48000, ch=1, bps=24, total=96000))
    assert (c["codec"], c["channels"], c["sample_rate_hz"],
            c["n_samples"], c["duration_ms"]) \
        == ("flac", 1, 48000, 96000, 2000)
    c = mc.parse_flac(_flac(pad=b"\x00" * 9))
    assert (c["channels"], c["duration_ms"]) == (2, 3000)
    # decode() dispatches on the fLaC magic
    assert mc.decode(_flac())["codec"] == "flac"

    with pytest.raises(NotImplementedError):
        mc.parse_flac(b"OggS" + b"\0" * 40)
    with pytest.raises(ValueError):
        mc.parse_flac(_flac()[:20])  # truncated mid-STREAMINFO
    with pytest.raises(ValueError):
        mc.parse_flac(_flac(sr=0))  # zero sample rate
    no_si = b"fLaC" + b"\x81\x00\x00\x02" + b"\x00\x00"  # padding only
    with pytest.raises(ValueError):
        mc.parse_flac(no_si)

    rng = random.Random(99)
    valid = _flac(pad=b"\x00" * 4)
    for _ in range(4000):
        mode = rng.random()
        if mode < 0.4:
            p = valid[:4] + bytes(rng.getrandbits(8)
                                  for _ in range(rng.randint(0, 60)))
        elif mode < 0.7:
            p = valid[: rng.randint(0, len(valid))]
        else:
            b = bytearray(valid)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] = rng.getrandbits(8)
            p = bytes(b)
        try:
            mc.parse_flac(p)
        except (NotImplementedError, ValueError, struct.error):
            pass


def _brute_dup_spans(docs, window=5, min_occ=2):
    """Brute-force maximal duplicated-span census: count every window
    occurrence corpus-wide on RAW strings (no hashing), merge seed
    starts per doc when they differ by <= window."""
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for i, text in docs:
        ws = text.split(" ")
        gs = [
            " ".join(ws[p : p + window])
            for p in range(len(ws) - window + 1)
        ]
        per_doc[i] = (len(ws), gs)
        grams.update(gs)
    out = {}
    for i, (n_words, gs) in per_doc.items():
        seeds = [p for p, g in enumerate(gs) if grams[g] >= min_occ]
        if not seeds:
            continue
        spans = []
        start = prev = seeds[0]
        cnt = 1
        for p in seeds[1:]:
            if p - prev <= window:
                prev = p
                cnt += 1
            else:
                spans.append((prev - start + window, cnt))
                start = prev = p
                cnt = 1
        spans.append((prev - start + window, cnt))
        out[i] = (
            len(seeds),
            len(spans),
            sum(s for s, _ in spans),
            n_words,
        )
    return out


def test_dup_span_census_equals_brute_force(spark):
    """Exactness of the span census vs an all-in-memory reference on
    a seeded corpus with: an identical pair, a doc embedding another
    doc's text mid-stream (the quote shape), internal self-repetition
    (within-doc duplication counts, Lee et al. semantics), and clean
    docs that must be ABSENT from the census."""
    import random

    from rust_dms_cdc_operator_spark.operators.dedup import dup_span_census

    rng = random.Random(77)
    vocab = [f"t{i}" for i in range(40)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))  # noqa: E731
    boiler = mk(8)
    docs = [
        (0, mk(30)),
        (1, mk(25)),
        (2, f"{mk(6)} {boiler} {mk(7)}"),   # shares boiler with 3
        (3, f"{boiler} {mk(12)}"),
        (4, " ".join([mk(6)] * 1)),          # clean short doc
        (5, "a b c"),                        # below window floor
    ]
    docs.append((6, docs[0][1]))             # identical dup of doc 0
    rep = mk(7)
    docs.append((7, f"{rep} {mk(6)} {rep}"))  # internal repetition
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_dup_seeds, r.n_spans, r.dup_words, r.n_words)
        for r in dup_span_census(df, "doc_id", "text", window=5).collect()
    }
    assert got == _brute_dup_spans(docs, window=5)
    assert 4 not in got and 5 not in got


def test_dup_span_census_full_doc_dup_covers_everything(spark):
    """Two identical docs: ONE maximal span each covering every word
    (the merge must not fragment a contiguous duplicated region)."""
    from rust_dms_cdc_operator_spark.operators.dedup import dup_span_census

    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = dup_span_census(df, "doc_id", "text", window=5).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r.n_spans, r.dup_words, r.n_words, r.n_dup_seeds) == (
            1, 20, 20, 16,
        )


def test_prefix_rs_join_equals_brute_force(spark):
    """Completeness + exactness of the cross-collection prefix join:
    equals the all-pairs brute force (set equality) on a seeded
    corpus, including ids that APPEAR IN BOTH collections (the
    side-tagged internal key must keep them apart)."""
    import random

    from rust_dms_cdc_operator_spark.operators.dedup import (
        hex_to_long as _h2l,  # noqa: F401  (parity with engine hashing)
        prefix_jaccard_join_rs,
    )

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda ws: " ".join(ws)  # noqa: E731
    left, right = [], []
    for i in range(25):
        base = rng.sample(vocab, rng.randint(4, 12))
        left.append((i, mk(base)))
        if rng.random() < 0.7:
            v = list(base)
            if rng.random() < 0.5:
                v[rng.randrange(len(v))] = rng.choice(vocab)
            right.append((i if rng.random() < 0.3 else 500 + i, mk(v)))
    right.append((left[0][0], left[0][1]))  # identical, same id both sides
    ldf = spark.createDataFrame(left, "doc_id long, text string")
    rdf = spark.createDataFrame(right, "doc_id long, text string")

    def shingles(text, n=3):
        ws = text.split(" ")
        if len(ws) < n:
            return frozenset([text])
        return frozenset(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    for t, num, den in ((0.8, 4, 5), (0.5, 1, 2)):
        want = set()
        for li, lt in left:
            for ri, rt in right:
                A, B = shingles(lt), shingles(rt)
                inter = len(A & B)
                union = len(A | B)
                if inter * den >= union * num:
                    want.add((li, ri, inter, union))
        got = {
            (r.id_l, r.id_r, r.inter_size, r.union_size)
            for r in prefix_jaccard_join_rs(
                ldf, rdf, min_jaccard=t, hash_shingles=False
            ).collect()
        }
        assert got == want, (t, got ^ want)
    spark.catalog.clearCache()


def test_ivf_knn_density_plants_outlier_first(spark):
    """A planted far-away vector in a tight cluster must rank as the
    worst-density outlier; result is layout-independent; neighbor
    counts are capped at k."""
    import random

    from rust_dms_cdc_operator_spark.operators.similarity import (
        ivf_knn_density,
        train_ivf_centroids,
    )

    rng = random.Random(5)
    rows = []
    for i in range(1, 60):
        base = [1.0, 0.0, 0.0, 0.0]
        rows.append(
            (i, [x + rng.uniform(-0.05, 0.05) for x in base])
        )
    rows.append((999, [0.0, 0.0, 0.0, 1.0]))  # the outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, "embedding", n_lists=4, seed=42)
    out = ivf_knn_density(df, cents, k=5, nprobe=2, top_n=10)
    got = out.collect()
    assert got[0].vec_id == 999
    assert all(r.n_neighbors <= 5 for r in got)
    # layout independence: same rows, different partitioning
    got2 = ivf_knn_density(
        df.repartition(7), cents, k=5, nprobe=2, top_n=10
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in got2]


def test_sorted_neighborhood_equals_brute_force(spark):
    """SNM candidates are exactly the window-3 successor pairs of the
    (text, id) sort order, each with exact shingle Jaccard — verified
    against an in-memory replay, on a corpus where near-identical
    template docs sort adjacently."""
    docs = []
    for i in range(40):
        t = i % 7
        docs.append(
            (i, f"template {t} body word{i % 3} filler common tail piece")
        )
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)

    from rust_dms_cdc_operator_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    def sh(text, n=3):
        ws = text.split(" ")
        if len(ws) < n:
            return frozenset([text])
        return frozenset(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    order = sorted(docs, key=lambda d: (d[1], d[0]))
    want = set()
    for i, (ida, ta) in enumerate(order):
        for j in range(i + 1, min(i + 4, len(order))):
            idb, tb = order[j]
            A, B = sh(ta), sh(tb)
            want.add((ida, idb, len(A & B), len(A | B)))
    got = {
        (r.id_a, r.id_b, r.inter_size, r.union_size)
        for r in sorted_neighborhood_pairs(
            df, window=3, hash_shingles=False
        ).collect()
    }
    assert got == want
    # same-template docs are adjacent in sort order => perfect-overlap
    # pairs must be present
    assert any(i == u for _, _, i, u in got)
    spark.catalog.clearCache()


def test_jl_rerank_recall_and_determinism(spark):
    """JL shortlist+rerank: on a corpus where the true top-10 are
    well-separated (a planted near-duplicate cluster of the query),
    recall@10 through the 3x shortlist must be perfect; the result is
    layout-independent; and the projection matrix is a pure function
    of the seed."""
    import random

    from rust_dms_cdc_operator_spark.operators.similarity import (
        jl_matrix,
        jl_rerank_topk,
    )

    assert jl_matrix(4, 8) == jl_matrix(4, 8)
    assert jl_matrix(4, 8, "a") != jl_matrix(4, 8, "b")

    rng = random.Random(11)
    q = [rng.uniform(-1, 1) for _ in range(16)]
    rows = []
    for i in range(1, 11):  # planted: tiny perturbations of q
        rows.append((i, [x + rng.uniform(-0.01, 0.01) for x in q]))
    for i in range(11, 200):  # background noise
        rows.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = jl_rerank_topk(df, q, k_proj=8, k=10, shortlist=30)
    got = out.collect()
    assert {r.vec_id for r in got} == set(range(1, 11))
    assert all(r.in_exact_topk for r in got)
    got2 = jl_rerank_topk(
        df.repartition(9), q, k_proj=8, k=10, shortlist=30
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in got2]


def test_cdc_chunk_census_resync_property(spark):
    """The content-defined property itself: inserting words at the
    FRONT of a long doc leaves the chunk stream identical after the
    first hash-selected boundary — the edited copy and the original
    share almost all chunks (fixed segmentation would share none past
    the edit). Plus exact-copy sanity: two identical docs have every
    chunk duplicated."""
    import random

    from rust_dms_cdc_operator_spark.operators.dedup import cdc_chunk_census

    rng = random.Random(3)
    body = " ".join(f"w{rng.randrange(500)}" for _ in range(400))
    docs = [
        (1, body),
        (2, "inserted preamble " + body),   # front edit
        (3, body),                           # exact copy of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in cdc_chunk_census(df, gram=4, modulus=16).collect()
    }
    # exact copies: everything duplicated
    assert got[1].n_dup_chunks == got[1].n_chunks
    assert got[3].n_dup_chunks == got[3].n_chunks
    assert got[1].dup_words == got[1].n_words == 400
    # front-edited copy: all but the first chunk(s) resynchronize —
    # the overwhelming majority of its words still dedup
    assert got[2].dup_words >= got[2].n_words - 3 * 16 - 2
    assert got[2].n_dup_chunks >= got[2].n_chunks - 2


def test_cdc_chunk_census_no_cuts_single_chunk(spark):
    """A doc too short for any gram window is one whole-doc chunk;
    unique docs report zero duplicated chunks."""
    from rust_dms_cdc_operator_spark.operators.dedup import cdc_chunk_census

    df = spark.createDataFrame(
        [(1, "a b"), (2, "totally unique text right here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cdc_chunk_census(df).collect()}
    assert got[1].n_chunks == 1 and got[1].n_dup_chunks == 0
    assert got[2].n_dup_chunks == 0
    assert got[1].n_words == 2


def test_theilsen_robust_to_outlier_day(spark):
    """Theil-Sen vs OLS on a series with one anomalous day: the
    median-of-slopes must stay at the true slope while OLS is
    dragged; even pair counts take the LOWER median (deterministic
    order-statistic, no interpolation)."""
    import datetime as dt

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_daily_trend,
        q_events_theilsen_trend,
    )

    # build a tiny events table: type 'a' counts 10,20,30,40,1000,60
    # (one spike day), perfect slope 10/day otherwise
    rows = []
    eid = 0
    for d, n in enumerate([10, 20, 30, 40, 1000, 60]):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + d, 12, 0, 0), 1, "a", 0.0,
                 "{}")
            )
    import tempfile

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="theilsen_")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    ts = {
        r.event_type: r.slope_med
        for r in q_events_theilsen_trend(spark, tmp).collect()
    }
    ols = {
        r.event_type: r.slope
        for r in q_events_daily_trend(spark, tmp).collect()
    }
    assert abs(ts["a"] - 10.0) <= 3.4  # within the clean-slope range
    assert ols["a"] > 50  # OLS dragged far away by the spike


def test_rrf_hybrid_fusion_semantics(spark):
    """RRF at sf0.001: every returned row's score equals
    1/(60+r_bm25) + 1/(60+r_cos) with nulls contributing 0; a doc
    present in BOTH rankings outranks one at the same position in
    only one ranking."""
    from rust_dms_cdc_operator_spark.inventory_llm import q_docs_rrf_hybrid

    rows = q_docs_rrf_hybrid(spark, "/root/testdata/sf0.001").collect()
    assert rows and len(rows) <= 10
    for r in rows:
        want = 0.0
        if r.r_bm25 is not None:
            want += 1.0 / (60 + r.r_bm25)
        if r.r_cos is not None:
            want += 1.0 / (60 + r.r_cos)
        assert abs(r.rrf_score - round(want, 8)) < 1e-12
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    spark.catalog.clearCache()


def _gradient_ppm(a, b, c, w=18, h=16):
    head = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            g = (a * x + b * y + a * b * x * y) % 251 + c
            px += bytes([g, g, g])
    return head + bytes(px)


def test_dhash64_invariances():
    """dHash: invariant under uniform brightness shift AND under
    2x upscale (the NN resize path normalizes resolution); different
    gradients produce different hashes; P5 graymaps hash like their
    P6 expansion (luminance of r=g=b equals the gray sample)."""
    from rust_dms_cdc_operator_spark.functions.mediacodec import (
        dhash64,
        resize_netpbm,
    )

    base = _gradient_ppm(40, 53, 0)
    assert dhash64(base) == dhash64(_gradient_ppm(40, 53, 2))
    assert dhash64(base) != dhash64(_gradient_ppm(87, 111, 0))
    up = resize_netpbm(base, 36, 32)
    assert dhash64(up) == dhash64(base)
    # P5 form of the same gray grid
    head = b"P5\n18 16\n255\n"
    px = bytes(
        (40 * x + 53 * y + 40 * 53 * x * y) % 251
        for y in range(16)
        for x in range(18)
    )
    assert dhash64(head + px) == dhash64(base)


def test_hamming_pairs_from_signatures_signed_full64(spark):
    """The generic banding is complete to the FULL signed 64-bit
    range: pairs within distance 3 (including signatures with the
    sign bit set) equal the brute-force popcount census; pairs at
    distance >= 4 that share no band are (correctly) absent."""
    import random

    from rust_dms_cdc_operator_spark.operators.dedup import (
        hamming_pairs_from_signatures,
    )

    rng = random.Random(8)
    sigs = []
    base = rng.getrandbits(64)
    for i in range(40):
        s = base
        for _ in range(rng.randint(0, 5)):
            s ^= 1 << rng.randrange(64)
        sigs.append((i, s - (1 << 64) if s >= 1 << 63 else s))
    df = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_pairs_from_signatures(
            df, "doc_id", "simhash", bits=64, bands=4, max_distance=3
        ).collect()
    }
    want = set()
    for i, si in sigs:
        for j, sj in sigs:
            if i < j:
                d = bin((si ^ sj) & ((1 << 64) - 1)).count("1")
                if d <= 3:
                    want.add((i, j, d))
    assert got == want
    spark.catalog.clearCache()


def test_dup_span_remove_consistency_with_census(spark):
    """Removal accounting is consistent with the census: for every
    doc the census reports, n_removed >= its dup_words... actually
    EQUAL for the all-copies policy on docs whose spans are mutual
    copies; clean docs lose nothing; a fully-duplicated doc goes
    NULL."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        dup_span_census,
        dup_span_remove,
    )

    text = " ".join(f"w{i}" for i in range(20))
    docs = [
        (1, text),
        (2, text),                          # full dup of 1
        (3, "totally different words entirely here now okay fine"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    removed = {r.doc_id: r for r in dup_span_remove(df).collect()}
    census = {r.doc_id: r for r in dup_span_census(df).collect()}
    assert removed[1].clean_text is None and removed[1].n_removed == 20
    assert removed[2].clean_text is None
    assert removed[3].n_removed == 0
    assert removed[3].clean_text == docs[2][1]
    assert census[1].dup_words == removed[1].n_removed
    assert 3 not in census


def test_mad_anomalies_resist_masking(spark):
    """The robust detector's reason to exist: TWO huge outlier hours
    inflate sigma enough that the z-score test (z > 2) can miss a
    moderate anomaly, while median/MAD still flags all three; a
    clean constant series flags nothing."""
    import datetime as dt
    import tempfile

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_mad_anomalies,
    )

    rows, eid = [], 0
    # type 'a': 20 calm hours of 10 events, 2 huge spikes, 1 moderate
    counts = [10] * 20 + [500, 480, 60]
    for h, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + h // 24, h % 24, 30, 0),
                 1, "a", 0.0, "{}")
            )
    # type 'b': constant series — nothing flagged
    for h in range(10):
        for _ in range(7):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 2, 1, h, 30, 0), 2, "b", 0.0,
                 "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="mad_")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    got = q_events_mad_anomalies(spark, tmp).collect()
    flagged = {(r.event_type, r.cnt) for r in got}
    assert ("a", 500) in flagged and ("a", 480) in flagged
    assert ("a", 60) in flagged          # the one sigma-masking hides
    assert not any(t == "b" for t, _ in flagged)


def test_attribution_last_touch_semantics(spark):
    """Hand-built stream: purchase credits the latest PRECEDING
    non-purchase touch of the same user only; a purchase-first user
    lands in '(none)'; values sum exactly in millis."""
    import datetime as dt
    import tempfile

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_attribution,
    )

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    s = dt.timedelta(minutes=1)
    rows = [
        # user 1: view -> click -> purchase(2.5) => click
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + s, 1, "click", 0.0, "{}"),
        (3, t0 + 2 * s, 1, "purchase", 2.5, "{}"),
        # user 1 again: purchase(1.0) right after => its own last
        # touch is still 'click' (purchases never count as touches)
        (4, t0 + 3 * s, 1, "purchase", 1.0, "{}"),
        # user 2: purchase with no prior events => (none)
        (5, t0, 2, "purchase", 4.0, "{}"),
        # user 3: view AFTER the purchase must not attribute
        (6, t0 + s, 3, "purchase", 8.0, "{}"),
        (7, t0 + 2 * s, 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp(prefix="attr_")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    got = {
        r.channel: (r.n_purchases, r.value_milli)
        for r in q_events_attribution(spark, tmp).collect()
    }
    assert got == {"click": (2, 3500), "(none)": (2, 12000)}


def _write_sf(spark, prefix, **tables):
    """Write keyword tables to a tmp sf_dir layout and return the dir."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix=prefix)
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{tmp}/{name}.parquet"
        )
    return tmp


def test_token_budget_select_greedy_boundary(spark):
    """Selection admits docs in density order and stops BEFORE the doc
    that would push the running total past floor(total/2)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_token_budget_select,
    )

    # one source; densities: d0=1.0 (4 tok), d1=0.75 (4 tok), d2=0.5 (4 tok)
    # total=12, budget=6 -> admit d0 (cum 4); d1 would hit 8 > 6 -> only d0
    docs = [
        (0, "a b c d", "en", "s0", 7),
        (1, "a a b c", "en", "s0", 7),
        (2, "a a b b", "en", "s0", 7),
    ]
    tmp = _write_sf(
        spark, "budget_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    got = q_docs_token_budget_select(spark, tmp).collect()
    assert [(r.doc_id, r.cum_tokens) for r in got] == [(0, 4)]


def test_backoff_crossppl_branches(spark):
    """Each backoff branch fires on the right evidence: seen trigram
    -> c3/c2; unseen trigram with seen (w2,w3) bigram -> 0.4*c2b/c1;
    fully unseen -> OOV floor. n_unseen counts backed-off positions."""
    import math

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_backoff_crossppl,
    )

    # train (doc 0, even): "a b c d"  => trigrams: abc, bcd
    #   bigrams: ab, bc, cd ; unigrams a,b,c,d (total=4)
    # held (doc 1, odd): "a b c x b c d"
    #   positions: abc (seen: 1/1), bcx (unseen tri, bigram 'c x' unseen,
    #   w3=x unseen -> 0.16*1/4), cxb (unseen, 'x b' unseen -> 0.16*1/4),
    #   xbc (unseen tri, 'b c' SEEN -> 0.4*1/1), bcd (seen: 1/1)
    docs = [
        (0, "a b c d", "en", "s0", 7),
        (1, "a b c x b c d", "en", "s0", 13),
    ]
    tmp = _write_sf(
        spark, "backoff_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    [r] = q_docs_backoff_crossppl(spark, tmp).collect()
    assert (r.doc_id, r.n_trigrams, r.n_unseen) == (1, 5, 3)
    expect = -(
        math.log(1.0) + math.log(0.16 * 1 / 4) + math.log(0.16 * 1 / 4)
        + math.log(0.4 * 1 / 1) + math.log(1.0)
    ) / 5
    assert abs(r.log_ppl3 - round(expect, 6)) < 1e-9


def test_exact_quantiles_match_sorted_values(spark):
    """Global-rank quantiles equal the nearest-rank picks from the
    fully sorted value list."""
    import math

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_exact_quantiles,
    )

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    vals = [float(v) for v in range(1, 101)]  # 1..100
    rows = [
        (i, t0, i, "click", v, "{}") for i, v in enumerate(vals)
    ]
    tmp = _write_sf(
        spark, "exq_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    got = {r.quantile: r.value_milli for r in
           q_events_exact_quantiles(spark, tmp).collect()}
    srt = sorted(round(v * 1000) for v in vals)
    n = len(srt)
    assert got == {
        "p50": srt[math.ceil(0.50 * n) - 1],
        "p95": srt[math.ceil(0.95 * n) - 1],
        "p99": srt[math.ceil(0.99 * n) - 1],
    }


def test_gini_known_distributions(spark):
    """Equal order values -> G = 0; a single dominant order drives G
    toward (n-1)/n under the rank formula."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_orders_revenue_gini,
    )

    import datetime as dt
    t0 = dt.datetime(1996, 1, 1)
    # segment EQ: 4 equal orders. segment SKEW: 9 x 1.0 + 1 x 1e6
    orders, custs = [], []
    ok = 0
    for seg, prices in (("EQ", [50.0] * 4),
                        ("SKEW", [1.0] * 9 + [1_000_000.0])):
        ck = len(custs) + 1
        custs.append((ck, f"c{ck}", 0, 0.0, seg))
        for p in prices:
            ok += 1
            orders.append((ok, ck, "O", p, t0, "1-URGENT", "c", 0, "x"))
    tmp = _write_sf(
        spark, "gini_",
        orders=(orders, "o_orderkey long, o_custkey long, o_orderstatus "
                        "string, o_totalprice double, o_orderdate timestamp,"
                        " o_orderpriority string, o_clerk string, "
                        "o_shippriority int, o_comment string"),
        customer=(custs, "c_custkey long, c_name string, c_nationkey long, "
                         "c_acctbal double, c_mktsegment string"),
    )
    got = {r.c_mktsegment: r.gini for r in
           q_orders_revenue_gini(spark, tmp).collect()}
    assert got["EQ"] == 0.0
    # exact rank-formula value for the skewed segment
    xs = sorted([1.0] * 9 + [1_000_000.0])
    n, s = len(xs), sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    assert abs(got["SKEW"] - round((2 * s1 - (n + 1) * s) / (n * s), 6)) < 1e-9


def test_stats_pruning_layout_contrast(spark):
    """Date-sorted files prune outside the window; the key-sorted
    layout of the SAME rows scans everything (dates interleave into
    every file)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_orders_stats_pruning,
    )

    import datetime as dt
    # 3000 orders over 3 months; o_orderkey assigned so that key order
    # interleaves the months (key % 3 picks the month)
    rows = []
    for k in range(1, 3001):
        month = (k % 3) + 1  # 1..3
        rows.append(
            (k, 1, "O", 10.0, dt.datetime(1996, month, 1 + (k % 27)),
             "1-URGENT", "c", 0, "x")
        )
    tmp = _write_sf(
        spark, "prune_",
        orders=(rows, "o_orderkey long, o_custkey long, o_orderstatus "
                      "string, o_totalprice double, o_orderdate timestamp, "
                      "o_orderpriority string, o_clerk string, "
                      "o_shippriority int, o_comment string"),
    )
    got = {r.layout: (r.n_files, r.files_pruned, r.rows_scanned)
           for r in q_orders_stats_pruning(spark, tmp).collect()}
    # 3000 rows -> 3 files per layout. March window: date-sorted layout
    # isolates March in its own file(s); key-sorted interleaves all
    # months into every file -> zero pruning, full scan.
    assert got["date_sorted"][0] == 3 and got["key_sorted"][0] == 3
    assert got["date_sorted"][1] >= 1
    assert got["date_sorted"][2] < 3000
    assert got["key_sorted"][1] == 0 and got["key_sorted"][2] == 3000


def test_ngram_novelty_exact_copy_scores_zero(spark):
    """A verbatim copy of an earlier doc has novelty 0; the original
    keeps 1.0; a half-new doc sits strictly between."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_ngram_novelty,
    )

    docs = [
        (0, "a b c d e", "en", "s0", 9),
        (1, "a b c d e", "en", "s0", 9),          # exact copy
        (2, "a b c x y z w", "en", "s0", 13),     # 1 of 5 trigrams seen
    ]
    tmp = _write_sf(
        spark, "novel_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    got = {r.doc_id: (r.n_trigrams, r.n_novel)
           for r in q_docs_ngram_novelty(spark, tmp).collect()}
    assert got[0] == (3, 3)
    assert got[1] == (3, 0)
    assert got[2] == (5, 4)


def test_cumulative_uniques_returning_users_not_recounted(spark):
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_cumulative_uniques,
    )

    import datetime as dt
    d1, d2, d3 = (dt.datetime(2024, 1, i, 10) for i in (1, 2, 3))
    rows = [
        (1, d1, 1, "click", 0.0, "{}"),
        (2, d1, 2, "click", 0.0, "{}"),
        (3, d2, 1, "click", 0.0, "{}"),   # returning: not new on day 2
        (4, d2, 3, "click", 0.0, "{}"),
        (5, d3, 1, "click", 0.0, "{}"),   # returning again
    ]
    tmp = _write_sf(
        spark, "cumu_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    got = [(str(r.first_day), r.new_users, r.cum_users)
           for r in q_events_cumulative_uniques(spark, tmp)
           .orderBy("first_day").collect()]
    assert got == [("2024-01-01", 2, 2), ("2024-01-02", 1, 3)]


def test_state_validity_flags_only_declared_violations(spark):
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_state_validity,
    )

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: error -> purchase (violation) then purchase -> view (ok)
        (1, t0, 1, "error", 0.0, "{}"),
        (2, t0 + s, 1, "purchase", 0.0, "{}"),
        (3, t0 + 2 * s, 1, "view", 0.0, "{}"),
        # user 2: signup -> signup (violation)
        (4, t0, 2, "signup", 0.0, "{}"),
        (5, t0 + s, 2, "signup", 0.0, "{}"),
        # user 3: clean funnel
        (6, t0, 3, "view", 0.0, "{}"),
        (7, t0 + s, 3, "click", 0.0, "{}"),
        (8, t0 + 2 * s, 3, "purchase", 0.0, "{}"),
    ]
    tmp = _write_sf(
        spark, "valid_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    got = {r.user_id: (r.n_transitions, r.n_invalid)
           for r in q_events_state_validity(spark, tmp).collect()}
    assert got == {1: (2, 1), 2: (1, 1)}


def test_centroid_drift_identical_and_orthogonal_labels(spark):
    """Two labels with identical member vectors -> centroid cosine 1;
    orthogonal labels -> 0."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_sim_centroid_drift,
    )

    ex = [1.0] + [0.0] * 63
    ey = [0.0, 1.0] + [0.0] * 62
    rows = [
        (1, ex, 0), (2, ex, 0),
        (3, ex, 1), (4, ex, 1),      # label 1 identical to label 0
        (5, ey, 2), (6, ey, 2),      # label 2 orthogonal
    ]
    tmp = _write_sf(
        spark, "drift_",
        embeddings=(rows, "vec_id long, embedding array<float>, label int"),
    )
    got = {(r.label_a, r.label_b): r.cos_sim
           for r in q_sim_centroid_drift(spark, tmp).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0 and got[(1, 2)] == 0.0


def test_semantic_pairs_match_within_cluster_brute_force(spark):
    """dedup_semantic_pairs at sf0.001 equals the brute-force census:
    assign every vector to its nearest trained centroid in Python,
    enumerate intra-cluster pairs, keep rounded cosine >= 0.3."""
    import itertools
    import math

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_semantic_pairs,
    )
    from rust_dms_cdc_operator_spark.operators.similarity import (
        train_ivf_centroids,
    )

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet").filter("vec_id > 0")
    cents = train_ivf_centroids(
        e.filter("vec_id <= 2048"), "embedding", n_lists=8, seed=42
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in e.select("vec_id", "embedding").collect()
    }
    assign = {}
    for vid, v in vecs.items():
        best = max(
            ((round(cos(v, c), 6), -i) for i, c in enumerate(cents)),
        )
        assign[vid] = -best[1]
    expect = set()
    by_cluster: dict[int, list[int]] = {}
    for vid, cl in assign.items():
        by_cluster.setdefault(cl, []).append(vid)
    for cl, ids in by_cluster.items():
        for a, b in itertools.combinations(sorted(ids), 2):
            c = round(cos(vecs[a], vecs[b]), 6)
            if c >= 0.3:
                expect.add((a, b, cl, c))
    got = {
        (r.id_a, r.id_b, r.cluster, r.cos_sim)
        for r in q_dedup_semantic_pairs(spark, sf).collect()
    }
    assert got == expect


def test_label_dispersion_identity_and_orthogonal(spark):
    """Identical members -> mean intra-label cosine 1; an orthogonal
    pair -> 0 (sum-vector identity, no pair enumeration)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_sim_label_dispersion,
    )

    ex = [1.0] + [0.0] * 63
    ey = [0.0, 1.0] + [0.0] * 62
    rows = [
        (1, ex, 0), (2, ex, 0), (3, ex, 0),   # identical triple
        (4, ex, 1), (5, ey, 1),               # orthogonal pair
        (6, ex, 2),                           # singleton: excluded (n<2)
    ]
    tmp = _write_sf(
        spark, "disp_",
        embeddings=(rows, "vec_id long, embedding array<float>, label int"),
    )
    got = {r.label: (r.n, r.mean_cos)
           for r in q_sim_label_dispersion(spark, tmp).collect()}
    assert got == {0: (3, 1.0), 1: (2, 0.0)}


def test_type_pmi_hand_counts(spark):
    """n_ab/n_a/n_b/N from a hand-built incidence; duplicate events of
    the same (user, type) must not inflate counts."""
    import math

    from rust_dms_cdc_operator_spark.inventory_llm import q_events_type_pmi

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 0.0, "{}"),
        (2, t0, 1, "a", 0.0, "{}"),   # duplicate incidence
        (3, t0, 1, "b", 0.0, "{}"),
        (4, t0, 2, "a", 0.0, "{}"),
        (5, t0, 3, "b", 0.0, "{}"),
    ]
    tmp = _write_sf(
        spark, "pmi_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    [r] = q_events_type_pmi(spark, tmp).collect()
    assert (r.type_a, r.type_b, r.n_ab) == ("a", "b", 1)
    assert abs(r.pmi - round(math.log(1 * 3 / (2 * 2)), 6)) < 1e-9


def test_powerlaw_degenerate_tail_is_null(spark):
    """All tail lengths equal xmin -> Σln = 0 -> alpha NULL on both
    engines (Spark would otherwise emit IEEE Infinity)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_length_powerlaw,
    )

    docs = [(i, "a b", "en", "s0", 100) for i in range(6)]
    tmp = _write_sf(
        spark, "plaw_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    [r] = q_docs_length_powerlaw(spark, tmp).collect()
    assert r.n_tail == 6 and r.xmin == 100 and r.alpha is None


def test_group_split_zero_leakage(spark):
    """docs_group_split must produce ZERO near-dup pairs straddling a
    split boundary — checked against the SAME pair stream the leakage
    census uses; and the id-hashed split (docs_split_leakage) on the
    same corpus does leak, proving the census isn't vacuous."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_group_split,
        q_docs_split_leakage,
    )
    from rust_dms_cdc_operator_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=2)
    gs = q_docs_group_split(spark, sf)
    straddle = (
        pairs.join(gs.select(F.col("doc_id").alias("id_a"),
                             F.col("split").alias("sa")), "id_a")
        .join(gs.select(F.col("doc_id").alias("id_b"),
                        F.col("split").alias("sb")), "id_b")
        .filter("sa <> sb")
        .count()
    )
    assert straddle == 0
    leak = {
        (r.split_lo, r.split_hi): r.n_pairs
        for r in q_docs_split_leakage(spark, sf).collect()
        if r.leaked
    }
    assert sum(leak.values()) > 0  # the naive split does leak here
    # every doc present exactly once, members share their group's split
    assert gs.count() == d.count()
    n_bad = (
        gs.groupBy("group_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter("ns > 1")
        .count()
    )
    assert n_bad == 0


def test_open_backlog_sweep_semantics(spark):
    """+1 on order date, -1 the day AFTER last shipment; an order with
    no lineitems stays open forever."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_orders_open_backlog_daily,
    )

    import datetime as dt
    d = lambda i: dt.datetime(1996, 1, i)  # noqa: E731
    orders = [
        (1, 1, "O", 1.0, d(1), "p", "c", 0, "x"),   # ships d2 (last)
        (2, 1, "O", 1.0, d(1), "p", "c", 0, "x"),   # never ships
        (3, 1, "O", 1.0, d(3), "p", "c", 0, "x"),   # ships d3
    ]
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1)),
        (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d(2)),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(3)),
    ]
    tmp = _write_sf(
        spark, "backlog_",
        orders=(orders, "o_orderkey long, o_custkey long, o_orderstatus "
                        "string, o_totalprice double, o_orderdate timestamp,"
                        " o_orderpriority string, o_clerk string, "
                        "o_shippriority int, o_comment string"),
        lineitem=(li, "l_orderkey long, l_partkey long, l_suppkey long, "
                      "l_linenumber int, l_quantity double, l_extendedprice "
                      "double, l_discount double, l_tax double, l_returnflag "
                      "string, l_linestatus string, l_shipdate timestamp"),
    )
    got = [(str(r.day), r.net, r.open_orders)
           for r in q_orders_open_backlog_daily(spark, tmp)
           .orderBy("day").collect()]
    # d1: +2 open; d3: order1 closed (-1 on d3 = d2+1) +1 new = 2; d4: -1
    assert got == [
        ("1996-01-01", 2, 2),
        ("1996-01-03", 0, 2),
        ("1996-01-04", -1, 1),
    ]


def test_skyline_dominance_brute_force(spark):
    """Skyline equals the brute-force non-dominated set (strict
    dominance: cheaper-or-equal AND newer-or-equal with one strict);
    equal (price, date) duplicates all survive."""
    from rust_dms_cdc_operator_spark.inventory_llm import q_orders_skyline

    import datetime as dt
    d = lambda i: dt.datetime(1996, 1, i)  # noqa: E731
    rows = [
        (1, 1, "O", 100.0, d(30), "P", "c", 0, "x"),   # skyline (newest)
        (2, 1, "O", 100.0, d(30), "P", "c", 0, "x"),   # duplicate point
        (3, 1, "O", 50.0, d(5), "P", "c", 0, "x"),     # dominated by 7
        (4, 1, "O", 60.0, d(4), "P", "c", 0, "x"),     # dominated by 3/7
        (5, 1, "O", 70.0, d(20), "P", "c", 0, "x"),    # skyline
        (6, 1, "O", 100.0, d(9), "P", "c", 0, "x"),    # dominated by 5
        (7, 1, "O", 40.0, d(5), "P", "c", 0, "x"),     # skyline (cheapest)
    ]
    tmp = _write_sf(
        spark, "sky_",
        orders=(rows, "o_orderkey long, o_custkey long, o_orderstatus "
                      "string, o_totalprice double, o_orderdate timestamp, "
                      "o_orderpriority string, o_clerk string, "
                      "o_shippriority int, o_comment string"),
    )
    got = sorted(r.o_orderkey for r in q_orders_skyline(spark, tmp).collect())
    pts = {r[0]: (r[3], r[4]) for r in rows}
    def dominated(q):
        pq, dq = pts[q]
        return any(
            (pp <= pq and dp >= dq and (pp < pq or dp > dq))
            for k, (pp, dp) in pts.items() if k != q
        )
    expect = sorted(k for k in pts if not dominated(k))
    assert got == expect == [1, 2, 5, 7]


def test_inter_arrival_median_lower_pick(spark):
    """Even gap count takes the LOWER median; sub-second fractions
    truncate identically on both engines (floor semantics)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_inter_arrival_median,
    )

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # user 1 gaps: 10, 20, 30, 40 -> lower median 20
    offs = [0, 10, 30, 60, 100]
    rows = [(i, t0 + offs[i] * s, 1, "click", 0.0, "{}")
            for i in range(len(offs))]
    tmp = _write_sf(
        spark, "gap_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    [r] = q_events_inter_arrival_median(spark, tmp).collect()
    assert (r.user_id, r.n_gaps, r.median_gap_s) == (1, 4, 20)


def test_supplier_hhi_exact_fractions(spark):
    """Single supplier -> HHI exactly 1; 50/50 split -> exactly 0.5
    (integer numerator/denominator, one division)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_lineitem_supplier_hhi,
    )

    import datetime as dt
    t = dt.datetime(1996, 1, 1)
    li = [
        (1, 100, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", t),   # part 100: only s1
        (2, 200, 1, 1, 3.0, 1.0, 0.0, 0.0, "N", "O", t),   # part 200: s1=3
        (3, 200, 2, 1, 3.0, 1.0, 0.0, 0.0, "N", "O", t),   # part 200: s2=3
    ]
    tmp = _write_sf(
        spark, "hhi_",
        lineitem=(li, "l_orderkey long, l_partkey long, l_suppkey long, "
                      "l_linenumber int, l_quantity double, l_extendedprice "
                      "double, l_discount double, l_tax double, l_returnflag "
                      "string, l_linestatus string, l_shipdate timestamp"),
    )
    got = {r.l_partkey: (r.n_suppliers, r.hhi)
           for r in q_lineitem_supplier_hhi(spark, tmp).collect()}
    assert got == {100: (1, 1.0), 200: (2, 0.5)}


def test_ambiguous_ordering_minute_bursts(spark):
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_cdc_ambiguous_ordering,
    )

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: 3 events inside one minute + 1 outside -> ambiguous
        (1, t0, 1, "a", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=10), 1, "b", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=50), 1, "c", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=5), 1, "d", 0.0, "{}"),
        # user 2: all distinct minutes -> absent
        (5, t0, 2, "a", 0.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "b", 0.0, "{}"),
    ]
    tmp = _write_sf(
        spark, "amb_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    got = {r.user_id: (r.n_events, r.peak_burst, r.ambiguous_minutes)
           for r in q_cdc_ambiguous_ordering(spark, tmp).collect()}
    assert got == {1: (4, 3, 1)}


def test_user_entropy_uniform_and_constant(spark):
    """Uniform over 4 types -> ln(4); single type -> 0."""
    import math

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_user_entropy,
    )

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, t, 0.0, "{}")
            for i, t in enumerate(["a", "b", "c", "d"])]
    rows += [(10 + i, t0, 2, "a", 0.0, "{}") for i in range(5)]
    tmp = _write_sf(
        spark, "ent_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    got = {r.user_id: r.entropy
           for r in q_events_user_entropy(spark, tmp).collect()}
    assert abs(got[1] - round(math.log(4), 6)) < 1e-9
    assert got[2] == 0.0


def test_simhash_bit_balance_sums(spark):
    """n is the corpus size everywhere; n_set recomputed from the
    signatures themselves."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_simhash_bit_balance,
    )
    from rust_dms_cdc_operator_spark.operators.dedup import simhash16

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    sigs = [r.simhash for r in simhash16(d, "doc_id", "text").collect()]
    got = {r.bit: (r.n_set, r.n)
           for r in q_dedup_simhash_bit_balance(spark, sf).collect()}
    assert len(got) == 16
    for b in range(16):
        expect = sum((s >> b) & 1 for s in sigs)
        assert got[b] == (expect, len(sigs))


def test_rareterm_neighbors_df_cap_excludes_boilerplate(spark):
    """A trigram shared by 25 docs (df > 20) must produce NO candidate
    pairs; a trigram shared by exactly 2 does. Dice uses rare-gram
    set sizes."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_rareterm_neighbors,
    )

    docs = []
    # 25 docs all containing the boilerplate trigram "x y z" (df=25)
    for i in range(25):
        docs.append((i, f"x y z filler{i} a{i} b{i}", "en", "s0", 20))
    # two docs sharing the rare trigram "p q r" (df=2)
    docs.append((100, "p q r m n o", "en", "s0", 11))
    docs.append((101, "p q r s t u", "en", "s0", 11))
    tmp = _write_sf(
        spark, "rare_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    got = [(r.doc_id, r.neighbor_id, r.shared)
           for r in q_docs_rareterm_neighbors(spark, tmp).collect()]
    # only the rare pair, both directions
    assert sorted(got) == [(100, 101, 1), (101, 100, 1)]


def test_collocations_pmi_ranking(spark):
    """A pair that always co-occurs outranks a frequent-but-
    independent pair; support < 5 is cut."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_collocations,
    )

    docs = []
    # "alpha beta" 6 times, alpha/beta appear ONLY together
    for i in range(6):
        docs.append((i, "alpha beta", "en", "s0", 10))
    # "the cat" 6 times but 'the' floods the corpus alone too
    for i in range(6):
        docs.append((10 + i, "the cat", "en", "s0", 7))
    for i in range(30):
        docs.append((100 + i, "the", "en", "s0", 3))
    # a rare pair below support threshold
    docs.append((200, "qq ww", "en", "s0", 5))
    tmp = _write_sf(
        spark, "coll_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    rows = q_docs_collocations(spark, tmp).collect()
    grams = [r.g for r in rows]
    assert "qq ww" not in grams                      # support cut
    assert grams.index("alpha beta") < grams.index("the cat")  # PMI order


def test_zipf_slope_exact_powerlaw(spark):
    """A corpus built with freq(rank) = round(C/rank) fits slope ~ -1."""
    from rust_dms_cdc_operator_spark.inventory_llm import q_docs_zipf_fit

    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1000 / r)
    docs = [(0, " ".join(words), "en", "s0", len(words))]
    tmp = _write_sf(
        spark, "zipf_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )
    [row] = q_docs_zipf_fit(spark, tmp).collect()
    assert row.n_ranks == 20
    assert abs(row.zipf_slope - (-1.0)) < 0.01


def _md5_long(s: str, chars: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:chars], 16)


def test_dsir_weights_hand_counts(spark):
    """Per-doc Σ m·ln((t+1)/(r+1)) over hashed-bigram buckets, with
    target = lang='en'; expected values re-derived through the same
    md5 bucketing so hash collisions can't desynchronize the test."""
    import math
    from collections import Counter

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_dsir_weights,
    )

    docs = [
        (1, "a b a b", "en", "s0", 7),
        (2, "a b c", "de", "s0", 5),
    ]
    tmp = _write_sf(
        spark, "dsir_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )

    def bigrams(text):
        t = text.split(" ")
        return [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]

    raw, tgt, per_doc = Counter(), Counter(), {}
    for doc_id, text, lang, _s, _n in docs:
        bs = [_md5_long(b, 8) % 4096 for b in bigrams(text)]
        per_doc[doc_id] = Counter(bs)
        raw.update(bs)
        if lang == "en":
            tgt.update(bs)
    expect = {
        d: round(sum(m * math.log((tgt[b] + 1) / (raw[b] + 1))
                     for b, m in c.items()), 6)
        for d, c in per_doc.items()
    }
    got = {r.doc_id: (r.n_bigrams, r.dsir_logweight)
           for r in q_docs_dsir_weights(spark, tmp).collect()}
    assert got[1][0] == 3 and got[2][0] == 2
    for d in (1, 2):
        assert abs(got[d][1] - expect[d]) < 1e-9, (d, got[d], expect[d])


def test_hll_daily_users_replica(spark):
    """Register census vs a sequential replica of the md5/rho rules;
    exact_users must match the true distinct count per day."""
    import datetime as dt

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_hll_daily_users,
    )

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (i, t0 + dt.timedelta(days=i % 2), uid, "t", 0.0, "{}")
        for i, uid in enumerate([1, 2, 3, 2, 1, 7, 7, 8])
    ]
    tmp = _write_sf(
        spark, "hll_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )

    def replica(uids):
        regs = {}
        for u in set(uids):
            h = _md5_long(str(u), 12)
            b, rest = h % 512, h // 512
            rho = 40 if rest == 0 else 40 - rest.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        present = sum(1 << (40 - m) for m in regs.values())
        return (
            len(set(uids)), len(regs),
            present + (512 - len(regs)) * (1 << 40),
        )

    day_users = {0: [1, 3, 1, 7], 1: [2, 2, 7, 8]}
    got = {r.event_date.day: (r.exact_users, r.used_registers,
                              r.denom_scaled)
           for r in q_events_hll_daily_users(spark, tmp).collect()}
    assert got[1] == replica(day_users[0]), got[1]
    assert got[2] == replica(day_users[1]), got[2]


def test_winnowing_replica_and_coverage(spark):
    """Window minima vs a sequential replica, plus the winnowing
    guarantee: every w-window of trigram hashes contributes a selected
    fingerprint, so n_fingerprints >= ceil(n_windows / w)."""
    from rust_dms_cdc_operator_spark.inventory_llm import q_docs_winnowing

    text = "e d c b a e d c b a z y"  # 12 tokens -> 10 trigrams
    docs = [(1, text, "en", "s0", len(text)), (2, "a b", "en", "s0", 3)]
    tmp = _write_sf(
        spark, "winn_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars long"),
    )

    def replica(t):
        w = t.split(" ")
        if len(w) < 3:
            grams = [t]
        else:
            grams = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
        kh = [_md5_long(g, 8) for g in grams]
        ch = [h * 16777216 + (16777215 - i) for i, h in enumerate(kh)]
        if len(ch) < 4:
            wins = [min(ch)]
        else:
            wins = [min(ch[i:i + 4]) for i in range(len(ch) - 3)]
        fps = sorted(set(wins))
        return len(kh), len(fps), sum(fps)

    got = {r.doc_id: (r.n_kgrams, r.n_fingerprints, r.fp_comp_sum)
           for r in q_docs_winnowing(spark, tmp).collect()}
    assert got[1] == replica(text), (got[1], replica(text))
    assert got[2] == replica("a b")
    n_windows = got[1][0] - 3
    assert got[1][1] >= (n_windows + 3) // 4


def test_weighted_sample_exact_pick_count(spark):
    """Systematic PPS invariants on real data: the K=100 grid picks
    partition [0, T), so Σ n_picks == 100 exactly; any doc heavier
    than the stride is guaranteed selection; rerun is identical."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_weighted_sample,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_docs_weighted_sample(spark, sf).collect()
    assert sum(r.n_picks for r in rows) == 100
    assert all(r.n_picks >= 1 for r in rows)
    total = sum(
        r.n_chars
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.col("n_chars").cast("long").alias("n_chars"))
        .collect()
    )
    stride = total / 100.0
    picked = {r.doc_id for r in rows}
    for r in spark.read.parquet(f"{sf}/documents.parquet").collect():
        if r.n_chars > stride:
            assert r.doc_id in picked, (r.doc_id, r.n_chars, stride)
    again = q_docs_weighted_sample(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_histogram_drift_replica(spark):
    """TVD census vs a sequential replica of the bin/scale rules:
    a drifting type maxes the scaled TVD, a stable type zeroes it."""
    import datetime as dt

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_histogram_drift,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type "drift": 4 early rows at low values, 4 late at high values
    for i in range(4):
        rows.append((i, t0 + dt.timedelta(hours=i), 1, "drift", 1.0, "{}"))
        rows.append(
            (10 + i, t0 + dt.timedelta(days=9, hours=i), 1, "drift",
             99.0, "{}")
        )
    # type "stable": same value early and late
    rows.append((20, t0, 2, "stable", 50.0, "{}"))
    rows.append((21, t0 + dt.timedelta(days=9), 2, "stable", 50.0, "{}"))
    tmp = _write_sf(
        spark, "drift_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )

    ts_us = [int((r[1] - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
             for r in rows]
    mid = (min(ts_us) + max(ts_us)) // 2
    vals = [r[4] for r in rows]
    lo, span = min(vals), max(vals) - min(vals)

    def replica(tname):
        a, b = [0] * 16, [0] * 16
        for r, us in zip(rows, ts_us):
            if r[3] != tname:
                continue
            bin_ = min(15, int((r[4] - lo) * 16.0 / span))
            (a if us <= mid else b)[bin_] += 1
        A, B = sum(a), sum(b)
        # only OCCUPIED bins exist as groupBy rows in the query
        occ = [i for i in range(16) if a[i] or b[i]]
        devs = {i: abs(a[i] * B - b[i] * A) for i in occ}
        combo = max(devs[i] * 16 + i for i in occ)
        return (A, B, sum(devs.values()), combo % 16, combo // 16)

    got = {r.event_type: (r.early_n, r.late_n, r.tvd_scaled, r.top_bin,
                          r.top_dev)
           for r in q_events_histogram_drift(spark, tmp).collect()}
    assert got["drift"] == replica("drift"), got["drift"]
    assert got["stable"] == replica("stable"), got["stable"]
    # full separation: every early row in a bin with zero late rows
    assert got["drift"][2] == 2 * 4 * 4
    assert got["stable"][2] == 0


def test_cusum_changepoint_peak_day(spark):
    """A level shift peaks the exact scaled CUSUM at the last
    pre-shift day; ties break to the EARLIEST day."""
    import datetime as dt

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_cusum_changepoint,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # 4 days at 1 event/day, then 4 days at 5 events/day
    daily = [1, 1, 1, 1, 5, 5, 5, 5]
    for d, c in enumerate(daily):
        for _ in range(c):
            rows.append(
                (eid, t0 + dt.timedelta(days=d), 1, "shift", 0.0, "{}")
            )
            eid += 1
    tmp = _write_sf(
        spark, "cusum_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    total, days = sum(daily), len(daily)
    cusums = []
    run = 0
    for c in daily:
        run += c * days - total
        cusums.append(run)
    peak = max(abs(c) for c in cusums)
    peak_idx = min(i for i, c in enumerate(cusums) if abs(c) == peak)

    [r] = q_events_cusum_changepoint(spark, tmp).collect()
    assert (r.days, r.total) == (days, total)
    assert r.peak_dev == peak
    assert r.peak_day == (t0 + dt.timedelta(days=peak_idx)).date()


def test_hll_retention_replica(spark):
    """Register-merge retention vs a sequential replica: per day pair,
    denom_a/denom_b match the per-day sketches, denom_union is the
    register-wise max merge, and exact_retained is the true overlap."""
    import datetime as dt

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_hll_retention,
    )

    day_users = {0: [1, 2, 3, 4], 1: [3, 4, 5], 2: [9]}
    t0 = dt.datetime(2024, 5, 1, 6)
    rows = []
    eid = 0
    for d, users in day_users.items():
        for u in users:
            rows.append((eid, t0 + dt.timedelta(days=d), u, "t", 0.0, "{}"))
            eid += 1
    tmp = _write_sf(
        spark, "hllret_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )

    def regs(uids):
        out = {}
        for u in set(uids):
            h = _md5_long(str(u), 12)
            b, rest = h % 512, h // 512
            rho = 40 if rest == 0 else 40 - rest.bit_length()
            out[b] = max(out.get(b, 0), rho)
        return out

    def denom(rr):
        return (sum(1 << (40 - m) for m in rr.values())
                + (512 - len(rr)) * (1 << 40))

    got = {r.event_date.day: r
           for r in q_events_hll_retention(spark, tmp).collect()}
    assert sorted(got) == [1, 2]  # day pairs (0,1) and (1,2)
    for d in (0, 1):
        ra, rb = regs(day_users[d]), regs(day_users[d + 1])
        merged = {b: max(ra.get(b, 0), rb.get(b, 0))
                  for b in set(ra) | set(rb)}
        row = got[d + 1]
        assert row.denom_a == denom(ra)
        assert row.denom_b == denom(rb)
        assert row.denom_union == denom(merged)
        assert row.exact_retained == len(
            set(day_users[d]) & set(day_users[d + 1])
        )
        # merged sketch covers at least each side's registers
        assert row.denom_union <= min(row.denom_a, row.denom_b)


def test_decile_lift_exact_cuts(spark):
    """20 customers with distinct spends -> 2 per decile, revenue per
    decile = the two ranked spends, cumulative strictly increasing."""
    import datetime as dt

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_orders_decile_lift,
    )

    t0 = dt.datetime(1996, 1, 1)
    # customer k spends (k+1) dollars in one order -> rank = 20-k
    rows = [
        (k, k, "O", float(k + 1), t0, "1-URGENT") for k in range(20)
    ]
    tmp = _write_sf(
        spark, "lift_",
        orders=(rows, "o_orderkey long, o_custkey long, "
                      "o_orderstatus string, o_totalprice double, "
                      "o_orderdate timestamp, o_orderpriority string"),
    )
    out = {r.decile: r for r in q_orders_decile_lift(spark, tmp).collect()}
    assert sorted(out) == list(range(10))
    ranked = sorted(((k + 1) * 100 for k in range(20)), reverse=True)
    cum = 0
    for d in range(10):
        expect_rev = ranked[2 * d] + ranked[2 * d + 1]
        cum += expect_rev
        assert out[d].customers == 2
        assert out[d].revenue_cents == expect_rev
        assert out[d].cum_revenue_cents == cum


def test_bloom_contamination_replica(spark):
    """Bloom membership vs a sequential replica of the 3-salt bit
    rules; no false negatives: every exact hit is a bloom hit."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_bloom_contamination,
    )

    # corpus doc (id 50) and eval docs (ids 1, 2): doc 1 shares its
    # only 5-gram with the corpus; doc 2 shares none
    corpus_text = "alpha beta gamma delta epsilon zeta"
    docs = [
        (50, corpus_text, "en", "s0", 6),
        (1, "alpha beta gamma delta epsilon", "en", "s0", 5),
        (2, "one two three four five six", "en", "s0", 6),
    ]
    tmp = _write_sf(
        spark, "bloom_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_tokens long"),
    )

    def grams(text):
        t = text.split(" ")
        return [" ".join(t[i:i + 5]) for i in range(len(t) - 4)]

    words = [0] * 128
    for g in grams(corpus_text):
        for s in ("b1", "b2", "b3"):
            p = _md5_long(g + s, 8) % 4096
            words[p // 32] |= 1 << (p % 32)

    def bloom_has(g):
        return all(
            (words[(_md5_long(g + s, 8) % 4096) // 32]
             >> ((_md5_long(g + s, 8) % 4096) % 32)) & 1
            for s in ("b1", "b2", "b3")
        )

    corpus_set = set(grams(corpus_text))
    got = {r.doc_id: r
           for r in q_docs_bloom_contamination(spark, tmp).collect()}
    for d in (1, 2):
        gs = sorted(set(grams(next(x[1] for x in docs if x[0] == d))))
        row = got[d]
        assert row.n_grams == len(gs)
        assert row.bloom_hits == sum(bloom_has(g) for g in gs)
        assert row.exact_hits == sum(g in corpus_set for g in gs)
        # a bloom filter has no false negatives
        assert row.bloom_hits >= row.exact_hits
    assert got[1].exact_hits == 1 and got[2].exact_hits == 0


def test_vocab_coverage_replica(spark):
    """Coverage sums vs a sequential replica with the same
    (count DESC, word ASC) rank order; curve is monotone in k."""
    from collections import Counter

    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_vocab_coverage,
    )

    docs = [
        (1, "a a a b b c", "en", "s0", 6),
        (2, "a b c d e f", "en", "s0", 6),
        (3, "a a d d d d", "en", "s0", 6),
    ]
    tmp = _write_sf(
        spark, "cov_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_tokens long"),
    )
    counts = Counter(w for _, t, *_ in docs for w in t.split(" "))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    got = {r.top_k: r for r in q_docs_vocab_coverage(spark, tmp).collect()}
    assert sorted(got) == [10, 100, 1000, 10000]
    for k, row in got.items():
        assert row.vocab_size == len(counts)
        assert row.total_tokens == total
        assert row.covered_tokens == sum(c for _, c in ranked[:k])
    assert got[10].covered_tokens <= got[100].covered_tokens


def test_minhash_knn_capped_excludes_hot_buckets(spark):
    """With a bucket cap below the clique size, identical docs (one
    giant band bucket) produce NO capped candidates, while the
    uncapped form ranks them; distinct docs sharing an under-cap
    bucket survive the cap."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        minhash_knn_topk,
    )

    rows = [(i, "same text for every clone doc", "en", "s0", 6)
            for i in range(10)]
    rows += [(100, "aa bb cc dd ee ff", "en", "s0", 6),
             (101, "aa bb cc dd ee ff", "en", "s0", 6)]
    tmp = _write_sf(
        spark, "knncap_",
        documents=(rows, "doc_id long, text string, lang string, "
                         "source string, n_tokens long"),
    )
    d = spark.read.parquet(f"{tmp}/documents.parquet")
    uncapped = minhash_knn_topk(d, "doc_id", "text", k=3)
    capped = minhash_knn_topk(d, "doc_id", "text", k=3, max_bucket=4)
    got_u = {(r.doc_id, r.neighbor_id) for r in uncapped.collect()}
    got_c = {(r.doc_id, r.neighbor_id) for r in capped.collect()}
    # the 10-clone clique is over-cap: none of its pairs survive
    assert not any(a < 100 and b < 100 for a, b in got_c)
    assert any(a < 100 and b < 100 for a, b in got_u)
    # the 2-doc under-cap bucket survives in both
    assert (100, 101) in got_c and (101, 100) in got_c
    assert got_c <= got_u


def test_histogram_drift_span_zero_degenerate(spark):
    """All values identical (span == 0): both engines must force
    bin 0. Unguarded, Spark evaluates (v-lo)*16/0 = NaN and
    floor→cast wraps it to 0 while the DuckDB oracle ERRORS on
    CAST(floor(NaN) AS BIGINT) — an engine divergence/oracle crash
    on a degenerate fixture (round-8 ADVICE)."""
    import datetime as dt

    import duckdb

    from rust_dms_cdc_operator_spark.inventory_llm import (
        ORACLE_SQL_LLM,
        q_events_histogram_drift,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "flat", 7.5, "{}"),
        (1, t0 + dt.timedelta(days=2), 1, "flat", 7.5, "{}"),
        (2, t0 + dt.timedelta(days=9), 2, "flat", 7.5, "{}"),
    ]
    tmp = _write_sf(
        spark, "driftz_",
        events=(rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string"),
    )
    got = {r.event_type: (r.early_n, r.late_n, r.tvd_scaled, r.top_bin,
                          r.top_dev)
           for r in q_events_histogram_drift(spark, tmp).collect()}
    # everything lands in bin 0; early 2 / late 1; dev = |2*1-1*2| = 0
    assert got == {"flat": (2, 1, 0, 0, 0)}
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp}/events.parquet/*.parquet'"
    )
    ora = con.sql(ORACLE_SQL_LLM["events_histogram_drift"]).fetchall()
    assert [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in ora] == [
        ("flat", 2, 1, 0, 0, 0)
    ]


def test_combo_decode_integer_div_exact_past_2p53(spark):
    """The combo decodes use integer `div`, not double `/`
    (round-8 ADVICE): dev scales as n^2 per group, and double
    division silently rounds past 2^53 — at x = 2^57-1 the old
    floor(x/16.0) decode returns 2^53 while the true x//16 (and
    DuckDB's `//`) is 2^53-1."""
    big = (1 << 57) - 1
    row = (
        spark.createDataFrame([(big,)], "x long")
        .select(
            F.expr("x div 16").alias("d"),
            F.floor(F.col("x") / 16).cast("long").alias("f"),
            (F.col("x") % 16).cast("int").alias("m"),
        )
        .first()
    )
    assert row.d == big // 16
    assert row.m == big % 16
    # the defect this guards against: double division is off by one here
    assert row.f != big // 16


def test_check_oracle_embedding_groups_assist_gating():
    """`check_oracle.py --materialize-pairs dedup_embedding_groups`
    alone: the CC hash-to-min assist must NOT fire (that oracle's
    closure is over EMBEDDING pairs, not minhash pairs) and the run
    must not crash on the missing __mh_pairs_plain temp table
    (round-8 ADVICE)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "--materialize-pairs",
         "--sf-dir", "/root/testdata/sf0.001", "dedup_embedding_groups"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "1/1 queries match" in r.stdout
    assert "__cc_groups" not in r.stdout


def test_ivf_join_forms_match_expression_forms(spark):
    """The broadcast-quantizer join forms (ivf_assign_join /
    ivf_probe_lists_join, round 9) must reproduce the expression
    forms (ivf_assign / ivf_probe_lists) bit-for-bit — same rounded
    cosines, same argmax and probe-list tie rules — on a frame with
    deliberate ties (duplicate vectors, symmetric centroids)."""
    from rust_dms_cdc_operator_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_join,
        ivf_probe_lists,
        ivf_probe_lists_join,
    )

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
             [1.0, 1.0, 0.0]]
    rows = [
        (1, [1.0, 0.1, 0.0]), (2, [0.1, 1.0, 0.0]), (3, [0.0, 0.1, 1.0]),
        (4, [1.0, 1.0, 0.0]),   # exact tie between cents 0/1 vs 3
        (5, [1.0, 1.0, 0.0]),   # duplicate of 4
        (6, [-1.0, -1.0, -1.0]),
        (7, [0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    exp = {r.vec_id: r.lst for r in df.select(
        "vec_id", ivf_assign(F.col("v"), cents).alias("lst")).collect()}
    got = {r.vec_id: r.lst for r in
           ivf_assign_join(df, cents, "vec_id").collect()}
    assert got == exp, (got, exp)
    exp_p = sorted(
        (r.vec_id, r.lst) for r in df.select(
            "vec_id",
            F.explode(ivf_probe_lists(F.col("v"), cents, 2)).alias("lst"),
        ).collect())
    got_p = sorted(
        (r.vec_id, r.lst)
        for r in ivf_probe_lists_join(df, cents, "vec_id", 2).collect())
    assert got_p == exp_p, (got_p, exp_p)


def test_q22_q11_empty_input_guard(spark):
    """Round-8 defect class: F.sum over an empty set returns NULL and
    the literal-lookup collect then raised int(None). Both queries
    must return EMPTY (the old broadcast-join contract), not crash,
    when the scalar's input set is empty."""
    from rust_dms_cdc_operator_spark.inventory import q_q22_dormant_customers
    from rust_dms_cdc_operator_spark.inventory_tpch2 import (
        q_q11_important_stock,
    )

    tmp = _write_sf(
        spark, "emptyq_",
        # every balance non-positive -> q22's positive set is empty
        customer=(
            [(1, "SEG", -5.0), (2, "SEG", 0.0)],
            "c_custkey long, c_mktsegment string, c_acctbal double",
        ),
        orders=(
            [(10, 1, "2001-06-01")],
            "o_orderkey long, o_custkey long, o_orderdate string",
        ),
        # empty lineitem -> q11's per-part aggregate is empty
        lineitem=([], "l_partkey long, l_quantity double"),
        part=([(1, 9.99)], "p_partkey long, p_retailprice double"),
    )
    assert q_q22_dormant_customers(spark, tmp).count() == 0
    assert q_q11_important_stock(spark, tmp).count() == 0


def test_kcore_unpersists_sweep_caches(spark):
    """Round-8 defect: kcore_membership persisted per-sweep frames and
    dropped them only on the converged path. On BOTH exit paths
    (fixed point and rounds-exhausted), everything except the final
    frontier must be unpersisted — at a 200M-pair sf1 graph each
    leaked sweep is ~400M cached rows."""
    from rust_dms_cdc_operator_spark.operators.graph import kcore_membership

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def clear_all():
        # catalog.clearCache() frees CacheManager entries only; the
        # final-frontier localCheckpoint (caller-owned by contract)
        # must be dropped at the RDD layer
        spark.catalog.clearCache()
        for r in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            r.unpersist()

    clear_all()
    base = n_cached()
    # path graph: peels one layer per sweep -> rounds exhaust unconverged
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    out = kcore_membership(edges, k=2, rounds=3)
    out.count()
    # live set by contract: the persisted adjacency + the LAST (small)
    # checkpointed cumulative-removed set — never per-sweep frames
    assert n_cached() - base <= 2, (base, n_cached())
    clear_all()
    # near-clique: converges (break path) -> adjacency only
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    out2 = kcore_membership(
        spark.createDataFrame(clique, "id_a long, id_b long"), k=2, rounds=4
    )
    out2.count()
    assert n_cached() - base <= 1, (base, n_cached())
    clear_all()


def test_oracle_override_skips_wrong_density_artifact(monkeypatch):
    """Round-8 defect: oracle_sql_overrides fell back from the 'ivfd'
    registry to the shared 8-list artifact, rendering the
    sim_knn_density / dedup_semantic_pairs oracles from the WRONG
    centroids — a guaranteed false failure. A missing or
    wrong-list-count artifact must now OMIT the two keys (documented
    skip), never substitute."""
    from rust_dms_cdc_operator_spark import inventory_llm as il
    from rust_dms_cdc_operator_spark import trained

    monkeypatch.setattr(il, "_density_n_lists", lambda n: 16)
    monkeypatch.setattr(trained, "load_ivf_density", lambda tag: None)
    out = il.oracle_sql_overrides("/root/testdata/sf0.1")
    assert "sim_knn_density" not in out
    assert "dedup_semantic_pairs" not in out
    # an artifact trained at the WRONG list count is also a skip
    eight = trained.load_ivf("sf0.1")
    if eight is not None:
        monkeypatch.setattr(trained, "load_ivf_density", lambda tag: eight)
        out2 = il.oracle_sql_overrides("/root/testdata/sf0.1")
        assert "sim_knn_density" not in out2
    # a CORRECT 16-list artifact renders the overrides
    fake = [[float(i == j) for j in range(64)] for i in range(16)]
    monkeypatch.setattr(trained, "load_ivf_density", lambda tag: fake)
    out3 = il.oracle_sql_overrides("/root/testdata/sf0.1")
    assert "sim_knn_density" in out3 and "dedup_semantic_pairs" in out3


def test_dedup_keep_best_longest_then_lowest_id(spark):
    """Keep-best representative selection: per duplicate group the
    LONGEST member wins (n_chars), ties break to the lowest doc_id —
    and the combo encode/decode round-trips exactly."""
    from rust_dms_cdc_operator_spark.inventory_llm import q_dedup_keep_best

    mk = lambda i, t, nc: (i, t, "en", "s0", nc)  # noqa: E731
    docs = [
        # group A: identical text, distinct lengths -> keep 2 (nc 99)
        mk(1, "alpha beta gamma delta epsilon zeta", 10),
        mk(2, "alpha beta gamma delta epsilon zeta", 99),
        mk(3, "alpha beta gamma delta epsilon zeta", 50),
        # group B: identical text, tied lengths -> keep 7 (lowest id)
        mk(7, "omicron sigma tau upsilon phi chi", 5),
        mk(8, "omicron sigma tau upsilon phi chi", 5),
        # singleton: no pair -> absent from the output
        mk(9, "unrelated words entirely here now then", 77),
    ]
    tmp = _write_sf(
        spark, "keepbest_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    got = {r.group_id: (r.keep_doc_id, r.keep_n_chars, r.group_size)
           for r in q_dedup_keep_best(spark, tmp).collect()}
    assert got == {1: (2, 99, 3), 7: (7, 5, 2)}, got


# ------------------------------------------------------------------
# round 9: classifier / calibration / sketch-similarity family
# ------------------------------------------------------------------


def test_text_langid_trained_profiles_and_und(spark):
    """Profiles learn per-lang tokens; a doc hitting only lang-B
    vocabulary is predicted B whatever its label; a doc sharing no
    profile token at all falls to 'und' with zero score mass."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_text_langid_trained,
    )

    docs = [
        (1, "aa aa aa bb bb cc", "en", "s0", 10),
        (2, "aa bb cc aa bb", "en", "s0", 10),
        (3, "xx xx yy yy zz", "de", "s0", 10),
        (4, "xx yy zz zz", "de", "s0", 10),
        # labeled en but pure de vocabulary -> predicted de
        (5, "xx yy zz", "en", "s0", 10),
    ]
    tmp = _write_sf(
        spark, "langidtr_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    got = {(r.lang, r.pred_lang): r.n_docs
           for r in q_text_langid_trained(spark, tmp).collect()}
    assert got[("en", "de")] == 1          # doc 5 crosses over
    assert got[("en", "en")] == 2
    assert got[("de", "de")] == 2
    # disjoint-vocabulary doc -> und
    docs.append((6, "qq ww ee", "fr", "s0", 10))
    # 'qq ww ee' WILL enter the fr profile (it is fr's only text), so
    # und needs a doc whose tokens miss every profile: impossible once
    # the doc itself trains a profile — und is reachable only through
    # empty-profile langs, so assert the score mass instead
    tmp2 = _write_sf(
        spark, "langidtr2_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    rows = q_text_langid_trained(spark, tmp2).collect()
    assert sum(r.n_docs for r in rows) == 6
    assert all(r.sum_score >= 0 for r in rows)


def test_nb_source_classifier_vote_arithmetic(spark):
    """The positive class is the LARGEST source (ties -> asc); tokens
    vote by exact smoothed cross-multiplication; the per-source census
    separates H-voting docs from the rest."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_nb_source_classifier,
    )

    # srcA has 3 docs (largest); its vocabulary is 'hot', rest 'cold'
    docs = [
        (1, "hot hot hot", "en", "srcA", 5),
        (2, "hot hot", "en", "srcA", 5),
        (3, "hot cold", "en", "srcA", 5),
        (4, "cold cold cold", "en", "srcB", 5),
        (5, "cold hot", "en", "srcB", 5),
    ]
    tmp = _write_sf(
        spark, "nbcls_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    rows = q_docs_nb_source_classifier(spark, tmp).collect()
    got = {(r.source, r.pred_high): (r.n_docs, r.sum_margin) for r in rows}
    # H = srcA. tokens: hot c_h=6,c_o=1; cold c_h=1,c_o=4; N_h=7,N_o=5,V=2
    # hot: (7)*(7) = 49 > (2)*(9) = 18 -> +1 ; cold: 2*7=14 < 5*9=45 -> -1
    # doc1 margin +3, doc2 +2, doc3 0 -> pred False; doc4 -3; doc5 0
    assert got[("srcA", True)] == (2, 5)
    assert got[("srcA", False)] == (1, 0)
    assert got[("srcB", False)] == (2, -3)


def test_dedup_minhash_error_identical_docs_bin_zero(spark):
    """Identical texts: every signature component matches AND the
    exact Jaccard is 1 -> error bin 0 with full masses; a disjoint
    doc never pairs."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_minhash_error,
    )

    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, t, "en", "s0", 10),
        (2, t, "en", "s0", 10),
        (3, "totally different words here now", "en", "s0", 10),
    ]
    tmp = _write_sf(
        spark, "mherr_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    rows = q_dedup_minhash_error(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.err_bin, r.n_pairs, r.sum_matches) == (0, 1, 16)
    assert r.sum_inter == r.sum_union == 8


def test_dedup_threshold_sweep_membership(spark):
    """A pair with word-Jaccard exactly 0.8 survives thresholds 5..8
    and falls out at 9; the identical pair survives all five."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_threshold_sweep,
    )

    base = "a b c d e f g h"                      # 8 distinct words
    j08 = "a b c d e f g h x y"                   # inter 8, union 10
    docs = [
        (1, base, "en", "s0", 10),
        (2, base, "en", "s0", 10),                # J = 1.0 with doc 1
        (3, j08, "en", "s0", 10),                 # J = 0.8 with 1 and 2
    ]
    tmp = _write_sf(
        spark, "thsweep_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    got = {r.threshold_tenths: r.n_pairs_ge
           for r in q_dedup_threshold_sweep(spark, tmp).collect()}
    assert set(got) == {5, 6, 7, 8, 9}
    assert got[9] == 1 and got[8] == 3 and got[5] == 3


def test_source_kmv_jaccard_identical_and_disjoint(spark):
    """Sources with identical vocabularies agree on every sketch slot
    (estimate 1) and their exact truth matches; disjoint sources match
    zero slots with exact_inter 0."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_docs_source_kmv_jaccard,
    )

    docs = [
        (1, "w1 w2 w3 w4 w5", "en", "sA", 5),
        (2, "w1 w2 w3 w4 w5", "en", "sB", 5),
        (3, "z1 z2 z3", "en", "sC", 5),
    ]
    tmp = _write_sf(
        spark, "kmvj_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    got = {(r.src_a, r.src_b): r for r in
           q_docs_source_kmv_jaccard(spark, tmp).collect()}
    ab = got[("sA", "sB")]
    assert ab.kmv_matches == ab.k_used == 5
    assert (ab.exact_inter, ab.exact_union) == (5, 5)
    ac = got[("sA", "sC")]
    assert ac.kmv_matches == 0 and ac.k_used == 8
    assert (ac.exact_inter, ac.exact_union) == (0, 8)


def test_sim_power_iteration_dominant_axis(spark):
    """A corpus whose variance lives on one axis: the projection
    census separates the two label clusters with opposite signs and
    magnitudes ~|x| * Q^2 (v converges to +-100 on the hot axis)."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_sim_power_iteration,
    )

    def vec(hot):
        v = [0.0] * 64
        v[7] = hot
        return v

    rows = [
        (1, vec(0.9), 0), (2, vec(0.8), 0), (3, vec(0.85), 0),
        (4, vec(-0.9), 1), (5, vec(-0.8), 1),
    ]
    tmp = _write_sf(
        spark, "powit_",
        embeddings=(rows, "vec_id long, embedding array<float>, "
                          "label int"),
    )
    got = {r.label: r for r in q_sim_power_iteration(spark, tmp).collect()}
    assert got[0].n_vecs == 3 and got[1].n_vecs == 2
    # clusters project to opposite signs on the dominant axis
    assert got[0].sum_proj * got[1].sum_proj < 0
    assert abs(got[0].min_proj) >= 7000  # ~0.8 * 100 * 100


def test_dedup_band_tuning_monotone_recall(spark):
    """More bands can only widen the candidate set over the same
    signature: candidate and true-positive counts are monotone in the
    config's band count, and the pooled truth is shared by all rows."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_band_tuning,
    )

    t = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = [
        (1, t, "en", "s0", 10),
        (2, t, "en", "s0", 10),
        (3, near, "en", "s0", 10),     # J = 8/9 vs 1 and 2 -> true
        (4, "other words entirely distinct set here", "en", "s0", 10),
    ]
    tmp = _write_sf(
        spark, "bandtune_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    rows = {r.config: r for r in q_dedup_band_tuning(spark, tmp).collect()}
    assert set(rows) <= {"2x8", "4x4", "8x2"}
    pools = {r.n_true_pooled for r in rows.values()}
    assert len(pools) == 1
    # NOTE: candidate counts are NOT asserted monotone in bands — the
    # hot-bucket cap can shrink a looser config (the cap interaction
    # the census exists to expose). Internal consistency instead:
    for r in rows.values():
        assert 0 <= r.n_true_pos <= r.n_candidates
        assert r.n_true_pos <= r.n_true_pooled
        # the identical + J=8/9 pairs collide in every band of every
        # config (equal signatures), well under the cap on 4 docs
        assert r.n_true_pos >= 1


def test_dedup_group_size_powerlaw_bins(spark):
    """Group sizes land in integer log2 bins: a 3-group and a 2-group
    -> bins 1 (sizes 2-3) with 2 groups / 5 docs."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_group_size_powerlaw,
    )

    a = "alpha beta gamma delta epsilon zeta"
    b = "omicron sigma tau upsilon phi chi"
    docs = [
        (1, a, "en", "s0", 10), (2, a, "en", "s0", 10),
        (3, a, "en", "s0", 10),
        (7, b, "en", "s0", 10), (8, b, "en", "s0", 10),
        (9, "unique words that pair with nothing at all", "en", "s0", 10),
    ]
    tmp = _write_sf(
        spark, "grppow_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    got = {r.size_bin: (r.n_groups, r.n_docs)
           for r in q_dedup_group_size_powerlaw(spark, tmp).collect()}
    assert got == {1: (2, 5)}, got


def test_dedup_source_impact_keep_best_accounting(spark):
    """Survivors = singletons + each group's longest member; token
    masses follow the same split, per source."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_dedup_source_impact,
    )

    t = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, t, "en", "sA", 10),          # group: 1,2 (sB doc 2 longer)
        (2, t, "en", "sB", 99),
        (3, "solo words here never paired at all", "en", "sA", 5),
    ]
    tmp = _write_sf(
        spark, "srcimp_",
        documents=(docs, "doc_id long, text string, lang string, "
                         "source string, n_chars int"),
    )
    got = {r.source: (r.n_docs, r.n_kept, r.tokens_total, r.tokens_kept)
           for r in q_dedup_source_impact(spark, tmp).collect()}
    # sA: doc1 (6 toks, dropped) + doc3 (7 toks, singleton kept)
    assert got["sA"] == (2, 1, 13, 7)
    # sB: doc2 kept (longest in its group)
    assert got["sB"] == (1, 1, 6, 6)


def test_sim_pc1_explained_rayleigh_bounds(spark):
    """On a corpus whose variance is entirely on one axis, PC1
    explains everything: sum_proj2 * 1 == v_norm2 * sum_norm2 ratio
    -> exactly 1 when v lands on the hot axis; and the masses obey
    the Cauchy-Schwarz bound sum_proj2 <= v_norm2 * sum_norm2."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_sim_pc1_explained,
    )

    def vec(hot):
        v = [0.0] * 64
        v[3] = hot
        return v

    rows = [
        (1, vec(0.9), 0), (2, vec(-0.9), 0), (3, vec(0.7), 1),
    ]
    tmp = _write_sf(
        spark, "pc1ex_",
        embeddings=(rows, "vec_id long, embedding array<float>, "
                          "label int"),
    )
    out = {r.label: r for r in q_sim_pc1_explained(spark, tmp).collect()}
    for r in out.values():
        assert r.sum_proj2 <= r.v_norm2 * r.sum_norm2
    # single-axis corpus: the bound is TIGHT (v has one nonzero comp)
    for r in out.values():
        assert r.sum_proj2 == r.v_norm2 * r.sum_norm2


def test_sim_ivf_occupancy_accounting(spark):
    """Occupancies sum to the corpus total; n_lists is the artifact
    size; n_lists_used counts only non-empty lists."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_sim_ivf_occupancy,
    )

    rows = q_sim_ivf_occupancy(spark, "/root/testdata/sf0.001").collect()
    assert rows
    tot = rows[0].n_total
    assert sum(r.n_vecs for r in rows) == tot
    assert all(r.n_lists == rows[0].n_lists for r in rows)
    assert len(rows) == rows[0].n_lists_used <= rows[0].n_lists
    assert all(r.n_vecs >= 1 for r in rows)


def test_events_ab_test_exact_significance(spark):
    """The exact cross-multiplication agrees with the algebraic
    two-proportion z^2 > 4 rule on a hand-computed fixture, and the
    degenerate all-convert metric is not significant."""
    from rust_dms_cdc_operator_spark.inventory_llm import (
        q_events_ab_test,
    )

    # arm A = even users (2,4,6,8), arm B = odd (1,3,5,7)
    # metric 'buy': A converts 4/4, B converts 0/4 -> z^2 = 8 -> sig
    # metric 'see': everyone converts -> z^2 = 0 -> not sig
    import datetime as _dt

    t0 = _dt.datetime(2026, 1, 1)
    ev = []
    eid = 0
    for u in range(1, 9):
        eid += 1
        ev.append((eid, t0, u, "see", 1.0, "{}"))
        if u % 2 == 0:
            eid += 1
            ev.append((eid, t0, u, "buy", 1.0, "{}"))
    tmp = _write_sf(
        spark, "abtest_",
        events=(ev, "event_id long, ts timestamp, user_id long, "
                    "event_type string, value double, props string"),
    )
    got = {r.event_type: r for r in q_events_ab_test(spark, tmp).collect()}
    buy, see = got["buy"], got["see"]
    assert (buy.conv_a, buy.conv_b, buy.n_a, buy.n_b) == (4, 0, 4, 4)
    assert buy.significant
    assert (see.conv_a, see.conv_b) == (4, 4)
    assert not see.significant


def test_wide_dev_expr_past_int64(spark):
    """Synthetic-magnitude proof (r10, verdict item 3): the TVD cross
    products a*late_n / b*early_n each exceed 2^63 — bare int64 math
    would wrap or raise — yet Spark's DECIMAL(38,0) _wide_dev_expr and
    DuckDB's HUGEINT formula agree exactly on the (int64-sized)
    result."""
    import duckdb

    from rust_dms_cdc_operator_spark.inventory_llm import _wide_dev_expr

    # products ~1.6e19 > 2^63 (9.22e18); |dev| stays int64-sized
    a, b, en, ln = 4_000_000_001, 4_000_000_000, 4_000_000_000, 4_000_000_000
    df = spark.createDataFrame([(a, b, en, ln)], "a long, b long, en long, ln long")
    got = df.select(
        _wide_dev_expr(F.col("a"), F.col("b"), F.col("en"), F.col("ln"))
        .cast("long").alias("dev")
    ).collect()[0]["dev"]
    want = duckdb.sql(
        f"SELECT CAST(abs(CAST({a} AS HUGEINT) * {ln}"
        f" - CAST({b} AS HUGEINT) * {en}) AS BIGINT)"
    ).fetchone()[0]
    assert got == want == abs(a * ln - b * en)
    assert a * ln > 2**63  # the intermediate really is past int64


def test_wide_sig_expr_past_int64(spark):
    """Synthetic-magnitude proof for the A/B significance inequality:
    per-arm counts of ~4e9 users put d^2*N near 1e29 — far past 2^63 —
    and Spark DECIMAL(38,0) and DuckDB HUGEINT still return the same
    verdict on both sides of the boundary."""
    import duckdb

    from rust_dms_cdc_operator_spark.inventory_llm import _wide_sig_expr

    # full-imbalance worst case at 3e7 users/arm: d = c_a*n_b = 9e14,
    # d^2 = 8.1e29 — past 2^63 by 11 orders — while d^2*N = 4.9e37
    # still fits DECIMAL(38)/HUGEINT (the documented loud bound)
    n_a = n_b = 30_000_000
    cases = [
        (30_000_000, 0),                 # full imbalance -> significant
        (15_000_001, 15_000_000),        # 1-user imbalance -> not
    ]
    df = spark.createDataFrame(cases, "conv_a long, conv_b long")
    got = [
        r["sig"]
        for r in df.select(
            _wide_sig_expr(F.col("conv_a"), F.col("conv_b"), n_a, n_b)
            .alias("sig")
        ).collect()
    ]
    want = []
    for ca, cb in cases:
        want.append(duckdb.sql(
            f"SELECT (CAST({ca} AS HUGEINT)*{n_b} - CAST({cb} AS HUGEINT)*{n_a})"
            f" * (CAST({ca} AS HUGEINT)*{n_b} - CAST({cb} AS HUGEINT)*{n_a})"
            f" * ({n_a} + {n_b})"
            f" > 4 * CAST({n_a} AS HUGEINT) * {n_b} * ({ca} + {cb})"
            f" * ({n_a} + {n_b} - {ca} - {cb})"
        ).fetchone()[0])
    assert got == want == [True, False]
    d = cases[0][0] * n_b - cases[0][1] * n_a
    assert d * d > 2**63  # the d^2 intermediate really is past int64


def test_wide_vote_expr_past_int64(spark):
    """Synthetic-magnitude proof for the NB vote cross-multiplication:
    per-class token totals of ~4e9 put (c+1)*(N+V) past 2^63; Spark
    DECIMAL(38,0) and DuckDB HUGEINT agree on the vote sign, including
    the exact-tie abstain."""
    import duckdb

    from rust_dms_cdc_operator_spark.inventory_llm import _wide_vote_expr

    nh, no, v = 4_000_000_000, 4_000_000_000, 4096
    cases = [
        (3_000_000_000, 2_999_999_999),  # lean H by one count
        (2_999_999_999, 3_000_000_000),  # lean other
        (3_000_000_000, 3_000_000_000),  # exact tie -> abstain
    ]
    df = spark.createDataFrame(cases, "c_h long, c_o long")
    got = [
        r["vote"]
        for r in df.select(
            _wide_vote_expr(F.col("c_h"), F.col("c_o"), nh, no, v)
            .alias("vote")
        ).collect()
    ]
    want = []
    for ch, co in cases:
        want.append(duckdb.sql(
            f"SELECT CASE WHEN (CAST({ch} AS HUGEINT)+1)*({no}+{v})"
            f" > (CAST({co} AS HUGEINT)+1)*({nh}+{v}) THEN 1"
            f" WHEN (CAST({ch} AS HUGEINT)+1)*({no}+{v})"
            f" < (CAST({co} AS HUGEINT)+1)*({nh}+{v}) THEN -1"
            f" ELSE 0 END"
        ).fetchone()[0])
    assert got == want == [1, -1, 0]
    assert (cases[0][0] + 1) * (no + v) > 2**63


def test_keepbest_combo_past_int32(spark):
    """Synthetic-magnitude proof for the keep-best argmax (round 11,
    verdict item 2 — the last documented-not-coded integer bound):
    n_chars AND doc_id both past the old 2^32 combo base, yet Spark's
    pure-long ``max(struct(n_chars, -doc_id))`` and DuckDB's HUGEINT
    combo (whose n_chars*2^63 product is past 2^63 itself) select the
    same representative — the two encodings are strictly monotone in
    the same total order, so no magnitude can split them."""
    import duckdb

    from rust_dms_cdc_operator_spark.inventory_llm import (
        _keepbest_argmax_expr,
        _keepbest_decode_exprs,
    )

    # one group: the longest doc wins; the n_chars tie at 2^40+7 must
    # break to the LOWEST doc_id — both ids past 2^32
    rows = [
        (2**40 + 5, 2**40 + 7),   # tie, higher id -> loses tie-break
        (2**40 + 3, 2**40 + 7),   # tie, lowest id -> winner
        (2**62 + 11, 2**40 + 6),  # shorter, huge id -> loses
        (7, 2**33),               # small id, shortest -> loses
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = (
        df.agg(
            _keepbest_argmax_expr(
                F.col("n_chars"), F.col("doc_id")
            ).alias("_m")
        )
        .select(
            _keepbest_decode_exprs(F.col("_m"))[0].alias("keep_doc_id"),
            _keepbest_decode_exprs(F.col("_m"))[1].alias("keep_n_chars"),
        )
        .collect()[0]
    )
    vals = ", ".join(f"({d}, {n})" for d, n in rows)
    want = duckdb.sql(
        "WITH t(doc_id, n_chars) AS (VALUES " + vals + ") "
        "SELECT CAST(9223372036854775808::HUGEINT - 1 "
        " - max(n_chars::HUGEINT * 9223372036854775808::HUGEINT "
        "       + (9223372036854775808::HUGEINT - 1 - doc_id)) "
        "   % 9223372036854775808::HUGEINT AS BIGINT), "
        "CAST(max(n_chars::HUGEINT * 9223372036854775808::HUGEINT "
        "         + (9223372036854775808::HUGEINT - 1 - doc_id)) "
        "     // 9223372036854775808::HUGEINT AS BIGINT) FROM t"
    ).fetchone()
    assert (got["keep_doc_id"], got["keep_n_chars"]) == want
    assert want == (2**40 + 3, 2**40 + 7)
    assert (2**40 + 7) * 2**63 > 2**63  # the combo really is past int64


def test_lsh_pairs_incremental_matches_full(spark):
    """Round 11: the persisted band-key index + batch probe
    (minhash_band_keys / lsh_pairs_incremental) must discover EXACTLY
    the full-corpus minhash_lsh_pairs stream restricted to pairs with
    >= 1 batch member — the contract that lets incremental_groups
    compute the same groups as the from-scratch rebuild."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        lsh_pairs_incremental,
        minhash_band_keys,
        minhash_lsh_pairs,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", num_hashes=16, bands=2
        ).collect()
    }
    is_batch = F.col("doc_id") % 4 == 0
    keys_b = minhash_band_keys(
        d.filter(is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    keys_c = minhash_band_keys(
        d.filter(~is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    incr = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(keys_b, keys_c).collect()
    }
    want = {
        (a, b) for a, b in full if a % 4 == 0 or b % 4 == 0
    }
    assert incr == want and len(want) > 0
    # and the batch-free remainder is exactly the prior-epoch stream
    assert (full - want) == {
        (a, b) for a, b in full if a % 4 != 0 and b % 4 != 0
    }


def test_lsh_pairs_incremental_capped_matches_full_capped(spark):
    """Round 12 (verdict item 1): the probe-side hot-bucket cap must
    reproduce the BATCH cap's semantics exactly — capped incremental
    discovery equals minhash_lsh_pairs(max_bucket=...) restricted to
    batch-touching pairs, whether occupancies come from the corpus
    keys directly or from the persisted band_key_bucket_counts
    artifact. The cap is chosen to actually truncate (census-gated
    non-vacuous)."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        band_key_bucket_counts,
        lsh_pairs_incremental,
        lsh_probe_truncation_census,
        minhash_band_keys,
        minhash_lsh_pairs,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cap = 8
    is_batch = F.col("doc_id") % 4 == 0
    keys_b = minhash_band_keys(
        d.filter(is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    keys_c = minhash_band_keys(
        d.filter(~is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    census = lsh_probe_truncation_census(
        keys_b, keys_c, max_bucket=cap
    ).collect()
    assert sum(r.n_hot_buckets for r in census) > 0  # cap really bites
    assert all(
        r.n_buckets_touched >= r.n_hot_buckets and r.n_batch_slots_hot > 0
        for r in census
        if r.n_hot_buckets > 0
    )
    full_capped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", num_hashes=16, bands=2, max_bucket=cap
        ).collect()
    }
    want = {(a, b) for a, b in full_capped if a % 4 == 0 or b % 4 == 0}
    got = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(
            keys_b, keys_c, max_bucket=cap
        ).collect()
    }
    assert got == want and len(want) > 0
    # same through the persisted occupancy artifact (no corpus scan)
    art = band_key_bucket_counts(keys_c)
    got_art = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(
            keys_b, keys_c, max_bucket=cap, corpus_bucket_counts=art
        ).collect()
    }
    assert got_art == want
    # census through the artifact matches the direct-keys census
    cen_art = lsh_probe_truncation_census(
        keys_b, max_bucket=cap, corpus_bucket_counts=art
    ).collect()
    assert sorted(map(tuple, cen_art)) == sorted(map(tuple, census))


def test_lsh_pairs_incremental_cap_noop_under_cap(spark):
    """An over-generous cap must be a no-op: capped output ==
    uncapped output when no touched bucket exceeds the cap."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        lsh_pairs_incremental,
        minhash_band_keys,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    is_batch = F.col("doc_id") % 4 == 0
    keys_b = minhash_band_keys(
        d.filter(is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    keys_c = minhash_band_keys(
        d.filter(~is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    base = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(keys_b, keys_c).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(
            keys_b, keys_c, max_bucket=10**9
        ).collect()
    }
    assert capped == base and len(base) > 0


def test_lsh_pairs_incremental_overlap_guard(spark):
    """Round 12 (verdict item 3): a violated disjointness precondition
    degrades safely — no self-pairs ever (free probe-join filter), and
    check_disjoint=True raises loudly instead of corrupting downstream
    CC with duplicate/degenerate candidates."""
    import pytest

    from rust_dms_cdc_operator_spark.operators.dedup import (
        lsh_pairs_incremental,
        minhash_band_keys,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    keys_b = minhash_band_keys(
        d.filter(F.col("doc_id") % 4 == 0), "doc_id", "text",
        num_hashes=16, bands=2,
    )
    # corpus WRONGLY includes the batch ids (full-corpus index)
    keys_all = minhash_band_keys(
        d, "doc_id", "text", num_hashes=16, bands=2
    )
    rows = lsh_pairs_incremental(keys_b, keys_all).collect()
    assert len(rows) > 0
    assert all(r.id_a != r.id_b for r in rows)
    assert all(r.id_a < r.id_b for r in rows)
    with pytest.raises(ValueError, match="contains batch ids"):
        lsh_pairs_incremental(keys_b, keys_all, check_disjoint=True)


def test_probe_truncation_census_hand_check(spark):
    """The probe census numbers against a hand computation over the
    collected band keys: touched = buckets holding >= 1 batch key;
    hot = touched with batch+corpus occupancy > cap; slot counts split
    by side."""
    from collections import defaultdict

    from rust_dms_cdc_operator_spark.operators.dedup import (
        lsh_probe_truncation_census,
        minhash_band_keys,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    is_batch = F.col("doc_id") % 4 == 0
    keys_b = minhash_band_keys(
        d.filter(is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    keys_c = minhash_band_keys(
        d.filter(~is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    cap = 8
    cb: dict = defaultdict(int)
    cc: dict = defaultdict(int)
    for r in keys_b.collect():
        cb[(r.band, r.bk)] += 1
    for r in keys_c.collect():
        cc[(r.band, r.bk)] += 1
    exp: dict = {}
    for (band, bk), nb in cb.items():
        t = exp.setdefault(band, [0, 0, 0, 0])
        t[0] += 1
        if nb + cc.get((band, bk), 0) > cap:
            t[1] += 1
            t[2] += nb
            t[3] += cc.get((band, bk), 0)
    got = {
        r.band_idx: [
            r.n_buckets_touched,
            r.n_hot_buckets,
            r.n_batch_slots_hot,
            r.n_corpus_slots_hot,
        ]
        for r in lsh_probe_truncation_census(
            keys_b, keys_c, max_bucket=cap
        ).collect()
    }
    assert got == dict(exp)


def test_verify_pairs_tokens_strategy_unordered_input(spark):
    """Round 12 (ADVICE): strategy='tokens' must match the arrays path
    row-for-row on candidate streams of ANY orientation — before the
    least/greatest normalization, an id_a > id_b candidate silently
    got inter_size = 0 from the ordered-only _pair_inter_counts."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        containment_verify_pairs,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    cand = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=2)
    # flip half the candidates to violate the old id_a < id_b contract
    flip = F.col("id_a") % 2 == 0
    unordered = cand.select(
        F.when(flip, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
        F.when(flip, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
    )

    def key(rows):
        return sorted(
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b)) + tuple(r)[2:]
            for r in rows
        )

    ja = key(jaccard_verify_pairs(unordered, d, strategy="arrays").collect())
    jt = key(jaccard_verify_pairs(unordered, d, strategy="tokens").collect())
    assert ja == jt and len(ja) > 0
    ca = key(
        containment_verify_pairs(
            unordered, d, strategy="arrays", min_containment=0.1
        ).collect()
    )
    ct = key(
        containment_verify_pairs(
            unordered, d, strategy="tokens", min_containment=0.1
        ).collect()
    )
    assert ca == ct and len(ca) > 0


def test_bucket_counts_merge(spark):
    """Round 12: the occupancy artifact's additive maintenance —
    merging a batch into the persisted counts equals a from-scratch
    census over corpus ∪ batch, and the merged artifact drives the
    capped probe identically to direct-keys occupancies."""
    from rust_dms_cdc_operator_spark.operators.dedup import (
        band_key_bucket_counts,
        lsh_pairs_incremental,
        merge_bucket_counts,
        minhash_band_keys,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    is_batch = F.col("doc_id") % 4 == 0
    keys_b = minhash_band_keys(
        d.filter(is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    keys_c = minhash_band_keys(
        d.filter(~is_batch), "doc_id", "text", num_hashes=16, bands=2
    )
    keys_all = minhash_band_keys(
        d, "doc_id", "text", num_hashes=16, bands=2
    )
    merged = {
        (r.band, r.bk): r.c
        for r in merge_bucket_counts(
            band_key_bucket_counts(keys_c), keys_b
        ).collect()
    }
    scratch = {
        (r.band, r.bk): r.c
        for r in band_key_bucket_counts(keys_all).collect()
    }
    assert merged == scratch and len(merged) > 0
    # NEXT-epoch shape: a second batch capped against the merged
    # artifact equals capping against direct occupancy of its corpus
    is_b2 = F.col("doc_id") % 8 == 1
    keys_b2 = minhash_band_keys(
        d.filter(is_b2), "doc_id", "text", num_hashes=16, bands=2
    )
    corpus2 = minhash_band_keys(
        d.filter(~is_b2), "doc_id", "text", num_hashes=16, bands=2
    )
    # the occupancy artifact covers the CORPUS side only (the probe
    # adds the batch's own counts itself)
    art2 = band_key_bucket_counts(corpus2)
    got_art = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(
            keys_b2, corpus2, max_bucket=8, corpus_bucket_counts=art2
        ).collect()
    }
    got_direct = {
        (r.id_a, r.id_b)
        for r in lsh_pairs_incremental(
            keys_b2, corpus2, max_bucket=8
        ).collect()
    }
    assert got_art == got_direct and len(got_art) > 0
