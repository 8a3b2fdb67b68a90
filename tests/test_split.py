"""Deterministic split / stratified sampling (operators/split.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.split import (
    stratified_sample,
    with_split,
)

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_partition_invariant(spark, ids):
    a = {r.doc_id: r.split for r in with_split(ids, "doc_id", FRACS).collect()}
    b = {
        r.doc_id: r.split
        for r in with_split(ids.repartition(13), "doc_id", FRACS).collect()
    }
    assert a == b
    # membership is a pure function of the id: a subset sees the same
    # assignments (no leakage when the corpus changes around an id)
    sub = ids.filter(F.col("doc_id") % 7 == 0)
    c = {r.doc_id: r.split for r in with_split(sub, "doc_id", FRACS).collect()}
    assert all(a[k] == v for k, v in c.items())


def test_split_fractions_approximate(spark, ids):
    counts = (
        with_split(ids, "doc_id", FRACS)
        .groupBy("split").count().collect()
    )
    got = {r["split"]: r["count"] / 5000 for r in counts}
    assert abs(got["train"] - 0.8) < 0.03
    assert abs(got["val"] - 0.1) < 0.02
    assert abs(got["test"] - 0.1) < 0.02


def test_split_rejects_over_unity(spark, ids):
    with pytest.raises(ValueError, match="> 1"):
        with_split(ids, "doc_id", {"a": 0.9, "b": 0.2})


def test_split_independent_salts(spark, ids):
    """Different salts make independent decisions — the val sets of
    two salted splits must not coincide."""
    a = {r.doc_id for r in with_split(ids, "doc_id", FRACS, salt="s1")
         .filter("split = 'val'").collect()}
    b = {r.doc_id for r in with_split(ids, "doc_id", FRACS, salt="s2")
         .filter("split = 'val'").collect()}
    overlap = len(a & b) / max(1, len(a))
    assert 0.0 < overlap < 0.5  # ~10% expected under independence


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.1})
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert abs(counts["en"] / 2000 - 0.5) < 0.05
    assert abs(counts["de"] / 2000 - 0.1) < 0.03
    again = stratified_sample(df.repartition(7), "doc_id", "lang",
                              {"en": 0.5, "de": 0.1})
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # unknown stratum with default_rate=0 drops everything
    none = stratified_sample(df, "doc_id", "lang", {"xx": 1.0})
    assert none.count() == 0


def test_global_prefix_sum_exact(spark):
    """The weighted rank's exclusive prefix sum must equal the naive
    single-partition window on shuffled input."""
    import random

    from rust_dms_cdc_operator_spark.operators.chunk import with_global_rank

    rng = random.Random(3)
    rows = [(i, rng.randint(1, 50)) for i in range(1000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, wt long").repartition(11)
    got = {
        r.k: r._prefix_sum
        for r in with_global_rank(df, ["k"], weight_col="wt").collect()
    }
    acc, want = 0, {}
    for k, wt in sorted(rows):
        want[k] = acc
        acc += wt
    assert got == want


def test_pack_sequences_semantics(spark):
    from rust_dms_cdc_operator_spark.operators.split import pack_sequences

    rows = [(1, 5), (2, 3), (3, 4), (4, 10), (5, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in pack_sequences(df, "doc_id", "n_tokens", budget=8).collect()
    }
    # prefix sums: 0,5,8,12,22 -> packs 0,0,1,1,2 at offsets 0,5,0,4,6
    assert out == {1: (0, 0), 2: (0, 5), 3: (1, 0), 4: (1, 4), 5: (2, 6)}


def test_repetition_ratio_edges(spark):
    from pyspark.sql import functions as F

    from rust_dms_cdc_operator_spark.functions.text import (
        repetition_ratio_expr,
    )

    rows = [
        (1, "a b c a b c a b c"),   # heavy repetition
        (2, "all distinct words here now"),
        (3, "too short"),           # < n words -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.rr
        for r in df.select(
            "doc_id", repetition_ratio_expr(F.col("text"), 3).alias("rr")
        ).collect()
    }
    assert got[3] == 0.0 and got[2] == 0.0
    # 7 grams, 3 distinct -> 1 - 3/7
    assert abs(got[1] - round(1 - 3 / 7, 6)) < 1e-9


def test_rebalance_mix_token_shares(spark):
    """Kept token mass per stratum lands near the requested share of
    the corpus; over-target strata cap at keep-all; unlisted strata
    drop; deterministic under repartition."""
    from rust_dms_cdc_operator_spark.operators.split import rebalance_mix

    rows = []
    for i in range(3000):
        src = ("web", "code", "junk")[i % 3]
        rows.append((i, src, 100))  # equal thirds of token mass
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = rebalance_mix(
        df, "doc_id", "source", "n_tokens",
        {"web": 0.10, "code": 0.50},  # code target > its 1/3 share -> cap
    )
    kept = {r["source"]: r["tok"] for r in out.groupBy("source")
            .agg(F.sum("n_tokens").alias("tok")).collect()}
    grand = 3000 * 100
    assert "junk" not in kept
    assert kept["code"] == grand // 3  # capped at everything it has
    assert abs(kept["web"] / grand - 0.10) < 0.02
    again = rebalance_mix(
        df.repartition(7), "doc_id", "source", "n_tokens",
        {"web": 0.10, "code": 0.50},
    )
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_write_sharded(spark, tmp_path):
    """Shards are bounded, ordered, and key-disjoint: shard N's keys
    all precede shard N+1's; no file exceeds rows_per_shard."""
    import glob

    import pyarrow.parquet as pq_mod

    from rust_dms_cdc_operator_spark.operators.split import write_sharded

    df = spark.range(0, 1050).withColumnRenamed("id", "doc_id") \
        .withColumn("payload", F.col("doc_id") * 2)
    path = str(tmp_path / "shards")
    n = write_sharded(df, path, "doc_id", rows_per_shard=200)
    assert n == 6  # ceil(1050/200)
    back = spark.read.parquet(path)
    assert back.count() == 1050
    ranges = {
        r.shard_id: (r.lo, r.hi)
        for r in back.groupBy("shard_id")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    }
    for s in range(5):
        assert ranges[s][1] < ranges[s + 1][0]
    for f in glob.glob(f"{path}/shard_id=*/*.parquet"):
        assert pq_mod.read_metadata(f).num_rows <= 200


def test_sample_filter_is_scan_local(spark):
    """The sampling predicate must stay a row-local filter — no
    shuffle, no join in the plan."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_deterministic_shuffle_permutation(spark, ids):
    from rust_dms_cdc_operator_spark.operators.split import (
        deterministic_shuffle,
    )

    out = deterministic_shuffle(ids, "doc_id", seed="7")
    pairs = {(r.doc_id, r.shuffle_rank) for r in out.collect()}
    # exact gap-free 1..n permutation
    assert sorted(r for _i, r in pairs) == list(range(1, 5001))
    # partition-invariant: same permutation from any physical layout
    again = deterministic_shuffle(ids.repartition(13), "doc_id", seed="7")
    assert {(r.doc_id, r.shuffle_rank) for r in again.collect()} == pairs
    # a different seed is a genuinely different permutation
    other = deterministic_shuffle(ids, "doc_id", seed="8")
    assert {(r.doc_id, r.shuffle_rank) for r in other.collect()} != pairs


def test_largest_remainder_quotas_exact():
    from rust_dms_cdc_operator_spark.operators.split import (
        largest_remainder_quotas,
    )

    totals = {"web": 70, "code": 20, "wiki": 7, "books": 3}
    q = largest_remainder_quotas(totals, 10)
    assert sum(q.values()) == 10
    assert q == {"web": 7, "code": 2, "wiki": 1, "books": 0}
    # every allocation is within 1 of the exact proportional share
    for s, n in totals.items():
        assert abs(q[s] - 10 * n / 100) < 1
    assert largest_remainder_quotas({}, 5) == {}
    assert largest_remainder_quotas({"a": 3}, 0) == {"a": 0}


def test_stratified_quota_sample_exact_k_and_rank(spark):
    from rust_dms_cdc_operator_spark.operators.split import (
        largest_remainder_quotas,
        stratified_quota_sample,
    )

    rows = [(i, "s%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = stratified_quota_sample(df, "id", "stratum", k=12).collect()
    assert len(out) == 12
    quotas = largest_remainder_quotas({"s0": 30, "s1": 30, "s2": 30}, 12)
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r.stratum, []).append(r)
    for s, got in by_stratum.items():
        assert len(got) == quotas[s]
        assert sorted(r.rank_in_stratum for r in got) == list(
            range(1, quotas[s] + 1)
        )


def test_stratified_quota_sample_matches_unpruned_rank(spark):
    """With oversample large enough to disable the prune, the winners
    must be exactly the quota smallest md5 keys per stratum (global
    rank) — and the default 8x prune must pick the same set here."""
    from rust_dms_cdc_operator_spark.operators.dedup import hex_to_long
    from rust_dms_cdc_operator_spark.operators.split import (
        stratified_quota_sample,
    )
    from pyspark.sql import functions as F

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    pruned = stratified_quota_sample(df, "id", "stratum", k=20)
    full = stratified_quota_sample(
        df, "id", "stratum", k=20, oversample=1 << 32
    )
    want = {(r.id, r.stratum, r.rank_in_stratum) for r in full.collect()}
    got = {(r.id, r.stratum, r.rank_in_stratum) for r in pruned.collect()}
    assert got == want
    # winners really are the globally-smallest hash keys per stratum
    h = hex_to_long(
        F.md5(F.concat(F.col("id").cast("string"), F.lit("quota"))), 8
    )
    hashes = {
        r.id: r.h for r in df.select("id", h.alias("h")).collect()
    }
    for s in ("a", "b"):
        ids = sorted(
            (i for i, st in rows if st == s), key=lambda i: (hashes[i], i)
        )[:10]
        assert {i for i, st, _ in got if st == s} == set(ids)


def test_stratified_quota_sample_partitioning_invariant(spark):
    from rust_dms_cdc_operator_spark.operators.split import (
        stratified_quota_sample,
    )

    rows = [(i, "s%d" % (i % 4)) for i in range(120)]
    df1 = spark.createDataFrame(rows, "id long, stratum string")
    df2 = df1.repartition(13, "id")
    a = {
        (r.id, r.rank_in_stratum)
        for r in stratified_quota_sample(df1, "id", "stratum", 17).collect()
    }
    b = {
        (r.id, r.rank_in_stratum)
        for r in stratified_quota_sample(df2, "id", "stratum", 17).collect()
    }
    assert a == b and len(a) == 17
