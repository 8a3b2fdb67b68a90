"""Deterministic dataset splitting & stratified sampling.

Training pipelines need splits that are (a) reproducible across runs,
clusters, and engines, (b) stable under repartitioning, and (c) leak-
free (an id always lands in the same split). ``F.rand`` fails all
three (seeded per partition), so the split key is a content hash:
``md5(id || salt)`` truncated to a long and reduced mod a grain — the
same arithmetic the dedup operators use (operators/dedup.hex_to_long),
so every decision is bit-reproducible in any engine with md5 (the
DuckDB oracle replays it exactly).

Scale: the split/sample predicates are pure row-local expressions
(codegen, no shuffle, pushdown-friendly); stratified sampling adds one
broadcast-scale map of per-stratum rates.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.operators.dedup import hex_to_long

SPLIT_GRAIN = 10_000  # basis points: rates resolve to 0.01%


def split_bucket(id_col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, SPLIT_GRAIN): first 8 md5 hex chars
    of ``id || salt`` as a long, mod the grain. Independent buckets for
    independent decisions come from distinct salts."""
    key = F.concat(id_col.cast("string"), F.lit(salt))
    return F.pmod(hex_to_long(F.md5(key), 8), F.lit(SPLIT_GRAIN))


def with_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label with the given fractions (must
    sum to ≤ 1; remainder falls into the last split). Contiguous
    bucket ranges per split, so membership is a single comparison and
    an id can never change splits when other fractions move below it.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = split_bucket(F.col(id_col), salt)
    expr: Column | None = None
    hi = 0
    names = list(fractions)
    for name in names:
        hi += round(fractions[name] * SPLIT_GRAIN)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert expr is not None
    return df.withColumn(split_col, expr.otherwise(names[-1]))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    bucket falls under its stratum's rate. The rate map becomes a
    literal CASE (broadcast-scale; no join, no shuffle), so the filter
    pushes into the scan."""
    bucket = split_bucket(F.col(id_col), salt)
    rate: Column | None = None
    for value, r in rates.items():
        thresh = F.lit(round(r * SPLIT_GRAIN))
        cond = F.col(stratum_col) == F.lit(value)
        rate = F.when(cond, thresh) if rate is None else rate.when(cond, thresh)
    rate = (
        F.lit(round(default_rate * SPLIT_GRAIN))
        if rate is None
        else rate.otherwise(round(default_rate * SPLIT_GRAIN))
    )
    return df.filter(bucket < rate)


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Assign documents to fixed token-budget packs in key order —
    the distributed form of streaming-concat sequence packing (docs
    are concatenated in ``order_col`` order and sliced every
    ``budget`` tokens, so a document may straddle a pack boundary;
    the (pack_id, pack_offset) pair tells the tokenizer stage exactly
    where its bytes land).

    Built on ``with_global_rank``'s weighted prefix sum: one data
    shuffle, no single-partition window, scales like the rank."""
    from rust_dms_cdc_operator_spark.operators.chunk import (  # noqa: PLC0415
        RANK_COL,
        with_global_rank,
    )

    ranked = with_global_rank(
        df, [order_col], weight_col=token_col, prefix_col="_pre"
    )
    return (
        ranked.withColumn(
            pack_col, F.floor(F.col("_pre") / F.lit(budget)).cast("long")
        )
        .withColumn(offset_col, F.pmod(F.col("_pre"), F.lit(budget)).cast("long"))
        .drop(RANK_COL, "_pre")
    )


def rebalance_mix(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    token_col: str,
    target_shares: Mapping[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixing: downsample strata so the surviving TOKEN mass
    approximates the requested share per stratum (the data-mixing
    recipe step of a pre-training pipeline — e.g. cap web text at 60%,
    keep all code). Strata absent from ``target_shares`` are dropped;
    a stratum whose target exceeds its current share keeps everything
    (rates cap at 1 — this operator never upsamples).

    Two passes: one partial-agged groupBy collects per-stratum token
    totals (≤ #strata rows on the driver), then the keep-rates enter
    the plan as a literal CASE over the same deterministic md5 buckets
    as :func:`stratified_sample` — scan-local filter, no join, exactly
    reproducible in the SQL oracle (rates are ratios of exact integer
    sums; thresholds use floor, which both engines share).
    """
    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(stratum_col).agg(F.sum(token_col)).collect()
        if r[1] is not None
    }
    grand = sum(totals.values())
    bucket = split_bucket(F.col(id_col), salt)
    thr: Column | None = None
    for stratum, tok in totals.items():
        share = target_shares.get(stratum)
        if share is None or tok <= 0:
            continue
        rate = min(1.0, (share * grand) / tok)
        t = int(rate * SPLIT_GRAIN)  # floor, engine-portable
        cond = F.col(stratum_col) == F.lit(stratum)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    if thr is None:
        return df.filter(F.lit(False))
    return df.filter(bucket < thr.otherwise(0))


def write_sharded(
    df: DataFrame,
    path: str,
    order_col: str,
    rows_per_shard: int,
    fmt: str = "parquet",
) -> int:
    """Materialize a curated dataset as bounded, key-ordered shards —
    the output hygiene a downstream tokenizer/loader wants: files of
    predictable size, rows in ``order_col`` order within and across
    shards (shard N's keys all precede shard N+1's).

    Uses the exact global rank to derive the shard id, range-shuffles
    on it (one shuffle; each writer task owns whole shards), sorts
    within partitions, and bounds files with ``maxRecordsPerFile`` as
    the belt-and-braces limit. Returns the shard count."""
    from rust_dms_cdc_operator_spark.operators.chunk import (  # noqa: PLC0415
        RANK_COL,
        with_global_rank,
    )

    ranked = with_global_rank(df, [order_col])
    sharded = ranked.withColumn(
        "shard_id",
        F.floor((F.col(RANK_COL) - 1) / F.lit(rows_per_shard)).cast("long"),
    ).drop(RANK_COL)
    (
        sharded.repartitionByRange("shard_id")
        .sortWithinPartitions("shard_id", order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .partitionBy("shard_id")
        .format(fmt)
        .save(path)
    )
    # count shards by reading back through Spark — works on any
    # filesystem the write targeted (s3a/hdfs/local), unlike os.listdir
    mx = (
        df.sparkSession.read.format(fmt)
        .load(path)
        .agg(F.max("shard_id"))
        .first()[0]
    )
    return int(mx) + 1 if mx is not None else 0


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "42",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Reproducible global permutation for training-data ordering:
    rank rows by ``md5(seed || ':' || id)``. The same seed gives the
    same permutation on any engine, cluster size, or partitioning
    (``F.rand`` gives none of that — per-partition seeding), and
    changing the seed is a full independent reshuffle.

    The rank comes from ``chunk.with_global_rank`` — per-bucket windows
    plus a broadcast bucket-offset lookup, ONE shuffle, no
    single-partition window — so the permutation is exact (1-based,
    gap-free), which downstream shard writers rely on.
    """
    from rust_dms_cdc_operator_spark.operators.chunk import (  # noqa: PLC0415
        with_global_rank,
    )

    key = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    keyed = df.withColumn("_shuffle_key", key)
    ranked = with_global_rank(
        keyed, ["_shuffle_key", id_col], rank_col=rank_col
    )
    return ranked.drop("_shuffle_key")


def weighted_bottom_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows: priority =
    hash(id) / weight, keep the k smallest — heavier rows get
    proportionally smaller priorities, so inclusion probability rises
    with weight (priority sampling / weighted bottom-k). The hash is
    the usual 60-bit md5 long and the priority a SINGLE IEEE division
    of exact integers, so the selected set is bit-reproducible in any
    engine (transcendental-free, unlike the classic
    u^(1/w) / -ln(u)/w A-Res keys, whose libm rounding differs across
    engines).

    Scale: priority is a row-local expression; the global cut is
    orderBy+limit, which Catalyst plans as TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver-side single
    reduce task, never a full sort shuffle. Mergeable the same way
    KMV is: union two samples, re-take the k smallest."""
    h = hex_to_long(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 15)
    priority = h.cast("double") / F.col(weight_col).cast("double")
    return (
        df.withColumn("_ws_priority", priority)
        .orderBy("_ws_priority", id_col)
        .limit(k)
        .drop("_ws_priority")
    )


def largest_remainder_quotas(
    totals: Mapping[str, int], k: int
) -> dict[str, int]:
    """Hamilton/largest-remainder apportionment of ``k`` sample seats
    across strata: base = (k * n_s) div N seats each, leftovers to the
    largest remainders (ties to the lexicographically smaller
    stratum). All integer arithmetic — the SQL oracle reproduces the
    allocation bit-for-bit — and the standard way to turn "100 eval
    docs, proportional by source" into EXACT per-stratum counts
    (independent floor/round rates drift from k by up to #strata)."""
    n_total = sum(totals.values())
    if n_total == 0 or k <= 0:
        return {s: 0 for s in totals}
    quotas = {s: (k * n) // n_total for s, n in totals.items()}
    seats = k - sum(quotas.values())
    order = sorted(
        totals, key=lambda s: (-((k * totals[s]) % n_total), s)
    )
    for s in order[:seats]:
        quotas[s] += 1
    return quotas


def stratified_quota_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    k: int,
    salt: str = "quota",
    oversample: int = 8,
) -> DataFrame:
    """EXACT-size stratified sample: ``k`` rows total, apportioned to
    strata by :func:`largest_remainder_quotas`, the quota-th smallest
    md5 keys winning within each stratum — the eval-set construction
    shape (rate-based sampling à la :func:`stratified_sample` gives
    binomial wobble around the target; an eval set needs exactly-k).

    Returns (id, stratum, rank_in_stratum, quota), rank 1-based.

    Scale shape: per-stratum counts are one partial-agged groupBy
    whose result (≤ #strata rows) is the only driver materialization
    — the :func:`rebalance_mix` contract; quotas and prune thresholds
    re-enter the plan as literal CASEs (no join). The within-stratum
    rank is computed only among rows whose 32-bit key falls under
    ``(oversample * quota * 2^32) div n_s`` — expected survivors
    ``oversample * quota`` per stratum, so the rank window sorts
    O(quota) rows instead of the whole stratum (the distributed
    top-k oversampling trick; at 100 TB the unpruned variant would
    globally sort every stratum for a 100-row answer). The prune rule
    is integer-deterministic and part of the operator's contract —
    the oracle applies it identically — and undersampling requires a
    stratum to put fewer than ``quota`` of its ``n_s`` keys below an
    ``oversample``-times-proportional threshold: for the default 8x,
    a ~e^-8-per-stratum tail event; callers needing a hard guarantee
    set ``oversample`` so that ``oversample * quota * 2^32 >= n_s``
    (prune disabled, exact global rank)."""
    if k < 0 or oversample < 1:
        raise ValueError("k must be >= 0, oversample >= 1")
    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n_s"))
        .collect()
    }
    quotas = largest_remainder_quotas(totals, k)
    h = hex_to_long(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 8
    )
    thr: Column | None = None
    qcol: Column | None = None
    for s in sorted(totals):
        n_s, q = totals[s], quotas[s]
        t = min((oversample * q * (1 << 32)) // n_s, 1 << 32) if n_s else 0
        cond = F.col(stratum_col) == F.lit(s)
        thr = F.when(cond, F.lit(t)) if thr is None else thr.when(cond, F.lit(t))
        qcol = (
            F.when(cond, F.lit(q)) if qcol is None else qcol.when(cond, F.lit(q))
        )
    if thr is None:
        return df.sparkSession.createDataFrame(
            [],
            f"{id_col} long, {stratum_col} string, "
            "rank_in_stratum long, quota long",
        )
    from pyspark.sql import Window  # noqa: PLC0415

    surv = df.select(
        F.col(id_col),
        F.col(stratum_col),
        h.alias("_h"),
        qcol.otherwise(0).alias("_q"),
    ).filter(F.col("_h") < thr.otherwise(0))
    w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    return (
        surv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_q"))
        .select(
            id_col,
            stratum_col,
            F.col("_rn").cast("long").alias("rank_in_stratum"),
            F.col("_q").cast("long").alias("quota"),
        )
    )
