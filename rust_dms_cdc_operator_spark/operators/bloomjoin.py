"""Runtime Bloom-filter semi-join: the 100 TB join-pruning pattern.

The dominant cost of a selective semi-join at scale is shuffling the
PROBE side: ``probe JOIN build ON key`` moves every probe row to its
hash partition before a single build key is consulted. Engines with
runtime row-level filtering (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled``, which injects a
``BloomFilterAggregate`` under the join) solve this by shipping a
compact membership sketch of the build keys to the probe scan so
non-matching rows die *before* the shuffle/exchange.

This build of Spark does not expose ``bloom_filter_agg`` /
``might_contain`` as SQL functions, so the operator assembles the
same plan from first principles with nothing but built-in
expressions — no UDFs, no RDDs:

1. Build side: distinct keys → ``num_hashes`` positions each via
   seeded ``xxhash64`` → OR-fold into 64-bit bitmap words with ONE
   ``groupBy(word_index).agg(bit_or)`` shuffle. The collected bitmap
   is ≤ ``num_bits/64`` longs — a size fixed by configuration, NOT by
   data volume (the same bounded-collect discipline as the sketch
   grids in ``operators/sketch``).
2. Probe side: the bitmap becomes a literal array broadcast with the
   plan; membership is ``num_hashes`` pure-JVM bit tests inside
   whole-stage codegen, applied at the scan — rows failing the Bloom
   test never reach the exchange.
3. Exactness: Bloom filters admit false positives, so survivors flow
   into a real ``left_semi`` join against the distinct build keys.
   The final result is bit-identical to the plain semi-join — the
   Bloom stage only reduces the rows that pay the shuffle, by
   (1 - FPR) of the non-matching volume.

At 1000 executors the bitmap (16 KiB at the default 2^17 bits) rides
the closure to every task; the probe scan stays a single pass with
predicate + Bloom test fused by codegen.

False-positive rate: with m bits, k hashes, n distinct build keys,
FPR ≈ (1 - e^(-kn/m))^k — at the defaults (m=131072, k=5) a build
side of 10k keys probes at ~0.1% FPR. Size ``num_bits`` ~10-16 bits
per expected build key.

Reference intent: the reference validates by shipping *all* source
rows to compare (pgdatadiff-style, rust-pgdatadiff ``diff`` over full
tables); this operator is what replaces that shape when only a thin
slice of a 100 TB fact actually joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """k seeded-xxhash64 bit positions for a key (non-negative)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits)).cast("int")
        for i in range(num_hashes)
    ]


def build_bloom_bitmap(
    build: DataFrame,
    key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> list[int]:
    """Aggregate the build side's distinct keys into a Bloom bitmap.

    Returns ``num_bits // 64`` longs. The collect is bounded by the
    CONFIGURED bitmap size (2048 longs at the default), independent of
    build-side cardinality — all per-key work (hashing, bit OR) is
    distributed and map-side combined before anything reaches the
    driver.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    keys = (
        build.select(F.col(key).alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
    )
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("__k"), num_hashes, num_bits)))
        .alias("p")
    )
    # variable-amount shifts go through SQL expr: the PySpark wrappers
    # for shiftleft/shiftright accept only Python-int amounts
    words = (
        pos.selectExpr(
            "shiftright(p, 6) AS w",
            "shiftleft(1L, p % 64) AS bit",
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_filter_rows(
    df: DataFrame, bitmap: list[int], key: str, num_hashes: int = 5
) -> DataFrame:
    """Keep only rows whose ``key`` MIGHT be in the Bloom bitmap.

    The bitmap rides the plan as one literal array column;
    ``num_hashes`` element_at + variable shift + mask tests run inside
    whole-stage codegen (SQL expr, because the PySpark shift wrappers
    take only constant amounts). Arithmetic shiftright is safe: only
    the lowest bit is inspected after the shift. NULL keys are
    dropped — a semi-join never matches NULL.
    """
    num_bits = len(bitmap) * 64
    out = df.withColumn("__bf", F.lit(bitmap))
    tests = []
    for i, p in enumerate(
        _positions(F.col(key), num_hashes, num_bits)
    ):
        out = out.withColumn(f"__p{i}", p)
        tests.append(
            f"(shiftright(element_at(__bf, shiftright(__p{i}, 6) + 1),"
            f" __p{i} % 64) & 1) = 1"
        )
    cond = F.col(key).isNotNull() & F.expr(" AND ".join(tests))
    return out.where(cond).drop(
        "__bf", *[f"__p{i}" for i in range(num_hashes)]
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT semi-join with a Bloom pre-filter on the probe scan.

    Result ≡ ``probe.join(build[key].distinct(), key, "left_semi")``;
    the Bloom test eliminates ~(1-FPR) of non-matching probe rows
    before the exchange, which is where a 100 TB probe side spends
    its time. The verifying semi-join clears false positives — AQE
    broadcasts the distinct build keys when they are small.
    """
    bitmap = build_bloom_bitmap(build, key, num_bits, num_hashes)
    keys = (
        build.select(F.col(key).alias(key))
        .where(F.col(key).isNotNull())
        .distinct()
    )
    pre = bloom_filter_rows(probe, bitmap, key, num_hashes)
    return pre.join(keys, key, "left_semi")
