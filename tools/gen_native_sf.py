"""Generate a NATIVE scaled sf directory: fresh rows matching the
driver tables' observed distributions, not replicated copies.

Round-4 verdict item 7: `gen_scaled_sf.py` replicates rows K times,
which distorts the pair-producing workloads (dedup/LSH output growth
measures the replication artifact, not the data). This generator
synthesizes NEW rows — 10x the counts with the same value
distributions — so the bench's sf1 section measures the genuine
workload: document text is drawn word-by-word from the SOURCE
corpus's own vocabulary, embeddings from the same value range,
TPC-H-ish facts with fresh keys joined to the copied dims.

Determinism without ``Math.random``: every sampled value is a pure
function of (row id, column seed) through ``xxhash64`` — the same
deterministic-hash discipline the engine's split/shuffle operators
use — so two runs produce identical bytes and all generation stays
JVM-side (``spark.range`` + expressions; zero Python on workers,
zero driver loops).

Small dims (region/nation/supplier/part) are copied as-is, as in
TPC-H where dims grow sublinearly; every fact/corpus table is
generated at ``K`` times the source row count.

This data is for TIMING scale checks only — correctness runs against
the driver's own tables.

Usage: python tools/gen_native_sf.py [src_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

COPY_TABLES = ["region", "nation", "supplier", "part"]


def _h(seed: str, *cols: Column) -> Column:
    """Deterministic 64-bit hash of (seed, cols...)."""
    return F.xxhash64(F.lit(seed), *cols)


def _u(seed: str, *cols: Column) -> Column:
    """Deterministic uniform double in [0, 1)."""
    return (F.pmod(_h(seed, *cols), F.lit(1 << 20))) / F.lit(float(1 << 20))


def _pick(seed: str, id_col: Column, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(_h(seed, id_col), len(values)) + 1).cast("int"))


def _counts(spark: SparkSession, src: str) -> dict[str, int]:
    out = {}
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings"):
        out[t] = spark.read.parquet(f"{src}/{t}.parquet").count()
    return out


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        i.alias("c_custkey"),
        F.format_string("Customer#%09d", i.cast("int")).alias("c_name"),
        F.pmod(_h("cnat", i), 25).cast("int").alias("c_nationkey"),
        F.round(F.lit(-1000.0) + _u("cbal", i) * 11000.0, 2).alias("c_acctbal"),
        _pick("cmkt", i, ["AUTOMOBILE", "BUILDING", "FURNITURE",
                          "HOUSEHOLD", "MACHINERY"]).alias("c_mktsegment"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    i = F.col("id")
    odate = F.timestamp_seconds(
        F.unix_timestamp(F.lit("1995-01-01 00:00:00"))
        + F.pmod(_h("odate", i), 2400) * 86400
    )
    return spark.range(n).select(
        i.alias("o_orderkey"),
        F.pmod(_h("ocust", i), n_cust).alias("o_custkey"),
        _pick("ostat", i, ["F", "O", "P"]).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u("oprice", i) * 499000.0, 2).alias(
            "o_totalprice"
        ),
        odate.cast("timestamp_ntz").alias("o_orderdate"),
        _pick("oprio", i, ["1-URGENT", "2-HIGH", "3-MEDIUM",
                           "4-NOT SPECIFIED", "5-LOW"]).alias(
            "o_orderpriority"
        ),
    )


def gen_lineitem(spark: SparkSession, n_orders: int) -> DataFrame:
    """1..7 lines per order (observed mean ≈ 4) via sequence+explode —
    the fan-out is a generated column, not a join."""
    base = spark.range(n_orders).select(
        F.col("id").alias("l_orderkey"),
        F.explode(
            F.sequence(
                F.lit(1), (F.pmod(_h("lcnt", F.col("id")), 7) + 1).cast("int")
            )
        ).alias("l_linenumber"),
    )
    o = F.col("l_orderkey")
    ln = F.col("l_linenumber")
    shipdate = F.timestamp_seconds(
        F.unix_timestamp(F.lit("1995-01-02 00:00:00"))
        + F.pmod(_h("lship", o, ln), 2450) * 86400
    )
    return base.select(
        "l_orderkey",
        F.pmod(_h("lpart", o, ln), 20000).alias("l_partkey"),
        F.pmod(_h("lsupp", o, ln), 1000).alias("l_suppkey"),
        ln.cast("int").alias("l_linenumber"),
        (F.pmod(_h("lqty", o, ln), 50) + 1).cast("double").alias("l_quantity"),
        F.round(F.lit(900.0) + _u("lprice", o, ln) * 104100.0, 2).alias(
            "l_extendedprice"
        ),
        (F.pmod(_h("ldisc", o, ln), 11) / F.lit(100.0)).alias("l_discount"),
        (F.pmod(_h("ltax", o, ln), 9) / F.lit(100.0)).alias("l_tax"),
        _pick("lret", F.xxhash64(o, ln), ["A", "N", "R"]).alias("l_returnflag"),
        _pick("lls", F.xxhash64(o, ln, ln), ["F", "O"]).alias("l_linestatus"),
        shipdate.cast("timestamp_ntz").alias("l_shipdate"),
    )


def gen_events(spark: SparkSession, n: int, n_users: int) -> DataFrame:
    i = F.col("id")
    # 30-day window at microsecond resolution, like the source table
    micros = F.pmod(_h("ets", i), F.lit(30 * 86400 * 1_000_000))
    ts = F.timestamp_micros(
        F.unix_timestamp(F.lit("2024-01-01 00:00:00")) * 1_000_000 + micros
    )
    return spark.range(n).select(
        i.alias("event_id"),
        ts.cast("timestamp_ntz").alias("ts"),
        F.pmod(_h("euser", i), n_users).alias("user_id"),
        _pick("etype", i, ["click", "error", "purchase", "signup", "view"])
        .alias("event_type"),
        F.round(_u("eval", i) * 560.0, 2).alias("value"),
        F.format_string(
            '{"k": %d}', F.pmod(_h("eprops", i), 100).cast("int")
        ).alias("props"),
    )


def gen_documents(spark: SparkSession, n: int, vocab: list[str],
                  sources: list[str]) -> DataFrame:
    """Fresh docs drawn word-by-word from the SOURCE corpus vocabulary
    (10–100 words, like the observed length range) — near-dup pairs at
    scale are then a genuine property of the tiny adversarial
    vocabulary, not of row replication."""
    i = F.col("id")
    n_words = (F.pmod(_h("dlen", i), 91) + 10).cast("int")
    arr = F.array(*[F.lit(w) for w in vocab])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(
                arr, (F.pmod(_h("dword", i, j), len(vocab)) + 1).cast("int")
            ),
        ),
        " ",
    )
    # observed language mix: en ~41%, the rest ~15% each
    lang_u = _u("dlang", i)
    lang = (
        F.when(lang_u < 0.41, "en")
        .when(lang_u < 0.56, "de")
        .when(lang_u < 0.71, "es")
        .when(lang_u < 0.86, "fr")
        .otherwise("zh")
    )
    return spark.range(n).select(
        i.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        _pick("dsrc", i, sources).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int, dim: int = 64) -> DataFrame:
    i = F.col("id")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(_h("evec", i, j), 2001) / F.lit(1000.0) - 1.0) * 0.33
        ).cast("float"),
    )
    return spark.range(n).select(
        i.alias("vec_id"),
        emb.alias("embedding"),
        F.pmod(_h("elabel", i), 10).cast("int").alias("label"),
    )


def generate(spark: SparkSession, src_dir: str, dst_dir: str,
             k: int = 10) -> None:
    # match the driver fixtures' physical encoding (timestamp[us]) so
    # dtype-probing readers see the same schema at every scale
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    # NTZ + UTC session: fixture timestamps are timezone-naive wall
    # clocks; TimestampType would write isAdjustedToUTC=true
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    os.makedirs(dst_dir, exist_ok=True)
    for t in COPY_TABLES:
        spark.read.parquet(f"{src_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst_dir}/{t}.parquet")

    n = _counts(spark, src_dir)
    src_docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    vocab = sorted(
        r[0]
        for r in src_docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().collect()
        if r[0]
    )
    sources = sorted(
        r[0] for r in src_docs.select("source").distinct().collect()
    )
    n_users = (
        spark.read.parquet(f"{src_dir}/events.parquet")
        .agg(F.max("user_id")).first()[0] + 1
    )

    tables = {
        "customer": gen_customer(spark, n["customer"] * k),
        "orders": gen_orders(spark, n["orders"] * k, n["customer"] * k),
        "lineitem": gen_lineitem(spark, n["orders"] * k),
        "events": gen_events(spark, n["events"] * k, n_users * k),
        "documents": gen_documents(spark, n["documents"] * k, vocab, sources),
        "embeddings": gen_embeddings(spark, n["embeddings"] * k),
    }
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{dst_dir}/{name}.parquet")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-graft-sf1-native"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from rust_dms_cdc_operator_spark.session import get_spark

    spark = get_spark(app_name="gen-native-sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    generate(spark, src, dst, k)
    print(f"wrote {dst} (native K={k} from {src})")


if __name__ == "__main__":
    main()
