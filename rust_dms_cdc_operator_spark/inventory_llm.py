"""Query inventory, part 2: training-data pipeline operators
(dedup / similarity / text analysis / multimodal / streaming CDC).

Same contract as ``inventory.py``: each query has a DuckDB oracle
whose SQL reproduces the Spark semantics bit-for-bit. Hash-bearing
queries share the md5 construction between engines; ratio-bearing
queries emit exact integer numerators/denominators where a rounded
float could round differently across engines.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.functions.multimodal import (
    extract_media_features,
    with_media_columns,
)
from rust_dms_cdc_operator_spark.functions.text import (
    STOPWORDS,
    fingerprint_expr,
    langid_expr,
    punct_count,
    quality_score_expr,
    regex_token_count,
    stopword_hits,
    whitespace_token_count,
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
    ivf_topk,
    lsh_bucket_topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The constant query vector: embedding of vec_id=0 (one driver-side
    row — a constant of the query, not data movement)."""
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).head()
    )
    return [float(x) for x in row["embedding"]]


# ------------------------------------------------------------------- dedup
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=2)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return simhash16(d, "doc_id", "text")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        d, "doc_id", "text", block_col="source", n=3, max_id_gap=5
    )


def q_dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        e, "vec_id", "embedding", block_col="label", max_id_gap=25
    )


# --------------------------------------------------------------- similarity
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") > 0)
    return cosine_topk(e, _query_vec(spark, sf_dir), "vec_id", "embedding", k=10)


def q_sim_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") > 0)
    return lsh_bucket_topk(
        e, _query_vec(spark, sf_dir), "vec_id", "embedding", k=10, bits=8
    )


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: 8 deterministic centroids (the 8 smallest vec_ids —
    production would train these with pyspark.ml KMeans), probe the 2
    lists nearest the query, exact top-10 within them."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") > 0)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.orderBy("vec_id").limit(8).collect()
    ]
    return ivf_topk(
        e, _query_vec(spark, sf_dir), cents, "vec_id", "embedding", k=10, nprobe=2
    )


# --------------------------------------------------------------------- text
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", langid_expr(F.col("text")).alias("pred_lang"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    sw = (
        stopword_hits(t, "en") + stopword_hits(t, "de") + stopword_hits(t, "fr")
    )
    # longs, not ints: DuckDB len()/length() return BIGINT and the
    # driver's schema compare may be type-sensitive
    return d.select(
        "doc_id",
        whitespace_token_count(t).cast("long").alias("n_tokens"),
        punct_count(t).cast("long").alias("punct_chars"),
        sw.cast("long").alias("stop_hits"),
        quality_score_expr(t).alias("quality"),
    )


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        whitespace_token_count(F.col("text")).cast("long").alias("ws_tokens"),
        regex_token_count(F.col("text")).cast("long").alias("re_tokens"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_expr(F.col("text")).alias("fingerprint"))


def q_docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation pipeline — what a training-data run actually
    chains: quality-score every doc → threshold filter → exact dedup
    (smallest doc_id per content wins) → per-source yield stats. One
    declarative plan: scan → window on md5(text) → partial-agg groupBy;
    Catalyst fuses the scoring into the scan stage."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "source",
        "text",
        quality_score_expr(t).alias("quality"),
        whitespace_token_count(t).cast("long").alias("n_tokens"),
    )
    kept = scored.filter(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    uniq = kept.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    # min/max (order-insensitive) rather than avg: a double SUM's
    # partial-merge order is engine/partitioning dependent
    return uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
        F.round(F.min("quality"), 6).alias("min_quality"),
        F.round(F.max("quality"), 6).alias("max_quality"),
    )


def q_events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation (the windowed-agg shape the
    streaming path runs with a watermark — see
    tests/test_streaming.py::test_watermarked_window_agg): per
    (hour, event_type) exact counts, distinct users, and an integer
    milli-value sum (double SUM merge order is not engine-portable;
    round(value*1000) is)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer div, not `/`: double division of ns epochs drifts 1 us
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    win = F.window(ts, "1 hour")
    return (
        e.select(win.alias("w"), "event_type", "user_id", "value")
        .groupBy(F.col("w.start").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events_n"),
            F.countDistinct("user_id").alias("users_n"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias(
                "value_milli_sum"
            ),
        )
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap —
    ``F.session_window`` (the streaming-native session operator, run in
    batch mode). Spark's session interval is half-open: an event at
    exactly previous_ts + gap starts a NEW session; the DuckDB
    gaps-and-islands oracle mirrors that with ``diff >= gap``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer div, not `/`: double division of ns epochs drifts 1 us
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    return (
        e.select("user_id", ts.alias("ts"))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events_n"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "events_n")
    )


# --------------------------------------------------------------- multimodal
def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    media = with_media_columns(d, "doc_id", "text", kind="blob")
    return extract_media_features(media)


# ---------------------------------------------------------------- streaming
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming replay of the events table (availableNow →
    foreachBatch merge into the bucketed incremental state table, so a
    microbatch costs O(touched buckets), never O(total state)); result
    must equal the batch W1 compaction, so it shares the w1 oracle."""
    from pyspark.sql import types as T  # noqa: PLC0415

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        stream_replay_bucketed,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def add_op(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "Op", F.when(F.col("event_type") == "error", "D").otherwise("U")
        )

    # the file-stream source wants a directory; expose the single table
    # file through a symlinked staging dir
    src_dir = tempfile.mkdtemp(prefix="cdc_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(src_dir, "events.parquet"))
    state_dir = tempfile.mkdtemp(prefix="cdc_stream_state_")
    final = stream_replay_bucketed(
        spark,
        src_dir,
        schema,
        pk_cols=["user_id"],
        order_cols=["ts", "event_id"],
        state_dir=state_dir,
        transform=add_op,
    )
    return final.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


# =================================================================== oracles
_HEX = "0123456789abcdef"


def _sql_hex_to_long(col: str, chars: int) -> str:
    """DuckDB rendering of dedup.hex_to_long."""
    terms = [
        f"(instr('{_HEX}', substr({col}, {i + 1}, 1)) - 1) * {16 ** (chars - 1 - i)}"
        for i in range(chars)
    ]
    return "(" + " + ".join(terms) + ")"


def _minhash_sql(num_hashes: int = 16, bands: int = 2) -> str:
    """Mirror of dedup.minhash_lsh_pairs: one md5 per distinct word →
    32-bit base hash → linear mixes (A_i*h+B_i) mod 2^31-1."""
    from rust_dms_cdc_operator_spark.operators.dedup import (  # noqa: PLC0415
        _MERSENNE,
        _mix_a,
        _mix_b,
    )

    rows = num_hashes // bands
    sigs = ", ".join(
        "list_aggregate(list_transform(wh, "
        f"h -> ({_mix_a(i)} * h + {_mix_b(i)}) % {_MERSENNE}), 'min') AS mh_{i}"
        for i in range(num_hashes)
    )
    band_exprs = [
        " || '|' || ".join(f"mh_{b * rows + r}::VARCHAR" for r in range(rows))
        for b in range(bands)
    ]
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS bk, {i} AS band_idx FROM sigs"
        for i, b in enumerate(band_exprs)
    )
    return f"""
        WITH wh AS (
          SELECT doc_id,
                 list_transform(list_distinct(string_split(text, ' ')),
                                w -> {_sql_hex_to_long('md5(w)', 8)}) AS wh
          FROM documents),
        sigs AS (SELECT doc_id, {sigs} FROM wh),
        banded AS ({band_selects})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.doc_id < b.doc_id
    """


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h16 >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(16)
    )
    sig = " + ".join(f"(CASE WHEN v_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM documents),
        h AS (SELECT doc_id, {_sql_hex_to_long('md5(word)', 4)} AS h16 FROM w),
        v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM v
    """


_SHINGLES = """
        words AS (SELECT doc_id, source, string_split(text, ' ') AS w
                  FROM documents),
        sh AS (SELECT doc_id, source,
                      CASE WHEN len(w) < 3
                           THEN list_distinct([array_to_string(w, ' ')])
                           ELSE list_distinct(list_transform(range(len(w) - 2),
                                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
                      END AS s
               FROM words)
"""


def _stop_hits_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({lst})))"


def _sql_sign_bucket(vec: str, bits: int = 8) -> str:
    """DuckDB rendering of similarity.sign_bucket (bit i weighs
    2^(bits-1-i); verified to round-trip identical values)."""
    terms = [
        f"(CASE WHEN {vec}[{i + 1}] >= 0 THEN {1 << (bits - 1 - i)} ELSE 0 END)"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


# round-6 cosine parity between the Spark fold and DuckDB's
# list_cosine_similarity holds exactly (0/500 mismatches at sf0.01);
# both compute double dot/norms over the same float32 inputs
_COS_Q0 = (
    "round(list_cosine_similarity(embedding::DOUBLE[], "
    "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6)"
)

ORACLE_SQL_LLM: dict[str, str] = {
    "sim_cosine_topk": f"""
        SELECT vec_id, {_COS_Q0} AS cos_sim
        FROM embeddings WHERE vec_id > 0
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "sim_lsh_bucket_topk": f"""
        SELECT vec_id, {_COS_Q0} AS cos_sim
        FROM embeddings
        WHERE vec_id > 0
          AND {_sql_sign_bucket('embedding')} =
              (SELECT {_sql_sign_bucket('embedding')} FROM embeddings
               WHERE vec_id = 0)
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "sim_ivf_topk": """
        WITH cents AS (
          SELECT vec_id AS cid, embedding::DOUBLE[] AS cemb
          FROM embeddings WHERE vec_id > 0 ORDER BY vec_id LIMIT 8
        ),
        q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        probes AS (
          SELECT cid FROM cents, q
          ORDER BY round(list_cosine_similarity(cemb, qv), 6) DESC, cid
          LIMIT 2
        ),
        assign AS (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(list_cosine_similarity(
                       e.embedding::DOUBLE[], c.cemb), 6) DESC, c.cid
                 ) AS rn
          FROM embeddings e CROSS JOIN cents c WHERE e.vec_id > 0
        )
        SELECT e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                 AS cos_sim
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1
        CROSS JOIN q
        WHERE a.cid IN (SELECT cid FROM probes) AND e.vec_id > 0
        ORDER BY cos_sim DESC, e.vec_id LIMIT 10
    """,
    "dedup_embedding_neardup": """
        SELECT * FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_cosine_similarity(a.embedding::DOUBLE[],
                                              b.embedding::DOUBLE[]), 6) AS cos_sim
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
           AND b.vec_id - a.vec_id <= 25)
        WHERE cos_sim >= 0.0
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_md5, min(doc_id) AS kept_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_simhash": _simhash_sql(),
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter_size,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_size
        FROM sh a JOIN sh b
          ON a.source = b.source AND a.doc_id < b.doc_id
         AND b.doc_id - a.doc_id <= 5
    """,
    "text_langid": f"""
        WITH s AS (
          SELECT doc_id,
                 {_stop_hits_sql('en')} AS en,
                 {_stop_hits_sql('de')} AS de,
                 {_stop_hits_sql('fr')} AS fr
          FROM documents)
        SELECT doc_id,
               CASE WHEN en + de + fr = 0 THEN 'und'
                    WHEN en >= de AND en >= fr THEN 'en'
                    WHEN de >= fr THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM s
    """,
    "text_quality": f"""
        WITH s AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                   AS punct_chars,
                 {_stop_hits_sql('en')} + {_stop_hits_sql('de')}
                   + {_stop_hits_sql('fr')} AS stop_hits,
                 length(text) AS n_char
          FROM documents)
        SELECT doc_id, n_tokens, punct_chars, stop_hits,
               least(greatest(
                 (CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.5
                 + least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.5
                 - (CAST(punct_chars AS DOUBLE) / CAST(n_char AS DOUBLE)),
                 0.0), 1.0) AS quality
        FROM s
    """,
    "docs_curation_pipeline": f"""
        WITH s AS (
          SELECT doc_id, source, text,
                 len(string_split(text, ' ')) AS n_tokens,
                 length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                   AS punct_chars,
                 {_stop_hits_sql('en')} + {_stop_hits_sql('de')}
                   + {_stop_hits_sql('fr')} AS stop_hits,
                 length(text) AS n_char
          FROM documents),
        scored AS (
          SELECT doc_id, source, text, CAST(n_tokens AS BIGINT) AS n_tokens,
                 least(greatest(
                   (CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.5
                   + least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.5
                   - (CAST(punct_chars AS DOUBLE) / CAST(n_char AS DOUBLE)),
                   0.0), 1.0) AS quality
          FROM s),
        kept AS (
          SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                   AS rn
          FROM scored WHERE quality >= 0.5)
        SELECT source, count(*) AS docs_kept,
               CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
               round(min(quality), 6) AS min_quality,
               round(max(quality), 6) AS max_quality
        FROM kept WHERE rn = 1 GROUP BY source
    """,
    "text_tokens": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens
        FROM documents
    """,
    "text_fingerprint": """
        WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
                   FROM documents)
        SELECT doc_id,
               CASE WHEN len(ws) < 4 THEN md5(text)
                    ELSE list_aggregate(list_transform(range(len(ws) - 3),
                         i -> md5(ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                                  || ' ' || ws[i+4])), 'min')
               END AS fingerprint
        FROM w
    """,
    "events_tumbling_counts": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS events_n,
               count(DISTINCT user_id) AS users_n,
               CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                 AS value_milli_sum
        FROM events
        GROUP BY window_start, event_type
    """,
    "events_sessionize": """
        WITH m AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
          FROM events),
        s AS (
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS events_n
        FROM s GROUP BY user_id, sid
    """,
    "mm_binary_stats": """
        SELECT doc_id AS media_id, 'blob' AS kind,
               octet_length(encode(text)) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte
        FROM documents
    """,
}

QUERIES_LLM: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embedding_neardup": q_dedup_embedding_neardup,
    "sim_cosine_topk": q_sim_cosine_topk,
    "sim_lsh_bucket_topk": q_sim_lsh_bucket_topk,
    "sim_ivf_topk": q_sim_ivf_topk,
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "docs_curation_pipeline": q_docs_curation_pipeline,
    "events_tumbling_counts": q_events_tumbling_counts,
    "events_sessionize": q_events_sessionize,
    "text_tokens": q_text_tokens,
    "text_fingerprint": q_text_fingerprint,
    "mm_binary_stats": q_mm_binary_stats,
    "stream_cdc_apply": q_stream_cdc_apply,
}
