"""Deduplication operators for large-scale training-data pipelines.

All of these stay JVM-side (built-in array/hash functions inside
whole-stage codegen — no Python UDFs in the hot path) and scale as:

- exact: one hash-shuffle on the content digest;
- MinHash+LSH: signatures computed per-row with array ops (no explode,
  no shuffle), then ONE shuffle per band on the band key; candidate
  pairs come from within-bucket self-joins whose skew AQE splits;
- SimHash: per-row 16-bit signature via word-hash bit voting —
  explode(words) + one groupBy(doc) shuffle;
- n-gram Jaccard: shingle sets per row (array ops), bounded candidate
  join, array_intersect/array_union sizes — exact fractions, no
  floating point.

Portability note: hashes are md5-hex (same on every engine) rather
than xxhash64 (Spark-specific seeds), so results are oracle-checkable;
swap ``_word_hash`` for ``F.xxhash64`` when checksum stability across
engines is not required and speed matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.split(text, " ")


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Exact dedup via content digest: one row per distinct content,
    keeping the smallest id (deterministic winner) and the group size."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias(f"kept_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signature_cols(
    text: Column, num_hashes: int
) -> list[Column]:
    """MinHash over the word set: sig_i = min over words of
    md5(i || '|' || word). Array ops only — no explode, no shuffle."""
    return [
        F.array_min(
            F.transform(
                _words(text), lambda w: F.md5(F.concat_ws("|", F.lit(str(i)), w))
            )
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any band signature.
    Returns distinct (id_a, id_b) with id_a < id_b.

    At scale: signature stage is embarrassingly parallel; each band is
    one hash-shuffle on a 32-char key; the within-bucket self-join is
    quadratic only inside a bucket (band width tunes that).
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col), *minhash_signature_cols(F.col(text_col), num_hashes)
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)

    pair_frames = []
    for b in range(bands):
        left = banded.select(F.col(f"band_{b}").alias("bk"), F.col(id_col).alias("id_a"))
        right = banded.select(F.col(f"band_{b}").alias("bk"), F.col(id_col).alias("id_b"))
        pair_frames.append(
            left.join(right, "bk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    out = pair_frames[0]
    for pf in pair_frames[1:]:
        out = out.unionByName(pf)
    return out.distinct()


def _hex4_to_int(hexcol: Column) -> Column:
    """First 4 hex chars → 16-bit int, via digit positions (portable —
    avoids engine-specific hex parsing)."""
    digits = "0123456789abcdef"
    out = F.lit(0)
    for i in range(4):
        out = out * 16 + (F.instr(F.lit(digits), F.substring(hexcol, i + 1, 1)) - 1)
    return out


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash: each word votes ±1 per bit of its 16-bit hash;
    signature bit b is 1 iff the vote sum is positive. One explode +
    one groupBy(doc) shuffle; 16 conditional sums in a single agg."""
    words = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("w")
    ).withColumn("h16", _hex4_to_int(F.md5(F.col("w"))))
    votes = words.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h16"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v_{b}")
            for b in range(16)
        ]
    )
    sig = F.lit(0)
    for b in range(16):
        sig = sig + F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(0)
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array (empty-safe)."""
    words = _words(text)
    return F.when(F.size(words) < n, F.array_distinct(F.array(text))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(words, i + j + 1) for j in range(n)]
                ),
            )
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    max_id_gap: int = 5,
) -> DataFrame:
    """n-gram Jaccard similarity for bounded candidate pairs (same
    block, id gap ≤ max_id_gap). Returns exact integer intersection /
    union sizes — no floating point, fully engine-portable.

    At scale, ``block_col`` is the blocking key (e.g. an LSH band from
    ``minhash_lsh_pairs``); the join shuffles on it once.
    """
    s = df.select(
        F.col(id_col), F.col(block_col), shingle_set(F.col(text_col), n).alias("sh")
    )
    a = s.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = s.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    )
    pairs = a.join(b, "blk").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("id_b") - F.col("id_a") <= max_id_gap)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return pairs.select(
        "id_a",
        "id_b",
        inter.alias("inter_size"),
        union.alias("union_size"),
    )
