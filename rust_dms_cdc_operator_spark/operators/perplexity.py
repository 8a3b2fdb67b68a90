"""Corpus-trained unigram LM scoring — perplexity-style quality filter.

CCNet-style curation ranks documents by language-model perplexity and
drops the tail. The full KenLM pipeline needs an external model; the
in-engine, fully-distributed form is a unigram LM trained on the
corpus itself: two linear passes, no model artifact, and the same
ranking signal (documents full of rare/garbage tokens score high).

Scale shape (100 TB): one token-key shuffle for the vocabulary counts
(map-side partial agg first, so the shuffle carries the vocabulary,
not the corpus), one token-key join to price each token (AQE
broadcasts the vocab side when it fits), one doc-key agg. All
JVM-side expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_dms_cdc_operator_spark.functions.text import TOKEN_PATTERN


def unigram_logppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """(id, n_tokens, log_ppl) where ``log_ppl`` is the negative mean
    unigram log-likelihood under the corpus's own token distribution:

        log_ppl(d) = ln(total_tokens) − mean(ln count(tok) for tok ∈ d)

    (algebraically −mean(ln p(tok)); perplexity = exp(log_ppl)).
    Lower = more typical of the corpus. Token-free documents keep
    ``n_tokens = 0`` and a NULL score. Rounded to 6 digits — the
    cross-engine-stable precision (ulp-level libm/summation-order
    differences sit ~1e-15, far below the rounding step).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(token_pattern), 0)
        ).alias("tok"),
    ).persist()  # consumed twice (vocab counts + pricing); evicted LRU
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # bounded driver scalar (one number), same pattern as the
    # chunk-offset literals: total corpus tokens
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    per = (
        toks.join(counts, "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.log(F.col("cnt").cast("double"))).alias("_avg_ln"),
        )
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            F.round(
                F.log(F.lit(float(total))) - F.col("_avg_ln"), 6
            ).alias("log_ppl"),
        )
    )


def source_token_drift(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    token_pattern: str = TOKEN_PATTERN,
    round_digits: int = 6,
) -> DataFrame:
    """Per-source distribution drift: KL(P_source ‖ P_corpus) over the
    unigram token distribution —

        KL_s = Σ_t (c_s(t)/N_s) · [ln c_s(t) − ln N_s − ln c(t) + ln N]

    The corpus-health companion to :func:`unigram_logppl`: a source
    whose token mix diverges from the rest of the corpus (template
    spam, scraped boilerplate, wrong language) shows up as a KL
    outlier before any per-document scoring runs.

    Scale shape: tokenize once, ONE (group, token)-key shuffle for the
    joint counts; per-token corpus totals re-aggregate those joint
    counts (vocabulary-sized input, not the corpus), join back on the
    token key (AQE broadcasts the vocab side when it fits), one final
    group agg. All JVM-side; exact integer counts, one rounded double
    at the very end (ulp-level summation-order noise sits far below
    the rounding step — same argument as unigram_logppl).

    Cache lifetime: the joint (group, token) counts are
    ``persist()``-ed and referenced by the RETURNED lazy plan (as is
    the token table in :func:`unigram_logppl`), so the function cannot
    unpersist them itself. Callers own the lifetime —
    ``spark.catalog.clearCache()`` after materializing, or rely on LRU
    block eviction in a long-lived session.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(token_pattern), 0)
        ).alias("tok"),
    )
    joint = toks.groupBy("grp", "tok").agg(F.count("*").alias("c_gt"))
    joint = joint.persist()  # consumed 3x: corpus totals, group totals, terms
    corpus = joint.groupBy("tok").agg(F.sum("c_gt").alias("c_t"))
    group_n = joint.groupBy("grp").agg(F.sum("c_gt").alias("n_g"))
    # bounded driver scalar: total corpus tokens (one number)
    total = group_n.agg(F.sum("n_g")).first()[0] or 0
    terms = (
        joint.join(corpus, "tok")
        .join(group_n, "grp")
        .select(
            "grp",
            "n_g",
            (
                (F.col("c_gt") / F.col("n_g"))
                * (
                    F.log(F.col("c_gt").cast("double"))
                    - F.log(F.col("n_g").cast("double"))
                    - F.log(F.col("c_t").cast("double"))
                    + F.log(F.lit(float(total)))
                )
            ).alias("term"),
        )
    )
    return (
        terms.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("n_g").alias("n_tokens"),
            F.round(F.sum("term"), round_digits).alias("kl_vs_corpus"),
        )
    )


def bigram_logppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_pattern: str = TOKEN_PATTERN,
    lam: float = 0.75,
) -> DataFrame:
    """(id, n_bigrams, log_ppl2) — negative mean log-likelihood under
    an interpolated corpus bigram LM:

        p(w2 | w1) = lam * c(w1 w2)/c(w1) + (1 - lam) * c(w2)/T

    (Jelinek-Mercer smoothing: the unigram back-off term keeps unseen
    bigrams finite). The sharper curation signal than
    :func:`unigram_logppl` — shuffled or templated text has typical
    words in atypical ORDER, which only a conditional model sees.
    Documents with fewer than 2 tokens keep ``n_bigrams = 0`` and a
    NULL score. lam = 0.75 is exactly representable in binary, and
    the score rounds to 6 digits (ulp-level libm/summation-order
    noise sits ~1e-15, the unigram_logppl argument).

    Scale shape: normalize text once (linear regex), bigrams via the
    lookahead regex (no quadratic lambda capture); ONE bigram-key
    shuffle for c2, token-key shuffles for c1 (both map-side combined,
    vocabulary-sized outputs), three vocab-keyed pricing joins (AQE
    broadcasts when they fit), one doc-key agg. All JVM-side.
    """
    from rust_dms_cdc_operator_spark.operators.dedup import (  # noqa: PLC0415
        sliding_word_ngrams,
    )

    norm = F.concat_ws(
        " ", F.regexp_extract_all(F.col(text_col), F.lit(token_pattern), 0)
    )
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(token_pattern), 0)
        ).alias("tok"),
    )
    big = docs.select(
        F.col(id_col),
        F.explode(sliding_word_ngrams(norm, 2)).alias("gram"),
    ).select(
        id_col,
        "gram",
        F.expr("split_part(gram, ' ', 1)").alias("w1"),
        F.expr("split_part(gram, ' ', 2)").alias("w2"),
    )
    c1 = toks.groupBy("tok").agg(F.count("*").alias("c_tok"))
    c2 = big.groupBy("gram").agg(F.count("*").alias("c_gram"))
    total = c1.agg(F.sum("c_tok")).first()[0] or 0
    priced = (
        big.join(c2, "gram")
        .join(c1.select(F.col("tok").alias("w1"), F.col("c_tok").alias("c_w1")), "w1")
        .join(c1.select(F.col("tok").alias("w2"), F.col("c_tok").alias("c_w2")), "w2")
        .select(
            id_col,
            (
                F.lit(lam) * F.col("c_gram") / F.col("c_w1")
                + F.lit(1.0 - lam) * F.col("c_w2") / F.lit(float(total))
            ).alias("p"),
        )
    )
    per = priced.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(-F.avg(F.log(F.col("p"))), 6).alias("log_ppl2"),
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.col("log_ppl2"),
        )
    )
