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
