"""Text-analysis functions for training-data pipelines.

Everything here is built-in-expression-only (whole-stage codegen, no
Python in the hot path): language ID by stopword voting, quality
scoring from exact integer counts, token counting (whitespace and
regex lexer), and min-sampled document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr": ("le", "la", "et", "est", "un", "une", "les", "des", "que"),
}

TOKEN_PATTERN = "[a-z0-9]+"


def words(text: Column) -> Column:
    return F.split(text, " ")


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of word tokens that are stopwords of ``lang``."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: w.isin(*sw)))


def langid_expr(text: Column) -> Column:
    """n-gram-heuristic language ID: the language whose stopword list
    scores the most hits (ties broken en > de > fr; no hits → und)."""
    en, de, fr = (stopword_hits(text, lang) for lang in ("en", "de", "fr"))
    return (
        F.when(en + de + fr == 0, "und")
        .when((en >= de) & (en >= fr), "en")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def punct_count(text: Column) -> Column:
    """Characters that are neither alphanumeric nor whitespace."""
    return F.length(text) - F.length(F.regexp_replace(text, "[^a-z0-9 ]", ""))


def whitespace_token_count(text: Column) -> Column:
    return F.size(words(text))


def regex_token_count(text: Column, pattern: str = TOKEN_PATTERN) -> Column:
    """BPE-ish lexer token count: maximal alnum runs."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def quality_score_expr(text: Column) -> Column:
    """Quality score in [0,1] from exact integer counts: rewards
    in-dictionary stopword presence and mid-range length, penalizes
    punctuation density. Deterministic double arithmetic."""
    n_char = F.length(text)
    n_tok = whitespace_token_count(text)
    sw = stopword_hits(text, "en") + stopword_hits(text, "de") + stopword_hits(text, "fr")
    sw_ratio = sw.cast("double") / n_tok.cast("double")
    punct_ratio = punct_count(text).cast("double") / n_char.cast("double")
    len_score = F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0))
    return F.least(
        F.greatest(
            sw_ratio * 0.5 + len_score * 0.5 - punct_ratio, F.lit(0.0)
        ),
        F.lit(1.0),
    )


def fingerprint_expr(text: Column, window: int = 4) -> Column:
    """Document fingerprint by min-sampling the rolling word-window
    hashes (winnowing-style): min over all ``window``-word windows of
    md5(window). Short docs fall back to md5(text).

    Windows come from one linear regexp_extract_all pass (see
    ``sliding_word_ngrams``): a transform lambda that indexes an outer
    word array re-evaluates the split per element in the interpreted
    higher-order-function path — quadratic per row."""
    from rust_dms_cdc_operator_spark.operators.dedup import (  # noqa: PLC0415
        sliding_word_ngrams,
    )

    return F.when(F.size(words(text)) < window, F.md5(text)).otherwise(
        F.array_min(
            F.transform(sliding_word_ngrams(text, window), lambda s: F.md5(s))
        )
    )


def repetition_ratio_expr(text: Column, n: int = 3) -> Column:
    """Fraction of repeated word n-grams, ``1 - distinct/total`` —
    high values flag boilerplate/spam/looped generations (a standard
    pre-training quality signal). 0.0 for texts shorter than ``n``
    words. Pure expression (linear regex n-grams), codegen-friendly."""
    from rust_dms_cdc_operator_spark.operators.dedup import (  # noqa: PLC0415
        sliding_word_ngrams,
    )

    grams = sliding_word_ngrams(text, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double")
            / total.cast("double"),
            6,
        )
    )


# conservative character-class patterns that parse identically under
# Java regex (Spark) and RE2 (DuckDB) — no \w, no lookarounds
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9./_%+#?&=:@~-]+"
PHONE_RE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def redact_pii_expr(
    text: Column,
    email_token: str = "<EMAIL>",
    url_token: str = "<URL>",
    phone_token: str = "<PHONE>",
) -> Column:
    """PII/URL scrubbing for pre-training text: emails, URLs, and
    phone-shaped digit runs replaced by stable tokens. Order matters
    (URLs first — an email-looking userinfo inside a URL must not
    split it). Pure regexp_replace chain — codegen, linear, and the
    patterns are dialect-portable so the DuckDB oracle replays them."""
    out = F.regexp_replace(text, URL_RE, url_token)
    out = F.regexp_replace(out, EMAIL_RE, email_token)
    return F.regexp_replace(out, PHONE_RE, phone_token)
