"""Skew mitigation utilities.

AQE's skew-join split handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in ``session.get_spark``),
but it only splits SORT-MERGE join partitions. ``salted_join`` is the
explicit fallback for the cases AQE can't fix — a hot key whose rows
must meet a non-broadcastable build side, or aggregation-feeding joins
where one key dominates:

- the probe (big, skewed) side gets a salt in [0, buckets);
- the build side is replicated once per salt via
  ``explode(sequence(...))``;
- the join runs on (keys..., salt), spreading each hot key over
  ``buckets`` tasks.

Cost model: build-side size × buckets extra shuffle volume buys
probe-side parallelism on hot keys. Use for moderate build sides that
are too big to broadcast; leave genuinely small sides to
``F.broadcast``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_skew_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with hot keys spread over ``salt_buckets`` tasks.

    ``probe`` is the large skewed side (each row gets one deterministic
    salt from a hash of its join key + a per-row disambiguator, so rows
    of one hot key spread across buckets); ``build`` is replicated once
    per salt. Supported ``how``: inner / left / left_semi semantics
    that keep every probe row exactly as an unsalted join would.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(f"salted_join does not support how={how!r}")
    # spread rows of the SAME key across buckets: hash the key plus a
    # physical disambiguator. monotonically_increasing_id is unstable
    # across retries, which is fine — any assignment is correct because
    # the build side carries every salt value.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    ).cast("int")
    probe_s = probe.withColumn(SALT_COL, salt)
    build_s = build.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return probe_s.join(build_s, [*on, SALT_COL], how).drop(SALT_COL)
