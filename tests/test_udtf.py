"""UDTF surface: Spark 4 Python UDTFs work through this engine's
session, and the declarative (codegen) formulation of the same
transform is provably equivalent — documenting WHY the inventory
queries never use UDTFs in the hot path (row-at-a-time Python is the
slow path; posexplode(split(...)) is the production formulation)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf


@udtf(returnType="sent_idx: int, sentence: string")
class SentenceSplit:
    def eval(self, text: str):
        for i, s in enumerate(text.split(". ")):
            if s:
                yield i, s


def test_udtf_matches_declarative_split(spark):
    texts = [
        "one fish. two fish. red fish",
        "a single sentence",
        "trail. ",
    ]
    # UDTF path (lateral join per row)
    udtf_rows = set()
    for t in texts:
        for r in SentenceSplit(lit(t)).collect():
            udtf_rows.add((t, r.sent_idx, r.sentence))

    # declarative path — what the inventory queries actually use
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    decl = (
        df.select(
            "text", F.posexplode(F.split("text", "\\. ")).alias("i", "s")
        )
        .filter(F.col("s") != "")
        .collect()
    )
    decl_rows = {(r.text, r.i, r.s) for r in decl}
    assert udtf_rows == decl_rows
    assert ("one fish. two fish. red fish", 1, "two fish") in decl_rows
