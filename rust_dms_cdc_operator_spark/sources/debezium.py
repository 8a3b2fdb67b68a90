"""Debezium-envelope CDC source (JSON Lines).

The reference consumes exactly one CDC format: AWS DMS parquet drops
(`Op` + `_dms_ingestion_timestamp` columns). The wider CDC ecosystem
emits the Debezium change envelope instead — one JSON object per
change with `op` (c=create, r=snapshot read, u=update, d=delete),
`before`/`after` row images, and `ts_ms`. This adapter maps that
envelope onto the engine's replay contract (`Op` ∈ I/U/D + data
columns + an ordering column), so every downstream operator —
compaction, upsert/delete, datadiff, the bucketed streaming state —
works on Debezium streams unchanged.

Mapping (the standard Debezium semantics):

- ``op`` c / r → ``I`` (snapshot reads are inserts of current state);
  u → ``U``; d → ``D``;
- row data comes from ``after`` for c/r/u and from ``before`` for d
  (a delete's ``after`` is null — the PK must come from the before
  image);
- replay order is (``ts_ms``, file path, position within file): the
  scan emits ``_dbz_file`` / ``_dbz_pos`` bookkeeping columns that
  reconstruct true file order without a shuffle (``_dbz_pos`` is
  ``struct(_metadata.file_block_start, low 33 bits of
  monotonically_increasing_id)`` — within one scan partition the id is
  assigned in read order, and blocks of a split file sort by their
  byte offset, so the struct orders records by file position no matter
  how the file was split). Same-millisecond bursts on one key —
  common under load — therefore compact deterministically. Callers
  pass the result straight to ``operators.compact.compact_cdc``.

Scale: the JSONL scan is one distributed ``spark.read.json`` with an
EXPLICIT envelope schema (schema inference would scan the data twice
and type-drift between files); everything after is column projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_dms_cdc_operator_spark.functions.dmscols import DMS_OP_COL

#: op → engine Op. Snapshot reads (r) are inserts of current state.
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}

#: bookkeeping columns carrying file order (see module docstring)
FILE_COL = "_dbz_file"
POS_COL = "_dbz_pos"


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The Debezium envelope for a given row schema: before/after are
    nullable row images, op/ts_ms the change metadata. (The full
    envelope also carries `source`/`transaction` blocks; they are
    dropped at projection — add fields here if a pipeline needs
    them.)"""
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def read_debezium_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    row_schema: T.StructType,
    op_col: str = DMS_OP_COL,
) -> DataFrame:
    """One distributed scan of Debezium JSONL → the engine's CDC
    contract: data columns (from ``after``, or ``before`` for
    deletes), ``Op`` ∈ I/U/D, ``ts_ms`` plus the ``_dbz_file`` /
    ``_dbz_pos`` file-order columns as the ordering key. Unknown or
    absent ``op`` values are dropped (Debezium also emits
    truncate/message events that carry no row)."""
    if isinstance(paths, str):
        paths = [paths]
    env = spark.read.schema(envelope_schema(row_schema)).json(list(paths))
    op = F.col("op")
    mapped = (
        F.when(op.isin("c", "r"), "I")
        .when(op == "u", "U")
        .when(op == "d", "D")
    )
    img = F.when(op == "d", F.col("before")).otherwise(F.col("after"))
    # file-order key, computed in the scan projection (before any
    # shuffle — both `_metadata` and monotonically_increasing_id are
    # only meaningful directly over the file relation):
    # (block byte offset, record index within the scan partition)
    # sorts records by true file position regardless of how the file
    # was split. No window, no shuffle — a per-file row_number()
    # window would funnel a large single file through one reducer.
    pos = F.struct(
        F.col("_metadata.file_block_start").alias("block"),
        F.monotonically_increasing_id()
        .bitwiseAND(F.lit((1 << 33) - 1))
        .alias("idx"),
    )
    out = env.select(
        img.alias("_row"),
        mapped.alias(op_col),
        F.col("ts_ms"),
        F.col("_metadata.file_path").alias(FILE_COL),
        pos.alias(POS_COL),
    ).filter(F.col(op_col).isNotNull() & F.col("_row").isNotNull())
    return out.select(
        *[F.col(f"_row.{f.name}").alias(f.name) for f in row_schema.fields],
        op_col,
        "ts_ms",
        FILE_COL,
        POS_COL,
    )


def debezium_compact(
    spark: SparkSession,
    paths: str | list[str],
    row_schema: T.StructType,
    pk_cols: list[str],
    op_col: str = DMS_OP_COL,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Convenience: read a Debezium JSONL drop and compact to final
    keyed state (last writer wins; deletes drop the key) — the W1
    semantics on a non-DMS source. ``order_cols`` defaults to
    ``["ts_ms", _dbz_file, _dbz_pos]`` — millisecond time, then true
    file order as the tie-break, so same-millisecond bursts on one
    key compact deterministically. Pass explicit ``order_cols`` to
    override (Debezium's own total order is the Kafka partition
    offset — prefer that when it is carried in the envelope)."""
    from rust_dms_cdc_operator_spark.operators.compact import (  # noqa: PLC0415
        compact_cdc,
    )

    cdc = read_debezium_jsonl(spark, paths, row_schema, op_col)
    out = compact_cdc(
        cdc,
        pk_cols,
        order_cols=order_cols or ["ts_ms", FILE_COL, POS_COL],
        op_col=op_col,
    )
    # final state: deletes are applied, the envelope bookkeeping goes
    return out.drop("ts_ms", op_col, FILE_COL, POS_COL)
