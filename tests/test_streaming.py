"""Streaming CDC apply: multi-batch replay must equal batch compaction."""

from __future__ import annotations

import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_dms_cdc_operator_spark.streaming.cdc_stream import stream_replay

SCHEMA = T.StructType(
    [
        T.StructField("Op", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _write(path: str, rows: list[tuple[str, int, str, int]], mtime: int) -> None:
    ops, ids, vals, seqs = zip(*rows)
    pq.write_table(
        pa.table({"Op": list(ops), "id": list(ids), "val": list(vals),
                  "seq": list(seqs)}),
        path,
    )
    # the file-stream source orders microbatches by modification time;
    # DMS drops have strictly increasing mtimes — reproduce that here
    os.utime(path, (mtime, mtime))


def test_stream_replay_multibatch(spark, tmp_path):
    src = tmp_path / "src"
    state = tmp_path / "state"
    os.makedirs(src)
    # file 1: inserts 1..3 ; file 2: update 2, delete 3, insert 4,
    # then update 4 again (last writer wins within the batch)
    _write(str(src / "f1.parquet"),
           [("I", 1, "a", 1), ("I", 2, "b", 2), ("I", 3, "c", 3)], mtime=1000)
    _write(
        str(src / "f2.parquet"),
        [("U", 2, "b2", 4), ("D", 3, "c", 5), ("I", 4, "d", 6), ("U", 4, "d2", 7)],
        mtime=2000,
    )

    final = stream_replay(
        spark,
        str(src),
        SCHEMA,
        pk_cols=["id"],
        order_cols=["seq"],
        state_dir=str(state),
        max_files_per_trigger=1,  # force one microbatch per file
    )
    got = {r.id: r.val for r in final.collect()}
    assert got == {1: "a", 2: "b2", 4: "d2"}


def test_stream_delete_then_reinsert(spark, tmp_path):
    src = tmp_path / "src2"
    state = tmp_path / "state2"
    os.makedirs(src)
    _write(str(src / "f1.parquet"), [("I", 1, "x", 1)], mtime=1000)
    _write(str(src / "f2.parquet"), [("D", 1, "x", 2)], mtime=2000)
    _write(str(src / "f3.parquet"), [("I", 1, "x2", 3)], mtime=3000)
    final = stream_replay(
        spark, str(src), SCHEMA, ["id"], ["seq"], str(state),
        max_files_per_trigger=1,
    )
    assert {r.id: r.val for r in final.collect()} == {1: "x2"}
