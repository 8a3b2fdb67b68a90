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


def test_incremental_stream_matches_single_batch_apply(spark, tmp_path):
    """Multi-microbatch incremental replay through the bucketed state
    must equal applying the whole event log as ONE batch (the batch
    compaction semantics the w1 oracle checks)."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        apply_cdc_batch,
        stream_replay_bucketed,
    )

    src = tmp_path / "src3"
    os.makedirs(src)
    _write(
        str(src / "f1.parquet"),
        [("I", i, f"v{i}", i) for i in range(1, 40)],
        mtime=1000,
    )
    _write(
        str(src / "f2.parquet"),
        [("U", 5, "upd", 100), ("D", 6, "x", 101), ("I", 99, "new", 102)],
        mtime=2000,
    )
    a = apply_cdc_batch(
        None, spark.read.schema(SCHEMA).parquet(str(src)), ["id"], ["seq"]
    )
    b = stream_replay_bucketed(
        spark, str(src), SCHEMA, ["id"], ["seq"], str(tmp_path / "sb"),
        num_buckets=8, max_files_per_trigger=1,
    )
    assert {(r.id, r.val) for r in a.collect()} == {
        (r.id, r.val) for r in b.collect()
    }


def test_bucketed_state_rewrites_only_touched_buckets(spark, tmp_path):
    """A small second batch must leave untouched bucket partitions'
    files physically unmodified (per-batch cost O(touched buckets))."""
    import glob as _glob

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "bstate" / "state"), ["id"], 16)
    base = spark.createDataFrame(
        [("I", i, f"v{i}", i) for i in range(1, 200)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    pat = str(tmp_path / "bstate" / "state" / "data" / "*" / "*" / "*.parquet")
    before = {p: os.path.getmtime(p) for p in _glob.glob(pat)}
    delta = spark.createDataFrame([("U", 7, "седем", 1000)], schema=SCHEMA)
    store.merge_batch(delta, order_cols=["seq"])
    after = {p: os.path.getmtime(p) for p in _glob.glob(pat)}
    untouched_same = [p for p in before if p in after and before[p] == after[p]]
    # at 16 buckets, a single-key batch touches exactly one bucket: the
    # other buckets' files must be byte-for-byte the same files (the
    # manifest protocol never rewrites or renames a committed file)
    assert len(untouched_same) >= len(before) - 2, (len(untouched_same), len(before))
    assert {r.val for r in store.read(spark).filter("id = 7").collect()} == {"седем"}


def test_bucketed_merge_is_idempotent_on_replay(spark, tmp_path):
    """Exactly-once contract: the streaming checkpoint replays a batch
    at-least-once after a crash; re-applying the SAME batch (including
    a crash between the two applies having already committed some
    buckets) must leave the state byte-identical in content."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "idem" / "state"), ["id"], 8)
    base = spark.createDataFrame(
        [("I", i, f"v{i}", i) for i in range(1, 60)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    delta = spark.createDataFrame(
        [("U", 5, "u5", 100), ("D", 6, "x", 101), ("I", 99, "n", 102)],
        schema=SCHEMA,
    )
    store.merge_batch(delta, order_cols=["seq"])
    first = {(r.id, r.val) for r in store.read(spark).collect()}
    # crash-replay: the same batch applied again
    store.merge_batch(delta, order_cols=["seq"])
    second = {(r.id, r.val) for r in store.read(spark).collect()}
    assert first == second
    assert (5, "u5") in second and not any(i == 6 for i, _ in second)


def test_manifest_crash_before_publish(spark, tmp_path, monkeypatch):
    """Kill the process at the worst commit moment — the staged
    generation dir is fully written but the manifest publish never
    happened. The state must be EXACTLY the previous commit (orphan
    generations are invisible), the replayed batch must converge, and
    the next successful commit must GC the orphan."""
    import pytest as _pytest

    from rust_dms_cdc_operator_spark import fsio
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "cr" / "state"), ["id"], 4)
    base = spark.createDataFrame(
        [("I", i, f"v{i}", i) for i in range(1, 40)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    before = {(r.id, r.val) for r in store.read(spark).collect()}
    data_dir = os.path.join(str(tmp_path / "cr" / "state"), "data")
    gens_before = set(os.listdir(data_dir))

    delta = spark.createDataFrame(
        [("U", 5, "u5", 100), ("I", 99, "n", 101)], schema=SCHEMA
    )

    def boom(*_a, **_k):
        raise RuntimeError("simulated crash before manifest publish")

    monkeypatch.setattr(fsio, "publish_text", boom)
    with _pytest.raises(RuntimeError):
        store.merge_batch(delta, order_cols=["seq"])
    monkeypatch.undo()

    # the orphan generation was written but is NOT visible
    orphans = set(os.listdir(data_dir)) - gens_before
    assert orphans, "staging write should have produced a generation dir"
    assert {(r.id, r.val) for r in store.read(spark).collect()} == before

    # checkpoint replays the same batch: plain re-merge converges
    store.merge_batch(delta, order_cols=["seq"])
    after = {(r.id, r.val) for r in store.read(spark).collect()}
    want = (before - {(5, "v5")}) | {(5, "u5"), (99, "n")}
    assert after == want
    # the successful commit's GC removed the orphan generation
    assert not (orphans & set(os.listdir(data_dir)))


def test_manifest_partial_tmp_files_invisible(spark, tmp_path):
    """A crash mid-manifest-write leaves a ``.tmp-*`` sibling; readers
    must ignore it (only fully renamed ``<epoch>.json`` names count)."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "tm" / "state"), ["id"], 4)
    base = spark.createDataFrame([("I", 1, "a", 1), ("I", 2, "b", 2)], schema=SCHEMA)
    store.merge_batch(base, order_cols=["seq"])
    mdir = os.path.join(store.path, "_manifests")
    junk = os.path.join(mdir, f"{99:020d}.json.tmp-dead")
    with open(junk, "w") as fh:
        fh.write("{ partial")
    assert store._manifest_epochs() == [1]
    assert {r.id: r.val for r in store.read(spark).collect()} == {1: "a", 2: "b"}
    delta = spark.createDataFrame([("U", 1, "a2", 10)], schema=SCHEMA)
    store.merge_batch(delta, order_cols=["seq"])
    assert {r.id: r.val for r in store.read(spark).collect()} == {1: "a2", 2: "b"}


def test_bucketed_state_on_file_uri(spark, tmp_path):
    """The same state protocol over a scheme-qualified URI: every
    metadata operation routes through the JVM Hadoop FileSystem (the
    exact code path an ``s3a://`` deployment takes), not ``os.*``."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(
        "file://" + str(tmp_path / "uri" / "state"), ["id"], 4
    )
    base = spark.createDataFrame(
        [("I", i, f"v{i}", i) for i in range(1, 30)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    delta = spark.createDataFrame(
        [("U", 5, "u5", 100), ("D", 6, "x", 101), ("I", 77, "n", 102)],
        schema=SCHEMA,
    )
    store.merge_batch(delta, order_cols=["seq"])
    got = {(r.id, r.val) for r in store.read(spark).collect()}
    assert (5, "u5") in got and (77, "n") in got
    assert not any(i == 6 for i, _ in got)
    assert len(got) == 29  # 28 survivors + 1 insert
    # and the layout on disk is the manifest layout (no POSIX calls hit
    # the URI — this asserts the protocol committed through Hadoop FS)
    local = str(tmp_path / "uri" / "state")
    assert os.path.isdir(os.path.join(local, "_manifests"))
    # Hadoop's checksummed local FS adds .crc sidecars — count manifests
    assert store._manifest_epochs() == [1, 2]


def test_state_fully_deleted_reads_typed_empty(spark, tmp_path):
    """Deleting EVERY key leaves a committed manifest with zero
    buckets; read() must return a 0-row frame with the data schema
    (not fail parquet schema inference)."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "fd" / "state"), ["id"], 4)
    base = spark.createDataFrame([("I", 1, "a", 1), ("I", 2, "b", 2)], schema=SCHEMA)
    store.merge_batch(base, order_cols=["seq"])
    kill = spark.createDataFrame(
        [("D", 1, "a", 10), ("D", 2, "b", 11)], schema=SCHEMA
    )
    store.merge_batch(kill, order_cols=["seq"])
    out = store.read(spark)
    assert out.count() == 0
    assert set(out.columns) == {"id", "val", "seq"}


def test_bucketed_state_clears_fully_deleted_bucket(spark, tmp_path):
    """Dynamic partition overwrite only writes partitions present in
    the output — a bucket whose every key is deleted must still be
    cleared (regression: stale rows survived)."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "bs2" / "state"), ["id"], 4)
    base = spark.createDataFrame(
        [("I", 1, "a", 1), ("I", 2, "b", 2)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    kill = spark.createDataFrame([("D", 1, "a", 10)], schema=SCHEMA)
    store.merge_batch(kill, order_cols=["seq"])
    assert {r.id: r.val for r in store.read(spark).collect()} == {2: "b"}


def test_watermarked_window_agg_matches_batch(spark, tmp_path):
    """Streaming tumbling-window aggregation with a watermark, append
    mode: only windows CLOSED by the final watermark (end <= max seen
    event time - delay) are emitted — the still-open last hour is
    withheld — and every emitted window's count matches the batch
    answer. (Dropping of late rows is best-effort per the Spark
    contract, so it is not asserted.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    src = tmp_path / "evsrc"
    out_dir = tmp_path / "evout"
    os.makedirs(src)
    rows = []
    for h in range(3):
        for i in range(20):
            rows.append((h * 20 + i, f"2026-01-01 {h:02d}:{i:02d}:00", "click" if i % 2 else "view"))
    # second file arrives "late": events for hour 0 after hour 2 was seen
    pq.write_table(
        pa.table({
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
        }),
        str(src / "e1.parquet"),
    )
    late = [(999, "2026-01-01 00:59:00", "late")]
    pq.write_table(
        pa.table({
            "event_id": [r[0] for r in late],
            "ts": [r[1] for r in late],
            "event_type": [r[2] for r in late],
        }),
        str(src / "e2.parquet"),
    )
    os.utime(str(src / "e1.parquet"), (1000, 1000))
    os.utime(str(src / "e2.parquet"), (2000, 2000))

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("event_type", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "evck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["w"]["start"].isoformat(), r["event_type"]): r["count"]
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    batch = (
        spark.read.schema(schema).parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .count()
    )
    want = {
        (r["w"]["start"].isoformat(), r["event_type"]): r["count"]
        for r in batch.collect()
    }
    # final watermark = 02:19 - 10 min = 02:09: the hour-2 window
    # (end 03:00) is still open -> append mode withholds it
    assert not any(k[0].startswith("2026-01-01T02") for k in got), got
    assert any(k[0].startswith("2026-01-01T02") for k in want)
    # every emitted (closed) window matches the batch count exactly
    for k, v in got.items():
        assert want[k] == v, (k, v, want.get(k))
    # hours 0 and 1 are fully present
    for h in ("2026-01-01T00:00:00", "2026-01-01T01:00:00"):
        for et in ("click", "view"):
            assert (h, et) in got


def test_apply_in_pandas_with_state_running_profile(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-key
    running profiles accumulate across microbatches; the final emit per
    key equals the batch aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from rust_dms_cdc_operator_spark.streaming.stateful import running_profile

    src = tmp_path / "stsrc"
    os.makedirs(src)
    f1 = [(1, "2026-01-01 00:00:00", 1.0), (2, "2026-01-01 00:01:00", 2.0),
          (1, "2026-01-01 00:02:00", 3.0)]
    f2 = [(1, "2026-01-01 00:03:00", 4.0), (3, "2026-01-01 00:04:00", 5.0)]
    for name, rows, mt in (("a.parquet", f1, 1000), ("b.parquet", f2, 2000)):
        pq.write_table(
            pa.table({
                "user_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "value": [r[2] for r in rows],
            }),
            str(src / name),
        )
        os.utime(str(src / name), (mt, mt))

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    emitted = []

    def sink(batch, epoch):
        emitted.extend((epoch, r) for r in batch.collect())

    q = (
        running_profile(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "stck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = {}
    for _epoch, r in emitted:
        final[r.key] = (r.events_n, r.value_sum, r.last_ts)
    assert final == {
        1: (3, 8.0, "2026-01-01 00:03:00"),
        2: (1, 2.0, "2026-01-01 00:01:00"),
        3: (1, 5.0, "2026-01-01 00:04:00"),
    }
    # key 1 appeared in both microbatches: its state really accumulated
    key1_emits = [r.events_n for _e, r in emitted if r.key == 1]
    assert key1_emits == [2, 3]


def test_manifest_publish_collision_raises(spark, tmp_path):
    """Zombie-writer guard: the commit targets a FRESH numbered key;
    if that key already exists (a second writer or a replayed zombie
    committed first), the publish must fail loudly instead of
    silently clobbering the other commit."""
    import pytest as _pytest

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "zz" / "state"), ["id"], 4)
    base = spark.createDataFrame([("I", 1, "a", 1)], schema=SCHEMA)
    store.merge_batch(base, order_cols=["seq"])
    # model the race: this writer loaded manifest 1, then a faster
    # writer committed manifest 2 before our publish
    man1 = store._load_manifest()
    store._load_manifest = lambda: man1
    mdir = os.path.join(store.path, "_manifests")
    with open(os.path.join(mdir, f"{2:020d}.json"), "w") as fh:
        fh.write('{"epoch": 2, "num_buckets": 4, "schema": "{}", "buckets": {}}')
    delta = spark.createDataFrame([("U", 1, "a2", 5)], schema=SCHEMA)
    with _pytest.raises(OSError):
        store.merge_batch(delta, order_cols=["seq"])


def test_manifest_crash_before_publish_on_file_uri(spark, tmp_path, monkeypatch):
    """The pre-publish crash point exercised through the Hadoop-FS
    branch (file:// — the s3a-shaped code path): state unchanged,
    replay converges, orphan generation GC'd."""
    import pytest as _pytest

    from rust_dms_cdc_operator_spark import fsio
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    local = str(tmp_path / "ucr" / "state")
    store = BucketedParquetState("file://" + local, ["id"], 4)
    base = spark.createDataFrame(
        [("I", i, f"v{i}", i) for i in range(1, 20)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    before = {(r.id, r.val) for r in store.read(spark).collect()}
    gens_before = set(os.listdir(os.path.join(local, "data")))

    delta = spark.createDataFrame([("U", 3, "u3", 99)], schema=SCHEMA)

    def boom(*_a, **_k):
        raise RuntimeError("crash before publish (uri)")

    monkeypatch.setattr(fsio, "publish_text", boom)
    with _pytest.raises(RuntimeError):
        store.merge_batch(delta, order_cols=["seq"])
    monkeypatch.undo()

    orphans = set(os.listdir(os.path.join(local, "data"))) - gens_before
    assert orphans
    assert {(r.id, r.val) for r in store.read(spark).collect()} == before
    store.merge_batch(delta, order_cols=["seq"])
    after = {(r.id, r.val) for r in store.read(spark).collect()}
    assert after == (before - {(3, "v3")}) | {(3, "u3")}
    assert not (orphans & set(os.listdir(os.path.join(local, "data"))))


def test_manifest_gc_bounds_history(spark, tmp_path):
    """State disk is O(live buckets + retention), not O(history):
    after N commits only the last keep_manifests manifests survive,
    and every generation dir on disk is referenced by one of them."""
    import json as _json

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "gc" / "state"), ["id"], 4)
    for i in range(1, 5):
        batch = spark.createDataFrame(
            [("I", i * 10 + j, f"v{i}", i * 100 + j) for j in range(3)],
            schema=SCHEMA,
        )
        store.merge_batch(batch, order_cols=["seq"])
    assert store._manifest_epochs() == [3, 4]
    referenced = set()
    for e in (3, 4):
        with open(os.path.join(store.path, "_manifests", f"{e:020d}.json")) as fh:
            for rel in _json.load(fh)["buckets"].values():
                referenced.add(rel.split("/")[1])
    on_disk = set(os.listdir(os.path.join(store.path, "data")))
    assert on_disk == referenced, (on_disk, referenced)
    # and the state is complete despite the pruned history
    assert store.read(spark).count() == 12


def test_stream_schema_drift_raises(spark, tmp_path):
    """P3 parity on the stream: a batch whose data columns differ from
    the committed state schema fails fast with the drift named, before
    any state is staged."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "dr" / "state"), ["id"], 4)
    store.merge_batch(
        spark.createDataFrame([("I", 1, "a", 1)], schema=SCHEMA),
        order_cols=["seq"],
    )
    drifted = T.StructType(
        [
            T.StructField("Op", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    batch = spark.createDataFrame([("U", 1, "a2", 5, "x")], schema=drifted)
    with _pytest.raises(ValueError, match="schema drift.*extra"):
        store.merge_batch(batch, order_cols=["seq"])
    # state untouched
    assert {r.id: r.val for r in store.read(spark).collect()} == {1: "a"}


def test_read_at_retained_epoch_time_travel(spark, tmp_path):
    """The manifest log is a commit history: a read pinned to a
    retained epoch sees exactly that commit's state, concurrent with
    the newer commit; non-retained epochs refuse."""
    import pytest as _pytest

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "tt" / "state"), ["id"], 4)
    store.merge_batch(
        spark.createDataFrame(
            [("I", 1, "a", 1), ("I", 2, "b", 2)], schema=SCHEMA
        ),
        order_cols=["seq"],
    )
    store.merge_batch(
        spark.createDataFrame(
            [("U", 1, "a2", 10), ("D", 2, "b", 11)], schema=SCHEMA
        ),
        order_cols=["seq"],
    )
    now = {r.id: r.val for r in store.read(spark).collect()}
    then = {r.id: r.val for r in store.read(spark, epoch=1).collect()}
    assert now == {1: "a2"}
    assert then == {1: "a", 2: "b"}
    store.merge_batch(
        spark.createDataFrame([("I", 3, "c", 20)], schema=SCHEMA),
        order_cols=["seq"],
    )
    with _pytest.raises(ValueError, match="not retained"):
        store.read(spark, epoch=1)  # GC'd out of the retention window


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    """Streaming exact-dedup: a key re-delivered in a later microbatch
    within the watermark horizon is emitted exactly once; distinct keys
    all pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from rust_dms_cdc_operator_spark.streaming.stateful import stream_dedup

    src = tmp_path / "ddsrc"
    out_dir = tmp_path / "ddout"
    os.makedirs(src)
    f1 = [(1, "2026-01-01 00:00:00", "a"), (2, "2026-01-01 00:01:00", "b")]
    f2 = [(1, "2026-01-01 00:02:00", "a-redelivered"),
          (3, "2026-01-01 00:03:00", "c")]
    for name, rows, mt in (("a.parquet", f1, 1000), ("b.parquet", f2, 2000)):
        pq.write_table(
            pa.table({
                "doc_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }),
            str(src / name),
        )
        os.utime(str(src / name), (mt, mt))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_dedup(stream, ["doc_id"], "ts", delay="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ddck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.text for r in spark.read.parquet(str(out_dir)).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # first arrival wins, once each


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Streaming sessionization (session_window + watermark, append
    mode): sessions CLOSED by the final watermark are emitted and
    match the batch session_window answer; a session still extendable
    at the final watermark is withheld. This is the streaming form of
    the batch `events_sessionize` oracle query."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    src = tmp_path / "sessrc"
    os.makedirs(src)
    # user 1: two bursts 40 min apart (two sessions); user 2: one
    # burst, then a very late final event to push the watermark
    rows = [
        (1, "2026-01-01 00:00:00"),
        (1, "2026-01-01 00:05:00"),
        (1, "2026-01-01 00:45:00"),  # > 30-min gap: new session
        (2, "2026-01-01 00:10:00"),
        (2, "2026-01-01 00:20:00"),
        (2, "2026-01-01 03:00:00"),  # drives watermark far forward
    ]
    pq.write_table(
        pa.table({
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
        }),
        str(src / "s1.parquet"),
    )

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.StringType()),
    ])

    def sessions(df):
        return (
            df.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("events_n"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                "events_n",
            )
        )

    out_dir = tmp_path / "sesout"
    q = (
        sessions(
            spark.readStream.schema(schema).parquet(str(src))
        )
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "sesck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.session_start.isoformat()): r.events_n
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # batch reference on the same data (watermark is a no-op in batch)
    batch = sessions(spark.read.schema(schema).parquet(str(src)))
    want = {
        (r.user_id, r.session_start.isoformat()): r.events_n
        for r in batch.collect()
    }
    # final watermark = 03:00 - 10 min = 02:50: every session except
    # user 2's 03:00 burst is closed (gap end < watermark) and emitted
    withheld = (2, "2026-01-01T03:00:00")
    assert withheld in want and withheld not in got
    for k, v in got.items():
        assert want[k] == v, (k, v, want.get(k))
    assert (1, "2026-01-01T00:00:00") in got  # 2 events
    assert (1, "2026-01-01T00:45:00") in got  # separate session
    assert (2, "2026-01-01T00:10:00") in got
    assert got[(1, "2026-01-01T00:00:00")] == 2


def test_compact_collapses_generations_and_rebuckets(spark, tmp_path):
    """Maintenance OPTIMIZE: after many small batches the state spans
    many generation dirs; compact() collapses the live state into ONE
    generation (same rows), and new_num_buckets re-buckets — the knob
    otherwise frozen at creation — transparently to later merges."""
    import glob as _glob

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(
        str(tmp_path / "cstate" / "state"), ["id"], 16, keep_manifests=2
    )
    for i in range(5):  # 5 batches -> up to 5 live generations
        b = spark.createDataFrame(
            [("I", i * 40 + k, f"v{i}-{k}", i) for k in range(40)],
            schema=SCHEMA,
        )
        store.merge_batch(b, order_cols=["seq"])
    want = {(r.id, r.val) for r in store.read(spark).collect()}
    gen_glob = str(tmp_path / "cstate" / "state" / "data" / "*")

    store.compact(spark, new_num_buckets=4)
    got = {(r.id, r.val) for r in store.read(spark).collect()}
    assert got == want
    # the new manifest references exactly one generation, with 4 buckets
    man = store._load_manifest()
    assert man["num_buckets"] == 4
    gens = {rel.split("/")[1] for rel in man["buckets"].values()}
    assert len(gens) == 1 and next(iter(gens)).startswith("e6-compact-")
    assert len({rel.split("=", 1)[1] for rel in man["buckets"].values()}) <= 4

    # one more commit pushes pre-compact manifests past retention: GC
    # reaps their generations, leaving compact's + the new one
    store.merge_batch(
        spark.createDataFrame([("U", 3, "bump", 99)], schema=SCHEMA),
        order_cols=["seq"],
    )
    live_gens = {os.path.basename(p) for p in _glob.glob(gen_glob)}
    assert len(live_gens) == 2, live_gens
    # and the re-bucketed state keeps serving merges correctly
    assert {r.val for r in store.read(spark).filter("id = 3").collect()} == {
        "bump"
    }


def test_lookup_reads_only_key_buckets(spark, tmp_path):
    """Point lookup returns exactly the requested keys' current rows
    and lists only the buckets those keys hash to."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(
        str(tmp_path / "lstate" / "state"), ["id"], 16
    )
    base = spark.createDataFrame(
        [("I", i, f"v{i}", i) for i in range(1, 300)], schema=SCHEMA
    )
    store.merge_batch(base, order_cols=["seq"])
    got = {(r.id, r.val) for r in store.lookup(spark, [(7,), (42,), (299,)]).collect()}
    assert got == {(7, "v7"), (42, "v42"), (299, "v299")}
    # a deleted key simply doesn't come back
    store.merge_batch(
        spark.createDataFrame([("D", 42, None, 1000)], schema=SCHEMA),
        order_cols=["seq"],
    )
    got = {r.id for r in store.lookup(spark, [(7,), (42,)]).collect()}
    assert got == {7}
    # unknown keys -> empty, typed
    assert store.lookup(spark, [(100000,)]).count() == 0


def test_stream_auto_compaction(spark, tmp_path):
    """compact_every folds maintenance into the replay loop: the final
    state matches the plain replay, and the generation count stays
    bounded instead of one-per-batch."""
    import glob as _glob

    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        stream_replay_bucketed,
    )
    from pyspark.sql import types as T

    src = tmp_path / "acsrc"
    os.makedirs(src)
    for i in range(4):
        _write(
            str(src / f"b{i}.parquet"),
            [("I", i * 10 + k, f"v{i}.{k}", i) for k in range(10)],
            1000 + i,
        )
    schema = T.StructType([
        T.StructField("Op", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("seq", T.LongType()),
    ])
    final = stream_replay_bucketed(
        spark, str(src), schema, ["id"], ["seq"],
        str(tmp_path / "acstate"), num_buckets=8,
        max_files_per_trigger=1, compact_every=2,
    )
    assert final.count() == 40
    gens = _glob.glob(str(tmp_path / "acstate" / "state" / "data" / "*"))
    # 4 merge epochs + 2 compact epochs, retention 2 -> few live gens,
    # and at least one is a compact generation
    assert any("-compact-" in os.path.basename(g) for g in gens), gens
    assert len(gens) <= 3, gens


def test_schema_evolution_additive(spark, tmp_path):
    """Opt-in Delta-style evolution: a batch ADDING a column extends
    the state (pre-evolution rows read NULL), a batch MISSING a column
    fills NULL; the strict default still raises; compact preserves the
    evolved schema across mixed-schema generations."""
    import pytest as _pytest
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(
        str(tmp_path / "estate" / "state"), ["id"], 8
    )
    store.merge_batch(
        spark.createDataFrame(
            [("I", 1, "a", 1), ("I", 2, "b", 1)], schema=SCHEMA
        ),
        order_cols=["seq"],
    )
    widened = spark.createDataFrame(
        [("U", 2, "b2", 2, "extra2"), ("I", 3, "c", 2, "extra3")],
        "Op string, id long, val string, seq long, extra string",
    )
    # strict default: clear pre-stage error
    with _pytest.raises(ValueError, match="schema drift"):
        store.merge_batch(widened, order_cols=["seq"])
    store.merge_batch(
        widened, order_cols=["seq"], allow_schema_evolution=True
    )
    got = {r.id: (r.val, r.extra) for r in store.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b2", "extra2"), 3: ("c", "extra3")}

    # a later batch WITHOUT the new column back-fills NULL for its rows
    store.merge_batch(
        spark.createDataFrame([("U", 1, "a9", 3)], schema=SCHEMA),
        order_cols=["seq"],
        allow_schema_evolution=True,
    )
    got = {r.id: (r.val, r.extra) for r in store.read(spark).collect()}
    assert got[1] == ("a9", None) and got[3] == ("c", "extra3")

    # compact across mixed-schema generations keeps the evolved schema
    store.compact(spark)
    got2 = {r.id: (r.val, r.extra) for r in store.read(spark).collect()}
    assert got2 == got


def test_merge_stats_in_manifest(spark, tmp_path):
    """Every commit carries its stats block: merge epochs report keys
    upserted/deleted + buckets touched + wall ms; compact epochs are
    marked as maintenance."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "sstate" / "state"), ["id"], 8)
    store.merge_batch(
        spark.createDataFrame(
            [("I", 1, "a", 1), ("I", 2, "b", 1), ("D", 3, None, 1)],
            schema=SCHEMA,
        ),
        order_cols=["seq"],
    )
    s = store.stats()
    assert s["kind"] == "merge"
    assert s["keys_upserted"] == 2 and s["keys_deleted"] == 1
    assert s["buckets_touched"] >= 1 and s["wall_ms"] >= 0
    store.compact(spark)
    assert store.stats()["kind"] == "compact"


def test_compact_and_lookup_on_file_uri(spark, tmp_path):
    """The round-4 state ops (compact/lookup) must stay on the fsio
    path: driven through a file:// URI root, where any os.* call or
    os.path.join would break (the object-store stand-in)."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    root = "file://" + str(tmp_path / "ustate" / "state")
    store = BucketedParquetState(root, ["id"], 8)
    for i in range(3):
        store.merge_batch(
            spark.createDataFrame(
                [("I", i * 10 + k, f"v{i}.{k}", i) for k in range(10)],
                schema=SCHEMA,
            ),
            order_cols=["seq"],
        )
    want = {(r.id, r.val) for r in store.read(spark).collect()}
    store.compact(spark, new_num_buckets=4)
    assert {(r.id, r.val) for r in store.read(spark).collect()} == want
    got = {r.id for r in store.lookup(spark, [(5,), (25,)]).collect()}
    assert got == {5, 25}
    assert store.stats()["kind"] == "compact"

def test_schema_evolution_survives_fresh_bucket_batch(spark, tmp_path):
    """Regression: with allow_schema_evolution, a batch whose touched
    buckets have NO live state (all-new keys) must not narrow the
    committed schema to the batch-only columns — a column present only
    in prior state would otherwise vanish from explicit-schema reads
    of the untouched buckets (destructive narrowing from a feature
    documented additive-only)."""
    from pyspark.sql import functions as F
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    nb = 8
    store = BucketedParquetState(str(tmp_path / "nstate" / "state"), ["id"], nb)
    store.merge_batch(
        spark.createDataFrame(
            [("I", 1, "a", 1, "x1")],
            "Op string, id long, val string, seq long, extra string",
        ),
        order_cols=["seq"],
    )

    def bucket_of(key: int) -> int:
        return (
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(key).cast("long")), F.lit(nb))
                .cast("int")
                .alias("b")
            )
            .first()
            .b
        )
    other = next(k for k in range(2, 200) if bucket_of(k) != bucket_of(1))

    # batch MISSING `extra`, landing in a bucket with no live state
    store.merge_batch(
        spark.createDataFrame([("I", other, "b", 2)], schema=SCHEMA),
        order_cols=["seq"],
        allow_schema_evolution=True,
    )
    got = {r.id: (r.val, r.extra) for r in store.read(spark).collect()}
    assert got == {1: ("a", "x1"), other: ("b", None)}


def test_lookup_composite_pk_follows_pk_cols_order(spark, tmp_path):
    """Regression: lookup key tuples follow pk_cols order as passed to
    the constructor — NOT committed-schema field order. With a
    composite PK whose pk_cols order differs from column order and
    whose types coincide, binding by field order silently returns the
    wrong (empty) result."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(
        str(tmp_path / "cstate" / "state"), ["b", "a"], 8
    )
    store.merge_batch(
        spark.createDataFrame(
            [("I", 1, 100, "r1", 1), ("I", 2, 200, "r2", 1)],
            "Op string, a long, b long, val string, seq long",
        ),
        order_cols=["seq"],
    )
    # tuples in pk_cols order: (b, a)
    got = {r.val for r in store.lookup(spark, [(100, 1)]).collect()}
    assert got == {"r1"}
    # schema-field order (a, b) must NOT match anything
    assert store.lookup(spark, [(1, 100)]).count() == 0


def test_merge_batch_reports_commit(spark, tmp_path):
    """merge_batch returns True only when it commits an epoch; an
    empty microbatch is a no-op (no manifest, no state) — the guard
    that keeps compact_every from scheduling compact() before any
    manifest exists."""
    from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
        BucketedParquetState,
    )

    store = BucketedParquetState(str(tmp_path / "gstate" / "state"), ["id"], 4)
    empty = spark.createDataFrame([], schema=SCHEMA)
    assert store.merge_batch(empty, order_cols=["seq"]) is False
    assert not store.exists()
    assert store.merge_batch(
        spark.createDataFrame([("I", 1, "a", 1)], schema=SCHEMA),
        order_cols=["seq"],
    ) is True
    assert store.exists()


def test_stateful_sessionize_multibatch_converges(spark, tmp_path):
    """A session that SPANS two microbatches must emerge merged: the
    provisional open-session row from batch 0 is superseded by the
    extended row from batch 1 (upsert on (user_id, session_start)),
    and a gap >= 30 min across the batch boundary closes the first
    session exactly once."""
    import pandas as pd
    from pyspark.sql import Window

    from rust_dms_cdc_operator_spark.streaming.stateful import (
        sessionize_stateful,
    )

    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    os.makedirs(src)

    def _ts(minute):
        return datetime(2024, 1, 1, 10, 0) + pd.Timedelta(minutes=minute)

    # user 1: events at t0, t10 (batch A) and t20, t70 (batch B):
    #   t20 extends the open session (gap 10 < 30); t70 starts a new one
    # user 2: single event in batch A only
    fa = str(src / "a.parquet")
    pq.write_table(
        pa.table({
            "user_id": [1, 1, 2],
            "ts": [_ts(0), _ts(10), _ts(5)],
        }),
        fa,
    )
    os.utime(fa, (1000, 1000))
    fb = str(src / "b.parquet")
    pq.write_table(
        pa.table({"user_id": [1, 1], "ts": [_ts(20), _ts(70)]}),
        fb,
    )
    os.utime(fb, (2000, 2000))

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sessions = sessionize_stateful(stream, gap_seconds=1800.0)

    def sink(batch_df, bid):
        batch_df.withColumn("_bid", F.lit(bid)).write.mode("append").parquet(
            str(out)
        )

    q = (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    res = spark.read.parquet(str(out))
    w = Window.partitionBy("user_id", "session_start").orderBy(
        F.col("_bid").desc()
    )
    final = (
        res.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "session_start", "session_end", "events_n")
    )
    rows = {
        (r.user_id, r.session_start, r.session_end): r.events_n
        for r in final.collect()
    }
    assert rows == {
        (1, _ts(0), _ts(20)): 3,   # spans the batch boundary, merged
        (1, _ts(70), _ts(70)): 1,  # opened by the 50-min gap
        (2, _ts(5), _ts(5)): 1,
    }, rows
    # the closed span-session emitted exactly once as closed=True
    closed = res.filter(
        (F.col("user_id") == 1) & F.col("closed")
    ).collect()
    assert len(closed) == 1 and closed[0].events_n == 3


def test_streaming_cms_merge_across_batches(spark, tmp_path):
    """Two microbatches, each building a partial sketch, merged
    bucket-wise — the accumulated sketch must be IDENTICAL to the
    one-shot batch sketch over all rows (lossless mergeability is the
    sketch's defining property)."""
    from rust_dms_cdc_operator_spark.operators.sketch import cms_build

    src = tmp_path / "src"
    acc = tmp_path / "acc"
    ck = tmp_path / "ck"
    os.makedirs(src)

    rows_a = [(f"w{i % 20}",) for i in range(300)]
    rows_b = [(f"w{i % 35}",) for i in range(200)]
    fa = str(src / "a.parquet")
    pq.write_table(pa.table({"word": [r[0] for r in rows_a]}), fa)
    os.utime(fa, (1000, 1000))
    fb = str(src / "b.parquet")
    pq.write_table(pa.table({"word": [r[0] for r in rows_b]}), fb)
    os.utime(fb, (2000, 2000))

    schema = T.StructType([T.StructField("word", T.StringType())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    n_batches = []

    def sink(batch_df, bid):
        n_batches.append(bid)
        part = cms_build(batch_df, "word", width=64)
        sess = batch_df.sparkSession
        try:
            prev = sess.read.parquet(str(acc))
            merged = (
                part.unionByName(prev)
                .groupBy("cms_row", "cms_bucket")
                .agg(F.sum("total").cast("long").alias("total"))
            )
        except Exception:
            merged = part
        rows = merged.collect()
        sess.createDataFrame(rows, part.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(acc))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(n_batches) == 2  # genuinely merged across two batches

    streamed = spark.read.parquet(str(acc))
    full = cms_build(
        spark.createDataFrame(rows_a + rows_b, "word string"), "word", width=64
    )
    assert streamed.exceptAll(full).count() == 0
    assert full.exceptAll(streamed).count() == 0


def test_stream_stream_join_across_batches(spark, tmp_path):
    """Clicks arriving in batch A must still join purchases arriving
    in batch B (the click is buffered in join state until the
    watermark provably passes its joinable horizon)."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    os.makedirs(src)

    t0 = datetime(2024, 1, 1, 10, 0)
    fa = str(src / "a.parquet")
    pq.write_table(
        pa.table({
            "event_id": [1, 2],
            "user_id": [7, 8],
            "event_type": ["click", "click"],
            "ts": [t0, t0],
        }),
        fa,
    )
    os.utime(fa, (1000, 1000))
    fb = str(src / "b.parquet")
    from datetime import timedelta
    pq.write_table(
        pa.table({
            "event_id": [3, 4],
            "user_id": [7, 8],
            "event_type": ["purchase", "purchase"],
            # user 7 inside the 1h bound, user 8 outside it
            "ts": [t0 + timedelta(minutes=30), t0 + timedelta(hours=2)],
        }),
        fb,
    )
    os.utime(fb, (2000, 2000))

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    clicks = raw.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", "1 hour")
    purchases = raw.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    j = clicks.join(
        purchases,
        F.expr("c_user = p_user AND p_ts >= c_ts"
               " AND p_ts <= c_ts + interval 1 hour"),
    ).select("click_id", "purchase_id")
    q = (
        j.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [(r.click_id, r.purchase_id) for r in spark.read.parquet(str(out)).collect()]
    assert got == [(1, 3)], got  # cross-batch pair joined; out-of-bound pair not


def test_cms_accumulate_corrupt_accumulator_fails_loudly(spark, tmp_path):
    """The streaming CMS accumulator's first-batch detection is an
    explicit existence probe, never try/except-as-control-flow (r6
    verdict): a healthy run merges batches exactly (2+3 occurrences of
    'a' estimate as 5), and a CORRUPT accumulator part file fails the
    microbatch loudly — silently resetting the sketch would undercount
    every key seen before the crash."""
    import pytest

    from rust_dms_cdc_operator_spark.operators.sketch import (
        cms_accumulate,
        cms_estimate,
    )

    acc = str(tmp_path / "acc")
    b1 = spark.createDataFrame([("a",), ("a",), ("b",)], "word string")
    b2 = spark.createDataFrame([("a",), ("a",), ("a",)], "word string")
    cms_accumulate(b1, acc, "word", width=64)
    cms_accumulate(b2, acc, "word", width=64)
    probes = spark.createDataFrame([("a",), ("b",)], "word string")
    est = {
        r.word: r.cms_count
        for r in cms_estimate(
            spark.read.parquet(acc), probes, "word", width=64
        ).collect()
    }
    assert est["a"] == 5 and est["b"] == 1  # merged, not reset

    # corrupt the accumulator: the next microbatch must raise, and the
    # (corrupt) accumulator must NOT be silently overwritten
    import os

    part = next(
        os.path.join(acc, n)
        for n in os.listdir(acc)
        if n.startswith("part-")
    )
    with open(part, "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        cms_accumulate(b1, acc, "word", width=64)
    with open(part, "rb") as fh:
        assert fh.read() == b"not a parquet file"  # left for forensics


def test_neardup_accumulate_batching_invariance_and_crash(spark, tmp_path):
    """Streaming SimHash near-dup: the accumulated output after an
    id-ordered multi-batch replay equals the batch rule 'shares a band
    with any smaller-id doc' AND equals a single-batch run (state
    merge is batching-invariant for ordered arrival); a corrupt state
    dir fails loudly (cms_accumulate contract)."""
    import os

    import pytest

    from rust_dms_cdc_operator_spark.operators.dedup import (
        neardup_accumulate,
        simhash_bits,
    )

    docs = []
    for i in range(30):
        t = i % 5
        docs.append((i, f"template {t} shared body text common tail w{t}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # ground truth: smaller-id band-share rule over the full corpus
    width, mask = 15, (1 << 15) - 1
    sig = {
        r.doc_id: r.simhash
        for r in simhash_bits(df, "doc_id", "text", 60).collect()
    }
    def bandset(s):
        return {(i, (s >> (i * width)) & mask) for i in range(4)}
    want = {
        i: any(
            bandset(sig[i]) & bandset(sig[j]) for j in sig if j < i
        )
        for i in sig
    }

    def run(batches, tag):
        acc = str(tmp_path / f"acc_{tag}")
        out = str(tmp_path / f"out_{tag}")
        for lo, hi in batches:
            b = df.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            neardup_accumulate(b, acc, out)
        return {
            r.doc_id: r.is_neardup
            for r in spark.read.parquet(out).collect()
        }

    got_multi = run([(0, 10), (10, 20), (20, 30)], "multi")
    got_single = run([(0, 30)], "single")
    assert got_multi == want
    assert got_single == want

    # corrupt state: loud failure, state not silently replaced.
    # State lives as epoch subdirs (round 8) — corrupt the part file
    # inside the newest committed epoch.
    acc = str(tmp_path / "acc_multi")
    epoch = max(
        os.path.join(acc, n) for n in os.listdir(acc)
        if n.startswith("state-")
    )
    part = next(
        os.path.join(epoch, n)
        for n in os.listdir(epoch)
        if n.startswith("part-")
    )
    with open(part, "wb") as fh:
        fh.write(b"junk not parquet")
    with pytest.raises(Exception, match="(?i)parquet|footer|magic"):
        neardup_accumulate(df, acc, str(tmp_path / "out_crash"))
    with open(part, "rb") as fh:
        assert fh.read() == b"junk not parquet"

    # a flat pre-epoch state layout is refused loudly, never silently
    # reset to "first batch"
    flat = str(tmp_path / "acc_flat")
    os.makedirs(flat)
    with open(os.path.join(flat, "part-00000"), "wb") as fh:
        fh.write(b"legacy")
    with pytest.raises(OSError, match="pre-epoch"):
        neardup_accumulate(df, flat, str(tmp_path / "out_flat"))


def test_neardup_accumulate_crash_replay_idempotent(spark, tmp_path):
    """Crash semantics of the epoch-state protocol: (a) an
    uncommitted epoch (no _SUCCESS) is ignored and the previous
    committed state drives the replay; (b) replaying a batch with the
    same batch_id after BOTH writes landed double-appends nothing
    (dynamic per-batch partition overwrite); (c) replay after the
    state committed but the output write was lost produces the same
    flags the first attempt would have."""
    import os
    import shutil

    from rust_dms_cdc_operator_spark.operators.dedup import (
        neardup_accumulate,
    )

    docs = [
        (i, f"template {i % 3} shared body text common tail w{i % 3}")
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    b1 = df.filter(F.col("doc_id") < 10)
    b2 = df.filter(F.col("doc_id") >= 10)
    acc, out = str(tmp_path / "acc"), str(tmp_path / "out")

    neardup_accumulate(b1, acc, out, batch_id=0)
    neardup_accumulate(b2, acc, out, batch_id=1)
    want = {
        r.doc_id: r.is_neardup for r in spark.read.parquet(out).collect()
    }
    assert len(want) == 20

    # (b) full replay of batch 1 with the same id: no duplicate rows
    neardup_accumulate(b2, acc, out, batch_id=1)
    again = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(again) == list(range(20))

    # (a) an uncommitted (crashed) epoch write is invisible to readers
    epochs = sorted(n for n in os.listdir(acc) if n.startswith("state-"))
    crashed = os.path.join(acc, "state-99")
    shutil.copytree(os.path.join(acc, epochs[-1]), crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    with open(os.path.join(crashed, "part-corrupt"), "wb") as fh:
        fh.write(b"torn write")
    # (c) replay batch 1 once more — crashed epoch ignored, flags equal
    neardup_accumulate(b2, acc, out, batch_id=1)
    got = {
        r.doc_id: r.is_neardup for r in spark.read.parquet(out).collect()
    }
    assert got == want
