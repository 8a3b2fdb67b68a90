"""Structured-Streaming CDC apply.

The reference processes CDC files as batch (SURVEY §2.7: no streaming
operators anywhere); this module is the engine's streaming-native
equivalent: ``readStream`` over the DMS drop directory, per-microbatch
window compaction, and a ``foreachBatch`` MERGE into the target state
table — the incremental form of ``operators.compact``.

Exactly-once: foreachBatch + an atomically-swapped parquet state dir
locally; on a cluster the same function body targets Delta
``MERGE INTO`` or a JDBC staging upsert.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_dms_cdc_operator_spark.functions.dmscols import DMS_OP_COL
from rust_dms_cdc_operator_spark.operators.compact import compact_cdc


def apply_cdc_batch(
    state: DataFrame | None,
    batch: DataFrame,
    pk_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = DMS_OP_COL,
) -> DataFrame:
    """Merge one microbatch of CDC events into the current state:
    compact the batch (last writer wins within the batch), then apply
    upserts + deletes against the state. Deletes must be applied from
    the batch's *last* event per key, so the compaction keeps D rows
    until after the merge."""
    # order cols stay in the state when they are real data columns;
    # synthetic ones (the _cdc_* bookkeeping) are dropped
    data_cols = [
        c
        for c in batch.columns
        if c != op_col and not (c in order_cols and c.startswith("_cdc"))
    ]
    last = compact_cdc(batch, pk_cols, order_cols=order_cols, op_col="__keep_d__")
    # op_col passed as a non-existent name ⇒ D rows survive compaction;
    # they must: a key whose LAST batch event is D has to delete state
    upserts = last.filter(F.col(op_col) != "D").select(*data_cols)
    if state is None:
        return upserts
    survivors = state.join(last.select(*pk_cols), list(pk_cols), "left_anti")
    return survivors.unionByName(upserts)


BUCKET_COL = "_state_bucket"


class BucketedParquetState:
    """Incremental state table: parquet partitioned by a stable hash
    bucket of the PK. A microbatch only rewrites the buckets its keys
    touch (dynamic partition overwrite + partition-pruned state read),
    so per-batch cost is O(touched buckets), not O(total state) — the
    property that keeps a 24/7 CDC stream viable when the state is
    100 TB and a batch touches a few GB.

    Exactly-once: the merge is idempotent (re-applying the same batch
    to an already-merged state is a no-op), so the streaming
    checkpoint's at-least-once replay after a crash converges; a
    partially overwritten partition is fully rewritten on retry.
    """

    def __init__(self, path: str, pk_cols: Sequence[str], num_buckets: int = 64):
        self.path = path
        self.pk_cols = list(pk_cols)
        self.num_buckets = num_buckets

    def _bucket(self) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.pk_cols]), F.lit(self.num_buckets)
        ).cast("int")

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def _live_buckets(self) -> set[int]:
        """Bucket partitions currently on disk. A state dir can exist
        with zero buckets (every key deleted) — reading it as parquet
        would fail schema inference, so callers gate on this."""
        if not self.exists():
            return set()
        return {
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith(f"{BUCKET_COL}=")
        }

    def read(self, spark: SparkSession) -> DataFrame:
        """Full current state (no DMS/bookkeeping columns)."""
        self._recover()
        return spark.read.parquet(self.path).drop(BUCKET_COL)

    # -------------------------------------------------- commit protocol
    # The swap is write-ahead: staging parquet completes, then a tiny
    # _touched.json is atomically dropped into the staging dir (the
    # COMMIT POINT — it records both the touched buckets and which of
    # them have staged replacements), then buckets swap via renames,
    # then staging is removed. Recovery is unambiguous at every crash
    # point: staging without the marker → the write never committed →
    # roll BACK (drop staging; the checkpoint will replay the batch);
    # staging with the marker → roll FORWARD (finish exactly the
    # renames/removes the marker prescribes — idempotent, and the
    # replayed batch then re-applies onto the committed state, which
    # the anti-join merge absorbs).
    def _staging(self) -> str:
        return f"{self.path}.staging"

    def _recover(self) -> None:
        staging = self._staging()
        if not os.path.exists(staging):
            return
        marker = os.path.join(staging, "_touched.json")
        if not os.path.exists(marker):
            shutil.rmtree(staging, ignore_errors=True)  # never committed
            return
        with open(marker) as fh:
            rec = json.load(fh)
        self._apply_swap(rec["touched"], set(rec["staged"]))

    def _apply_swap(self, touched: list[int], staged_set: set[int]) -> None:
        staging = self._staging()
        os.makedirs(self.path, exist_ok=True)
        for b in touched:
            live = os.path.join(self.path, f"{BUCKET_COL}={b}")
            staged = os.path.join(staging, f"{BUCKET_COL}={b}")
            if b in staged_set:
                if os.path.exists(staged):  # not yet swapped
                    shutil.rmtree(live, ignore_errors=True)
                    os.rename(staged, live)
                # else: already swapped on a previous attempt
            else:
                # every key in this bucket was deleted: removing the
                # live dir IS the commit (idempotent)
                shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

    def merge_batch(
        self,
        batch: DataFrame,
        order_cols: Sequence[str],
        op_col: str = DMS_OP_COL,
    ) -> None:
        spark = batch.sparkSession
        self._recover()  # heal any interrupted swap before reading state
        data_cols = [
            c
            for c in batch.columns
            if c != op_col and not (c in order_cols and c.startswith("_cdc"))
        ]
        last = compact_cdc(batch, self.pk_cols, order_cols=order_cols, op_col="__keep_d__")
        last = last.withColumn(BUCKET_COL, self._bucket()).persist()
        try:
            touched = [r[BUCKET_COL] for r in last.select(BUCKET_COL).distinct().collect()]
            if not touched:  # empty microbatch
                return
            upserts = last.filter(F.col(op_col) != "D").select(*data_cols, BUCKET_COL)
            if self._live_buckets() & set(touched):
                state = spark.read.parquet(self.path).filter(
                    F.col(BUCKET_COL).isin(touched)  # partition-pruned read
                )
                survivors = state.join(
                    last.select(*self.pk_cols), self.pk_cols, "left_anti"
                )
                merged = survivors.unionByName(upserts)
            else:
                merged = upserts
            # Stage the merged buckets in a sibling directory FIRST: the
            # staging write is a fully-completed job before any byte of
            # the live state moves, so the plan reading self.path can
            # never observe its own overwrite — lineage is broken by
            # materialization, not by best-effort caching. The swap
            # itself follows the write-ahead commit protocol documented
            # at _recover(): parquet write → atomic _touched.json
            # marker (commit point) → per-bucket renames → drop
            # staging. Any crash rolls back (no marker) or forward
            # (marker present) without losing a bucket. On an object
            # store this whole method maps to a transactional MERGE
            # (Delta/Iceberg) — renames are the local-parquet protocol.
            staging = self._staging()
            # align write tasks with buckets: one task → one bucket →
            # one file, instead of every shuffle partition spraying a
            # file into every touched bucket directory
            merged.repartition(
                min(self.num_buckets, len(touched)), BUCKET_COL
            ).write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
            staged_set = {
                int(d.split("=", 1)[1])
                for d in os.listdir(staging)
                if d.startswith(f"{BUCKET_COL}=")
            }
            marker_tmp = os.path.join(staging, "_touched.json.tmp")
            with open(marker_tmp, "w") as fh:
                json.dump(
                    {"touched": list(touched), "staged": sorted(staged_set)}, fh
                )
            os.replace(marker_tmp, os.path.join(staging, "_touched.json"))
            self._apply_swap(list(touched), staged_set)
        finally:
            last.unpersist()


def stream_replay_bucketed(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    pk_cols: Sequence[str],
    order_cols: Sequence[str],
    state_dir: str,
    op_col: str = DMS_OP_COL,
    num_buckets: int = 64,
    max_files_per_trigger: int | None = None,
    transform=None,
) -> DataFrame:
    """``stream_replay`` with the bucketed incremental state table —
    same contract, per-batch cost proportional to touched buckets."""
    store = BucketedParquetState(
        os.path.join(state_dir, "state"), pk_cols, num_buckets
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if transform is not None:
        stream = transform(stream)

    def handle(batch: DataFrame, _epoch: int) -> None:
        store.merge_batch(batch, order_cols, op_col)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.read(spark)


def stream_replay(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    pk_cols: Sequence[str],
    order_cols: Sequence[str],
    state_dir: str,
    op_col: str = DMS_OP_COL,
    max_files_per_trigger: int | None = None,
    transform=None,
    num_buckets: int = 64,
) -> DataFrame:
    """Replay a directory of CDC parquet as a stream into a parquet
    state table; returns the final state DataFrame.

    Uses ``availableNow`` so the call is synchronous (drains whatever
    exists, then stops) — the 24/7 deployment drops the trigger and
    keeps the query running.

    Delegates to :func:`stream_replay_bucketed`: the bucketed
    incremental state (O(touched buckets) per microbatch) is the only
    state backend. The earlier full-rewrite versioned store was
    O(total state) per batch — a scale-killer for a 24/7 stream — and
    was removed in favor of this.
    """
    return stream_replay_bucketed(
        spark,
        source_dir,
        schema,
        pk_cols,
        order_cols,
        state_dir,
        op_col=op_col,
        num_buckets=num_buckets,
        max_files_per_trigger=max_files_per_trigger,
        transform=transform,
    )
