"""Structured-Streaming CDC apply.

The reference processes CDC files as batch (SURVEY §2.7: no streaming
operators anywhere); this module is the engine's streaming-native
equivalent: ``readStream`` over the DMS drop directory, per-microbatch
window compaction, and a ``foreachBatch`` MERGE into the target state
table — the incremental form of ``operators.compact``.

Exactly-once: foreachBatch + a manifest-committed bucketed parquet
state table (immutable data files, a numbered manifest file as the
single commit point) — a protocol that is atomic on local disk, HDFS,
and object stores alike. The reference's native habitat is S3
(``/root/reference/src/s3/s3_operator.rs:210-317``), so the commit
protocol deliberately never renames a directory and never overwrites
a file.
"""

from __future__ import annotations

import json
import re
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_dms_cdc_operator_spark import fsio
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


_MANIFEST_RE = re.compile(r"^(\d{20})\.json$")


class BucketedParquetState:
    """Incremental state table: parquet hash-bucketed by PK, committed
    through a manifest log. A microbatch only rewrites the buckets its
    keys touch, so per-batch cost is O(touched buckets), not O(total
    state) — the property that keeps a 24/7 CDC stream viable when the
    state is 100 TB and a batch touches a few GB.

    Layout::

        <path>/_manifests/<epoch, 20 digits>.json   # commit log
        <path>/data/e<epoch>-<uuid8>/_state_bucket=<b>/part-*.parquet

    Commit protocol (object-store safe — the design constraint is that
    s3a has no atomic directory rename and no POSIX ``os.*``):

    1. every data file is IMMUTABLE and lives in a generation directory
       with a unique, never-reused name; nothing is ever renamed or
       overwritten in ``data/``;
    2. the COMMIT POINT is publishing manifest ``N+1`` — a single small
       JSON mapping bucket → current generation directory — under a
       fresh monotonically numbered key (atomic everywhere: os.rename
       locally, FileSystem.rename on HDFS, single COPY-object PUT on
       s3a; see :func:`fsio.publish_text`);
    3. readers take the highest-numbered manifest; a crash before the
       manifest publish leaves only invisible orphan generation dirs —
       the streaming checkpoint replays the batch and the idempotent
       merge converges;
    4. GC runs after a successful commit and deletes only generation
       dirs referenced by NO retained manifest (last
       ``keep_manifests``), so a reader of the previous manifest never
       loses files mid-scan.

    All filesystem metadata goes through :mod:`fsio`, so a
    ``s3a://bucket/state`` path uses the session's Hadoop connector
    end-to-end.
    """

    def __init__(
        self,
        path: str,
        pk_cols: Sequence[str],
        num_buckets: int = 64,
        keep_manifests: int = 2,
    ):
        self.path = path
        self.pk_cols = list(pk_cols)
        self.num_buckets = num_buckets
        self.keep_manifests = max(1, keep_manifests)

    def _bucket(self, num_buckets: int) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.pk_cols]), F.lit(num_buckets)
        ).cast("int")

    def _manifest_dir(self) -> str:
        return fsio.join(self.path, "_manifests")

    def _manifest_epochs(self) -> list[int]:
        out = []
        for name in fsio.listdir(self._manifest_dir()):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _load_manifest(self) -> dict | None:
        epochs = self._manifest_epochs()
        if not epochs:
            return None
        path = fsio.join(self._manifest_dir(), f"{epochs[-1]:020d}.json")
        return json.loads(fsio.read_text(path))

    def exists(self) -> bool:
        return bool(self._manifest_epochs())

    def read(self, spark: SparkSession, epoch: int | None = None) -> DataFrame:
        """Full state (no DMS/bookkeeping columns) at the latest
        commit, or — time travel — at a specific retained ``epoch``
        (the manifest log keeps the last ``keep_manifests`` commits;
        generation dirs referenced by any retained manifest are never
        GC'd, so a pinned read stays consistent)."""
        if epoch is None:
            man = self._load_manifest()
            if man is None:
                raise FileNotFoundError(f"no committed state at {self.path}")
        else:
            retained = self._manifest_epochs()
            if epoch not in retained:
                raise ValueError(
                    f"epoch {epoch} not retained at {self.path} "
                    f"(retained: {retained})"
                )
            man = json.loads(
                fsio.read_text(
                    fsio.join(self._manifest_dir(), f"{epoch:020d}.json")
                )
            )
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        if not man["buckets"]:  # every key deleted: empty, typed
            return spark.createDataFrame([], schema)
        dirs = [fsio.join(self.path, rel) for rel in man["buckets"].values()]
        # explicit committed schema: after additive evolution, buckets
        # written before a column existed read it as NULL (parquet
        # schema clipping) instead of failing a mergeSchema union
        return spark.read.schema(schema).parquet(*dirs)

    def merge_batch(
        self,
        batch: DataFrame,
        order_cols: Sequence[str],
        op_col: str = DMS_OP_COL,
        allow_schema_evolution: bool = False,
    ) -> bool:
        """Merge one compacted microbatch into the state and commit a
        new manifest epoch. Returns True if a commit was published,
        False for an empty microbatch (no epoch, no state change)."""
        spark = batch.sparkSession
        man = self._load_manifest()
        num_buckets = man["num_buckets"] if man else self.num_buckets
        epoch = man["epoch"] if man else 0
        buckets: dict[str, str] = dict(man["buckets"]) if man else {}
        data_cols = [
            c
            for c in batch.columns
            if c != op_col and not (c in order_cols and c.startswith("_cdc"))
        ]
        if man is not None:
            # P3 parity for the stream (compact.py:161-167): surface
            # drift as a clear error before any state byte is staged,
            # not as a union failure mid-merge. With
            # allow_schema_evolution, drift is instead resolved
            # Delta-style: batch-added columns extend the state (old
            # rows read NULL), batch-missing columns fill NULL — the
            # unionByName(allowMissingColumns) below does both, and
            # the committed manifest schema becomes the union.
            committed = {
                f["name"]
                for f in json.loads(man["schema"]).get("fields", [])
            }
            drift = set(data_cols) ^ committed
            if drift and not allow_schema_evolution:
                raise ValueError(
                    f"schema drift between batch and committed state at "
                    f"{self.path}: differing columns {sorted(drift)} "
                    "(recreate the state, align the source schema, or "
                    "opt in with allow_schema_evolution=True)"
                )
        t0 = time.monotonic()
        last = compact_cdc(batch, self.pk_cols, order_cols=order_cols, op_col="__keep_d__")
        last = last.withColumn(BUCKET_COL, self._bucket(num_buckets)).persist()
        try:
            touched = sorted(
                r[BUCKET_COL] for r in last.select(BUCKET_COL).distinct().collect()
            )
            if not touched:  # empty microbatch
                return False
            upserts = last.filter(F.col(op_col) != "D").select(*data_cols)
            live_dirs = [
                fsio.join(self.path, buckets[str(b)])
                for b in touched
                if str(b) in buckets
            ]
            if live_dirs:
                # path-level pruning: ONLY the touched buckets' current
                # generation dirs are listed/scanned — no filter over
                # the full state is ever planned. The committed schema
                # is explicit so pre-evolution buckets read added
                # columns as NULL.
                state = spark.read.schema(
                    T.StructType.fromJson(json.loads(man["schema"]))
                ).parquet(*live_dirs)
                survivors = state.join(
                    last.select(*self.pk_cols), self.pk_cols, "left_anti"
                )
                merged = survivors.unionByName(
                    upserts, allowMissingColumns=allow_schema_evolution
                )
            else:
                merged = upserts
            merged = merged.withColumn(BUCKET_COL, self._bucket(num_buckets))
            # one task → one bucket → one file, instead of every shuffle
            # partition spraying a file into every bucket directory
            gen = f"e{epoch + 1}-{uuid.uuid4().hex[:8]}"
            gen_dir = fsio.join(self.path, "data", gen)
            merged.repartition(
                min(num_buckets, len(touched)), BUCKET_COL
            ).write.partitionBy(BUCKET_COL).parquet(gen_dir)
            staged = {
                int(d.split("=", 1)[1])
                for d in fsio.listdir_dirs(gen_dir)
                if d.startswith(f"{BUCKET_COL}=")
            }
            for b in touched:
                # a touched bucket with no staged dir lost its every
                # key: dropping it from the mapping IS the delete
                buckets.pop(str(b), None)
            for b in staged:
                buckets[str(b)] = f"data/{gen}/{BUCKET_COL}={b}"
            # committed schema = union of the PREVIOUS committed schema
            # and the batch schema. merged.schema alone is wrong when no
            # touched bucket had live state (live_dirs empty ⇒ merged is
            # batch-only): under allow_schema_evolution a column present
            # only in the committed state would silently vanish from the
            # manifest schema, and explicit-schema reads of untouched old
            # buckets would drop that column's data — destructive
            # narrowing from a feature that is documented additive-only.
            out_schema = merged.drop(BUCKET_COL).schema
            if man is not None:
                committed_schema = T.StructType.fromJson(
                    json.loads(man["schema"])
                )
                have = {f.name for f in committed_schema.fields}
                out_schema = T.StructType(
                    list(committed_schema.fields)
                    + [f for f in out_schema.fields if f.name not in have]
                )
            schema_json = out_schema.json()
            # per-epoch observability (the reference's self-timing log
            # lines, cdc_operator.rs:219-229 — but queryable from the
            # commit log): counts are two tiny jobs over the already-
            # persisted compacted batch, never over the state
            n_keys = last.count()
            n_upserts = last.filter(F.col(op_col) != "D").count()
            fsio.mkdirs(self._manifest_dir())
            fsio.publish_text(
                fsio.join(self._manifest_dir(), f"{epoch + 1:020d}.json"),
                json.dumps(
                    {
                        "epoch": epoch + 1,
                        "num_buckets": num_buckets,
                        "schema": schema_json,
                        "buckets": buckets,
                        "stats": {
                            "kind": "merge",
                            "keys_upserted": n_upserts,
                            "keys_deleted": n_keys - n_upserts,
                            "buckets_touched": len(touched),
                            "wall_ms": int((time.monotonic() - t0) * 1000),
                        },
                    }
                ),
                tmp_suffix=f".tmp-{uuid.uuid4().hex[:8]}",
            )
            self._gc()
            return True
        finally:
            last.unpersist()

    def lookup(self, spark: SparkSession, keys: list[tuple]) -> DataFrame:
        """Point lookup: current state rows for the given PK tuples
        (each tuple's values in ``pk_cols`` order as passed to the
        constructor),
        reading ONLY the buckets those keys hash to. The bucket
        assignment runs through the SAME JVM expression the writer
        uses (xxhash64 — not reimplementable driver-side in Python),
        on a tiny keys frame; the state scan then lists just the
        matched buckets' generation dirs and semi-joins. Cost:
        O(|keys| + touched buckets), never O(total state) — the state
        inspection path for a 100 TB table.
        """
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed state at {self.path}")
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        # key tuples follow self.pk_cols order, so the StructType must
        # too — deriving it from committed-schema FIELD order binds
        # composite-PK values to the wrong fields whenever pk_cols order
        # differs from table column order (silently wrong/empty results
        # when the types happen to coincide)
        pk_fields = [schema[c] for c in self.pk_cols]
        keys_df = spark.createDataFrame(keys, T.StructType(pk_fields))
        num_buckets = man["num_buckets"]
        wanted = {
            r[BUCKET_COL]
            for r in keys_df.select(
                self._bucket(num_buckets).alias(BUCKET_COL)
            ).distinct().collect()
        }
        dirs = [
            fsio.join(self.path, rel)
            for b, rel in man["buckets"].items()
            if int(b) in wanted
        ]
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*dirs).join(
            F.broadcast(keys_df), self.pk_cols, "left_semi"
        )

    def compact(
        self, spark: SparkSession, new_num_buckets: int | None = None
    ) -> None:
        """Maintenance OPTIMIZE: rewrite every live bucket into ONE
        fresh generation and commit it as the next epoch. Long-running
        streams scatter state across one generation dir per batch;
        compaction collapses the listing back to a single generation
        (and lets GC reap the old ones at the retention horizon).

        ``new_num_buckets`` additionally RE-BUCKETS the state — the
        scale knob that is otherwise frozen at table creation: as state
        grows, re-bucket upward so each bucket stays executor-sized
        (subsequent ``merge_batch`` calls read the bucket count from
        the manifest, so the change is transparent to the stream).

        Same commit protocol as a merge: immutable generation dir
        first, numbered manifest publish as the commit point, GC after
        — a crash mid-compact leaves an invisible orphan generation
        and the old manifest intact.
        """
        man = self._load_manifest()
        if man is None:
            raise FileNotFoundError(f"no committed state at {self.path}")
        num_buckets = new_num_buckets or man["num_buckets"]
        epoch = man["epoch"]
        buckets: dict[str, str] = {}
        if man["buckets"]:
            # committed schema explicit: generations written before an
            # additive evolution read the newer columns as NULL
            state = spark.read.schema(
                T.StructType.fromJson(json.loads(man["schema"]))
            ).parquet(
                *[fsio.join(self.path, rel) for rel in man["buckets"].values()]
            )
            gen = f"e{epoch + 1}-compact-{uuid.uuid4().hex[:8]}"
            gen_dir = fsio.join(self.path, "data", gen)
            state.withColumn(
                BUCKET_COL, self._bucket(num_buckets)
            ).repartition(num_buckets, BUCKET_COL).write.partitionBy(
                BUCKET_COL
            ).parquet(gen_dir)
            buckets = {
                d.split("=", 1)[1]: f"data/{gen}/{BUCKET_COL}={d.split('=', 1)[1]}"
                for d in fsio.listdir_dirs(gen_dir)
                if d.startswith(f"{BUCKET_COL}=")
            }
        fsio.publish_text(
            fsio.join(self._manifest_dir(), f"{epoch + 1:020d}.json"),
            json.dumps(
                {
                    "epoch": epoch + 1,
                    "num_buckets": num_buckets,
                    "schema": man["schema"],
                    "buckets": buckets,
                    "stats": {"kind": "compact", "buckets": len(buckets)},
                }
            ),
            tmp_suffix=f".tmp-{uuid.uuid4().hex[:8]}",
        )
        self._gc()

    def stats(self, epoch: int | None = None) -> dict | None:
        """The stats block of the latest (or a retained) commit —
        keys upserted/deleted, buckets touched, wall ms for merges;
        kind='compact' for maintenance epochs. None for pre-stats
        manifests."""
        if epoch is None:
            man = self._load_manifest()
        else:
            man = json.loads(
                fsio.read_text(
                    fsio.join(self._manifest_dir(), f"{epoch:020d}.json")
                )
            )
        return (man or {}).get("stats")

    def _gc(self) -> None:
        """Post-commit cleanup: drop manifests beyond the retention
        window, then any generation dir no retained manifest references
        (replaced generations AND orphans from pre-commit crashes).
        Best-effort — a crash mid-GC just leaves garbage for the next
        commit."""
        epochs = self._manifest_epochs()
        retained, stale = epochs[-self.keep_manifests :], epochs[: -self.keep_manifests]
        referenced: set[str] = set()
        for e in retained:
            man = json.loads(
                fsio.read_text(fsio.join(self._manifest_dir(), f"{e:020d}.json"))
            )
            for rel in man["buckets"].values():
                referenced.add(rel.split("/")[1])  # data/<gen>/<bucket>
        for e in stale:
            fsio.delete(
                fsio.join(self._manifest_dir(), f"{e:020d}.json"), recursive=False
            )
        data_dir = fsio.join(self.path, "data")
        for gen in fsio.listdir_dirs(data_dir):
            if gen not in referenced:
                fsio.delete(fsio.join(data_dir, gen))


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
    compact_every: int | None = None,
    after_merge=None,
) -> DataFrame:
    """``stream_replay`` with the bucketed incremental state table —
    same contract, per-batch cost proportional to touched buckets.

    ``compact_every=N`` folds maintenance into the loop: after every
    N merged batches the state is compacted to one generation
    (``BucketedParquetState.compact``), bounding the generation-dir
    count a 24/7 stream accretes. Compaction is itself a committed
    epoch, so a crash between merge and compact loses nothing.

    ``after_merge(store, spark)``: optional hook invoked after every
    COMMITTED merge epoch — the streaming-materialized-view seam
    (e.g. ``ivm.IncrementalAggView.refresh``: each microbatch then
    maintains downstream aggregates at O(touched buckets) too)."""
    store = BucketedParquetState(
        fsio.join(state_dir, "state"), pk_cols, num_buckets
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    merged_count = 0

    def handle(batch: DataFrame, _epoch: int) -> None:
        nonlocal merged_count
        # count only batches that actually committed an epoch: an empty
        # first trigger would otherwise schedule compact() before any
        # manifest exists and kill the stream with FileNotFoundError
        if store.merge_batch(batch, order_cols, op_col):
            merged_count += 1
            if after_merge is not None:
                after_merge(store, batch.sparkSession)
            if compact_every and merged_count % compact_every == 0:
                store.compact(batch.sparkSession)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", fsio.join(state_dir, "_checkpoint"))
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
