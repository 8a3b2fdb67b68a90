"""Incremental view maintenance (IVM) over a ``BucketedParquetState``.

A materialized aggregate whose refresh cost is bounded by the CDC
churn, not the table size: the state table is hash-bucketed by PK and
every merge epoch rewrites ONLY the touched buckets' generation dirs
(`cdc_stream.py`), so a bucket's data path doubles as a change vector
— if the path recorded at the last refresh still matches, every row
in the bucket is byte-identical and its per-bucket partial aggregate
carries forward BY REFERENCE. Refresh therefore:

1. diffs the state manifest's bucket→path map against the snapshot
   recorded in the view's own manifest (driver-side, O(buckets));
2. recomputes partial aggregates for the stale buckets only — one
   scan of those buckets' dirs, one (bucket, group) aggregation;
3. commits a new view manifest (same immutable-generation +
   numbered-manifest pattern as the state store — atomic on
   local/HDFS/s3a, crash-safe, GC by manifest retention).

`result()` re-aggregates the per-bucket partials — O(buckets x
groups) rows, never O(state). Only decomposable aggregates are
supported (count/sum/min/max), because their partials re-aggregate
EXACTLY: count re-aggregates as sum, sum as sum, min as min, max as
max. (avg = sum/count at read time; distinct counts need a sketch —
see operators/sketch.py KMV/CMS.)

This is the materialized-view story the reference's validate-loop
hints at (recompute everything, compare) done incrementally: at
100 TB with 1% daily churn, refresh touches ~1% of buckets.
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_dms_cdc_operator_spark import fsio
from rust_dms_cdc_operator_spark.streaming.cdc_stream import (
    BUCKET_COL,
    BucketedParquetState,
)

_MANIFEST_GLOB_WIDTH = 20

#: measure -> (partial expr builder, re-agg fn name)
_SUPPORTED = {"count", "sum", "min", "max"}
_REAGG = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


class IncrementalAggView:
    """Materialized ``group_cols`` aggregate over a bucketed state.

    ``measures`` maps output alias -> (fn, col) with fn in
    count/sum/min/max; for count the col is ignored.
    """

    def __init__(
        self,
        state: BucketedParquetState,
        path: str,
        group_cols: Sequence[str],
        measures: dict[str, tuple[str, str]],
        keep_manifests: int = 2,
    ):
        for alias, (fn, _col) in measures.items():
            if fn not in _SUPPORTED:
                raise ValueError(
                    f"measure {alias!r}: {fn!r} is not decomposable "
                    f"(supported: {sorted(_SUPPORTED)}); express avg as "
                    "sum/count and distinct via a sketch"
                )
        self.state = state
        self.path = path
        self.group_cols = list(group_cols)
        self.measures = dict(measures)
        self.keep_manifests = max(1, keep_manifests)

    # -- manifest plumbing (the state store's commit pattern) --------
    def _manifest_dir(self) -> str:
        return fsio.join(self.path, "_manifests")

    def _manifest_epochs(self) -> list[int]:
        if not fsio.exists(self._manifest_dir()):
            return []
        out = []
        for name in fsio.listdir(self._manifest_dir()):
            stem = name.split(".json")[0]
            if stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def _load_manifest(self) -> dict | None:
        epochs = self._manifest_epochs()
        if not epochs:
            return None
        return json.loads(
            fsio.read_text(
                fsio.join(
                    self._manifest_dir(),
                    f"{epochs[-1]:0{_MANIFEST_GLOB_WIDTH}d}.json",
                )
            )
        )

    # -- partial-aggregate expressions -------------------------------
    def _partial_exprs(self) -> list:
        out = []
        for alias, (fn, col) in self.measures.items():
            if fn == "count":
                out.append(F.count(F.lit(1)).cast("long").alias(alias))
            else:
                out.append(getattr(F, fn)(F.col(col)).alias(alias))
        return out

    def _reagg_exprs(self) -> list:
        out = []
        for alias, (fn, _col) in self.measures.items():
            expr = getattr(F, _REAGG[fn])(F.col(alias))
            if fn == "count":
                expr = expr.cast("long")
            out.append(expr.alias(alias))
        return out

    # -- the IVM core ------------------------------------------------
    def refresh(self, spark: SparkSession) -> dict:
        """Bring the view up to the state's current epoch. Returns
        stats: buckets recomputed / carried / dropped."""
        sman = self.state._load_manifest()
        if sman is None:
            raise FileNotFoundError(
                f"state at {self.state.path} has no committed manifest"
            )
        vman = self._load_manifest()
        prev_map: dict = vman["state_buckets"] if vman else {}
        cur_map: dict = sman["buckets"]
        agg_dirs: dict = dict(vman["agg_buckets"]) if vman else {}

        # change vector: a bucket whose generation path moved is stale;
        # a bucket absent from the state lost its every key
        stale = sorted(
            b for b, p in cur_map.items() if prev_map.get(b) != p
        )
        dropped = sorted(b for b in agg_dirs if b not in cur_map)
        for b in dropped:
            agg_dirs.pop(b, None)

        if stale:
            schema = T.StructType.fromJson(json.loads(sman["schema"]))
            dirs = [
                fsio.join(self.state.path, cur_map[b]) for b in stale
            ]
            df = spark.read.schema(schema).parquet(*dirs)
            # recompute the bucket id from the PK (the state's own
            # expression) — partition dirs don't carry the column
            df = df.withColumn(
                BUCKET_COL, self.state._bucket(sman["num_buckets"])
            )
            partials = df.groupBy(BUCKET_COL, *self.group_cols).agg(
                *self._partial_exprs()
            )
            gen = f"v{uuid.uuid4().hex[:8]}"
            gen_dir = fsio.join(self.path, "aggs", gen)
            partials.repartition(
                min(len(stale), sman["num_buckets"]), BUCKET_COL
            ).write.partitionBy(BUCKET_COL).parquet(gen_dir)
            for d in fsio.listdir_dirs(gen_dir):
                if d.startswith(f"{BUCKET_COL}="):
                    b = d.split("=", 1)[1]
                    agg_dirs[b] = f"aggs/{gen}/{d}"

        epoch = (vman["epoch"] + 1) if vman else 1
        fsio.mkdirs(self._manifest_dir())
        fsio.publish_text(
            fsio.join(
                self._manifest_dir(),
                f"{epoch:0{_MANIFEST_GLOB_WIDTH}d}.json",
            ),
            json.dumps(
                {
                    "epoch": epoch,
                    "state_epoch": sman["epoch"],
                    "state_buckets": cur_map,
                    "agg_buckets": agg_dirs,
                }
            ),
            tmp_suffix=f".tmp-{uuid.uuid4().hex[:8]}",
        )
        self._gc()
        return {
            "state_epoch": sman["epoch"],
            "buckets_recomputed": len(stale),
            "buckets_carried": len(agg_dirs) - len(
                {b for b in stale if b in agg_dirs}
            ),
            "buckets_dropped": len(dropped),
        }

    def result(self, spark: SparkSession) -> DataFrame:
        """The materialized aggregate: re-aggregate the per-bucket
        partials (O(buckets x groups) input rows, never O(state))."""
        vman = self._load_manifest()
        if vman is None:
            raise FileNotFoundError(
                f"view at {self.path} has never been refreshed"
            )
        if not vman["agg_buckets"]:
            # state is empty: an empty frame with the result schema
            empty = spark.createDataFrame([], self._result_schema(spark))
            return empty
        dirs = [
            fsio.join(self.path, rel)
            for rel in sorted(set(vman["agg_buckets"].values()))
        ]
        partials = spark.read.parquet(*dirs)
        return partials.groupBy(*self.group_cols).agg(*self._reagg_exprs())

    def _result_schema(self, spark: SparkSession):
        sman = self.state._load_manifest()
        schema = T.StructType.fromJson(json.loads(sman["schema"]))
        fields = [schema[c] for c in self.group_cols]
        for alias, (fn, col) in self.measures.items():
            if fn == "count":
                fields.append(T.StructField(alias, T.LongType()))
            else:
                fields.append(T.StructField(alias, schema[col].dataType))
        return T.StructType(fields)

    def _gc(self) -> None:
        epochs = self._manifest_epochs()
        retained = epochs[-self.keep_manifests :]
        stale = epochs[: -self.keep_manifests]
        referenced: set[str] = set()
        for e in retained:
            man = json.loads(
                fsio.read_text(
                    fsio.join(
                        self._manifest_dir(),
                        f"{e:0{_MANIFEST_GLOB_WIDTH}d}.json",
                    )
                )
            )
            for rel in man["agg_buckets"].values():
                referenced.add(rel.split("/")[1])  # aggs/<gen>/<bucket>
        for e in stale:
            fsio.delete(
                fsio.join(
                    self._manifest_dir(),
                    f"{e:0{_MANIFEST_GLOB_WIDTH}d}.json",
                ),
                recursive=False,
            )
        aggs_dir = fsio.join(self.path, "aggs")
        if fsio.exists(aggs_dir):
            for gen in fsio.listdir_dirs(aggs_dir):
                if gen not in referenced:
                    fsio.delete(fsio.join(aggs_dir, gen))
