"""SparkSession construction tuned for the CDC engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), UTC session timezone (required for oracle parity and for
the DMS `_dms_ingestion_timestamp` semantics), Arrow enabled for the
Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rust-dms-cdc-operator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster it is left to spark-submit. ``shuffle_partitions``
    defaults to the core count locally — on a 1000-executor cluster
    you would set this to ~2-3x total cores (AQE coalesces down).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # round 12 (guide §2.2 "fewer, larger reduce partitions"):
        # let AQE re-plan the OUTPUT partitioning of persisted plans.
        # Off (the default), a persisted salted LSH pair stream
        # materializes with every skew-split/salt reducer partition
        # intact (measured: 256 cache partitions of ~100 KB at sf0.1),
        # and every downstream pass over the cache — CC labeling,
        # contraction joins, verify attaches — schedules one task per
        # tiny partition. On, AQE coalesces the cached plan's tail
        # exchange to advisoryPartitionSizeInBytes like any other
        # exchange; the setting is scale-independent (on a cluster it
        # produces the same ~target-sized cache blocks).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.scheduler.mode", "FAIR")  # per-table pools share fairly
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Per-process memo of fixture table schemas, keyed by (dir, table).
#: METADATA only — never rows, never results: each query still scans,
#: plans and computes from the parquet inputs on every invocation.
#: Inferring a parquet schema costs a footer-read + py4j round trip
#: (~0.1 s warm, measured) and the bench pays it 1-3x per query
#: construction; an explicit schema read (~0.02 s) is also exactly
#: what a production job does — tables have declared schemas. Fixture
#: schemas are immutable for the life of a process, so the memo can
#: never serve a stale schema.
_TABLE_SCHEMA_MEMO: dict = {}


def read_table(spark, data_dir: str, name: str):
    """Read ``{data_dir}/{name}.parquet`` with a memoized explicit
    schema (round 12, guide §1.2 driver-side fixed costs; see
    ``_TABLE_SCHEMA_MEMO``). First read per (dir, table) infers and
    memoizes; later reads skip footer-based schema inference."""
    path = f"{data_dir}/{name}.parquet"
    schema = _TABLE_SCHEMA_MEMO.get((data_dir, name))
    if schema is None:
        df = spark.read.parquet(path)
        _TABLE_SCHEMA_MEMO[(data_dir, name)] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def local_relation(spark, rows, schema):
    """Driver rows → DataFrame via pandas/Arrow (round 12, guide §6
    "Arrow for driver transfers"): ``createDataFrame(list)``
    parallelizes the rows into ``defaultParallelism`` pickled slices,
    and EVERY later evaluation of the frame pays one Python-worker
    round trip per slice — ~0.15 s each, serialized when a consumer
    (e.g. ``coalesce(1)``) reads them in one task (measured: a
    4096-row write cost 5-7 s through the list form, 0.3 s through
    Arrow). The pandas/Arrow form lands as an Arrow-backed local
    relation evaluated entirely JVM-side. Rows must be
    fully-materialized tuples/Rows with no nulls in integer columns
    (pandas would coerce those to float)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if not rows:
        return spark.createDataFrame([], schema)
    pdf = pd.DataFrame(
        [tuple(r) for r in rows], columns=[f.name for f in schema.fields]
    )
    return spark.createDataFrame(pdf, schema)


def materialize_leaf(df):
    """Materialize a heavy intermediate ONCE and hand consumers a leaf
    (round 12, guide §5 localCheckpoint). For iterative consumers
    (CC, PageRank/LPA BSP rounds, k-core sweeps) of an expensive pair
    plan this is the difference between every round shipping the
    whole banded-LSH DAG in its task binary + re-planning it per AQE
    stage, and reading a leaf RDD (dedup_pagerank_capped measured:
    build 4.5-6.4 s → 0.7-0.8 s, exec 2.4-3.0 → 1.3-1.4 s at sf0.1).

    Checkpoints at the plan's NATURAL partitioning and coalesces the
    LEAF afterwards — order matters: ``coalesce(cores)`` BELOW the
    checkpoint squeezed the whole upstream band-join pipeline into
    ``cores`` fat tasks, and at native sf1 (~200M pairs) the per-task
    sort/aggregation state exhausted the execution pool
    (SparkOutOfMemoryError UNABLE_TO_ACQUIRE_MEMORY in the driver
    bench's scale section — dedup_pagerank). Coalescing ABOVE the
    checkpoint is a narrow merge of already-materialized blocks:
    materialization keeps every stage at its AQE-sized parallelism,
    while consumers still read ~cores partitions instead of one per
    salt shard (never increased: coalesce only shrinks). Blocks are
    freed by the harness-level :func:`release_persistent_rdds` sweep
    (or the ContextCleaner once the frame is unreferenced). Do NOT
    call this per-level inside a recursive operator — consecutive
    LogicalRDD rewrites compound Catalyst's stats/constraint
    propagation exponentially (see connected_components' e0 note)."""
    spark = df.sparkSession
    return df.localCheckpoint().coalesce(
        max(spark.sparkContext.defaultParallelism, 1)
    )


def release_persistent_rdds(spark) -> int:
    """Free every persisted RDD — including ``localCheckpoint`` block
    sets, which ``spark.catalog.clearCache()`` does NOT cover (it only
    drops CacheManager entries). Harness-level cleanup between
    independent queries (round 12): a lazily-GC'd localCheckpoint
    leaks its blocks until the ContextCleaner happens to run, and a
    suite that runs hundreds of queries back-to-back accumulates
    gigabytes of dead blocks that evict live working sets (measured:
    a +58 s regression window across the mid-inventory until GC
    caught up). Returns the number of RDDs released. Never call this
    while a query that still references a checkpointed frame is
    in flight — truncated lineage cannot recompute."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in list(jmap.values()):  # py4j JavaMap view
        jrdd.unpersist(False)
        n += 1
    return n


def scan_parallelism_floor(df, min_parts: int | None = None):
    """Floor the parallelism of an embarrassingly-parallel per-row
    compute stage (round 12; guide §2.5 "input skew" / §6 input
    splits): a dataset that arrives as a single small parquet file —
    or any scan below ``min_parts`` splits — otherwise executes the
    whole downstream row-wise stage (MinHash signatures, SimHash
    votes, shingle digests, image decodes) as ONE task while the rest
    of the machine idles. Round-robin repartition to
    ``defaultParallelism`` only when the current layout is below the
    floor; at scale a real scan already has >= cores splits, so this
    is a no-op and no shuffle is ever added on a cluster. Row-wise
    transforms are placement-independent, so results are unchanged,
    and Spark's sort-before-repartition (on by default) keeps the
    row-to-partition assignment deterministic under task retries.
    The repartition is an explicit REPARTITION_BY_NUM, which AQE
    never re-coalesces back down."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
