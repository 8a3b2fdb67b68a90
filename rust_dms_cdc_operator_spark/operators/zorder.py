"""Z-order (Morton) clustering: interleave the bits of several
integer dimensions into one sort key so that sorting/range-
partitioning by it co-locates rows that are close in EVERY dimension
— the data-layout primitive behind multi-dimensional file pruning
(Delta/Iceberg OPTIMIZE ZORDER BY): a query filtering on any subset
of the z-dimensions touches a small fraction of files instead of all
of them.

Pure bit arithmetic on longs (shiftleft/shiftright/AND), so z-values
are engine-portable integers and the layout decision is
oracle-checkable. At 100 TB the cluster step is ONE
repartitionByRange shuffle on the z-value (range boundaries from the
sampled distribution) + an in-partition sort — the same cost as any
re-layout write, paid once at ingest to make every later
multi-dimension scan prune.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 10) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (values
    must be non-negative; callers reduce to a bounded domain first,
    e.g. ``col % 1024`` or a rank). Bit i of dimension j lands at
    position ``i * ndims + j``; total width bits*ndims must stay
    under 63."""
    ndims = len(cols)
    if bits * ndims > 62:
        raise ValueError("z-value would overflow a signed 64-bit long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ndims + j)
    return z


def zorder_sql(col_names: list[str], bits: int = 10) -> str:
    """DuckDB rendering of ``zvalue`` (same bit placement), for
    oracles and cross-engine checks."""
    terms = []
    for j, name in enumerate(col_names):
        for i in range(bits):
            terms.append(f"((({name} >> {i}) & 1) << {i * len(col_names) + j})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    cols: list[Column],
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` so writes produce z-clustered files: range-
    partition on the z-value (one shuffle; boundaries sampled) and
    sort within each partition. Downstream writers emit one file per
    partition whose min/max column stats are tight in every
    z-dimension — the pruning contract."""
    with_z = df.withColumn("_zval", zvalue(cols, bits))
    parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        with_z.repartitionByRange(parts, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )
