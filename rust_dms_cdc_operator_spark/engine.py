"""Library entry point: the ``CdcEngine`` facade.

The reference is consumed as a crate through two static methods
(`src/cdc/cdc_operator.rs:26,255` — ``CDCOperator::snapshot`` /
``CDCOperator::validate`` with hand-built payloads; README.md:38,107).
This is the same two-method surface over the Spark engine — thin by
design: it binds a SparkSession once and forwards to the
orchestration modules (`snapshot.py`, `validate.py`), which the CLI
uses identically, so library and CLI consumers run the same code
path (SURVEY §3.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rust_dms_cdc_operator_spark.payloads import (
    CdcSnapshotPayload,
    CdcValidatePayload,
)
from rust_dms_cdc_operator_spark.snapshot import ParquetTarget
from rust_dms_cdc_operator_spark.snapshot import snapshot as _snapshot
from rust_dms_cdc_operator_spark.validate import TableReport
from rust_dms_cdc_operator_spark.validate import validate as _validate


class CdcEngine:
    """Two-method library surface mirroring ``CDCOperator``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def snapshot(
        self,
        payload: CdcSnapshotPayload,
        root: str,
        target_root: str,
        primary_keys: dict[str, list[str]] | None = None,
        max_parallel_tables: int | None = None,
    ) -> dict[str, str]:
        """Replay DMS drops under ``root`` into parquet state under
        ``target_root``; returns table → written path (the library
        analogue of `cdc_operator.rs:26-252`)."""
        kwargs = {}
        if max_parallel_tables is not None:
            kwargs["max_parallel_tables"] = max_parallel_tables
        return _snapshot(
            self.spark,
            payload,
            ParquetTarget(target_root),
            root,
            primary_keys=primary_keys,
            **kwargs,
        )

    def validate(
        self,
        payload: CdcValidatePayload,
        tables: dict[str, tuple[DataFrame, DataFrame, list[str]]],
    ) -> dict[str, TableReport]:
        """Chunked hash-diff validation per table (the library
        analogue of `cdc_operator.rs:255-293`)."""
        return _validate(self.spark, payload, tables)
