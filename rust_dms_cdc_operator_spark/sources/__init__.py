from rust_dms_cdc_operator_spark.sources.manifest import (
    ParquetFile,
    build_manifest,
    classify_and_order,
    date_start_key,
    filter_by_date_window,
    table_prefix,
)
from rust_dms_cdc_operator_spark.sources.reader import read_manifest

__all__ = [
    "ParquetFile",
    "build_manifest",
    "classify_and_order",
    "date_start_key",
    "filter_by_date_window",
    "read_manifest",
    "table_prefix",
]
