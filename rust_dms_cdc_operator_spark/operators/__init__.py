from rust_dms_cdc_operator_spark.operators.compact import (
    apply_deletes,
    compact_cdc,
    merge_full_load_with_cdc,
    replay_manifest,
    upsert,
)
from rust_dms_cdc_operator_spark.operators.diff import (
    chunked_hash_diff,
    count_diff,
    row_diff,
)

__all__ = [
    "apply_deletes",
    "chunked_hash_diff",
    "compact_cdc",
    "count_diff",
    "merge_full_load_with_cdc",
    "replay_manifest",
    "row_diff",
    "upsert",
]
