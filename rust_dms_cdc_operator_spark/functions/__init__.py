from rust_dms_cdc_operator_spark.functions.dmscols import (
    DMS_OP_COL,
    DMS_TS_COL,
    delete_rows,
    drop_dms_columns,
    geometry_rewrite_expr,
    insert_rows,
    update_rows,
)

__all__ = [
    "DMS_OP_COL",
    "DMS_TS_COL",
    "delete_rows",
    "drop_dms_columns",
    "geometry_rewrite_expr",
    "insert_rows",
    "update_rows",
]
