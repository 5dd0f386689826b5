"""Scalar-function library: timestamp formatting, JSON access, text & vector ops."""

from kinesis_log_watcher_spark.functions.strftime import (
    strftime_col,
    go_layout_col,
    rfc3339nano_col,
)

__all__ = ["strftime_col", "go_layout_col", "rfc3339nano_col"]
