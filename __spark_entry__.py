"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing_summary) on sf0.001.
queries()     — every implemented operator/query from SURVEY.md §2, one
                callable per name (see kinesis_log_watcher_spark.queries).
oracle_sql()  — matching DuckDB SQL for each query (None-oracle queries
                are omitted → driver records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kinesis_log_watcher_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
