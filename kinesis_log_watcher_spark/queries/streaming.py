"""Streaming queries: executed through Structured Streaming, oracle-checked
against the equivalent batch SQL (a bounded stream replay must equal the
batch answer — SURVEY.md §5.2's streaming-semantics property)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_log_watcher_spark.queries.base import register
from kinesis_log_watcher_spark.streaming.windows import run_windowed_counts


@register(
    "stream_windowed_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h event-time windows via Structured Streaming "
    "(AvailableNow replay → memory sink); oracle = the batch GROUP BY "
    "date_trunc. The reference has no event-time windowing at all "
    "(SURVEY.md §2.2).",
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_windowed_counts(spark, f"{sf_dir}/events.parquet")
