"""Stream-stream join: watermarked, time-bounded equi-join of two event
streams — the most state-intensive streaming operator Spark offers, and
one the reference has nothing like (SURVEY.md §2.2).

The canonical attribution shape: for every click, the purchases by the
same user within the following hour. Both sides carry watermarks and the
join condition bounds the event-time distance, so the state store can
evict rows once the other side's watermark passes the bound — state is
O(events within the join window), not O(stream).

On a bounded replay the inner join's emissions equal the batch join
(inner stream-stream joins emit eagerly on match; watermarks only bound
state), which is what the SQL oracle computes.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.tscompat import normalize_ts_cols

from kinesis_log_watcher_spark.session import ensure_session_confs

_counter = itertools.count()


def clicks_to_purchases(
    clicks: DataFrame, purchases: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """The join itself (works for static and streaming inputs)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def run_stream_stream_join(
    spark: SparkSession,
    events_path: str,
    within: str = "1 hour",
    timeout_s: int = 300,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay the events table as TWO streams (clicks / purchases) and
    stream-stream join them."""
    from kinesis_log_watcher_spark.sources.files import read_parquet_stream

    ensure_session_confs(spark)

    def stream():
        s = read_parquet_stream(spark, events_path, max_files_per_trigger)
        s = normalize_ts_cols(s)
        return s.withWatermark("ts", "1 minute")

    clicks = stream().filter(F.col("event_type") == "click")
    purchases = stream().filter(F.col("event_type") == "purchase")
    joined = clicks_to_purchases(clicks, purchases, within)

    name = f"stream_stream_join_{next(_counter)}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    from kinesis_log_watcher_spark.sources.files import await_or_raise

    await_or_raise(q, timeout_s)
    return spark.table(name)


def run_stream_static_enrich(
    spark: SparkSession,
    events_path: str,
    customer_path: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Stream-STATIC join: enrich a replayed event stream with a static
    dimension table, then aggregate per (segment, event_type).

    The static side is a plain batch DataFrame — Spark re-plans it into
    every micro-batch as a broadcast hash join (no state store at all,
    unlike stream-stream joins: a static dim needs no watermark and
    holds no join state). This is the 100 TB enrichment shape: the
    fact stream never shuffles for the join; only the post-join
    aggregate keeps (tiny, per-group) state."""
    from kinesis_log_watcher_spark.functions.exact import dec

    from kinesis_log_watcher_spark.sources.files import read_parquet_stream

    ensure_session_confs(spark)
    stream = normalize_ts_cols(read_parquet_stream(spark, events_path))

    dim = spark.read.parquet(customer_path).select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    )
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("value"), 28, 4)).cast("double").alias("sum_value"),
    )

    name = f"stream_static_enrich_{next(_counter)}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    from kinesis_log_watcher_spark.sources.files import await_or_raise

    await_or_raise(q, timeout_s)
    return spark.table(name)
