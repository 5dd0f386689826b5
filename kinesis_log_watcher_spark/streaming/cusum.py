"""Stateful streaming CUSUM control chart (``applyInPandasWithState``).

Statistical process control over an unbounded stream: per event_type,
maintain the cumulative sum of (value − TARGET) deviations plus its
running extrema, and count threshold breaches — the streaming twin of
queries/round6b.py's batch ``revenue_cusum_changepoint`` closed form
(S⁺ = P − min(0, prefix-min P); S⁻ mirrored). TARGET and the breach
threshold are CONSTANTS of the monitor (classic SPC watches deviation
from a control target — a data-derived mean would not be incrementally
maintainable over an unbounded stream).

Determinism: the fold is order-sensitive, so rows are folded in
(ts, event_id) order. Within a batch the kernel concatenates ALL Arrow
chunks before sorting (the streaming/stateful.py chunk hazard); across
batches the replay harness stages TIME-SPLIT parts (the
streaming/timers.py discipline), so batch k's rows all precede batch
k+1's and the cross-batch state continuation replays the exact batch
fold. Each batch emits the current per-key snapshot (update mode);
snapshots grow monotonically in n, so the bounded-replay reduction is
``max(struct(n, …))`` per key — which the batch window oracle states
directly.

Scale: state is 5 int64s per monitored key; one shuffle by key per
micro-batch; emission volume is |keys| rows per batch.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kinesis_log_watcher_spark.functions.tscompat import normalize_ts_cols
from kinesis_log_watcher_spark.session import ensure_session_confs
from kinesis_log_watcher_spark.sources.files import (
    await_or_raise,
    read_parquet_stream,
    replay_partitions,
    stage_replay_files,
)

TARGET_MILLI = 50_000  # control target: value = 50.0
THRESHOLD_MILLI = 100_000  # breach when either CUSUM side exceeds 100.0

UPDATE_SCHEMA = (
    "event_type string, n bigint, cusum_pos bigint, cusum_neg bigint, "
    "n_breaches bigint"
)
STATE_SCHEMA = "p bigint, pmin bigint, pmax bigint, breaches bigint, n bigint"

_counter = itertools.count()


def _cusum_fn(target_milli: int, threshold_milli: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            p, pmin, pmax, breaches, n = state.get
        else:
            p, pmin, pmax, breaches, n = 0, 0, 0, 0, 0

        chunks = [pdf[["ts", "event_id", "milli"]] for pdf in pdfs]
        if chunks:
            allrows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            allrows = allrows.sort_values(["ts", "event_id"])
            for v in allrows["milli"].astype("int64"):
                p += int(v) - target_milli
                pmin = min(pmin, p)
                pmax = max(pmax, p)
                n += 1
                if p - pmin > threshold_milli or pmax - p > threshold_milli:
                    breaches += 1
        state.update((p, pmin, pmax, breaches, n))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n": [n],
                "cusum_pos": [p - pmin],
                "cusum_neg": [pmax - p],
                "n_breaches": [breaches],
            }
        )

    return fn


def cusum_update_stream(
    events: DataFrame,
    target_milli: int = TARGET_MILLI,
    threshold_milli: int = THRESHOLD_MILLI,
) -> DataFrame:
    return events.groupBy("event_type").applyInPandasWithState(
        _cusum_fn(target_milli, threshold_milli),
        outputStructType=UPDATE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_cusum(
    spark: SparkSession,
    events_path: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Replay the bounded events table through the CUSUM monitor in two
    TIME-SPLIT batches (cross-batch state continuation under the exact
    event-time order) and reduce the update stream to the final per-key
    snapshot."""
    ensure_session_confs(spark)
    ev = normalize_ts_cols(spark.read.parquet(events_path)).select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias(
            "milli"
        ),
    ).filter(F.col("milli").isNotNull())
    mid = ev.agg(F.expr("percentile_approx(ts, 0.5)").alias("mid")).collect()[
        0
    ].mid
    p1 = ev.filter(F.col("ts") <= mid)
    p2 = ev.filter(F.col("ts") > mid)
    replay = stage_replay_files(spark, [p1, p2], prefix="cusum_replay_")
    stream = normalize_ts_cols(
        read_parquet_stream(spark, replay, max_files_per_trigger=1)
    )
    name = f"stream_cusum_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            cusum_update_stream(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    # snapshots are monotone in n: the final state is the max-n row
    snap = spark.table(name).groupBy("event_type").agg(
        F.max(
            F.struct("n", "cusum_pos", "cusum_neg", "n_breaches")
        ).alias("m")
    )
    return snap.select(
        "event_type",
        F.col("m.n").alias("n"),
        F.col("m.cusum_pos").alias("cusum_pos"),
        F.col("m.cusum_neg").alias("cusum_neg"),
        F.col("m.n_breaches").alias("n_breaches"),
    )
