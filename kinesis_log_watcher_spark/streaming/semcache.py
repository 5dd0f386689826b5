"""Streaming semantic-cache TTL evaluation: per-cluster last-served
state, online hit/miss decisions, per-bucket hit-rate partials.

The ingest-time form of semantic_cache_ttl_eval (queries/round10.py):
serving requests stream in, each maps to a paraphrase cluster (the
stand-in for an embedding-bucket cache key), and a request HITS when
the same cluster was served within the last TTL sequence numbers. The
batch query answers this with one LAG window after the fact; a serving
stack has to answer it ONLINE — per-cluster state is exactly ONE
bigint (the cluster's last-served sequence number), bounded by the
cluster alphabet, never the stream.

Determinism contract (what makes the stateful fold oracle-comparable):
within a micro-batch each cluster's rows fold in event_id order;
across micro-batches the replay arrives in event_id order (single-file
replay = one batch; multi-file replays are mtime-ordered by id range —
the tokenbudget contract). The DuckDB oracle states the same rule
declaratively (LAG over event_id per cluster), so a green row
certifies the stateful stream == the declarative batch window.

Emissions are per-(cluster, bucket) COUNT PARTIALS for the micro-batch
(not running totals): the memory sink accumulates partials and the
read-side rollup SUMs them per bucket — at scale the same emissions
feed a downstream windowed aggregation instead of a memory table.

Dual-path like streaming/tokenbudget.py: transformWithStateInPandas
(ValueState) where the TWS runtime is available, applyInPandasWithState
otherwise — same fold, same emissions.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from kinesis_log_watcher_spark.session import ensure_session_confs
from kinesis_log_watcher_spark.streaming.tws import tws_runtime_available

PARTIAL_SCHEMA = "cluster bigint, bucket bigint, n_requests bigint, n_hits bigint"
_STATE_SCHEMA = "last_event bigint"
_counter = itertools.count()


def _fold_batch(
    last_event: "int | None", batch: pd.DataFrame, ttl: int
) -> "tuple[int | None, pd.DataFrame]":
    """Fold one micro-batch's rows (event_id order) through the
    cluster's last-served state; return (new_state, per-bucket partial
    counts for THIS batch)."""
    batch = batch.sort_values("event_id")
    counts: dict[int, list[int]] = {}
    for event_id in batch["event_id"]:
        event_id = int(event_id)
        bucket = event_id // 1000
        hit = 1 if (last_event is not None and event_id - last_event <= ttl) else 0
        c = counts.setdefault(bucket, [0, 0])
        c[0] += 1
        c[1] += hit
        last_event = event_id
    part = pd.DataFrame(
        {
            "bucket": list(counts),
            "n_requests": [c[0] for c in counts.values()],
            "n_hits": [c[1] for c in counts.values()],
        }
    )
    return last_event, part


class SemCacheProcessor(StatefulProcessor):
    """ValueState-backed per-cluster TTL fold (TWS path)."""

    def __init__(self, ttl: int):
        self._ttl = ttl

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("last", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        last = int(self._state.get()[0]) if self._state.exists() else None
        batch = pd.concat(list(rows), ignore_index=True)
        last, part = _fold_batch(last, batch, self._ttl)
        self._state.update((int(last),))
        part.insert(0, "cluster", int(key[0]))
        yield part

    def close(self) -> None:  # pragma: no cover - no resources held
        pass


def _cache_updates(ttl: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cluster,) = key
        last = int(state.get[0]) if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        last, part = _fold_batch(last, batch, ttl)
        state.update((int(last),))
        part.insert(0, "cluster", int(cluster))
        yield part

    return fn


def cache_partials_stream(
    requests: DataFrame, ttl: int, use_tws: bool | None = None
) -> DataFrame:
    """(event_id, cluster) stream in → per-(cluster, bucket) hit/req
    partials per micro-batch."""
    if use_tws is None:
        use_tws = tws_runtime_available()
    keyed = requests.select("cluster", "event_id").groupBy("cluster")
    if use_tws:
        return keyed.transformWithStateInPandas(
            statefulProcessor=SemCacheProcessor(ttl),
            outputStructType=PARTIAL_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return keyed.applyInPandasWithState(
        _cache_updates(ttl),
        outputStructType=PARTIAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_semcache_eval(
    spark: SparkSession,
    events_path: str,
    clusters: int,
    ttl: int,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
    use_tws: bool | None = None,
) -> DataFrame:
    """Replay a bounded events table through the online cache gate and
    roll the emitted partials up to the per-bucket hit rates (partials
    are disjoint per (cluster, batch), so the rollup is an order-free
    SUM)."""
    from kinesis_log_watcher_spark.sources.files import (
        await_or_raise,
        python_state_partitions,
        read_parquet_stream,
        replay_partitions,
    )

    ensure_session_confs(spark)
    stream = read_parquet_stream(spark, events_path, max_files_per_trigger)
    requests = stream.select(
        "event_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("scq|"), F.col("event_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % clusters
        ).alias("cluster"),
    )
    name = f"semcache_{next(_counter)}"
    with replay_partitions(spark, python_state_partitions()):
        q = (
            cache_partials_stream(requests, ttl, use_tws=use_tws)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return (
        spark.table(name)
        .groupBy("bucket")
        .agg(
            F.sum("n_requests").cast("long").alias("n_requests"),
            F.sum("n_hits").cast("long").alias("n_hits"),
        )
        .select(
            "bucket",
            "n_requests",
            "n_hits",
            F.expr("CAST(n_hits * 1000000 div n_requests AS BIGINT)").alias(
                "hit_rate_micro"
            ),
        )
    )
