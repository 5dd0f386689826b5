"""Per-key categorical counters via transformWithState MapState —
completing the Spark-4 typed-state API triad this engine exercises:
ValueState (streaming/tws.py running totals), ListState
(streaming/ratelimit.py arrival log), MapState (here).

The operator maintains, per stream key (user), a map
``event_type -> running count`` and emits the UPDATED entries each
micro-batch. Count merging is addition — associative, commutative,
order-free — so any micro-batch split converges to the batch
``GROUP BY (user, event_type)`` counts, and the update-mode sink's
latest row per (user, event_type) (= its MAX, counts are monotone) IS
the batch answer the SQL oracle states directly.

State size: |event types per user| entries per key — the map is the
per-key histogram itself, never the events. At 100 TB this is the
canonical per-entity categorical profile (feature-store counters,
per-user action mixes) with bounded state; a TTL on the map
(``ttlDurationMs``, supported by the same API) ages out idle entities.

The applyInPandasWithState twin (two parallel arrays in the group
state) runs wherever the TWS protobuf worker is unavailable — same
fold, same emissions, pinned against the processor in tests.
"""

from __future__ import annotations

from kinesis_log_watcher_spark.sources.files import (
    python_state_partitions,
    replay_partitions,
)

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.session import ensure_session_confs
from kinesis_log_watcher_spark.streaming.tws import tws_runtime_available
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

COUNT_SCHEMA = "user_id bigint, event_type string, n bigint"
_STATE_SCHEMA = "types array<string>, counts array<bigint>"
_counter = itertools.count()


def _batch_increments(batch: pd.DataFrame) -> "list[tuple[str, int]]":
    """Per-type increments of one micro-batch, in sorted-type order (a
    deterministic emission order within the batch)."""
    upd = batch.groupby("event_type").size()
    return [(str(et), int(n)) for et, n in sorted(upd.items())]


class TypeCountsProcessor(StatefulProcessor):
    """MapState-backed per-user event-type counters."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "et string", "n bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        out_et: list[str] = []
        out_n: list[int] = []
        for et, add in _batch_increments(batch):
            cur = (
                self._counts.getValue((et,))
                if self._counts.containsKey((et,))
                else None
            )
            n = (int(cur[0]) if cur is not None else 0) + add
            self._counts.updateValue((et,), (n,))
            out_et.append(et)
            out_n.append(n)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_et),
                "event_type": out_et,
                "n": out_n,
            }
        )

    def close(self) -> None:  # pragma: no cover - no resources held
        pass


def _count_updates():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        counts: dict[str, int] = {}
        if state.exists:
            types, ns = state.get
            counts = dict(zip(types, (int(n) for n in ns)))
        batch = pd.concat(list(pdfs), ignore_index=True)
        out_et: list[str] = []
        out_n: list[int] = []
        for et, add in _batch_increments(batch):
            counts[et] = counts.get(et, 0) + add
            out_et.append(et)
            out_n.append(counts[et])
        keys_sorted = sorted(counts)
        state.update((keys_sorted, [counts[t] for t in keys_sorted]))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_et),
                "event_type": out_et,
                "n": out_n,
            }
        )

    return fn


def count_stream(events: DataFrame, use_tws: bool | None = None) -> DataFrame:
    """Stream in → updated (user_id, event_type, n) rows per batch."""
    if use_tws is None:
        use_tws = tws_runtime_available()
    if use_tws:
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=TypeCountsProcessor(),
            outputStructType=COUNT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _count_updates(),
        outputStructType=COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_type_counts(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Replay a bounded events table through the counter and resolve
    the update sink to final counts (counts are monotone per key, so
    latest = MAX — order-free)."""
    from kinesis_log_watcher_spark.sources.files import (
        await_or_raise,
        read_parquet_stream,
    )

    ensure_session_confs(spark)
    stream = read_parquet_stream(spark, events_path, max_files_per_trigger)
    name = f"type_counts_{next(_counter)}"
    with replay_partitions(spark, python_state_partitions()):
        q = (
            count_stream(stream.select("user_id", "event_type"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.max("n").cast("long").alias("n"))
    )
