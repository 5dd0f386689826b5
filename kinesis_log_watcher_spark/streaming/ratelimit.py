"""Stateful streaming rate limiter: sliding-window-log admission per key.

The reference throttles at the CONNECTOR level (R1, main.go retry/backoff
on Kinesis throughput errors — SURVEY.md §2.1, delegated to the
connector here). This operator is the record-level analogue an analytics
pipeline actually deploys: admit an event iff fewer than K events from
the same key arrived in the preceding sliding window — the
"sliding window log" limiter, decided on ARRIVALS (not on prior
admissions, which would make the semantics sequential-only and
oracle-hostile).

Determinism / oracle: an event is admitted iff the count of STRICTLY
PRIOR arrivals — total order (ts, event_id) — with ts in
(event.ts - window, event.ts] is < K. That definition is order-free, so
a batch SQL oracle computes it directly (a correlated time-bounded
count), and the streaming processor reproduces it exactly by sorting
each micro-batch by (ts, event_id) — tie pairs decide by event_id, not
arrival accident.

State: one timestamp log per key holding only arrivals inside the
current window — bounded by the per-key arrival rate times the window,
independent of stream length (old entries evict as time advances; at
100 TB the same plan adds GroupStateTimeout eviction for keys gone
idle, as streaming/neardup.py does)."""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.tscompat import normalize_ts_cols
from kinesis_log_watcher_spark.session import ensure_session_confs
from kinesis_log_watcher_spark.streaming.tws import tws_runtime_available
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RATE_LIMIT_K = 5
RATE_WINDOW_S = 3600

_US = 1_000_000
_counter = itertools.count()

ADMIT_SCHEMA = "user_id bigint, event_id bigint, admitted int"
STATE_SCHEMA = "ts_log array<bigint>"


def _admit_updates(k: int, window_s: int):
    window_us = window_s * _US

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        log: list[int] = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        out_eid: list[int] = []
        out_adm: list[int] = []
        for t, eid in zip(ts_us, rows["event_id"]):
            t = int(t)
            log = [p for p in log if p > t - window_us]
            out_eid.append(int(eid))
            out_adm.append(1 if len(log) < k else 0)
            log.append(t)
        state.update((log,))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_eid),
                "event_id": out_eid,
                "admitted": out_adm,
            }
        )

    return fn


class RateLimitProcessor(StatefulProcessor):
    """transformWithState twin of the limiter: the arrival log lives in
    a ListState (one int64 row per in-window arrival) — the Spark-4
    typed-state API's natural fit for a log-shaped value, alongside
    tws.py's ValueState running totals. Same total order, same
    admission rule, same bounded state as the applyInPandasWithState
    path (which remains the no-protobuf fallback)."""

    def __init__(self, k: int = RATE_LIMIT_K, window_s: int = RATE_WINDOW_S):
        self._k = k
        self._window_us = window_s * _US

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._log = handle.getListState("ts_log", "t bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        log = [int(r[0]) for r in self._log.get()]
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        out_eid: list[int] = []
        out_adm: list[int] = []
        for t, eid in zip(ts_us, batch["event_id"]):
            t = int(t)
            log = [p for p in log if p > t - self._window_us]
            out_eid.append(int(eid))
            out_adm.append(1 if len(log) < self._k else 0)
            log.append(t)
        self._log.clear()
        if log:
            self._log.appendList([(t,) for t in log])
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_eid),
                "event_id": out_eid,
                "admitted": out_adm,
            }
        )

    def close(self) -> None:  # pragma: no cover - no resources held
        pass


def admit_stream(
    events: DataFrame,
    k: int = RATE_LIMIT_K,
    window_s: int = RATE_WINDOW_S,
    use_tws: bool | None = None,
) -> DataFrame:
    """Stream in → one (user_id, event_id, admitted) row per event.

    ``use_tws=None`` auto-detects (same gate as tws.py): the
    transformWithState ListState processor when its protobuf-backed
    worker can run, else the applyInPandasWithState twin."""
    if use_tws is None:
        use_tws = tws_runtime_available()
    if use_tws:
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RateLimitProcessor(k, window_s),
            outputStructType=ADMIT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _admit_updates(k, window_s),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_rate_limit(
    spark: SparkSession,
    events_path: str,
    k: int = RATE_LIMIT_K,
    window_s: int = RATE_WINDOW_S,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Replay a bounded events table through the rate limiter and roll
    the per-event admissions up per user. Each event is emitted exactly
    once (in the batch that carries it), so the update sink is already
    the full decision relation."""
    ensure_session_confs(spark)
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", os.path.basename(events_path)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(os.path.dirname(events_path))
    stream = normalize_ts_cols(stream)
    name = f"rate_limit_{next(_counter)}"
    q = (
        admit_stream(stream, k, window_s)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("admitted").cast("long").alias("n_admitted"),
        )
    )
