"""Bounded-state streaming top-k leaderboard via transformWithState
ListState.

The operator keeps, per stream key (event_type), ONLY the current top-k
records ``(value_milli, event_id, user_id)`` — k rows of state per key,
never the events. Each micro-batch folds the batch's candidates into
the stored leaderboard (merge, sort by (value_milli DESC, event_id),
truncate to k) and emits the updated board. This is the canonical
bounded-state streaming top-k: eviction is EXACT because a record's
score is its own value (no cross-record accumulation), so

    leaderboard(prefix ∪ batch) = topk(leaderboard(prefix) ∪ batch)

and the union of every emission contains the global top-k. That
containment is what makes sink resolution order-free: re-ranking the
DISTINCT union of emitted rows yields the batch answer regardless of
how the replay was split into micro-batches — the same replay-split
convergence argument streaming/mapstate.py makes for counters.

State size: k rows per key — at 100 TB the per-key board is a constant,
and emissions are k rows per updated key per batch. Values are
milli-quantized int64 (the house events.value convention, e.g.
queries/mining.py ab_welch_ttest) so comparisons are exact integer
comparisons, bit-identical to the DuckDB oracle's ranking.

The applyInPandasWithState twin (three parallel arrays in group state)
runs wherever the TWS protobuf worker is unavailable — same fold, same
emissions.

Reference scope note: the reference (main.go) has no analytics surface;
this belongs to the SURVEY.md §2.2 streaming-stateful family.
"""

from __future__ import annotations

from kinesis_log_watcher_spark.sources.files import replay_partitions

import itertools
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from kinesis_log_watcher_spark.session import ensure_session_confs
from kinesis_log_watcher_spark.streaming.tws import tws_runtime_available

TOPK_K = 3
TOPK_SCHEMA = (
    "event_type string, event_id bigint, user_id bigint, value_milli bigint"
)
_STATE_SCHEMA = (
    "vals array<bigint>, event_ids array<bigint>, user_ids array<bigint>"
)
_counter = itertools.count()


def _fold_board(
    board: "list[tuple[int, int, int]]", batch: pd.DataFrame, k: int
) -> "list[tuple[int, int, int]]":
    """Merge a batch's rows into the (value_milli, event_id, user_id)
    board: best k by (value DESC, event_id ASC). Pure and deterministic
    — the single ordering both the processor and its twin share."""
    cand = board + list(
        zip(
            (int(v) for v in batch["value_milli"]),
            (int(e) for e in batch["event_id"]),
            (int(u) for u in batch["user_id"]),
        )
    )
    cand.sort(key=lambda t: (-t[0], t[1]))
    return cand[:k]


def _board_frame(key_val: str, board: "list[tuple[int, int, int]]"):
    return pd.DataFrame(
        {
            "event_type": [key_val] * len(board),
            "event_id": [e for _, e, _ in board],
            "user_id": [u for _, _, u in board],
            "value_milli": [v for v, _, _ in board],
        }
    )


class TopKProcessor(StatefulProcessor):
    """ListState-backed per-key top-k leaderboard."""

    def __init__(self, k: int = TOPK_K) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._top = handle.getListState(
            "top", "value_milli bigint, event_id bigint, user_id bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        board = [(int(v), int(e), int(u)) for v, e, u in self._top.get()]
        batch = pd.concat(list(rows), ignore_index=True)
        board = _fold_board(board, batch, self._k)
        self._top.put([(v, e, u) for v, e, u in board])
        yield _board_frame(key[0], board)

    def close(self) -> None:  # pragma: no cover - no resources held
        pass


def _topk_updates(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        board: list[tuple[int, int, int]] = []
        if state.exists:
            vals, eids, uids = state.get
            board = [
                (int(v), int(e), int(u))
                for v, e, u in zip(vals, eids, uids)
            ]
        batch = pd.concat(list(pdfs), ignore_index=True)
        board = _fold_board(board, batch, k)
        state.update(
            (
                [v for v, _, _ in board],
                [e for _, e, _ in board],
                [u for _, _, u in board],
            )
        )
        yield _board_frame(event_type, board)

    return fn


def topk_stream(
    events: DataFrame, k: int = TOPK_K, use_tws: bool | None = None
) -> DataFrame:
    """Stream of (event_type, event_id, user_id, value_milli) in →
    updated per-key leaderboards out, one board emission per batch."""
    if use_tws is None:
        use_tws = tws_runtime_available()
    if use_tws:
        return events.groupBy("event_type").transformWithStateInPandas(
            statefulProcessor=TopKProcessor(k),
            outputStructType=TOPK_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return events.groupBy("event_type").applyInPandasWithState(
        _topk_updates(k),
        outputStructType=TOPK_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_topk(
    spark: SparkSession,
    events_path: str,
    k: int = TOPK_K,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Replay a bounded events table through the leaderboard and
    resolve the update sink: every emission is a running top-k, so the
    DISTINCT union of emissions contains the global top-k and one
    re-rank recovers it — order-free in the replay split."""
    from kinesis_log_watcher_spark.sources.files import (
        await_or_raise,
        read_parquet_stream,
    )

    ensure_session_confs(spark)
    stream = read_parquet_stream(spark, events_path, max_files_per_trigger)
    feed = stream.select(
        "event_type",
        "event_id",
        "user_id",
        F.expr(
            "CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
        ).alias("value_milli"),
    )
    name = f"stream_topk_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            topk_stream(feed, k)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value_milli").desc(), F.col("event_id")
    )
    return (
        spark.table(name)
        .distinct()
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("event_type", "event_id", "user_id", "value_milli", "rank")
    )
