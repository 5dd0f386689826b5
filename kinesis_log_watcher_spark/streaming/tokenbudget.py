"""Streaming token-budget admission: per-source running BPE token
totals with a hard budget cutoff, maintained in typed state.

The ingest-time form of sequence_packing_stats/bpe_tokenize_budget
(queries/round8.py): documents stream in, each source admits documents
in doc_id order until its token budget is exhausted — the gate a
training-data collector runs while a crawl is still arriving, when
"stop taking from this source" must be decided online, not after a
batch pass. State per source is ONE (cum_tokens, cum_docs) pair —
bounded by the source alphabet, never the stream.

Determinism contract (what makes the stateful fold oracle-comparable):
within a micro-batch each source's rows fold in doc_id order; across
micro-batches the replay files are mtime-ordered by doc_id range. The
DuckDB oracle states the same rule declaratively (cumulative token sum
over doc_id order per source), so a green row certifies the stateful
stream == the declarative batch cumsum.

Tokenization runs inside the same Arrow-batched Python stage that holds
the state (the rows are already in pandas), through a module-level
word → n_tokens cache, so the per-row cost is a dict hit once the
vocabulary is warm — the same vocabulary-sized-work posture as
operators/bpe.py, without a circular stream-static join on a vocab
derived from the stream itself.

Dual-path like streaming/mapstate.py: transformWithStateInPandas
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

from kinesis_log_watcher_spark.operators.bpe import bpe_encode, merge_ranks
from kinesis_log_watcher_spark.session import ensure_session_confs
from kinesis_log_watcher_spark.streaming.tws import tws_runtime_available

TOKEN_BUDGET = 1000  # tokens admitted per source before the gate closes

ADMIT_SCHEMA = (
    "source string, n_docs bigint, n_admitted bigint, "
    "tokens_total bigint, tokens_admitted bigint"
)
_STATE_SCHEMA = (
    "cum_tokens bigint, cum_adm_tokens bigint, n_docs bigint, n_adm bigint"
)
_counter = itertools.count()

_RANKS = merge_ranks()
_WORD_CACHE: dict[str, int] = {}


def doc_tokens(text: str) -> int:
    """Exact BPE token count of one document, word-cache-backed."""
    total = 0
    for w in text.lower().split(" "):
        n = _WORD_CACHE.get(w)
        if n is None:
            n = len(bpe_encode(w, _RANKS))
            _WORD_CACHE[w] = n
        total += n
    return total


def _fold_batch(
    state: "tuple[int, int, int, int]", batch: pd.DataFrame
) -> "tuple[tuple[int, int, int, int], None]":
    """Fold one micro-batch's rows (doc_id order) into the running
    (cum_tokens, cum_admitted_tokens, n_docs, n_admitted) state.

    Admission is PREFIX semantics: a doc admits iff the source's
    running token total INCLUDING it stays within budget; the first
    overflow closes the gate for good (cum only grows, so admission is
    a doc_id prefix). That is the declaratively-expressible rule — the
    oracle states it as `cumsum <= budget` — and the realistic one for
    an online collector ("stop taking from this source")."""
    cum, cum_adm, n_docs, n_adm = state
    batch = batch.sort_values("doc_id")
    for text in batch["text"]:
        n = doc_tokens(str(text))
        n_docs += 1
        cum += n
        if cum <= TOKEN_BUDGET:
            cum_adm = cum
            n_adm += 1
    return (cum, cum_adm, n_docs, n_adm), None


class TokenBudgetProcessor(StatefulProcessor):
    """ValueState-backed per-source budget fold (TWS path)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("budget", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = (
            (self._state.get() or (0, 0, 0, 0))
            if self._state.exists()
            else (0, 0, 0, 0)
        )
        state = tuple(int(x) for x in cur)
        batch = pd.concat(list(rows), ignore_index=True)
        state, _ = _fold_batch(state, batch)
        self._state.update(state)
        cum, cum_adm, n_docs, n_adm = state
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "n_docs": [n_docs],
                "n_admitted": [n_adm],
                "tokens_total": [cum],
                "tokens_admitted": [cum_adm],
            }
        )

    def close(self) -> None:  # pragma: no cover - no resources held
        pass


def _budget_updates():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        cur = tuple(int(x) for x in state.get) if state.exists else (0, 0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        cur, _ = _fold_batch(cur, batch)
        state.update(cur)
        cum, cum_adm, n_docs, n_adm = cur
        yield pd.DataFrame(
            {
                "source": [source],
                "n_docs": [n_docs],
                "n_admitted": [n_adm],
                "tokens_total": [cum],
                "tokens_admitted": [cum_adm],
            }
        )

    return fn


def admission_stream(docs: DataFrame, use_tws: bool | None = None) -> DataFrame:
    """Stream in → updated per-source admission counters per batch."""
    if use_tws is None:
        use_tws = tws_runtime_available()
    keyed = docs.select("source", "doc_id", "text").groupBy("source")
    if use_tws:
        return keyed.transformWithStateInPandas(
            statefulProcessor=TokenBudgetProcessor(),
            outputStructType=ADMIT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return keyed.applyInPandasWithState(
        _budget_updates(),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_token_budget_admission(
    spark: SparkSession,
    docs_path: str,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
    use_tws: bool | None = None,
) -> DataFrame:
    """Replay a bounded documents table through the admission gate and
    resolve the update sink to the final per-source counters (all four
    counters are monotone per key, so latest = MAX — order-free)."""
    from kinesis_log_watcher_spark.sources.files import (
        await_or_raise,
        read_parquet_stream,
        replay_partitions,
    )

    ensure_session_confs(spark)
    stream = read_parquet_stream(spark, docs_path, max_files_per_trigger)
    name = f"token_budget_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            admission_stream(stream, use_tws=use_tws)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return (
        spark.table(name)
        .groupBy("source")
        .agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.max("n_admitted").cast("long").alias("n_admitted"),
            F.max("tokens_total").cast("long").alias("tokens_total"),
            F.max("tokens_admitted").cast("long").alias("tokens_admitted"),
        )
    )
