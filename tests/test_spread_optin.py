"""The per-query scan-spread opt-in (queries/base.load(spread=True)).

Round-12 optimization: the byte-triggered spread of small-row-count but
wide/fan-out single-row-group scans (documents, embeddings) is a
per-query opt-in — measured a 1.1-3x win on heavy single-chain text
kernels and a 1.2-2.7x LOSS on trivial or many-reference plans, so it
must never apply globally. These tests pin the decision logic: the
row-guard behavior is unchanged, the opt-in spreads only above the
byte floor, and the spread never changes rows.
"""

from __future__ import annotations

from kinesis_log_watcher_spark.queries.base import load

SF01 = "/root/testdata/sf0.1"
SF0001 = "/root/testdata/sf0.001"


def _logical(df) -> str:
    # logical node name: "Repartition 32, true" (physical: RoundRobinPartitioning)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_documents_default_not_spread(spark):
    # 5,000 rows < the 10k row guard and no opt-in -> no repartition.
    assert "Repartition " not in _logical(load(spark, SF01, "documents"))


def test_documents_optin_spread(spark):
    # opt-in + 1.6 MB single-row-group footer -> round-robin repartition.
    assert "Repartition " in _logical(
        load(spark, SF01, "documents", spread=True)
    )


def test_optin_respects_byte_floor(spark):
    # sf0.001 documents is ~160 KB < the 512 KiB floor: opt-in stays
    # inert, so tiny fixtures never pay the exchange.
    assert "Repartition " not in _logical(
        load(spark, SF0001, "documents", spread=True)
    )


def test_row_guard_unchanged(spark):
    # lineitem (600k rows) spreads by the row guard with no opt-in,
    # exactly as in round 11.
    assert "Repartition " in _logical(load(spark, SF01, "lineitem"))


def test_optin_rows_identical(spark):
    a = sorted(r.doc_id for r in load(spark, SF01, "documents").collect())
    b = sorted(
        r.doc_id for r in load(spark, SF01, "documents", spread=True).collect()
    )
    assert a == b
