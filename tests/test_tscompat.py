"""Timestamp-layout normalization stays scoped to known tables/columns.

Pins the contract of functions/tscompat.normalize_ts_cols + the per-table
NANOS_BIGINT_COLS scoping used by queries/base.load: only columns known to
have shipped as TIMESTAMP(NANOS) get the bigint→nanos reinterpretation; an
unrelated bigint column — even one named ``ts`` — loads unmolested.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.tscompat import (
    NANOS_BIGINT_COLS,
    normalize_ts_cols,
)


def test_unrelated_bigint_ts_column_is_untouched(spark):
    # A synthetic table with a legitimate bigint column named "ts"
    # (e.g. a sequence counter). Scoped per-table, the loader passes an
    # empty nanos-column list — the column must come through as bigint.
    df = spark.createDataFrame([(1, 7), (2, 9)], "id bigint, ts bigint")
    out = normalize_ts_cols(df, NANOS_BIGINT_COLS.get("not_a_known_table", ()))
    assert dict(out.dtypes)["ts"] == "bigint"
    assert [r["ts"] for r in out.orderBy("id").collect()] == [7, 9]


def test_events_scope_reinterprets_nanos_bigint(spark):
    # Under the legacy layout events.ts scans as bigint nanoseconds;
    # the events scope converts it to TimestampType exactly (µs-aligned).
    ns = 1_700_000_000_000_000_000  # 2023-11-14T22:13:20Z, µs-aligned
    df = spark.createDataFrame([(1, ns)], "event_id bigint, ts bigint")
    out = normalize_ts_cols(df, NANOS_BIGINT_COLS["events"])
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = out.select(F.unix_micros("ts").alias("us")).collect()[0]["us"]
    assert got == ns // 1000


def test_backtick_identifier_survives_weird_names(spark):
    # The nanos div is built with a quoted identifier: a column name that
    # needs quoting (space, dash) must not break the expression.
    ns = 1_700_000_000_000_000_000
    df = spark.createDataFrame([(ns,)], ["weird ts-name"])
    out = normalize_ts_cols(df, ("weird ts-name",))
    assert dict(out.dtypes)["weird ts-name"] == "timestamp"


def test_ntz_columns_cast_to_session_zone(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 2, 3, 4, 5, 678901),)], "t timestamp_ntz"
    )
    out = normalize_ts_cols(df, ())
    assert dict(out.dtypes)["t"] == "timestamp"
    got = out.collect()[0]["t"]
    assert (got.hour, got.microsecond) == (3, 678901)
