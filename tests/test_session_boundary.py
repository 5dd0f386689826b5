"""Session-window gap-boundary semantics, pinned on both sides.

Spark's ``F.session_window`` merges an event landing EXACTLY at
``prev + gap`` into the open session (sessions merge on touching
boundaries: a new session starts only when the gap is strictly
exceeded). The registered oracle restates this as
``epoch(ts) - epoch(prev_ts) > gap`` — strict inequality — so an
exact-boundary event must NOT open a new session there either.

This test runs the REAL streaming path (run_session_windows, AvailableNow
replay) and the REAL registered oracle SQL (DuckDB) on data crafted to
hit the boundary, and asserts they produce identical sessions — the pair
the driver's correctness gate compares can't flap on boundary events.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from kinesis_log_watcher_spark.queries.base import registry
from kinesis_log_watcher_spark.streaming.windows import run_session_windows

T0 = datetime(2024, 1, 1, 0, 0, 0)
GAP = timedelta(minutes=30)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark):
    rows = [
        # user 1: second event EXACTLY at prev+gap (must merge), third
        # event strictly beyond the merged session's end (new session)
        (1, T0),
        (1, T0 + GAP),
        (1, T0 + GAP + GAP + timedelta(seconds=1)),
        # user 2: chain of exact-boundary events — each extends the session
        (2, T0),
        (2, T0 + GAP),
        (2, T0 + 2 * GAP),
        # user 3: one microsecond beyond the gap → separate sessions
        (3, T0),
        (3, T0 + GAP + timedelta(microseconds=1)),
    ]
    return spark.createDataFrame(
        [(i, ts, uid, "click", 1.0, "{}") for i, (uid, ts) in enumerate(rows)],
        EVENT_SCHEMA,
    )


@pytest.fixture()
def events_path(spark, tmp_path):
    # single parquet FILE named events.parquet (the testdata layout the
    # streaming source's pathGlobFilter expects)
    import glob
    import shutil

    stage = tmp_path / "stage"
    _events(spark).coalesce(1).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    dest = tmp_path / "events.parquet"
    shutil.copy(part, dest)
    return str(dest)


def test_exact_gap_boundary_merges_and_oracle_agrees(spark, events_path):
    spark_rows = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in run_session_windows(spark, events_path).collect()
    )

    # the boundary event merged: user 1's first session holds 2 events and
    # ends at (T0+gap)+gap; user 2's chain is ONE session of 3 events
    assert (1, T0, T0 + 2 * GAP, 2) in spark_rows
    assert (2, T0, T0 + 3 * GAP, 3) in spark_rows
    # one microsecond past the gap does NOT merge
    assert sum(1 for r in spark_rows if r[0] == 3) == 2

    oracle_sql = registry()["stream_session_windows"].oracle
    con = duckdb.connect()
    con.register("events", _events(spark).toPandas())
    oracle_rows = sorted(tuple(r) for r in con.execute(oracle_sql).fetchall())

    assert spark_rows == oracle_rows
