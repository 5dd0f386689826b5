"""Stateful-operator semantics: applyInPandasWithState sessionization.

The key property (SURVEY.md §5.2 item 3): any micro-batch partitioning of
a bounded replay yields the same final sessions as the batch computation —
state must carry sessions across batch boundaries correctly.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.streaming.stateful import (
    final_sessions,
    run_stateful_sessions,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, "click", 1.0, "{}") for i, (uid, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture()
def event_files(spark, tmp_path):
    """Two parquet files split mid-session: user 1's second session spans
    the file boundary (state must merge it), user 2 closes in file 1."""
    m = timedelta(minutes=1)
    h = timedelta(hours=1)
    batch1 = [
        (1, T0),
        (1, T0 + 5 * m),          # session A: 2 events
        (1, T0 + 2 * h),          # session B starts
        (2, T0),                  # user 2 session: 1 event
    ]
    batch2 = [
        (1, T0 + 2 * h + 10 * m), # session B continues across the boundary
        (2, T0 + 9 * h),          # user 2: new session
    ]
    import glob
    import os
    import shutil

    d = tmp_path / "events_stream"
    d.mkdir()
    for i, batch in enumerate((batch1, batch2), start=1):
        stage = tmp_path / f"stage{i}"
        _mk_events(spark, batch).coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        dest = d / f"f{i}.parquet"
        shutil.copy(part, dest)
        # the file source orders discovered files by modification time
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(d)


def _expected():
    m = timedelta(minutes=1)
    h = timedelta(hours=1)
    return {
        (1, T0, T0 + 5 * m, 2),
        (1, T0 + 2 * h, T0 + 2 * h + 10 * m, 2),
        (2, T0, T0, 1),
        (2, T0 + 9 * h, T0 + 9 * h, 1),
    }


def _run(spark, path, **kw):
    import glob
    import os

    # run_stateful_sessions takes a single file path or a glob within a dir
    df = run_stateful_sessions(spark, path, **kw)
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in df.collect()
    }


def test_sessions_span_micro_batches(spark, event_files):
    """One file per micro-batch: session B continues across batches."""
    got = _run(
        spark, f"{event_files}/*.parquet", max_files_per_trigger=1
    )
    assert got == _expected()


def test_single_batch_equals_multi_batch(spark, event_files):
    got_single = _run(spark, f"{event_files}/*.parquet")
    got_multi = _run(spark, f"{event_files}/*.parquet", max_files_per_trigger=1)
    assert got_single == got_multi == _expected()
