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


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Two parquet files split mid-session: user 1's second session spans
    the file boundary (state must merge it), user 2 closes in file 1.
    Module-scoped: read-only input staged once for the whole file."""
    tmp_path = tmp_path_factory.mktemp("event_files")
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
    from conftest import replay_parallel

    got_single, got_multi = replay_parallel(
        lambda: _run(spark, f"{event_files}/*.parquet"),
        lambda: _run(spark, f"{event_files}/*.parquet", max_files_per_trigger=1),
    )
    assert got_single == got_multi == _expected()


def test_state_survives_checkpoint_restart(spark, tmp_path):
    """Stop the stateful query, add data, restart from the SAME
    checkpoint: per-user session state must carry across the restart —
    a session whose events straddle the stop/start boundary comes out
    as ONE session (the durable-resume property the reference intends
    but gets wrong, SURVEY.md §2.1 W4 / main.go:345)."""
    import glob
    import os
    import shutil
    from datetime import timedelta

    from pyspark.sql import functions as F

    from kinesis_log_watcher_spark.streaming.stateful import (
        final_sessions,
        session_update_stream,
    )

    m = timedelta(minutes=1)
    d = tmp_path / "stream"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected = []

    def write_file(name, rows, mtime):
        stage = tmp_path / f"stage_{name}"
        _mk_events(spark, rows).coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        dest = d / f"{name}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    def run_once():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ).parquet(str(d))
        q = (
            session_update_stream(stream, gap_s=1800)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1: user 1's session is open (2 events), user 2 has 1 event
    write_file("f1", [(1, T0), (1, T0 + 5 * m), (2, T0)], 1_700_000_000)
    run_once()
    # query fully stopped; new file arrives while "down"
    write_file("f2", [(1, T0 + 10 * m), (2, T0 + 600 * m)], 1_700_000_001)
    # run 2: restart from the same checkpoint — must NOT re-read f1, and
    # must resume user 1's open session from state
    run_once()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in final_sessions(
            spark.createDataFrame(collected)
        ).collect()
    }
    assert got == {
        (1, T0, T0 + 10 * m, 3),          # ONE session across the restart
        (2, T0, T0, 1),
        (2, T0 + 600 * m, T0 + 600 * m, 1),
    }
