"""Per-user running totals must reproduce the batch aggregate for any
micro-batch split of a bounded replay — state carries across batch
boundaries. Runs on the transformWithState StatefulProcessor path when
protobuf is available, else on its applyInPandasWithState twin (same
semantics — see streaming/tws.py ENVIRONMENT GATE); either way the
replay≡batch pin executes."""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

import pytest

from kinesis_log_watcher_spark.streaming.tws import (
    batch_totals,
    run_running_totals,
    tws_runtime_available,
)

T0 = datetime(2024, 1, 1)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + timedelta(minutes=i), uid, "click", val, "{}")
            for i, (uid, val) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Three files; users 1 and 2 span file boundaries. Module-scoped:
    the staged dir is read-only input for every test here, and staging
    it once saves a multi-second Spark write chain per test."""
    tmp_path = tmp_path_factory.mktemp("tws_events")
    batches = [
        [(1, 1.5), (1, 2.25), (2, 10.0)],
        [(1, 0.125), (2, -3.5), (3, 7.0)],
        [(2, 1.0), (1, 4.0)],
    ]
    d = tmp_path / "events_stream"
    d.mkdir()
    for i, batch in enumerate(batches, start=1):
        stage = tmp_path / f"stage{i}"
        _mk_events(spark, batch).coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        dest = d / f"f{i}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(d)


def _as_set(df):
    return {(r.user_id, r.n_events, r.value_sum_q) for r in df.collect()}


def test_replay_matches_batch_any_split(spark, event_files):
    expected = _as_set(batch_totals(spark.read.parquet(event_files)))
    assert expected  # sanity: non-empty
    from conftest import replay_parallel

    # one batch per file (state must merge across three batches) and
    # all-files-in-one-batch, replayed concurrently
    got_split, got_single = (
        _as_set(df)
        for df in replay_parallel(
            lambda: run_running_totals(spark, event_files, max_files_per_trigger=1),
            lambda: run_running_totals(spark, event_files),
        )
    )
    assert got_split == expected
    assert got_single == expected


def test_quantized_sum_is_exact(spark, event_files):
    """int64 micro-unit sums: 1.5+2.25+0.125+4.0 = 7.875 exactly."""
    totals = {
        r.user_id: r.value_sum_q
        for r in batch_totals(spark.read.parquet(event_files)).collect()
    }
    assert totals[1] == 7_875_000
    assert totals[2] == 7_500_000
    assert totals[3] == 7_000_000
