"""Stream-stream join semantics: matches spanning micro-batches join via
the buffered state; state is watermark-bounded by the join window."""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

from kinesis_log_watcher_spark.streaming.joins import run_stream_stream_join

T0 = datetime(2024, 1, 1, 0, 0, 0)
M = timedelta(minutes=1)


def _write(spark, tmp_path, name, rows, mtime):
    stage = tmp_path / f"stage_{name}"
    spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (uid, et, ts) in enumerate(rows, start=mtime % 100 * 10)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    dest = tmp_path / "stream" / f"{name}.parquet"
    shutil.copy(part, dest)
    os.utime(dest, (1_700_000_000 + mtime, 1_700_000_000 + mtime))


def test_join_matches_across_micro_batches(spark, tmp_path):
    (tmp_path / "stream").mkdir()
    # batch 1: user 1 clicks at 00:00; user 2 clicks at 00:05
    _write(spark, tmp_path, "b1",
           [(1, "click", T0), (2, "click", T0 + 5 * M)], 1)
    # batch 2: user 1 purchases at 00:30 (within 1h of the batch-1 click),
    # user 2 purchases at 02:00 (outside the 1h bound → no match)
    _write(spark, tmp_path, "b2",
           [(1, "purchase", T0 + 30 * M), (2, "purchase", T0 + 120 * M)], 2)

    got = run_stream_stream_join(
        spark, f"{tmp_path}/stream/*.parquet", max_files_per_trigger=1
    )
    rows = [(r.user_id, r.click_ts, r.purchase_ts) for r in got.collect()]
    assert rows == [(1, T0, T0 + 30 * M)]


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """Stream-static join: bounded replay == batch join+aggregate; the
    static dim is broadcast per micro-batch, no join state needed."""
    from pyspark.sql import functions as F

    from kinesis_log_watcher_spark.streaming.joins import run_stream_static_enrich

    events = spark.createDataFrame(
        [
            (1, T0, 10, "click", 2.5, "{}"),
            (2, T0 + M, 10, "click", 1.5, "{}"),
            (3, T0 + 2 * M, 20, "view", 4.0, "{}"),
            (4, T0 + 3 * M, 99, "view", 9.0, "{}"),  # no matching customer
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    # stage as single FILES (the driver-table layout the glob filter expects)
    events.coalesce(1).write.parquet(f"{tmp_path}/stage_ev")
    (part,) = glob.glob(f"{tmp_path}/stage_ev/part-*.parquet")
    shutil.copy(part, f"{tmp_path}/events.parquet")
    spark.createDataFrame(
        [(10, "BUILDING"), (20, "MACHINERY")], "c_custkey long, c_mktsegment string"
    ).coalesce(1).write.parquet(f"{tmp_path}/stage_cu")
    (part,) = glob.glob(f"{tmp_path}/stage_cu/part-*.parquet")
    shutil.copy(part, f"{tmp_path}/customer.parquet")

    got = run_stream_static_enrich(
        spark, f"{tmp_path}/events.parquet", f"{tmp_path}/customer.parquet"
    )
    rows = {
        (r.c_mktsegment, r.event_type): (r.n, r.sum_value) for r in got.collect()
    }
    assert rows == {
        ("BUILDING", "click"): (2, 4.0),
        ("MACHINERY", "view"): (1, 4.0),
    }
