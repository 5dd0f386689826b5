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


def test_left_outer_join_emits_unmatched_clicks(spark, tmp_path):
    """LEFT OUTER stream-stream join: the unmatched click gets an
    explicit sentinel row, emitted via watermark-driven state eviction
    (finalized by the runner's sentinel batches); matches still emit."""
    from kinesis_log_watcher_spark.streaming.joins import (
        run_stream_stream_left_join,
    )

    d = tmp_path / "louter"
    d.mkdir()
    stage = tmp_path / "stage_louter"
    spark.createDataFrame(
        [
            (1, T0, 1, "click", 1.0, "{}"),
            (2, T0 + 30 * M, 1, "purchase", 1.0, "{}"),
            (3, T0 + 5 * M, 2, "click", 1.0, "{}"),           # never purchases
            (4, T0 + 120 * M, 2, "purchase", 1.0, "{}"),      # outside 1h
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    shutil.copy(part, d / "events.parquet")

    got = run_stream_stream_left_join(spark, str(d / "events.parquet"))
    rows = sorted(
        (r.user_id, r.click_id, r.matched, r.purchase_id) for r in got.collect()
    )
    assert rows == [(1, 1, True, 2), (2, 3, False, -1)]
    # unmatched columns carry the documented sentinels, not NULLs
    (um,) = [r for r in got.collect() if not r.matched]
    assert um.purchase_ts == datetime(1970, 1, 1)
    # no sentinel-harness rows leak into the result
    assert all(r.user_id >= 0 for r in got.collect())


def test_left_outer_equals_batch_left_join(spark, tmp_path):
    """Bounded replay == the batch LEFT JOIN at any micro-batch split
    (the runner replays [data, sentinel, sentinel] at one file per
    trigger already)."""
    from pyspark.sql import functions as F

    from kinesis_log_watcher_spark.streaming.joins import (
        run_stream_stream_left_join,
    )

    d = tmp_path / "louter_eq"
    d.mkdir()
    stage = tmp_path / "stage_louter_eq"
    rows = []
    eid = 0
    for uid in range(6):
        for k in range(4):
            rows.append((eid, T0 + (uid * 17 + k * 23) * M, uid, "click", 1.0, "{}"))
            eid += 1
            if (uid + k) % 3 != 0:
                rows.append(
                    (eid, T0 + (uid * 17 + k * 23 + 40) * M, uid, "purchase", 1.0, "{}")
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    shutil.copy(part, d / "events.parquet")

    got = {
        (r.user_id, r.click_id, r.matched, r.purchase_id)
        for r in run_stream_stream_left_join(
            spark, str(d / "events.parquet")
        ).collect()
    }

    ev = spark.read.parquet(str(d / "events.parquet"))
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 hour")),
        "left_outer",
    )
    want = {
        (r.c_user, r.click_id, r.purchase_id is not None,
         r.purchase_id if r.purchase_id is not None else -1)
        for r in batch.collect()
    }
    assert got == want and len(got) >= 24
