"""Stream-stream join semantics: matches spanning micro-batches join via
the buffered state; state is watermark-bounded by the join window.

Suite-speed shape (the r8 <10:00 work): all four scenarios stage into a
module temp dir and their bounded replays launch in ONE replay_parallel
burst (module-scoped fixture) — a bounded replay spends its wall-clock
in per-batch machinery on a near-idle 32-core JVM, so four replays cost
~max, not ~sum. Tests consume the pre-collected rows and keep their
batch-comparison halves inline (those are cheap batch jobs).
"""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

import pytest

from conftest import replay_parallel
from kinesis_log_watcher_spark.streaming.joins import (
    run_stream_static_enrich,
    run_stream_stream_join,
    run_stream_stream_left_join,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)
M = timedelta(minutes=1)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _stage_single_file(spark, stage_dir, dest, rows, schema=EVENT_SCHEMA,
                       mtime=None):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage_dir))
    (part,) = glob.glob(str(stage_dir / "part-*.parquet"))
    shutil.copy(part, dest)
    if mtime is not None:
        os.utime(dest, (1_700_000_000 + mtime, 1_700_000_000 + mtime))


def _louter_eq_rows():
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
    return rows


@pytest.fixture(scope="module")
def replays(spark, tmp_path_factory):
    from concurrent.futures import ThreadPoolExecutor

    tmp_path = tmp_path_factory.mktemp("joins")
    (tmp_path / "stream").mkdir()
    d_louter = tmp_path / "louter"
    d_louter.mkdir()
    d_eq = tmp_path / "louter_eq"
    d_eq.mkdir()

    stages = [
        # inner join across micro-batches: two mtime-ordered files
        (tmp_path / "stage_b1", tmp_path / "stream" / "b1.parquet",
         [(10, T0, 1, "click", 1.0, "{}"),
          (11, T0 + 5 * M, 2, "click", 1.0, "{}")], EVENT_SCHEMA, 1),
        (tmp_path / "stage_b2", tmp_path / "stream" / "b2.parquet",
         [(20, T0 + 30 * M, 1, "purchase", 1.0, "{}"),
          (21, T0 + 120 * M, 2, "purchase", 1.0, "{}")], EVENT_SCHEMA, 2),
        # stream-static enrich
        (tmp_path / "stage_ev", tmp_path / "events.parquet",
         [(1, T0, 10, "click", 2.5, "{}"),
          (2, T0 + M, 10, "click", 1.5, "{}"),
          (3, T0 + 2 * M, 20, "view", 4.0, "{}"),
          (4, T0 + 3 * M, 99, "view", 9.0, "{}")],  # no matching customer
         EVENT_SCHEMA, None),
        (tmp_path / "stage_cu", tmp_path / "customer.parquet",
         [(10, "BUILDING"), (20, "MACHINERY")],
         "c_custkey long, c_mktsegment string", None),
        # left-outer sentinel scenario
        (tmp_path / "stage_louter", d_louter / "events.parquet",
         [(1, T0, 1, "click", 1.0, "{}"),
          (2, T0 + 30 * M, 1, "purchase", 1.0, "{}"),
          (3, T0 + 5 * M, 2, "click", 1.0, "{}"),       # never purchases
          (4, T0 + 120 * M, 2, "purchase", 1.0, "{}")],  # outside 1h
         EVENT_SCHEMA, None),
        # left-outer == batch-left-join scenario
        (tmp_path / "stage_louter_eq", d_eq / "events.parquet",
         _louter_eq_rows(), EVENT_SCHEMA, None),
    ]

    # staging writes are independent Spark jobs into disjoint dirs —
    # submit them concurrently (same pattern as stage_replay_files)
    def stage(a):
        stage_dir, dest, rows, schema, mtime = a
        _stage_single_file(spark, stage_dir, dest, rows, schema=schema,
                           mtime=mtime)

    with ThreadPoolExecutor(max_workers=6) as pool:
        list(pool.map(stage, stages))

    inner, static, louter, louter_eq = replay_parallel(
        lambda: run_stream_stream_join(
            spark, f"{tmp_path}/stream/*.parquet", max_files_per_trigger=1
        ).collect(),
        lambda: run_stream_static_enrich(
            spark, f"{tmp_path}/events.parquet", f"{tmp_path}/customer.parquet"
        ).collect(),
        lambda: run_stream_stream_left_join(
            spark, str(d_louter / "events.parquet")
        ).collect(),
        lambda: run_stream_stream_left_join(
            spark, str(d_eq / "events.parquet")
        ).collect(),
    )
    return {
        "inner": inner,
        "static": static,
        "louter": louter,
        "louter_eq": louter_eq,
        "eq_dir": str(d_eq),
    }


def test_join_matches_across_micro_batches(replays):
    # batch 1: user 1 clicks at 00:00; user 2 clicks at 00:05
    # batch 2: user 1 purchases at 00:30 (within 1h of the batch-1 click),
    # user 2 purchases at 02:00 (outside the 1h bound → no match)
    rows = [(r.user_id, r.click_ts, r.purchase_ts) for r in replays["inner"]]
    assert rows == [(1, T0, T0 + 30 * M)]


def test_stream_static_enrich_equals_batch(replays):
    """Stream-static join: bounded replay == batch join+aggregate; the
    static dim is broadcast per micro-batch, no join state needed."""
    rows = {
        (r.c_mktsegment, r.event_type): (r.n, r.sum_value)
        for r in replays["static"]
    }
    assert rows == {
        ("BUILDING", "click"): (2, 4.0),
        ("MACHINERY", "view"): (1, 4.0),
    }


def test_left_outer_join_emits_unmatched_clicks(replays):
    """LEFT OUTER stream-stream join: the unmatched click gets an
    explicit sentinel row, emitted via watermark-driven state eviction
    (finalized by the runner's sentinel batches); matches still emit."""
    got = replays["louter"]
    rows = sorted((r.user_id, r.click_id, r.matched, r.purchase_id) for r in got)
    assert rows == [(1, 1, True, 2), (2, 3, False, -1)]
    # unmatched columns carry the documented sentinels, not NULLs
    (um,) = [r for r in got if not r.matched]
    assert um.purchase_ts == datetime(1970, 1, 1)
    # no sentinel-harness rows leak into the result
    assert all(r.user_id >= 0 for r in got)


def test_left_outer_equals_batch_left_join(spark, replays):
    """Bounded replay == the batch LEFT JOIN at any micro-batch split
    (the runner replays [data, sentinel, sentinel] at one file per
    trigger already)."""
    from pyspark.sql import functions as F

    got = {
        (r.user_id, r.click_id, r.matched, r.purchase_id)
        for r in replays["louter_eq"]
    }

    ev = spark.read.parquet(f"{replays['eq_dir']}/events.parquet")
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
