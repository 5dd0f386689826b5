"""Streaming exact dedup: dropDuplicates over a replayed stream is
state-backed — a key seen in micro-batch 1 suppresses its duplicates in
micro-batch 2 (cross-batch state), and the output carries each key
exactly once. This is the streaming form of the dedup_exact operator
(the LLM-pipeline dedup family, COVERAGE.md)."""

from __future__ import annotations

import glob
import os
import shutil


def _write_file(spark, tmp_path, name, rows, mtime):
    stage = tmp_path / f"stage_{name}"
    spark.createDataFrame(rows, "doc_id long, content_hash string").coalesce(
        1
    ).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    dest = tmp_path / "stream" / f"{name}.parquet"
    shutil.copy(part, dest)
    os.utime(dest, (mtime, mtime))


def test_streaming_dedup_across_batches(spark, tmp_path):
    (tmp_path / "stream").mkdir()
    t = 1_700_000_000
    _write_file(
        spark, tmp_path, "b1",
        [(1, "h_a"), (2, "h_b"), (3, "h_a")], t + 1,   # h_a duplicated in-batch
    )
    _write_file(
        spark, tmp_path, "b2",
        [(4, "h_b"), (5, "h_c"), (6, "h_a")], t + 2,   # h_a/h_b dup cross-batch
    )
    stream = (
        spark.readStream.schema("doc_id long, content_hash string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "stream"))
    )
    deduped = stream.dropDuplicates(["content_hash"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.table("stream_dedup").collect()
    # each hash exactly once, survivor is the first-seen batch's row
    assert sorted(r.content_hash for r in rows) == ["h_a", "h_b", "h_c"]
    by_hash = {r.content_hash: r.doc_id for r in rows}
    assert by_hash["h_a"] in (1, 3)   # batch-1 occurrence, never doc 6
    assert by_hash["h_b"] == 2        # batch-1 occurrence, never doc 4
    assert by_hash["h_c"] == 5


def _write_ts_file(spark, tmp_path, name, rows, mtime):
    stage = tmp_path / f"stage_{name}"
    spark.createDataFrame(rows, "content_hash string, ts timestamp").coalesce(
        1
    ).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    dest = tmp_path / "stream" / f"{name}.parquet"
    shutil.copy(part, dest)
    os.utime(dest, (mtime, mtime))


def test_streaming_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    horizon are suppressed, and state is EVICTED once the watermark
    passes — the same key arriving much later is emitted again. That
    eviction is what makes streaming dedup viable on an unbounded
    100 TB stream (plain dropDuplicates state grows forever)."""
    from datetime import datetime

    (tmp_path / "stream").mkdir()
    t = 1_700_000_000
    ts0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        from datetime import timedelta

        return ts0 + timedelta(minutes=minutes)

    # b1: first sight of key A
    _write_ts_file(spark, tmp_path, "b1", [("A", at(0))], t + 1)
    # b2: duplicate of A 1 min later (inside the 10-min horizon) →
    # suppressed; key W pushes the max event time to 60min
    _write_ts_file(spark, tmp_path, "b2", [("A", at(1)), ("W", at(60))], t + 2)
    # Batch N's watermark is derived from data through batch N-1, so the
    # 50min watermark (60 - 10) only takes effect in b3; A's state
    # (expiry ≈ 11min) is evicted at b3's end.
    _write_ts_file(spark, tmp_path, "b3", [("X", at(61))], t + 3)
    # b4: A again at 120min — state long evicted → emitted as new
    _write_ts_file(spark, tmp_path, "b4", [("A", at(120))], t + 4)

    stream = (
        spark.readStream.schema("content_hash string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "stream"))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup_wm")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [(r.content_hash, r.ts) for r in spark.table("stream_dedup_wm").collect()]
    a_times = sorted(ts for k, ts in got if k == "A")
    # A emitted exactly twice: once at first sight, once after eviction
    assert a_times == [at(0), at(120)], got
    assert ("W", at(60)) in got
