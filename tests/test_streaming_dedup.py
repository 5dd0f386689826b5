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
