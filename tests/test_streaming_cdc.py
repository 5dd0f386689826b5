"""Streaming CDC delta sink semantics (merge-on-read, idempotent
batches) and streaming-HLL register convergence."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.streaming.cdc import resolve_latest, run_cdc_upsert


def _stage_file(spark, tmp_path, dest_dir, name, df, mtime):
    stage = tmp_path / f"_stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    (part,) = glob.glob(str(stage / "part-*.parquet"))
    dest = dest_dir / f"{name}.parquet"
    shutil.copy(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(stage)


def test_cdc_latest_version_wins_across_batches(spark, tmp_path):
    changes = tmp_path / "changes"
    changes.mkdir()
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, val string, version long"
    )
    # batch 0: keys 1..3 at v0; batch 1: key 2 updated, key 4 inserted
    _stage_file(spark, tmp_path, changes, "c0",
                mk([(1, "a", 0), (2, "b", 0), (3, "c", 0)]), 1_700_000_000)
    _stage_file(spark, tmp_path, changes, "c1",
                mk([(2, "B", 1), (4, "d", 0)]), 1_700_000_010)

    got = run_cdc_upsert(
        spark, str(changes), str(tmp_path / "target"),
        key_cols=("k",), version_col="version",
    )
    rows = {(r.k, r.val, r.version) for r in got.collect()}
    assert rows == {(1, "a", 0), (2, "B", 1), (3, "c", 0), (4, "d", 0)}
    # one delta dir per micro-batch landed
    assert sorted(
        d for d in os.listdir(tmp_path / "target") if d.startswith("batch=")
    ) == ["batch=0", "batch=1"]


def test_cdc_delta_dirs_are_idempotent(spark, tmp_path):
    """Re-landing a batch id overwrites its own directory — the retry
    path cannot duplicate rows."""
    target = tmp_path / "t2"
    df = spark.createDataFrame([(1, "a", 0), (2, "b", 0)],
                               "k long, val string, version long")
    for _ in range(2):  # same batch id landed twice (simulated retry)
        df.write.mode("overwrite").parquet(str(target / "batch=0"))
    deltas = spark.read.option("basePath", str(target)).parquet(
        str(target / "batch=*")
    )
    assert deltas.count() == 2
    resolved = resolve_latest(deltas, ("k",), "version")
    assert resolved.count() == 2


def test_cdc_same_version_later_batch_wins(spark, tmp_path):
    """Tie on version resolves by sink batch id (later micro-batch
    wins) — resolution is total and deterministic."""
    target = tmp_path / "t3"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, val string, version long"
    )
    mk([(7, "old", 5)]).write.parquet(str(target / "batch=0"))
    mk([(7, "new", 5)]).write.parquet(str(target / "batch=1"))
    deltas = spark.read.option("basePath", str(target)).parquet(
        str(target / "batch=*")
    )
    (row,) = resolve_latest(deltas, ("k",), "version").collect()
    assert (row.k, row.val) == (7, "new")


def test_streaming_hll_matches_batch_any_split(spark, tmp_path):
    """Register-MAX folding converges to the batch sketch whatever the
    micro-batch split (order-free state update)."""
    from kinesis_log_watcher_spark.operators.sketch import hll_build
    from kinesis_log_watcher_spark.streaming.windows import run_streaming_hll

    d = tmp_path / "ev"
    d.mkdir()
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id long, event_type string"
    )
    _stage_file(spark, tmp_path, d, "e0",
                mk([(i, "click") for i in range(40)]
                   + [(i, "view") for i in range(10)]), 1_700_000_000)
    _stage_file(spark, tmp_path, d, "e1",
                mk([(i, "click") for i in range(20, 60)]
                   + [(i, "view") for i in range(5, 15)]), 1_700_000_010)

    batch_regs = hll_build(
        spark.read.parquet(str(d)), "user_id", group_cols=("event_type",), p=4
    )
    want = {(r.event_type, r.r, r.m_rho) for r in batch_regs.collect()}

    from conftest import replay_parallel

    # split and single-batch replays run concurrently; the estimate is a
    # deterministic function of the registers
    est, est_single = replay_parallel(
        lambda: run_streaming_hll(spark, str(d), max_files_per_trigger=1),
        lambda: run_streaming_hll(spark, str(d)),
    )
    got = {
        (r.event_type, round(r.est_distinct, 9))
        for r in est.collect()
    }
    got_single = {
        (r.event_type, round(r.est_distinct, 9))
        for r in est_single.collect()
    }
    assert got == got_single and len(got) == 2
    # and the split replay's registers reduce to the batch estimate:
    from kinesis_log_watcher_spark.operators.sketch import hll_estimate

    want_est = {
        (r.event_type, round(r.est_distinct, 9))
        for r in hll_estimate(
            batch_regs, group_cols=("event_type",), p=4
        ).collect()
    }
    assert got == want_est and want  # registers converged
