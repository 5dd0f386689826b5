"""stage_replay_files_split: the single-partitioned-write replay staging
(round-12 optimization used by the timer-session harness) must produce
byte-for-byte the same replay LAYOUT contract as the per-part fallback:
one f{i}.parquet per part, mtime-ascending, carrying exactly that
part's rows without the part column."""

from __future__ import annotations

import glob
import os

import pytest

from kinesis_log_watcher_spark.sources.files import stage_replay_files_split


def _rows(spark, path: str):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )


@pytest.mark.parametrize("fallback", ["0", "1"])
def test_split_staging_layout(spark, monkeypatch, fallback):
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_STAGING", fallback)
    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 3 AS INT) AS part"
    )
    replay = stage_replay_files_split(spark, df, "part", 3, prefix="t_split_")
    files = sorted(glob.glob(os.path.join(replay, "f*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        "f0.parquet", "f1.parquet", "f2.parquet"
    ]
    # mtime-ascending (the replay reader's consumption-order contract)
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes)
    for i, f in enumerate(files):
        got = _rows(spark, f)
        assert got == [(x,) for x in range(100) if x % 3 == i]


def test_split_staging_empty_part_raises(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_STAGING", "1")
    df = spark.range(0, 10).selectExpr("id", "CAST(0 AS INT) AS part")
    with pytest.raises(ValueError, match="empty"):
        stage_replay_files_split(spark, df, "part", 2, prefix="t_split_")
