"""CLI parity (reference README.md:9-12): flags, defaults, exit codes."""

from __future__ import annotations

import pytest

from kinesis_log_watcher_spark.__main__ import build_parser, main
from kinesis_log_watcher_spark.sources.fixture import kinesis_records_fixture


def test_defaults_match_reference():
    args = build_parser().parse_args(["my-stream"])
    assert args.format == "{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}"
    assert args.start == "5m"
    assert args.watch == "10s"
    assert args.one_shot is False


def test_invalid_duration_exits_2(spark, tmp_path, capsys):
    assert main(["-s", "bogus", str(tmp_path)], spark=spark) == 2
    assert "invalid duration" in capsys.readouterr().err


def test_invalid_template_exits_2(spark, tmp_path, capsys):
    d = tmp_path / "records"
    kinesis_records_fixture(spark, n_records=20).write.parquet(str(d))
    assert main(["-f", "{{.Broken", "-O", str(d)], spark=spark) == 2
    assert "unclosed action" in capsys.readouterr().err


def test_one_shot_over_file_source(spark, tmp_path, capsys):
    d = tmp_path / "records"
    kinesis_records_fixture(spark, n_records=20).write.parquet(str(d))
    # lookback window that includes the fixture's 2024 timestamps
    rc = main(["-O", "-s", "100000d", str(d)], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.strip()]) == 20
