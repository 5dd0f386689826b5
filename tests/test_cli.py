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


def test_region_profile_flags_and_help_epilog(capsys):
    """-r/--region and -p/--profile parity (main.go:68-69) and the
    field-docs usage epilog (main.go:36-59, README.md:13-25)."""
    args = build_parser().parse_args(
        ["-r", "eu-central-1", "-p", "logs-ro", "my-stream"]
    )
    assert args.region == "eu-central-1"
    assert args.profile == "logs-ro"
    # defaults: unset → SDK default chain / no profile
    dflt = build_parser().parse_args(["my-stream"])
    assert dflt.region is None and dflt.profile is None

    with pytest.raises(SystemExit) as exc:
        build_parser().parse_args(["--help"])
    assert exc.value.code == 0
    helptext = capsys.readouterr().out
    # every template field the reference documents, verbatim
    for field in (
        "{{.HostId}}", "{{.HostID}}", "{{.ShortHostId}}", "{{.ShortHostID}}",
        "{{.Timestamp}}", "{{.LogEntry}}", "{{.Log}}", "{{.Log.FieldName}}",
    ):
        assert field in helptext
    # duration conventions + strftime example (main.go:41-42, 56-57)
    assert "Examples: 30s, 5m, 3h, 1d." in helptext
    assert 'strftime "%Y-%m-%dT%H:%M:%S"' in helptext
    for flag in ("--region", "--profile", "--one-shot", "--format",
                 "--start", "--watch"):
        assert flag in helptext
