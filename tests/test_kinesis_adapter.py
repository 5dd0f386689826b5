"""Kinesis adapter contract (sources/kinesis.py) — pure unit tests, no
connector jar, no network: pin the full option map against the
reference's consumption parameters (main.go:66,218,300-305) and the
clear offline failure mode."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from kinesis_log_watcher_spark.sources.kinesis import (
    DEFAULT_MAX_FETCH_RECORDS,
    KINESIS_FORMAT,
    read_kinesis_stream,
    reader_options,
)


def test_option_map_defaults():
    # no --region flag → no region option: the connector falls back to
    # the SDK default chain, exactly the reference's flag-only behavior
    # (main.go:133-138 only sets a region when -r is given)
    opts = reader_options("my-logs")
    assert opts == {
        "streamName": "my-logs",
        # GetRecords Limit=10000 (main.go:218)
        "maxFetchRecordsPerShard": "10000",
        "startingPosition": "latest",
    }
    assert DEFAULT_MAX_FETCH_RECORDS == 10_000


def test_option_map_at_timestamp_start():
    # the reference's default start is now-5m (main.go:66 '--start 5m'),
    # expressed by the caller as an AT_TIMESTAMP position (main.go:300-305)
    now = datetime(2026, 8, 14, 12, 0, 0, tzinfo=timezone.utc)
    start = now - timedelta(minutes=5)
    opts = reader_options(
        "my-logs",
        region="eu-west-1",
        start_timestamp=start,
        endpoint_url="http://localhost:4566",
        max_fetch_records=500,
    )
    assert opts["startingPosition"] == "2026-08-14T11:55:00.000000+00:00"
    assert opts["region"] == "eu-west-1"
    assert opts["maxFetchRecordsPerShard"] == "500"
    assert opts["endpointUrl"] == "http://localhost:4566"


def test_endpoint_omitted_when_unset():
    assert "endpointUrl" not in reader_options("s")


def test_connector_format_name_stable():
    # the reader format is part of the public contract (a deploy pins
    # its connector jar against this name)
    assert KINESIS_FORMAT == "aws-kinesis"


def test_missing_connector_raises_clear_error(spark):
    with pytest.raises(RuntimeError, match="no Kinesis connector"):
        read_kinesis_stream(spark, "my-logs")


def test_profile_credentials_resolution(tmp_path):
    """--profile/-p (main.go:69, 133-138): a named profile in the shared
    credentials INI resolves to static credential options; missing
    file/profile/key fail hard, like the SDK."""
    from kinesis_log_watcher_spark.sources.kinesis import profile_credentials

    ini = tmp_path / "credentials"
    ini.write_text(
        "[default]\n"
        "aws_access_key_id = AKIADEFAULT\n"
        "aws_secret_access_key = defaultsecret\n"
        "\n"
        "[logs-ro]\n"
        "aws_access_key_id = AKIALOGSRO\n"
        "aws_secret_access_key = logssecret\n"
        "aws_session_token = tok123\n"
    )
    assert profile_credentials("logs-ro", str(ini)) == {
        "awsAccessKeyId": "AKIALOGSRO",
        "awsSecretKey": "logssecret",
        "awsSessionToken": "tok123",
    }
    # no session token → option omitted
    assert "awsSessionToken" not in profile_credentials("default", str(ini))
    with pytest.raises(ValueError, match="profile not found"):
        profile_credentials("nope", str(ini))
    with pytest.raises(ValueError, match="not found"):
        profile_credentials("default", str(tmp_path / "missing"))
    (tmp_path / "partial").write_text("[p]\naws_access_key_id = A\n")
    with pytest.raises(ValueError, match="aws_secret_access_key"):
        profile_credentials("p", str(tmp_path / "partial"))


def test_option_map_with_profile(tmp_path):
    ini = tmp_path / "credentials"
    ini.write_text(
        "[prod]\naws_access_key_id = AKIAPROD\n"
        "aws_secret_access_key = prodsecret\n"
    )
    opts = reader_options(
        "my-logs", region="us-west-2", profile="prod",
        credentials_path=str(ini),
    )
    assert opts["awsAccessKeyId"] == "AKIAPROD"
    assert opts["awsSecretKey"] == "prodsecret"
    assert opts["region"] == "us-west-2"
    # profile omitted → no credential options, SDK default chain
    assert "awsAccessKeyId" not in reader_options("my-logs")
