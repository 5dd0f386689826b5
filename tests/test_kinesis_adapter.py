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
