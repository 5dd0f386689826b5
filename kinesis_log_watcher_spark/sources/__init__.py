"""Sources: Kinesis-shaped record streams for prod (connector) and test (fixture/files)."""

from kinesis_log_watcher_spark.sources.fixture import kinesis_records_fixture
from kinesis_log_watcher_spark.sources.files import (
    read_raw_records,
    read_raw_records_stream,
)

__all__ = [
    "kinesis_records_fixture",
    "read_raw_records",
    "read_raw_records_stream",
]
