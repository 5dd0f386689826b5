"""Production Kinesis source adapter (connector passthrough).

Maps the reference's consumption machinery onto a Spark Kinesis connector
(e.g. the spark-streaming-sql-kinesis connector; jar not bundled here —
this adapter only builds the reader config):

- shard discovery + 1 worker/shard (main.go:148-178) → connector does both
  (one input partition per shard).
- AT_TIMESTAMP start position, default now-5m (main.go:66, 300-305)
  → ``startingPosition``.
- 10k records/GetRecords cap (main.go:218) → ``maxFetchRecordsPerShard``.
- sequence-number resume after iterator expiry (main.go:320-363 — buggy in
  the reference: main.go:345 shadows the renewed iterator with ``:=`` so
  it's never used) → checkpointed offsets give the *intended* semantics,
  durably.
- throttle backoff (main.go:217-243) → connector-internal retry.

Import-gated: no AWS/account on the test path (SURVEY.md §7.4).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

KINESIS_FORMAT = "aws-kinesis"  # Spark 4 / Databricks-style connector name

DEFAULT_MAX_FETCH_RECORDS = 10_000  # reference's GetRecords Limit (main.go:218)


def read_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str = "us-east-1",
    start_timestamp: datetime | None = None,
    endpoint_url: str | None = None,
    max_fetch_records: int = DEFAULT_MAX_FETCH_RECORDS,
) -> DataFrame:
    """Build the streaming reader for a real Kinesis stream.

    Raises a clear error if no Kinesis connector is on the classpath —
    offline tests use sources.files / sources.fixture instead.
    """
    reader = (
        spark.readStream.format(KINESIS_FORMAT)
        .option("streamName", stream_name)
        .option("region", region)
        .option("maxFetchRecordsPerShard", str(max_fetch_records))
    )
    if start_timestamp is not None:
        reader = reader.option(
            "startingPosition",
            start_timestamp.strftime("%Y-%m-%dT%H:%M:%S.%f+00:00"),
        )
    else:
        reader = reader.option("startingPosition", "latest")
    if endpoint_url:
        reader = reader.option("endpointUrl", endpoint_url)
    try:
        return reader.load()
    except Exception as exc:  # connector jar absent in this environment
        raise RuntimeError(
            "no Kinesis connector available on the classpath; use "
            "sources.read_raw_records_stream (files) or sources.fixture "
            "for offline runs"
        ) from exc
