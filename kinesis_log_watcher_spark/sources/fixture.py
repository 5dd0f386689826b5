"""Deterministic ``kinesis_records`` fixture (FIXTURES.md §1).

The reference has no tests (SURVEY.md §5.1); this fixture models its exact
input shape — one row per Kinesis record, pre-envelope — with the value
coverage each reference behavior needs (FIXTURES.md §1):

- all four PartitionKey shapes (ECS task ARN, EC2 instance ARN,
  ip-address, uuid) → ShortHostId derivation paths (main.go:249-262)
- payload mix: JSON object / JSON non-object / invalid JSON / empty
  → lenient-parse + render-error semantics (main.go:273-287)
- multiple shards, interleaved sub-second timestamps, records straddling a
  t₀ boundary → per-shard order + AT_TIMESTAMP start filter
  (main.go:176-178, 300-305)

Deterministic: seeded, no wall-clock.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

from kinesis_log_watcher_spark.envelope import RAW_KINESIS_SCHEMA

EPOCH = datetime(2024, 5, 1, 12, 0, 0, tzinfo=timezone.utc)

_PARTITION_KEYS = [
    "arn:aws:ecs:us-east-1:123456789012:task/abc-123",
    "arn:aws:ec2:us-east-1:123456789012:instance/i-0abcdef",
    "ip-address:10.0.0.1",
    "uuid:6f1e4a3c-9d2b-4c61-a0f7-2f4f0a9b1c55",
]


def _payload(rng: random.Random, i: int) -> bytes:
    kind = i % 6
    if kind in (0, 1, 2):  # valid JSON object (majority, like real logs)
        return json.dumps(
            {
                "level": rng.choice(["info", "warn", "error"]),
                "msg": f"request {i} handled",
                "FieldName": f"v{i % 7}",
                "latency_ms": rng.randint(1, 500),
                "nested": {"code": i % 3},
            }
        ).encode()
    if kind == 3:  # valid JSON non-object
        return rng.choice([b"[1,2]", b'"plain string"', b"42"])
    if kind == 4:  # invalid JSON: plain text, or invalid UTF-8 bytes
        if (i // 6) % 2 == 1:
            return b"\xff\xfe raw bytes \xff" + str(i).encode()
        return f"plain text log line {i}".encode()
    return b""  # empty payload


def kinesis_records_fixture(
    spark: SparkSession,
    n_records: int = 1000,
    n_shards: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Build the raw-record DataFrame (RAW_KINESIS_SCHEMA), ~n_records rows.

    Timestamps: 1 record/sec/shard with pseudo-random microsecond jitter,
    shards interleaved. Sequence numbers: zero-padded, strictly increasing
    per shard (reference orders within a shard by these, main.go:320,362).
    """
    rng = random.Random(seed)
    rows = []
    per_shard = n_records // n_shards
    for shard in range(n_shards):
        for i in range(per_shard):
            gid = shard * per_shard + i
            ts = EPOCH + timedelta(seconds=i, microseconds=rng.randint(0, 999_999))
            rows.append(
                (
                    "test-stream",
                    f"shardId-{shard:012d}",
                    f"{shard:04d}{i:016d}",
                    ts.replace(tzinfo=None),  # session TZ is UTC
                    _PARTITION_KEYS[gid % len(_PARTITION_KEYS)],
                    bytearray(_payload(rng, gid)),
                )
            )
    return spark.createDataFrame(rows, RAW_KINESIS_SCHEMA)


def write_fixture_parquet(spark: SparkSession, path: str, **kwargs) -> None:
    """Materialize the fixture as parquet partitioned by shard — the
    file-based stand-in for a sharded stream (one input split per shard,
    like the connector's shard→partition mapping)."""
    df = kinesis_records_fixture(spark, **kwargs)
    df.write.mode("overwrite").partitionBy("shardId").parquet(path)
