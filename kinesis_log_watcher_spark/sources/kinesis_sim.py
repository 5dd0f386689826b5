"""Custom Python DataSource: a deterministic offline Kinesis simulator.

The reference consumes a real Kinesis stream (main.go:148-243: paginated
ListShards, one consumer per shard, AT_TIMESTAMP/AT_SEQUENCE_NUMBER
iterators, NextShardIterator advancement). sources/kinesis.py adapts
those options onto a connector; THIS module implements the stream's
*semantics* as a first-class Spark source via the Python DataSource API
(Spark 4): shards → one InputPartition each (S2 parity: per-shard
parallel scan), records totally ordered per shard by zero-padded
sequence number (main.go:320,362), offsets = a per-shard sequence-number
map that Structured Streaming checkpoints and resumes (W4 parity — the
same resume contract as the reference's latestSequenceNumber tracking,
minus its main.go:345 shadow bug).

Everything the simulator emits is a PURE FUNCTION of (shard, seq) — no
randomness, no clock — so a SQL oracle can regenerate the identical
records with generate_series and the whole source + envelope + JSON
access pipeline is hash-checkable end to end (queries/round6b.py
kinesis_sim_batch_scan / stream_kinesis_sim_scan).

At scale: a real deployment swaps this class for the connector; the
reader surface (partition-per-shard, offset map, bounded per-pull
record limit ≙ the ≤10k GetRecords bound, S3 parity) is identical.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SIM_SCHEMA = (
    "streamName string, shardId string, sequenceNumber string, "
    "approximateArrivalTimestamp timestamp, partitionKey string, "
    "data binary"
)

SIM_EPOCH = datetime(2024, 5, 1, 12, 0, 0)

_LEVELS = ("info", "warn", "error")


def sim_record(stream_name: str, shard: int, seq: int) -> tuple:
    """The deterministic record for (shard, seq) — the single source of
    truth both the reader below and the SQL oracle restate."""
    level = _LEVELS[seq % 3]
    latency = (seq * 7 + shard * 3) % 500
    payload = json.dumps(
        {
            "level": level,
            "msg": f"req {seq} shard {shard}",
            "latency_ms": latency,
        },
        separators=(", ", ": "),
    )
    return (
        stream_name,
        f"shardId-{shard:012d}",
        f"{shard:04d}{seq:016d}",
        SIM_EPOCH + timedelta(seconds=seq),
        f"instance/i-{shard:04d}",
        payload.encode("utf-8"),
    )


class _ShardSlice(InputPartition):
    def __init__(self, shard: int, start: int, end: int, stream_name: str):
        self.shard = shard
        self.start = start
        self.end = end
        self.stream_name = stream_name


def _opts(options) -> tuple[int, int, int, str]:
    shards = int(options.get("shards", "4"))
    per_shard = int(options.get("recordsPerShard", "250"))
    batch = int(options.get("maxRecordsPerPull", "100"))
    name = options.get("streamName", "sim-stream")
    return shards, per_shard, batch, name


class KinesisSimBatchReader(DataSourceReader):
    def __init__(self, options):
        self.shards, self.per_shard, _, self.stream_name = _opts(options)

    def partitions(self):
        # one input partition per shard — the connector's layout
        return [
            _ShardSlice(s, 0, self.per_shard, self.stream_name)
            for s in range(self.shards)
        ]

    def read(self, partition: _ShardSlice):
        for seq in range(partition.start, partition.end):
            yield sim_record(partition.stream_name, partition.shard, seq)


class KinesisSimStreamReader(DataSourceStreamReader):
    """Offsets are {"shard-<i>": next_seq} maps — checkpointed by
    Structured Streaming exactly like the reference tracks
    latestSequenceNumber per shard. maxRecordsPerPull bounds each
    INPUT PARTITION (one pull ≡ one GetRecords call, Limit ≤10k,
    main.go:218); a trigger may span several pulls per shard, exactly
    like the reference's poll loop."""

    def __init__(self, options):
        self.shards, self.per_shard, self.batch, self.stream_name = _opts(
            options
        )

    def initialOffset(self):
        return {f"shard-{s}": 0 for s in range(self.shards)}

    def latestOffset(self):
        # a bounded simulation: the stream "ends" at per_shard records
        return {f"shard-{s}": self.per_shard for s in range(self.shards)}

    def partitions(self, start: dict, end: dict):
        # Each input partition is one bounded PULL (the GetRecords
        # Limit analogue, main.go:218): a micro-batch may span several
        # pulls per shard, exactly like the reference's poll loop
        # issues several GetRecords calls per poll.
        parts = []
        for s in range(self.shards):
            a = int(start.get(f"shard-{s}", 0))
            b = int(end.get(f"shard-{s}", 0))
            while a < b:
                c = min(a + self.batch, b)
                parts.append(_ShardSlice(s, a, c, self.stream_name))
                a = c
        return parts

    def read(self, partition: _ShardSlice):
        for seq in range(partition.start, partition.end):
            yield sim_record(partition.stream_name, partition.shard, seq)

    def commit(self, end):
        pass

    def stop(self):
        pass


class KinesisSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_sim"

    def schema(self) -> str:
        return SIM_SCHEMA

    def reader(self, schema):
        return KinesisSimBatchReader(self.options)

    def streamReader(self, schema):
        return KinesisSimStreamReader(self.options)


def register_sim_source(spark) -> None:
    """Idempotently register the simulator with this session."""
    spark.dataSource.register(KinesisSimDataSource)
