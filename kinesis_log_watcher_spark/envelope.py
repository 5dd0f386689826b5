"""The record envelope: reference semantics as declarative Column exprs.

The reference turns every Kinesis record into a 6-field dynamically-typed
map (reference main.go:264-279):

    Timestamp       <- record.ApproximateArrivalTimestamp   (main.go:265)
    HostId          <- record.PartitionKey, verbatim        (main.go:266-267)
    ShortHostId     <- last ':'-segment of PartitionKey,
                       'task/' / 'instance/' prefix removed (main.go:252-262)
    SequenceNumber  <- record.SequenceNumber                (main.go:270)
    LogEntry        <- string(record.Data)                  (main.go:271)
    Log             <- lenient JSON parse of Data; nil on
                       failure, never an error              (main.go:273-279)

Here the envelope is a fixed StructType over a raw connector-shaped input
(see RAW_KINESIS_SCHEMA) and each derivation is a built-in Column
expression — no UDFs, fully codegen'd, and the whole projection is a
narrow (shuffle-free) map over however many partitions the source has.

``Log`` is intentionally NOT materialized as a parsed column: the faithful
translation of Go's ``interface{}`` payload is schema-on-read string access
(``get_json_object`` per template reference), which also keeps the scan
schema narrow. See template.py for the access semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Raw record shape produced by Kinesis-style connectors (and by our test
# fixture): one row per stream record.
RAW_KINESIS_SCHEMA = StructType(
    [
        StructField("streamName", StringType()),
        StructField("shardId", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("approximateArrivalTimestamp", TimestampType()),
        StructField("partitionKey", StringType()),
        StructField("data", BinaryType()),
    ]
)

# The reference's envelope (main.go:264-271). 'Log' is virtual (see above).
ENVELOPE_SCHEMA = StructType(
    [
        StructField("Timestamp", TimestampType()),
        StructField("HostId", StringType()),
        StructField("ShortHostId", StringType()),
        StructField("SequenceNumber", StringType()),
        StructField("LogEntry", StringType()),
    ]
)

ENVELOPE_FIELDS = [f.name for f in ENVELOPE_SCHEMA.fields]

# Go-side alias pairs: HostID/HostId, ShortHostID/ShortHostId both exist in
# the reference's map (main.go:266-269). SQL identifiers are case-insensitive
# in Spark by default, so a single column serves both spellings.
ENVELOPE_ALIASES = {
    "HostID": "HostId",
    "ShortHostID": "ShortHostId",
}


def short_host_id(partition_key: Column) -> Column:
    """Derive ShortHostId (reference main.go:252-262).

    Last ':'-segment of the partition key, then strip a leading ``task/``
    (ECS task ARN) or ``instance/`` (EC2 instance ARN) path prefix.
    Pure built-ins: split + element_at + regexp_replace.
    """
    last_segment = F.element_at(F.split(partition_key, ":"), -1)
    return F.regexp_replace(last_segment, r"^(task/|instance/)", "")


def envelope_columns(
    ts: Column, partition_key: Column, sequence_number: Column, data: Column
) -> list[Column]:
    """The envelope as a select-list (reference main.go:264-271)."""
    return [
        ts.alias("Timestamp"),
        partition_key.alias("HostId"),
        short_host_id(partition_key).alias("ShortHostId"),
        sequence_number.alias("SequenceNumber"),
        data.cast(StringType()).alias("LogEntry"),
    ]


def with_envelope(raw: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Project a raw Kinesis-shaped DataFrame to the reference envelope.

    ``keep`` optionally retains raw columns (e.g. ``shardId`` for
    per-shard ordering tests). Works identically for batch and streaming
    DataFrames — it is a stateless narrow projection.
    """
    cols = envelope_columns(
        F.col("approximateArrivalTimestamp"),
        F.col("partitionKey"),
        F.col("sequenceNumber"),
        F.col("data"),
    )
    if keep:
        cols = [F.col(c) for c in keep] + cols
    return raw.select(*cols)


def is_json_object(log_entry: Column) -> Column:
    """True iff the payload parses as a JSON *object*.

    Used for the reference's template-error semantics: ``{{.Log.Field}}``
    errors (and the row is dropped, main.go:283-287) when ``Log`` is nil
    (unparseable payload, main.go:276-277) or not an object.
    ``json_object_keys`` returns NULL for invalid JSON and non-objects.
    """
    return F.json_object_keys(log_entry).isNotNull()
