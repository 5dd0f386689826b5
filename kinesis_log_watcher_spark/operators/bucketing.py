"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact⋈fact join (lineitem ⋈ orders on
the order key) is the shuffle of both sides. Bucketing moves that
shuffle to *write time*: both tables are written hash-partitioned into
the same number of buckets on the join key, and every later join or
aggregation on that key reads co-located buckets — SortMergeJoin with
NO Exchange on either side, repeated for free across every downstream
query. This is the storage-layout half of the prompt's "repartition()/
bucketing for co-located joins".

Spark specifics encoded here:
- bucketing requires ``saveAsTable`` (metastore-backed; plain
  ``.parquet(path)`` silently drops bucket metadata);
- both sides must have the SAME bucket count, and
  ``spark.sql.sources.bucketing.enabled`` (default true) must be on;
- ``sortBy`` within buckets additionally removes the per-task Sort
  before a SortMergeJoin;
- bucket pruning applies equality filters on the bucket column by
  reading 1/N of the files.

The reference has no storage layer at all (it is a stream tailer,
main.go:1-416) — this module is §2.2 engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally in-bucket sorted)
    parquet table. One shuffle now; zero shuffles on every future
    join/agg keyed on ``bucket_col`` between same-bucketed tables.
    ``path`` makes it an external table at that location (tests use
    /tmp); default is the session warehouse."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching
    bucket counts the physical plan is exchange-free on both sides
    (assert with ``"Exchange" not in plan`` — tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
