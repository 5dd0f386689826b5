"""Partitioned-directory writes + partition pruning: the second storage
layout strategy (alongside bucketing) — at 100 TB a scan that prunes to
the partitions the predicate names reads a fraction of the table, and
dynamic partition pruning (DPP) extends that to join-derived predicates
discovered at runtime."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.queries.base import load


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("part") / "events_by_type")
    load(spark, sf_dir, "events").write.partitionBy("event_type").parquet(base)
    return base


def test_static_partition_pruning(spark, partitioned_events):
    """A literal filter on the partition column must land in
    PartitionFilters (directory pruning), not in the data filters."""
    df = spark.read.parquet(partitioned_events).filter(
        F.col("event_type") == "error"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf, plan[:1500]
    # and the result only contains the surviving partition
    types = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert types == {"error"}


def test_dynamic_partition_pruning_from_join(spark, partitioned_events):
    """Joining on the partition column against a FILTERED dim must plan a
    dynamicpruning subquery: the fact side scans only the partitions the
    dim's surviving keys name — discovered at runtime, the mechanism that
    keeps a 100 TB fact⋈dim join from reading the whole fact."""
    dim = spark.createDataFrame(
        [("error", 1), ("purchase", 2), ("click", 3)],
        "event_type string, type_class int",
    )
    fact = spark.read.parquet(partitioned_events)
    j = fact.join(
        F.broadcast(dim.filter(F.col("type_class") == 1)), "event_type"
    )
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    executed = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in optimized.lower() or "dynamicpruning" in executed.lower(), (
        executed[:2000]
    )
    assert j.count() == fact.filter(F.col("event_type") == "error").count()
