"""Bucketed-table co-located joins: the write-time shuffle pays for
exchange-free joins forever after — the storage-layout strategy for
repeated fact⋈fact joins at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from kinesis_log_watcher_spark.queries.base import load

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    write_bucketed(
        li, "li_b", "l_orderkey", N_BUCKETS, path=str(base / "li_b")
    )
    write_bucketed(
        orders, "orders_b", "o_orderkey", N_BUCKETS, path=str(base / "orders_b")
    )
    yield "li_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Same bucket count on the join key on both sides → SortMergeJoin
    with NO shuffle (and, with sortBy, no per-task Sort of the sides).
    hint("merge") pins SMJ so a broadcast doesn't mask the property at
    tiny SF."""
    li_t, orders_t = bucketed_tables
    j = spark.table(li_t).hint("merge").join(
        spark.table(orders_t),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan[:2000]}"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    """Layout must not change semantics: bucketed join ≡ plain join."""
    li_t, orders_t = bucketed_tables
    bucketed = bucketed_join(
        spark, li_t, orders_t, F.col("l_orderkey") == F.col("o_orderkey")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias("q"),
    )
    plain = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(9,2)")).alias("q"),
        )
    )
    assert bucketed.collect() == plain.collect()


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket column also reuses the layout: partial and
    final aggregation collapse into bucket-local work, no shuffle."""
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(
        F.count("*").alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg shuffled:\n{plan[:2000]}"


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    """An equality filter on the bucket column must prune to 1/N of the
    buckets at the scan (plan reports 'selected N buckets')."""
    li_t, _ = bucketed_tables
    # For a filter-only plan Spark's autoBucketedScan heuristic may fall
    # back to a plain scan (no interchange to avoid); disable it so the
    # bucketed scan — and its pruning — is visible in the plan.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(li_t).filter(F.col("l_orderkey") == 42)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of" in plan, plan[:2000]
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
