"""Deterministic sampling/splitting/packing operators (training-data
pipeline surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.operators.sampling import (
    hash_draw,
    pack_bins,
    rate_threshold,
    split_assign,
    stratified_sample,
)
from kinesis_log_watcher_spark.queries.base import load


def test_rate_threshold_boundaries():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(0.5) == "80000000"
    assert rate_threshold(1.0) == "gggggggg"  # 'g' > 'f': above every draw
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_sample_is_deterministic_and_stable_under_growth(spark, sf_dir):
    """Membership depends only on the row key: sampling a subset picks
    exactly the subset of the full sample (no rand()-style dependence on
    what else is in the corpus or how it is partitioned)."""
    docs = load(spark, sf_dir, "documents")
    pick = lambda df: {
        r.doc_id
        for r in stratified_sample(
            df, "lang", {"en": 0.2}, key_col="doc_id", default_rate=0.5
        )
        .select("doc_id")
        .collect()
    }
    subset = docs.filter(F.col("doc_id") < 100)
    full_sample = pick(docs)
    assert pick(subset) == {i for i in full_sample if i < 100}
    # and re-running (different partitioning) is identical
    assert pick(docs.repartition(7)) == full_sample


def test_split_partitions_every_row_exactly_once(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    assigned = split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = dict(
        assigned.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert sum(counts.values()) == docs.count()
    # 80/10/10 within generous tolerance at 500 docs
    total = sum(counts.values())
    assert counts["train"] / total > 0.6
    assert 0 < counts.get("val", 0) < total * 0.3
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"a": 0.5, "b": 0.3})


def test_split_is_filter_only_no_shuffle(spark, sf_dir):
    """Sampling/splitting must stay narrow — a filter/projection over the
    scan, no Exchange (at 100 TB this runs at read speed)."""
    docs = load(spark, sf_dir, "documents")
    sampled = stratified_sample(docs, "lang", {"en": 0.2}, key_col="doc_id")
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_bins_contiguity_and_budget(spark):
    """Bins are contiguous runs in order; every doc's start offset lies
    in its bin's [bin*B, (bin+1)*B) range; bin ids are dense from 0."""
    rows = [("g", i, 600) for i in range(10)]  # 600 tokens each, budget 2048
    df = spark.createDataFrame(rows, ["source", "doc_id", "tok"])
    packed = pack_bins(
        df, group_col="source", size_col=F.col("tok").cast("long"),
        budget=2048, order_col="doc_id",
    ).collect()
    by_doc = {r.doc_id: r for r in packed}
    for i in range(10):
        start = i * 600
        assert by_doc[i]._start_off == start
        assert by_doc[i].bin_id == start // 2048
    bins = sorted({r.bin_id for r in packed})
    assert bins == list(range(bins[-1] + 1))
    # doc straddling a boundary belongs to its start bin (doc 3: start
    # 1800 < 2048 → bin 0 even though it ends at 2400)
    assert by_doc[3].bin_id == 0
    assert by_doc[4].bin_id == 1


def test_hash_draw_matches_duckdb(spark):
    """The cross-engine invariant the whole family rests on: identical
    md5 hex prefix for identical keys."""
    import duckdb

    df = spark.range(0, 50).select(
        F.col("id"), hash_draw(F.col("id")).alias("h")
    )
    spark_vals = {r.id: r.h for r in df.collect()}
    duck_vals = dict(
        duckdb.sql(
            "SELECT i, substr(md5(CAST(i AS VARCHAR)),1,8) FROM range(50) t(i)"
        ).fetchall()
    )
    assert spark_vals == duck_vals


def test_quota_apportionment_sums_to_budget_exactly(spark, sf_dir):
    from kinesis_log_watcher_spark.queries import registry

    reg = registry()
    rows = reg["source_quota_apportion"].fn(spark, sf_dir).collect()
    assert rows
    total_n = sum(r.n for r in rows)
    assert sum(r.quota for r in rows) == 1000  # the LR guarantee
    for r in rows:
        assert r.floor_quota == r.n * 1000 // total_n
        assert r.remainder == r.n * 1000 % total_n
        # a source never gains more than one seat over its floor
        assert r.quota in (r.floor_quota, r.floor_quota + 1)
        # and stays within one seat of exact proportionality
        assert abs(r.quota - r.n * 1000 / total_n) < 1.0


def test_rendezvous_rebalance_moves_only_to_new_shard(spark, sf_dir):
    from kinesis_log_watcher_spark.queries import registry

    reg = registry()
    (row,) = reg["rendezvous_shard_rebalance"].fn(spark, sf_dir).collect()
    assert row.n_docs > 0
    # the HRW minimal-disruption theorem, exactly
    assert row.n_moved == row.n_moved_to_new
    # moved fraction concentrates near 1/9 (binomial, allow wide noise)
    assert 0.03 < row.moved_frac < 0.25, row.moved_frac
