"""Pandas UDF surface: scalar and grouped-aggregate paths agree with
their built-in / numpy references exactly (Arrow round-trip is lossless
for doubles)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.udfs import discounted_price_udf, median_udaf


def test_scalar_pandas_udf_matches_builtin(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    both = li.select(
        discounted_price_udf()("l_extendedprice", "l_discount").alias("u"),
        (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("b"),
    )
    assert both.filter(F.col("u") != F.col("b")).count() == 0


def test_grouped_agg_pandas_udf_median(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 4.0), ("b", 6.0)],
        "k string, v double",
    )
    got = {
        r.k: r.m
        for r in df.groupBy("k").agg(median_udaf()("v").alias("m")).collect()
    }
    assert got == {"a": 2.0, "b": 5.0}
    assert got["b"] == float(np.median([4.0, 6.0]))
