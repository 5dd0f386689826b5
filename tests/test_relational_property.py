"""Property-based tests (hypothesis) for the scale-pattern relational
operators: the optimized plans must agree with direct single-pass
references on arbitrary inputs — two-phase top-k vs one ranking window,
bucketized interval overlap vs the naive quadratic join."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from conftest import property_examples
from pyspark.sql import Window
from pyspark.sql import functions as F


@settings(max_examples=property_examples(12), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # group
            st.integers(min_value=0, max_value=50),     # value (ties likely)
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=4),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_twophase_topk_equals_single_window(spark, rows, k, n_salts):
    """Salted partial top-k then survivor re-rank == one ranking window,
    for any data, any k, any salt count (incl. heavy value ties)."""
    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)],
        "g long, id long, v long",
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    direct = {
        (r.g, r.id, r.rnk)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }
    salt = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_salts
    )
    w1 = Window.partitionBy("g", "salt").orderBy(F.col("v").desc(), F.col("id"))
    partial = (
        df.withColumn("salt", salt)
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .drop("salt", "r1")
    )
    twophase = {
        (r.g, r.id, r.rnk)
        for r in partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }
    assert twophase == direct


@settings(max_examples=property_examples(6), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),     # user
            st.integers(min_value=0, max_value=300),   # start minute
            st.integers(min_value=0, max_value=180),   # duration minutes
        ),
        min_size=1,
        max_size=25,
    ),
)
# the layouts the docstring names, pinned so they run on EVERY pass
# (random examples are reduced to 6 — the edge coverage no longer
# depends on the draw):
@example(iv=[(0, 10, 0), (1, 10, 0)])                    # zero-length, same instant
@example(iv=[(0, 0, 180), (1, 60, 10)])                  # nested
@example(iv=[(0, 55, 10), (1, 62, 10)])                  # bucket-boundary straddle
@example(iv=[(0, 0, 0), (1, 300, 0), (2, 0, 180), (3, 59, 2), (4, 60, 0)])
def test_bucketized_overlap_equals_naive_join(spark, iv):
    """Hour-bucketed equi-join + dedupe + exact predicate == the naive
    quadratic theta join, for arbitrary interval layouts (zero-length,
    nested, bucket-boundary-straddling). The naive side is a pure-Python
    quadratic scan — an oracle INDEPENDENT of Spark's join machinery
    (and free of a second per-example Catalyst plan)."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (u, i, t0 + timedelta(minutes=s), t0 + timedelta(minutes=s + d))
        for i, (u, s, d) in enumerate(iv)
    ]
    df = spark.createDataFrame(rows, "u long, iid long, s timestamp, e timestamp")

    naive = {
        (u1, i1, u2, i2)
        for (u1, i1, s1, e1) in rows
        for (u2, i2, s2, e2) in rows
        if u1 < u2 and s1 <= e2 and s2 <= e1
    }

    buckets = df.select(
        "u", "iid", "s", "e",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s")),
                F.date_trunc("hour", F.col("e")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    ab = buckets.select(
        F.col("u").alias("u1"), F.col("iid").alias("i1"),
        F.col("s").alias("a_s"), F.col("e").alias("a_e"), "bucket",
    )
    bb = buckets.select(
        F.col("u").alias("u2"), F.col("iid").alias("i2"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"), "bucket",
    )
    bucketized = {
        (r.u1, r.i1, r.u2, r.i2)
        for r in ab.join(bb, "bucket")
        .filter(F.col("u1") < F.col("u2"))
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .select("u1", "i1", "u2", "i2")
        .distinct()
        .collect()
    }
    assert bucketized == naive
