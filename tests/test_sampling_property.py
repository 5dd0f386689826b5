"""Property-based tests (hypothesis) for the sampling/packing operators:
for arbitrary inputs, the Spark implementations must agree with plain
Python references — bin assignment, split disjointness/exhaustiveness,
and threshold monotonicity."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import property_examples
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.operators.sampling import (
    pack_bins,
    rate_threshold,
    split_assign,
)


def _draw(key) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()[:8]


@settings(max_examples=property_examples(20), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=4096),
)
def test_pack_bins_matches_python_reference(spark, sizes, budget):
    rows = [("g", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "source string, doc_id long, tok long")
    got = {
        r.doc_id: (r._start_off, r.bin_id)
        for r in pack_bins(
            df, group_col="source", size_col=F.col("tok"),
            budget=budget, order_col="doc_id",
        ).collect()
    }
    off = 0
    for i, s in enumerate(sizes):
        assert got[i] == (off, off // budget), (i, s, budget)
        off += s


@settings(max_examples=property_examples(20), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                  max_size=50, unique=True),
    w_train=st.integers(min_value=1, max_value=8),
    w_val=st.integers(min_value=1, max_value=8),
)
def test_split_assign_matches_python_reference(spark, keys, w_train, w_val):
    """Split membership is exactly the hex-range rule — verified against
    an independent Python md5 computation, for arbitrary weights."""
    total = w_train + w_val + 2
    weights = {
        "train": w_train / total,
        "val": w_val / total,
        "test": 2 / total,
    }
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r.doc_id: r.split for r in split_assign(df, "doc_id", weights).collect()
    }
    t1 = rate_threshold(weights["train"])
    t2 = rate_threshold(weights["train"] + weights["val"])
    for k in keys:
        d = _draw(k)
        expect = "train" if d < t1 else ("val" if d < t2 else "test")
        assert got[k] == expect, (k, d, t1, t2)


def test_rate_threshold_monotone():
    """More rate → never a smaller threshold (sample sets are nested)."""
    grid = [i / 64 for i in range(65)]
    ts = [rate_threshold(r) for r in grid]
    assert ts == sorted(ts)
