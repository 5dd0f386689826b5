"""Count-Min Sketch: sub-linear frequency estimation as DataFrames.

The CMS (Cormode & Muthukrishnan 2005) summarizes a key-frequency
distribution in a depth×width counter grid: row i counts keys bucketed
by hash_i(key) mod width; a key's estimate is the MIN of its d counters
— always ≥ the true count (collisions only ever inflate), with error
≤ εN at width = e/ε with probability 1 − δ at depth = ln(1/δ).

Distributed shape: building is ONE groupBy over (row, bucket) — the
sketch is depth×width rows regardless of input size, so it broadcasts
everywhere after a single aggregation pass; merging shards is counter
addition (the groupBy does it); estimation is a broadcast join against
the tiny grid. This is the sketch pattern the engine uses for any
"heavy hitters at 100 TB" question where exact per-key counts don't fit.

Hashes are md5-derived (same convention as the minhash/simhash family:
``conv(substr(md5(...), 1, 15), 16, 10)``) so a SQL oracle reproduces
the grid — and therefore the estimates — bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(i_col, key_col, width: int):
    h = F.conv(
        F.substring(
            F.md5(F.concat(i_col.cast("string"), F.lit(":"), key_col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return h % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """One aggregation pass → the (i, b, c) counter grid
    (depth × width rows total, whatever the input size)."""
    rows = df.select(F.col(key_col).alias("k")).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    return (
        rows.withColumn("b", _bucket(F.col("i"), F.col("k"), width))
        .groupBy("i", "b")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Estimate each key's frequency: min over its d counters (absent
    counter rows are zero). The grid broadcasts — the only real work is
    the scan of ``keys``."""
    probes = keys.select(F.col(key_col).alias("k")).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    probes = probes.withColumn("b", _bucket(F.col("i"), F.col("k"), width))
    joined = probes.join(F.broadcast(cms), ["i", "b"], "left")
    return (
        joined.groupBy("k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_n"))
        .withColumnRenamed("k", key_col)
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1024, k: int = 3
) -> DataFrame:
    """Bloom filter as a DataFrame of set bit positions: each key sets k
    md5-derived positions in [0, m_bits). Output is AT MOST m_bits rows
    whatever the input size — the broadcastable membership summary for a
    set too large to broadcast exactly. Merge = union-distinct."""
    rows = df.select(F.col(key_col).alias("key")).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    return (
        rows.select(_bucket(F.col("i"), F.col("key"), m_bits).alias("b"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Membership test: a key is 'maybe present' iff ALL k of its bit
    positions are set — no false negatives ever, false positives at the
    classical (1-e^{-kn/m})^k rate. The bit set broadcasts; probing is a
    narrow pass over ``keys`` (the 100 TB use: pre-filter a fact table
    before an expensive join against a non-broadcastable dim)."""
    probes = keys.select(F.col(key_col).alias("key")).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    probes = probes.withColumn("b", _bucket(F.col("i"), F.col("key"), m_bits))
    hit = probes.join(
        F.broadcast(bits.withColumn("_set", F.lit(True))), "b", "left"
    )
    return (
        hit.groupBy("key")
        .agg(F.min(F.coalesce(F.col("_set"), F.lit(False))).alias("bloom_maybe"))
        .withColumnRenamed("key", key_col)
    )
