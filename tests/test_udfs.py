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


def test_udtf_matches_posexplode(spark):
    from kinesis_log_watcher_spark.functions.udfs import tokenize_udtf

    Tokenize = tokenize_udtf()
    spark.udtf.register("tokenize", Tokenize)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, None)], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = sorted(
        (r.doc_id, r.pos, r.token)
        for r in spark.sql(
            "SELECT d.doc_id, t.pos, t.token "
            "FROM udtf_docs d, LATERAL tokenize(d.text) t"
        ).collect()
    )
    exp = sorted(
        (r.doc_id, r.pos, r.token)
        for r in docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
        ).collect()
    )
    assert got == exp


def test_salted_join_equals_plain_join(spark):
    from kinesis_log_watcher_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "a", "b") for i in range(50 if k == "hot" else 3)],
        "k string, lv long",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("a", 3), ("c", 4)], "k string, rv long"
    )
    plain = sorted(
        (r.k, r.lv, r.rv) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r.k, r.lv, r.rv) for r in salted_join(left, right, "k", salt=4).collect()
    )
    assert salted == plain


def test_approx_count_distinct_within_bounds(spark):
    """Approximate aggregates (HLL++): rsd=0.05 must land within ±3·rsd
    of the exact count on the orders custkeys — the scale path when an
    exact distinct shuffle is too expensive."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) <= 3 * 0.05 * exact


def test_connected_components_chain_and_pair(spark):
    """A 4-node chain (needs multiple propagation rounds) and a separate
    pair must resolve to min-id components."""
    from kinesis_log_watcher_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (7, 9)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: (r.component, r.cluster_size)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        10: (10, 4), 20: (10, 4), 30: (10, 4), 40: (10, 4),
        7: (7, 2), 9: (7, 2),
    }


def test_connected_components_deep_chain(spark):
    """A 201-node path graph: diameter (200) far exceeds max_iter (25).
    The alternating large-star/small-star rounds halve tree height, so
    this converges in O(log) rounds — per-hop label propagation would
    silently return partial labels here."""
    from kinesis_log_watcher_spark.operators.dedup import connected_components

    n = 201
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == n
    assert all(r.component == 0 and r.cluster_size == n for r in rows)


def test_connected_components_random_graph_matches_union_find(spark):
    """Star-contraction output equals a driver-side union-find on the
    same edge list (seeded random graph with several components)."""
    import random

    from kinesis_log_watcher_spark.operators.dedup import connected_components

    rng = random.Random(7)
    nodes = list(range(120))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
    ]
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # canonical label = min node id per component, only for edge-touched nodes
    touched = {v for e in edges for v in e if e[0] != e[1]}
    comp: dict[int, int] = {}
    for v in touched:
        root = find(v)
        comp[root] = min(comp.get(root, v), v)
    expect = {v: comp[find(v)] for v in touched}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == expect


def test_cosine_topk_fast_exact_parity(spark):
    """The fast ANN path's doubles are deterministic: zip_with/aggregate
    folds left-to-right, so a Python left-fold reproduces them bit-for-
    bit (np.dot would not — it reorders)."""
    import math

    from kinesis_log_watcher_spark.operators.similarity import cosine_topk_fast

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = cosine_topk_fast(q, emb, k=3).collect()
    assert len(got) == 9

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    for r in got:
        a, b = rows[r.q_id], rows[r.neighbor_id]
        exp = fold_dot(a, b) / (
            math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b))
        )
        assert r.cosine == exp, (r.q_id, r.neighbor_id)


def test_multimodal_decoders_and_custom_decoder(spark):
    """Real decoders reject non-decodable payloads (ValueError — the
    corrupt-blob path; see test_multimodal_codec.py for decode success);
    the mapInPandas plumbing accepts a swapped-in decoder."""
    import pytest as _pytest

    from kinesis_log_watcher_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        image_metadata,
        resize_image,
        with_binary_payload,
    )

    for decoder, args in ((decode_image, (b"x",)), (decode_audio, (b"x",)),
                          (resize_image, (b"x", 8, 8))):
        with _pytest.raises(ValueError):
            decoder(*args)

    docs = spark.createDataFrame([(1, "abc"), (2, "defg")], "doc_id long, text string")

    def custom(payload: bytes):
        return len(payload), 1, 2, 3, 0.5

    rows = {r.doc_id: r.n_bytes for r in
            image_metadata(with_binary_payload(docs), decode=custom).collect()}
    assert rows == {1: 3, 2: 4}


def test_asof_join_edges(spark):
    """asof_join: picks the latest at-or-before match, breaks exact-ts
    ties by tiebreak desc, and keeps unmatched left rows with nulls."""
    from datetime import datetime

    from kinesis_log_watcher_spark.operators.relational import asof_join

    t = lambda s: datetime(2024, 1, 1, s)
    left = spark.createDataFrame(
        [(1, 100, t(12)), (2, 100, t(5)), (3, 200, t(12))],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(9)), (100, 11, t(9)), (100, 12, t(10)), (100, 13, t(13))],
        "k long, rid long, rts timestamp",
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="k", left_id="lid",
            left_ts="lts", right_ts="rts", tiebreak="rid",
        ).collect()
    }
    assert got[1] == 12       # latest <= 12:00 is 10:00
    assert got[2] is None     # nothing at or before 05:00
    assert got[3] is None     # key 200 has no history
    # exact-ts tie: rows 10 and 11 at 09:00 → highest rid wins
    left2 = spark.createDataFrame([(9, 100, t(9))], "lid long, k long, lts timestamp")
    got2 = asof_join(
        left2, right, on="k", left_id="lid",
        left_ts="lts", right_ts="rts", tiebreak="rid",
    ).collect()
    assert [(r.lid, r.rid) for r in got2] == [(9, 11)]


def test_asof_join_forward(spark):
    """direction='forward': earliest at-or-after match, ascending
    tiebreak, unmatched survive with nulls."""
    from datetime import datetime

    import pytest as _pytest

    from kinesis_log_watcher_spark.operators.relational import asof_join

    t = lambda s: datetime(2024, 1, 1, s)
    left = spark.createDataFrame(
        [(1, 100, t(9)), (2, 100, t(14)), (3, 200, t(1))],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(9)), (100, 11, t(9)), (100, 12, t(10)), (100, 13, t(13))],
        "k long, rid long, rts timestamp",
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="k", left_id="lid", left_ts="lts",
            right_ts="rts", tiebreak="rid", direction="forward",
        ).collect()
    }
    # earliest >= 09:00 is 09:00; exact-ts tie → LOWEST rid (asc)
    assert got[1] == 10
    assert got[2] is None     # nothing at or after 14:00
    assert got[3] is None     # key 200 unmatched
    with _pytest.raises(ValueError):
        asof_join(left, right, on="k", left_id="lid", left_ts="lts",
                  right_ts="rts", tiebreak="rid", direction="sideways")


def test_asof_join_null_tiebreak(spark):
    """A matched right row with NULL tiebreak must not leak rank>1
    duplicates: exactly one output row per left row, and the newest-ts
    match still wins."""
    from datetime import datetime

    from kinesis_log_watcher_spark.operators.relational import asof_join

    t = lambda s: datetime(2024, 1, 1, s)
    left = spark.createDataFrame(
        [(1, 100, t(12)), (2, 100, t(9))], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(100, None, t(8)), (100, 7, t(10)), (100, None, t(11))],
        "k long, rid long, rts timestamp",
    )
    out = asof_join(
        left, right, on="k", left_id="lid",
        left_ts="lts", right_ts="rts", tiebreak="rid",
    ).collect()
    assert len(out) == 2  # one row per left row, no NULL-tiebreak leakage
    got = {r.lid: (r.rid, r.rts) for r in out}
    assert got[1] == (None, t(11))  # newest <=12:00 is the NULL-rid row at 11
    assert got[2] == (None, t(8))   # newest <=09:00 is the NULL-rid row at 8


def test_resize_images_plumbing(spark):
    """Binary→binary mapInPandas resize: exact target size both when
    downsampling and when padding up; deterministic kernel verified
    against a local reference."""
    from kinesis_log_watcher_spark.operators.multimodal import (
        fake_resize,
        resize_images,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "short"), (2, "x" * 1000)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in resize_images(
            with_binary_payload(docs), width=8, height=8,
            resize_fn=fake_resize,
        ).collect()
    }
    assert rows[1].n_bytes_out == 64 and rows[2].n_bytes_out == 64
    assert bytes(rows[1].resized) == fake_resize(b"short", 8, 8)
    assert bytes(rows[2].resized) == fake_resize(b"x" * 1000, 8, 8)
    # padding path repeats the payload; downsampling strides it
    assert bytes(rows[1].resized)[:5] == b"short"
    assert set(bytes(rows[2].resized)) == {ord("x")}


def test_cms_overestimates_and_small_exact(spark):
    """Count-Min property: est >= exact for every key, and with a grid
    far wider than the keyspace (no collisions) est == exact."""
    from kinesis_log_watcher_spark.operators.sketch import cms_build, cms_estimate

    import pyspark.sql.functions as _F

    df = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 30 + [3] * 7 + [4] * 1],
        "user_id long",
    )
    exact = {1: 50, 2: 30, 3: 7, 4: 1}
    # tight grid (collisions possible): est >= exact always
    cms = cms_build(df, "user_id", depth=4, width=4)
    keys = df.select("user_id").distinct()
    est = {
        r["user_id"]: r["est_n"]
        for r in cms_estimate(cms, keys, "user_id", depth=4, width=4).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    # wide grid: 4 keys in 4x1024 buckets -> no collisions -> exact
    cms_w = cms_build(df, "user_id", depth=4, width=1024)
    est_w = {
        r["user_id"]: r["est_n"]
        for r in cms_estimate(cms_w, keys, "user_id", depth=4, width=1024).collect()
    }
    assert est_w == exact
    # the grid never exceeds depth*width rows
    assert cms_w.count() <= 4 * 1024


def test_bloom_no_false_negatives(spark):
    """Bloom property: every member key tests maybe=True (no false
    negatives); the bit set never exceeds m_bits rows."""
    from kinesis_log_watcher_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(k,) for k in range(0, 200, 3)], "k long")
    others = spark.createDataFrame([(k,) for k in range(1, 200, 3)], "k long")
    bits = bloom_build(members, "k", m_bits=256, k=3)
    assert bits.count() <= 256
    got_m = {r["k"]: r["bloom_maybe"]
             for r in bloom_probe(bits, members, "k", m_bits=256, k=3).collect()}
    assert all(got_m.values())  # no false negatives, ever
    got_o = {r["k"]: r["bloom_maybe"]
             for r in bloom_probe(bits, others, "k", m_bits=256, k=3).collect()}
    # some non-members must test negative (the filter is not saturated)
    assert not all(got_o.values())


def test_hll_estimate_merge_and_branches(spark):
    """HLL properties: (1) sketches MERGE — building on two halves and
    MAX-combining registers equals building on the union (the whole
    point of a mergeable NDV sketch); (2) the estimate lands within the
    standard-error envelope; (3) tiny cardinalities route through the
    linear-counting branch and stay near-exact."""
    from pyspark.sql import functions as F

    from kinesis_log_watcher_spark.operators.sketch import hll_build, hll_estimate

    n = 5000
    whole = spark.range(n).select(F.col("id").alias("k"))
    half1 = whole.filter(F.col("k") < n // 2)
    half2 = whole.filter(F.col("k") >= n // 2)

    p = 9  # m=512 -> se ~ 1.04/sqrt(512) ~ 4.6%
    regs_whole = hll_build(whole, "k", p=p)
    merged = (
        hll_build(half1, "k", p=p)
        .unionAll(hll_build(half2, "k", p=p))
        .groupBy("r")
        .agg(F.max("m_rho").alias("m_rho"))
    )
    # merge == rebuild, register for register
    a = {(r["r"]): r["m_rho"] for r in regs_whole.collect()}
    b = {(r["r"]): r["m_rho"] for r in merged.collect()}
    assert a == b

    [est] = hll_estimate(regs_whole, p=p).collect()
    assert abs(est["est_distinct"] - n) / n < 0.2  # ~4 standard errors

    # small-range: 10 keys in 512 registers -> linear counting, near-exact
    tiny = spark.range(10).select(F.col("id").alias("k"))
    [est_t] = hll_estimate(hll_build(tiny, "k", p=p), p=p).collect()
    assert abs(est_t["est_distinct"] - 10) <= 2


def test_hist_quantiles_merge_and_accuracy(spark):
    """Histogram-quantile properties: shard histograms merge by counter
    addition into exactly the whole-input histogram, and the estimate
    sits within one bin width of the true order statistic."""
    from pyspark.sql import functions as F

    from kinesis_log_watcher_spark.operators.sketch import hist_build, hist_quantiles

    n = 2000
    df = spark.range(n).select((F.col("id") % 1000).cast("double").alias("v"))
    kw = dict(lo=0.0, hi=1000.0, nbins=100)

    whole = hist_build(df, "v", **kw)
    merged = (
        hist_build(df.filter(F.col("v") < 500), "v", **kw)
        .unionAll(hist_build(df.filter(F.col("v") >= 500), "v", **kw))
        .groupBy("bin")
        .agg(F.sum("c").alias("c"))
    )
    assert {(r["bin"], r["c"]) for r in whole.collect()} == {
        (r["bin"], r["c"]) for r in merged.collect()
    }

    est = {r["p"]: r["est_value"] for r in hist_quantiles(whole, (50, 95), **kw).collect()}
    # uniform 0..999: true p50=499.5, p95=949.5; bin width 10
    assert abs(est[50] - 499.5) <= 10
    assert abs(est[95] - 949.5) <= 10
