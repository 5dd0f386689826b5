"""Round-6 wave-3 operator tests: Mann-Kendall/Theil-Sen, Spearman,
label propagation, lexical diversity, Zipf fit, blocklist filter,
skyline, weighted median, k-center coreset, chained streaming agg.

Each test re-derives the operator's answer independently (pure Python /
pandas / brute force) rather than re-running the oracle SQL — the
oracle equivalence is the driver gate's job; these pin the semantics."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.queries import registry
from kinesis_log_watcher_spark.queries.base import load


def _q(name):
    return registry()[name].fn


# ---------------------------------------------------------------------------
# Mann-Kendall + Theil-Sen
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_pure_python(spark, sf_dir):
    rows = {
        r.o_orderpriority: r
        for r in _q("revenue_trend_mann_kendall")(spark, sf_dir).collect()
    }
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .count()
        .collect()
    )
    series: dict[str, list[tuple[int, int]]] = {}
    for r in monthly:
        series.setdefault(r.o_orderpriority, []).append((r.m, r["count"]))
    assert set(series) == set(rows)
    for pri, pts in series.items():
        pts.sort()
        n = len(pts)
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                d = pts[j][1] - pts[i][1]
                s += (d > 0) - (d < 0)
                slopes.append(
                    (
                        math.floor(d * 1000.0 / (pts[j][0] - pts[i][0]) + 0.5),
                        pts[i][0],
                        pts[j][0],
                    )
                )
        ties = Counter(v for _, v in pts)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        r = rows[pri]
        assert r.n_months == n
        assert r.s_stat == s
        assert r.var_s_x18 == var18
        assert r.theil_sen_slope_milli == med
        assert r.trend == (
            "increasing" if s > 0 else "decreasing" if s < 0 else "flat"
        )


# ---------------------------------------------------------------------------
# Spearman via joint histogram == pandas average-rank Spearman
# ---------------------------------------------------------------------------


def test_spearman_matches_pandas_ranks(spark, sf_dir):
    out = {
        r.l_returnflag: r
        for r in _q("spearman_quantity_discount")(spark, sf_dir).collect()
    }
    pdf = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
        .toPandas()
    )
    pdf["qv"] = (pdf.l_quantity + 0.5).apply(math.floor)
    pdf["dv"] = (pdf.l_discount * 10000 + 0.5).apply(math.floor)
    for flag, g in pdf.groupby("l_returnflag"):
        rx = g.qv.rank(method="average")
        ry = g.dv.rank(method="average")
        n = len(g)
        # identical integer rank2 encoding (2x average rank)
        r2x, r2y = (2 * rx).astype("int64"), (2 * ry).astype("int64")
        sx, sy = int(r2x.sum()), int(r2y.sum())
        sxx = int((r2x * r2x).sum())
        syy = int((r2y * r2y).sum())
        sxy = int((r2x * r2y).sum())
        num = float(n) * float(sxy) - float(sx) * float(sy)
        den = (float(n) * float(sxx) - float(sx) * float(sx)) * (
            float(n) * float(syy) - float(sy) * float(sy)
        )
        expect = math.floor(num / math.sqrt(den) * 1000000 + 0.5)
        assert out[flag].n_rows == n
        assert out[flag].rho_micro == expect
        # a rank correlation lives in [-1, 1]
        assert -1000000 <= out[flag].rho_micro <= 1000000


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def test_lpa_matches_python_sync_rounds(spark, sf_dir):
    from kinesis_log_watcher_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    edges = [
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.35)
        .select("vec_a", "vec_b")
        .collect()
    ]
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {v: v for v in nbrs}
    for _ in (1, 2):
        new = {}
        for v, ns in nbrs.items():
            votes = Counter(labels[u] for u in ns)
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    sizes = Counter(labels.values())
    out = _q("community_label_propagation")(spark, sf_dir).collect()
    assert len(out) == len(labels)
    for r in out:
        assert labels[r.vec_id] == r.community
        assert sizes[r.community] == r.community_size


# ---------------------------------------------------------------------------
# Lexical diversity
# ---------------------------------------------------------------------------


def test_lexical_diversity_matches_python(spark, sf_dir):
    out = {
        r.doc_id: r for r in _q("doc_lexical_diversity")(spark, sf_dir).collect()
    }
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    )
    assert len(out) == len(docs)
    for d in docs:
        f = Counter(d.text.split(" "))
        n = sum(f.values())
        r = out[d.doc_id]
        assert r.n_tokens == n
        assert r.n_distinct == len(f)
        assert r.ttr_micro == len(f) * 1000000 // n
        rep = sum(c * (c - 1) for c in f.values())
        assert r.simpson_micro == (
            0 if n < 2 else rep * 1000000 // (n * (n - 1))
        )
        assert r.hapax_micro == (
            sum(1 for c in f.values() if c == 1) * 1000000 // n
        )


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------


def test_zipf_slope_negative_and_matches_python(spark, sf_dir):
    out = {r.lang: r for r in _q("zipf_law_fit")(spark, sf_dir).collect()}
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select("lang", "text")
        .collect()
    )
    freq: dict[str, Counter] = {}
    for d in docs:
        freq.setdefault(d.lang, Counter()).update(d.text.split(" "))
    assert set(out) == set(freq)
    for lang, f in freq.items():
        ranked = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        pts = [
            (
                math.floor(math.log(i + 1) * 1000000 + 0.5),
                math.floor(math.log(c) * 1000000 + 0.5),
            )
            for i, (_, c) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        den = float(n) * float(sxx) - float(sx) * float(sx)
        num = float(n) * float(sxy) - float(sx) * float(sy)
        r = out[lang]
        assert r.n_points == n
        assert r.slope_micro == math.floor(num / den * 1000000 + 0.5)
        # Zipfian frequency spectra decay: the exponent is negative
        assert r.slope_micro < 0


# ---------------------------------------------------------------------------
# Blocklist filter
# ---------------------------------------------------------------------------


def test_blocklist_matches_python_containment(spark, sf_dir):
    from kinesis_log_watcher_spark.queries.round6b import _BLOCKLIST

    out = {
        r.category: r for r in _q("blocklist_phrase_filter")(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    agg: dict[str, dict] = {}
    for d in docs:
        if d.text is None:
            continue
        for phrase, cat in _BLOCKLIST:
            if phrase in d.text:
                a = agg.setdefault(
                    cat, {"docs": set(), "hits": 0, "phrases": set()}
                )
                a["docs"].add(d.doc_id)
                a["hits"] += 1
                a["phrases"].add(phrase)
    assert set(out) == set(agg)
    for cat, a in agg.items():
        assert out[cat].n_docs == len(a["docs"])
        assert out[cat].n_hits == a["hits"]
        assert out[cat].n_phrases_hit == len(a["phrases"])


# ---------------------------------------------------------------------------
# Skyline
# ---------------------------------------------------------------------------


def test_pareto_frontier_nondominated_and_complete(spark, sf_dir):
    out = _q("pareto_frontier_orders")(spark, sf_dir).collect()
    pts = (
        load(spark, sf_dir, "orders")
        .select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("dd"),
        )
        .collect()
    )
    best: dict[int, int] = {}
    cnt: Counter = Counter()
    for p in pts:
        best[p.cents] = max(best.get(p.cents, -(10**9)), p.dd)
        cnt[(p.cents, p.dd)] += 1
    expect = {
        (c, d)
        for c, d in best.items()
        if all(hd < d for hc, hd in best.items() if hc > c)
    }
    got = {(r.price_cents, r.last_day) for r in out}
    assert got == expect
    for r in out:
        assert r.n_orders == cnt[(r.price_cents, r.last_day)]
    # the staircase is strictly monotone: higher price -> strictly
    # earlier last day
    srt = sorted(got)
    for (c1, d1), (c2, d2) in zip(srt, srt[1:]):
        assert c1 < c2 and d1 > d2


# ---------------------------------------------------------------------------
# Weighted median
# ---------------------------------------------------------------------------


def test_weighted_median_matches_python(spark, sf_dir):
    out = {
        r.l_returnflag: r
        for r in _q("weighted_median_price")(spark, sf_dir).collect()
    }
    rows = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    hist: dict[str, Counter] = {}
    for r in rows:
        cents = math.floor(r.l_extendedprice * 100 + 0.5)
        hist.setdefault(r.l_returnflag, Counter())[cents] += math.floor(
            r.l_quantity + 0.5
        )
    for flag, h in hist.items():
        tot = sum(h.values())
        cum = 0
        for cents in sorted(h):
            cum += h[cents]
            if 2 * cum >= tot:
                break
        r = out[flag]
        assert r.wmedian_cents == cents
        assert r.total_qty_units == tot
        assert r.n_prices == len(h)


# ---------------------------------------------------------------------------
# k-center coreset
# ---------------------------------------------------------------------------


def test_kcenter_matches_python_greedy(spark, sf_dir):
    out = sorted(
        _q("kcenter_coreset_greedy")(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    q = {
        r.vec_id: [math.floor(float(x) * 10000000 + 0.5) for x in r.embedding]
        for r in emb
    }
    n2 = {v: sum(x * x for x in qe) for v, qe in q.items()}

    def d2(a, b):
        return n2[a] + n2[b] - 2 * sum(x * y for x, y in zip(q[a], q[b]))

    # seed: max norm2, tie-break min id
    c = max(n2, key=lambda v: (n2[v], -v))
    dist = {v: d2(v, c) for v in q}
    expect = []
    for rnd in (1, 2, 3):
        far = max(dist, key=lambda v: (dist[v], -v))
        expect.append((rnd, c, dist[far]))
        c = far
        for v in q:
            dist[v] = min(dist[v], d2(v, c))
    assert [(r.round, r.center_id, r.radius_d2) for r in out] == expect
    # radii are non-increasing as centers are added
    assert out[0].radius_d2 >= out[1].radius_d2 >= out[2].radius_d2


def test_kcenter_empty_input(spark, sf_dir, tmp_path):
    load(spark, sf_dir, "embeddings").limit(0).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = _q("kcenter_coreset_greedy")(spark, str(tmp_path)).collect()
    assert out == []


# ---------------------------------------------------------------------------
# Chained streaming aggregation
# ---------------------------------------------------------------------------


def test_two_level_stream_equals_batch(spark, sf_dir):
    out = _q("stream_two_level_agg")(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    b = ev.groupBy(
        F.window("ts", "10 minutes").alias("w"), "event_type"
    ).agg(F.count("*").cast("long").alias("n"))
    expect = (
        b.groupBy(F.window(F.col("w.start"), "1 hour").alias("h"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("total_n"),
            F.max("n").cast("long").alias("max_bucket_n"),
        )
        .select(
            F.col("h.start").alias("hour_start"),
            "event_type",
            "n_buckets",
            "total_n",
            "max_bucket_n",
        )
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Two-sample KS
# ---------------------------------------------------------------------------


def test_ks_matches_python_exact(spark, sf_dir):
    r = _q("ks_two_sample_price")(spark, sf_dir).collect()[0]
    rows = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    ha, hr = Counter(), Counter()
    for x in rows:
        cents = math.floor(x.l_extendedprice * 100 + 0.5)
        (ha if x.l_returnflag == "A" else hr)[cents] += 1
    na, nr = sum(ha.values()), sum(hr.values())
    cum_a = cum_r = 0
    best = (-1, None)
    for cents in sorted(set(ha) | set(hr)):
        cum_a += ha.get(cents, 0)
        cum_r += hr.get(cents, 0)
        num = abs(cum_a * nr - cum_r * na)
        if num > best[0]:
            best = (num, cents)
    assert (r.n_a, r.n_r) == (na, nr)
    assert r.d_stat_micro == best[0] * 1000000 // (na * nr)
    assert r.d_at_cents == best[1]
    assert 0 <= r.d_stat_micro <= 1000000


# ---------------------------------------------------------------------------
# Assortativity + modularity on the shared near-dup graph
# ---------------------------------------------------------------------------


def _near_dup_edges(spark, sf_dir):
    from kinesis_log_watcher_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    return [
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.35)
        .select("vec_a", "vec_b")
        .collect()
    ]


def test_assortativity_matches_python(spark, sf_dir):
    r = _q("neardup_graph_assortativity")(spark, sf_dir).collect()[0]
    edges = _near_dup_edges(spark, sf_dir)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    pts = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    denx = float(n) * float(sxx) - float(sx) * float(sx)
    deny = float(n) * float(syy) - float(sy) * float(sy)
    expect = (
        0
        if denx <= 0 or deny <= 0
        else math.floor(
            (float(n) * float(sxy) - float(sx) * float(sy))
            / math.sqrt(denx * deny)
            * 1000000
            + 0.5
        )
    )
    assert r.n_edges == len(edges)
    assert r.r_micro == expect
    assert -1000000 <= r.r_micro <= 1000000


def test_modularity_matches_python(spark, sf_dir):
    r = _q("community_modularity")(spark, sf_dir).collect()[0]
    edges = _near_dup_edges(spark, sf_dir)
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {v: v for v in nbrs}
    for _ in (1, 2):
        labels = {
            v: max(
                Counter(labels[u] for u in ns).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for v, ns in nbrs.items()
        }
    m = len(edges)
    e_in = sum(1 for a, b in edges if labels[a] == labels[b])
    dc = Counter()
    for v, ns in nbrs.items():
        dc[labels[v]] += len(ns)
    sum_dc2 = sum(d * d for d in dc.values())
    q = math.floor(
        (4.0 * m * e_in - float(sum_dc2)) / (4.0 * m * m) * 1000000 + 0.5
    )
    assert r.n_edges == m
    assert r.n_communities == len(dc)
    assert r.q_micro == q
    # Q is bounded in [-1/2, 1)
    assert -500000 <= r.q_micro < 1000000


# ---------------------------------------------------------------------------
# Markov entropy rate
# ---------------------------------------------------------------------------


def test_entropy_rate_matches_python(spark, sf_dir):
    out = {
        r.event_type: r
        for r in _q("event_markov_entropy_rate")(spark, sf_dir).collect()
    }
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    tc: Counter = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            tc[(a.event_type, b.event_type)] += 1
    ni = Counter()
    for (cur, _), n in tc.items():
        ni[cur] += n
    for cur, n in ni.items():
        s = sum(
            nij * math.floor(math.log(n / nij) * 1000000000 + 0.5)
            for (c, _), nij in tc.items()
            if c == cur
        )
        r = out[cur]
        assert r.n_from == n
        assert r.n_successors == sum(1 for (c, _) in tc if c == cur)
        assert r.h_cond_nano == s // n
        # conditional entropy of a k-way split is <= ln(k)
        assert 0 <= r.h_cond_nano <= math.log(max(r.n_successors, 1)) * 1e9 + 1


# ---------------------------------------------------------------------------
# Bitmap rollup
# ---------------------------------------------------------------------------


def test_bitmap_matches_python(spark, sf_dir):
    out = {
        r.p_brand: r for r in _q("part_status_bitmap")(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_linestatus"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(part, li.l_partkey == part.p_partkey).collect()
    masks: dict[str, int] = {}
    lines: Counter = Counter()
    for r in rows:
        bit = {"A": 0, "N": 1, "R": 2}[r.l_returnflag] * 2 + (
            0 if r.l_linestatus == "F" else 1
        )
        masks[r.p_brand] = masks.get(r.p_brand, 0) | (1 << bit)
        lines[r.p_brand] += 1
    assert set(out) == set(masks)
    for brand, mask in masks.items():
        assert out[brand].status_mask == mask
        assert out[brand].n_statuses == bin(mask).count("1")
        assert out[brand].n_lines == lines[brand]


# ---------------------------------------------------------------------------
# FD discovery
# ---------------------------------------------------------------------------


def test_fd_discovery_matches_python(spark, sf_dir):
    from kinesis_log_watcher_spark.queries.round6b import _FD_PAIRS

    out = {r.fd: r for r in _q("orders_fd_discovery")(spark, sf_dir).collect()}
    rows = load(spark, sf_dir, "orders").collect()
    for l, rr in _FD_PAIRS:
        groups: dict[str, set] = {}
        for row in rows:
            groups.setdefault(str(row[l]), set()).add(str(row[rr]))
        r = out[f"{l}->{rr}"]
        assert r.n_lhs == len(groups)
        assert r.n_violating == sum(1 for s in groups.values() if len(s) > 1)
        assert r.max_rhs_card == max(len(s) for s in groups.values())
        assert r.holds == (1 if r.n_violating == 0 else 0)
    # the primary key FD must hold; a many-to-many pair must not
    assert out["o_orderkey->o_custkey"].holds == 1
    assert out["o_custkey->o_orderstatus"].holds == 0


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def test_cusum_matches_python_fold(spark, sf_dir):
    out = sorted(
        _q("revenue_cusum_changepoint")(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    daily: Counter = Counter()
    for r in load(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect():
        daily[str(r.o_orderdate.date())] += math.floor(
            r.o_totalprice * 100 + 0.5
        )
    days = sorted(daily)
    mu = sum(daily.values()) // len(days)
    # the classic sequential recurrence the closed form must equal
    s_pos = s_neg = 0
    expect = []
    for d in days:
        x = daily[d] - mu
        s_pos = max(0, s_pos + x)
        s_neg = max(0, s_neg - x)
        expect.append((d, daily[d], s_pos, s_neg))
    assert len(out) == len(expect)
    for r, (d, cents, sp, sn) in zip(out, expect):
        assert (r.day, r.cents, r.cusum_pos, r.cusum_neg) == (d, cents, sp, sn)
        assert r.breach == (1 if sp > mu or sn > mu else 0)


# ---------------------------------------------------------------------------
# Greedy bigram generation
# ---------------------------------------------------------------------------


def test_generation_matches_python_walk(spark, sf_dir):
    out = sorted(
        _q("bigram_greedy_generation")(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("text")
        .collect()
    )
    uni: Counter = Counter()
    bi: Counter = Counter()
    for d in docs:
        ts = d.text.split(" ")
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    tok = min(t for t, f in uni.items() if f == max(uni.values()))
    expect = [(1, tok)]
    for step in range(2, 9):
        succ = {w2: c for (w1, w2), c in bi.items() if w1 == tok}
        if not succ:
            break
        cmax = max(succ.values())
        tok = min(w for w, c in succ.items() if c == cmax)
        expect.append((step, tok))
    assert [(r.step, r.tok) for r in out] == expect
    # every emitted token is a real corpus token
    assert all(t in uni for _, t in expect)


# ---------------------------------------------------------------------------
# Cogrouped reconcile
# ---------------------------------------------------------------------------


def test_cogroup_reconcile_matches_join(spark, sf_dir):
    out = {r.id: r for r in _q("cogroup_order_event_reconcile")(spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    events = load(spark, sf_dir, "events").select("user_id", "value").collect()
    oc, ocents = Counter(), Counter()
    for r in orders:
        oc[r.o_custkey] += 1
        ocents[r.o_custkey] += math.floor(r.o_totalprice * 100 + 0.5)
    ec, emilli = Counter(), Counter()
    for r in events:
        ec[r.user_id] += 1
        emilli[r.user_id] += math.floor(r.value * 1000 + 0.5)
    ids = set(oc) | set(ec)
    assert set(out) == ids
    for i in ids:
        r = out[i]
        assert r.n_orders == oc.get(i, 0)
        assert r.order_cents == ocents.get(i, 0)
        assert r.n_events == ec.get(i, 0)
        assert r.value_milli == emilli.get(i, 0)
        assert r.presence == (
            "both"
            if i in oc and i in ec
            else ("orders_only" if i in oc else "events_only")
        )


# ---------------------------------------------------------------------------
# ANOVA F
# ---------------------------------------------------------------------------


def test_anova_matches_python(spark, sf_dir):
    r = _q("priority_anova_f")(spark, sf_dir).collect()[0]
    rows = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups: dict[str, list[float]] = {}
    for x in rows:
        groups.setdefault(x.o_orderpriority, []).append(x.o_totalprice)
    # replicate the ordered fold: per-group exact decimal moments ->
    # double, combined left-to-right in priority order
    from decimal import Decimal

    nn = ssum = sssum = tsum = 0.0
    for pri in sorted(groups):
        vals = [Decimal(str(round(v, 2))) for v in groups[pri]]
        n = len(vals)
        s = float(sum(vals))
        ss = float(sum(v * v for v in vals))
        nn += float(n)
        ssum += s
        sssum += ss
        tsum += s * s / float(n)
    k = len(groups)
    ssb = tsum - ssum * ssum / nn
    ssw = sssum - tsum
    expect = math.floor((ssb / (k - 1)) / (ssw / (nn - k)) * 1000000 + 0.5)
    assert r.k_groups == k
    assert r.n_total == int(nn)
    assert r.f_stat_micro == expect
    assert r.f_stat_micro >= 0


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def test_rfm_partitions_customers_into_balanced_quintiles(spark, sf_dir):
    out = _q("customer_rfm_segmentation")(spark, sf_dir).collect()
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in out) == n_cust
    # each axis's quintiles are NTILE-balanced (sizes differ by <= 1)
    for axis in ("r_score", "f_score", "m_score"):
        per = Counter()
        for r in out:
            per[r[axis]] += r.n_customers
        assert set(per) == {1, 2, 3, 4, 5}
        assert max(per.values()) - min(per.values()) <= 1
    # monetary quintile 1 outearns quintile 5 in total
    m1 = sum(r.total_cents for r in out if r.m_score == 1)
    m5 = sum(r.total_cents for r in out if r.m_score == 5)
    assert m1 > m5


# ---------------------------------------------------------------------------
# Conformal calibration
# ---------------------------------------------------------------------------


def test_conformal_quantile_and_coverage(spark, sf_dir):
    out = {
        r.event_type: r
        for r in _q("conformal_interval_calibration")(spark, sf_dir).collect()
    }
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
        .collect()
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(
            (math.floor(r.value * 1000 + 0.5), r.event_id)
        )
    for t, vals in groups.items():
        n = len(vals)
        mean = sum(v for v, _ in vals) // n
        scores = sorted((abs(v - mean), eid) for v, eid in vals)
        k = min(n, math.ceil(0.9 * (n + 1)))
        qhat = scores[k - 1][0]
        cov = sum(1 for s, _ in scores if s <= qhat) * 1000000 // n
        r = out[t]
        assert r.n == n
        assert r.qhat_milli == qhat
        assert r.coverage_micro == cov
        # finite-sample conformal guarantee: coverage >= 90%
        assert r.coverage_micro >= 900000


# ---------------------------------------------------------------------------
# Streaming CUSUM
# ---------------------------------------------------------------------------


def test_stream_cusum_equals_batch_fold(spark, sf_dir):
    from kinesis_log_watcher_spark.streaming.cusum import (
        TARGET_MILLI,
        THRESHOLD_MILLI,
    )

    out = {
        r.event_type: r
        for r in _q("stream_cusum_alerts")(spark, sf_dir).collect()
    }
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(r)
    for t, rows in groups.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        p = pmin = pmax = breaches = 0
        for r in rows:
            p += math.floor(r.value * 1000 + 0.5) - TARGET_MILLI
            pmin = min(pmin, p)
            pmax = max(pmax, p)
            if p - pmin > THRESHOLD_MILLI or pmax - p > THRESHOLD_MILLI:
                breaches += 1
        o = out[t]
        assert o.n == len(rows)
        assert o.cusum_pos == p - pmin
        assert o.cusum_neg == pmax - p
        assert o.n_breaches == breaches


# ---------------------------------------------------------------------------
# Custom Python DataSource (Kinesis simulator)
# ---------------------------------------------------------------------------


def test_sim_source_batch_stream_agree(spark, sf_dir):
    batch = {
        (r.short_host, r.level): r
        for r in _q("kinesis_sim_batch_scan")(spark, sf_dir).collect()
    }
    stream = {
        (r.short_host, r.level): r
        for r in _q("stream_kinesis_sim_scan")(spark, sf_dir).collect()
    }
    assert batch.keys() == stream.keys() and len(batch) == 12
    for k, b in batch.items():
        s = stream[k]
        assert (b.n, b.sum_latency_ms, b.min_seq, b.max_seq) == (
            s.n,
            s.sum_latency_ms,
            s.min_seq,
            s.max_seq,
        )


def test_sim_source_per_shard_order_and_layout(spark):
    from kinesis_log_watcher_spark.sources.kinesis_sim import (
        register_sim_source,
    )

    register_sim_source(spark)
    raw = (
        spark.read.format("kinesis_sim")
        .option("shards", "3")
        .option("recordsPerShard", "40")
        .load()
    )
    # S2 parity: one input partition per shard, records in sequence
    # order within each partition
    parts = raw.select("shardId", "sequenceNumber").rdd.glom().collect()
    nonempty = [p for p in parts if p]
    assert len(nonempty) == 3
    for p in nonempty:
        shards = {r.shardId for r in p}
        assert len(shards) == 1
        seqs = [r.sequenceNumber for r in p]
        assert seqs == sorted(seqs) and len(seqs) == 40


def test_sim_source_checkpoint_resume(spark, tmp_path):
    """W4 parity: the per-shard sequence offset map checkpoints and
    resumes — a restart with MORE available records reads only the
    delta (no replays, no gaps), like the reference's
    latestSequenceNumber tracking (main.go:320,362)."""
    from kinesis_log_watcher_spark.sources.kinesis_sim import (
        register_sim_source,
    )

    register_sim_source(spark)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run(per_shard: int):
        s = (
            spark.readStream.format("kinesis_sim")
            .option("shards", "2")
            .option("recordsPerShard", str(per_shard))
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run(100)  # first run: offsets advance to 100 per shard
    first = spark.read.parquet(out).count()
    assert first == 200
    run(250)  # the "stream grew"; resume must read ONLY the delta
    rows = spark.read.parquet(out).select("shardId", "sequenceNumber").collect()
    assert len(rows) == 500  # 2 shards x 250, no duplicates from rerun
    assert len({(r.shardId, r.sequenceNumber) for r in rows}) == 500


# ---------------------------------------------------------------------------
# Zone-map skipping audit
# ---------------------------------------------------------------------------


def test_zone_map_zorder_dominates_natural(spark, sf_dir):
    out = _q("zone_map_skip_audit")(spark, sf_dir).collect()
    by = {(r.layout, r.pred_id): r for r in out}
    preds = {p for _, p in by if True}
    assert {l for l, _ in by} == {"natural", "zorder"}
    total_rows = (
        load(spark, sf_dir, "lineitem").count()
    )
    for p in {pid for _, pid in by}:
        nat, zo = by[("natural", p)], by[("zorder", p)]
        # the Z-ordered layout prunes at least as much as arrival order
        # on a ship-date predicate (that is the point of Z-ordering)
        assert zo.skip_micro >= nat.skip_micro
        for r in (nat, zo):
            assert 0 <= r.n_skippable <= r.n_buckets
            assert 0 <= r.rows_skipped <= total_rows
    # and materially more on at least one predicate
    assert any(
        by[("zorder", p)].skip_micro > by[("natural", p)].skip_micro
        for p in {pid for _, pid in by}
    )


def test_customer_l_diversity_partitions_classes(spark, sf_dir):
    out = _q("customer_l_diversity")(spark, sf_dir).collect()
    n_classes = (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .count()
    )
    n_rows = load(spark, sf_dir, "customer").count()
    assert sum(r.n_classes for r in out) == n_classes
    assert sum(r.n_rows for r in out) == n_rows
    for r in out:
        assert r.violates_l3 == (r.l_distinct < 3)


# ---------------------------------------------------------------------------
# Runs test
# ---------------------------------------------------------------------------


def test_runs_test_matches_python(spark, sf_dir):
    r = _q("revenue_runs_test")(spark, sf_dir).collect()[0]
    daily: Counter = Counter()
    for x in load(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect():
        daily[str(x.o_orderdate.date())] += math.floor(
            x.o_totalprice * 100 + 0.5
        )
    days = sorted(daily)
    n = len(days)
    m = sorted(
        (daily[d], d) for d in days
    )[(n + 1) // 2 - 1][0]
    signs = [1 if daily[d] > m else 0 for d in days]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), n - sum(signs)
    er = 1.0 + 2.0 * n1 * n2 / n
    vr = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    expect = math.floor((runs - er) / math.sqrt(vr) * 1000000 + 0.5)
    assert (r.n_days, r.n_above, r.n_below, r.n_runs) == (n, n1, n2, runs)
    assert r.z_micro == expect


def test_render_e2e_lines_are_exact(spark, sf_dir):
    """Spot-check the rendered lines themselves (the registry row only
    hash-sums them): pull a few through build_lines and compare to the
    literal expected strings."""
    from kinesis_log_watcher_spark.queries.round6b import _E2E_TEMPLATE
    from kinesis_log_watcher_spark.sources.kinesis_sim import (
        register_sim_source,
    )
    from kinesis_log_watcher_spark.watcher import build_lines

    register_sim_source(spark)
    raw = (
        spark.read.format("kinesis_sim")
        .option("shards", "1")
        .option("recordsPerShard", "4")
        .load()
    )
    lines = sorted(r.line for r in build_lines(raw, _E2E_TEMPLATE).collect())
    assert lines == [
        "i-0000 12:00:00 info 0",
        "i-0000 12:00:01 warn 7",
        "i-0000 12:00:02 error 14",
        "i-0000 12:00:03 info 21",
    ]


def test_stream_scd2_enrich_equals_batch_join(spark, sf_dir):
    from kinesis_log_watcher_spark.queries.warehouse import _scd2_dim

    out = {
        r.c_mktsegment: r
        for r in _q("stream_scd2_enrich")(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("event_id") % 21).alias("event_day")
    )
    scd = _scd2_dim(spark, sf_dir)
    expect = {
        r.c_mktsegment: r
        for r in ev.join(
            scd,
            (ev["user_id"] == scd["c_custkey"])
            & (ev["event_day"] >= scd["from_day"])
            & (scd["to_day"].isNull() | (ev["event_day"] < scd["to_day"])),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("bal_cents").cast("long").alias("asof_bal_cents"),
        )
        .collect()
    }
    assert out.keys() == expect.keys() and len(out) > 0
    for k, e in expect.items():
        assert (out[k].n_events, out[k].asof_bal_cents) == (
            e.n_events,
            e.asof_bal_cents,
        )
    # point-in-time semantics: a fact matches AT MOST one version (an
    # event before its customer's first version matches none) — the
    # join must never fan a fact out across versions
    j = ev.join(
        scd,
        (ev["user_id"] == scd["c_custkey"])
        & (ev["event_day"] >= scd["from_day"])
        & (scd["to_day"].isNull() | (ev["event_day"] < scd["to_day"])),
    )
    assert j.count() == j.select("event_id").distinct().count()


# ---------------------------------------------------------------------------
# Plan-shape pins for the scale-sensitive wave-3 rewrites
# ---------------------------------------------------------------------------


def _plan(spark, sf_dir, name: str) -> str:
    df = _q(name)(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_spearman_plans_without_ranking_window(spark, sf_dir):
    # the whole point of the joint-histogram decomposition: ranks come
    # from cumulative counts over the tiny value-margin relations, so
    # the plan must not rank the fact table row-by-row
    plan = _plan(spark, sf_dir, "spearman_quantity_discount")
    assert "row_number" not in plan


def test_bucketed_prefix_windows_are_partitioned(spark, sf_dir):
    # ks/pareto prefix scans run per-bucket: every window spec in the
    # plan carries a partition expression (no global single-partition
    # staircase except the trivially-bounded bucket prefix relation)
    for name in ("ks_two_sample_price", "pareto_frontier_orders"):
        plan = _plan(spark, sf_dir, name)
        assert "windowspecdefinition(bucket" in plan, name


def test_scene_cuts_fire_exactly_at_the_level_shift(spark, sf_dir):
    out = {
        r.doc_id: r for r in _q("multimodal_scene_cuts")(spark, sf_dir).collect()
    }
    assert len(out) == 200
    for d, r in out.items():
        assert r.n_frames == 8
        # exact recompute of the framed energies and the >=4x ratio rule
        cut = 32 + (d % 3) * 32
        x = [
            (3 if i >= cut else 1) * ((d * 7 + i) % 200 - 100)
            for i in range(128)
        ]
        en = [
            sum(v * v for v in x[f * 16 : (f + 1) * 16]) for f in range(8)
        ]
        cuts = [
            f
            for f in range(1, 8)
            if en[f] > 4 * en[f - 1] or 4 * en[f] < en[f - 1]
        ]
        assert r.n_cuts == len(cuts), d
        assert r.first_cut_frame == (cuts[0] if cuts else -1), d
    # the 9x level shifts make cuts common corpus-wide (per-doc firing
    # depends on base-frame ratios; the exact per-doc pin is above)
    assert sum(r.n_cuts for r in out.values()) >= 200


def test_twoway_anova_matches_python(spark, sf_dir):
    from decimal import Decimal

    r = _q("flag_status_anova_twoway")(spark, sf_dir).collect()[0]
    rows = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).collect()
    cells: dict[tuple, list] = {}
    for x in rows:
        cells.setdefault((x.l_returnflag, x.l_linestatus), []).append(
            Decimal(str(round(x.l_quantity, 2)))
        )
    nn = sum(len(v) for v in cells.values())
    sg = float(sum(sum(v) for v in cells.values()))
    ssg = float(sum(sum(q * q for q in v) for v in cells.values()))
    t_cells = 0.0
    for k in sorted(cells):
        v = cells[k]
        t_cells += float(sum(v)) ** 2 / len(v)
    avals = sorted({a for a, _ in cells})
    bvals = sorted({b for _, b in cells})
    t_a = 0.0
    for a in avals:
        s = float(sum(sum(v) for (aa, _), v in cells.items() if aa == a))
        n = sum(len(v) for (aa, _), v in cells.items() if aa == a)
        t_a += s * s / n
    t_b = 0.0
    for b in bvals:
        s = float(sum(sum(v) for (_, bb), v in cells.items() if bb == b))
        n = sum(len(v) for (_, bb), v in cells.items() if bb == b)
        t_b += s * s / n
    cf = sg * sg / nn
    mse = (ssg - t_cells) / (nn - len(cells))
    ka, kb = len(avals), len(bvals)
    f_a = (t_a - cf) / (ka - 1) / mse
    f_b = (t_b - cf) / (kb - 1) / mse
    f_i = ((t_cells - cf) - (t_a - cf) - (t_b - cf)) / (
        (ka - 1) * (kb - 1)
    ) / mse
    assert (r.n_total, r.k_flag, r.k_status) == (nn, ka, kb)
    assert r.f_flag_micro == math.floor(f_a * 1000000 + 0.5)
    assert r.f_status_micro == math.floor(f_b * 1000000 + 0.5)
    assert r.f_interaction_micro == math.floor(f_i * 1000000 + 0.5)


def test_nprobe_curve_is_monotone(spark, sf_dir):
    out = sorted(
        _q("ann_nprobe_recall_curve")(spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in out] == [1, 2, 4]
    # probing more cells can only help recall and grows candidates
    for a, b in zip(out, out[1:]):
        assert b.recall_micro >= a.recall_micro
        assert b.cand_pairs >= a.cand_pairs
    for r in out:
        assert 0 <= r.recall_micro <= 1000000
        assert r.n_hit <= r.n_truth


def test_periodogram_matches_python(spark, sf_dir):
    out = {
        r.period_days: r
        for r in _q("revenue_periodogram")(spark, sf_dir).collect()
    }
    daily: Counter = Counter()
    for r in load(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect():
        daily[str(r.o_orderdate.date())] += math.floor(
            r.o_totalprice * 100 + 0.5
        )
    days = sorted(daily)
    n = len(days)
    mu = sum(daily.values()) // n
    xs = [daily[d] - mu for d in days]
    for p in (7, 30, 91):
        sc = sum(
            x * math.floor(math.cos(2 * math.pi * t / p) * 1000 + 0.5)
            for t, x in enumerate(xs)
        )
        ss = sum(
            x * math.floor(math.sin(2 * math.pi * t / p) * 1000 + 0.5)
            for t, x in enumerate(xs)
        )
        sxx = float(sum(x * x for x in xs))
        power = math.floor(
            (float(sc) * float(sc) + float(ss) * float(ss))
            / 1000000.0
            / (sxx * float(n) / 2.0)
            * 1000000
            + 0.5
        )
        r = out[p]
        assert r.n_days == n
        assert r.power_micro == power
        assert r.power_micro >= 0


def test_embedding_drift_matches_python(spark, sf_dir):
    out = {
        r.label: r for r in _q("embedding_label_drift")(spark, sf_dir).collect()
    }
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("label").isNotNull())
        .collect()
    )
    sums: dict[tuple, list] = {}
    counts: Counter = Counter()
    for r in emb:
        half = r.vec_id % 2
        key = (r.label, half)
        q = [math.floor(float(x) * 10000000 + 0.5) for x in r.embedding]
        if key not in sums:
            sums[key] = [0] * len(q)
        sums[key] = [a + b for a, b in zip(sums[key], q)]
        counts[key] += 1
    labels = {l for l, _ in sums}
    for l in labels:
        sa, sb = sums.get((l, 0)), sums.get((l, 1))
        if sa is None or sb is None:
            continue
        dot = float(sum(x * y for x, y in zip(sa, sb)))
        naa = float(sum(x * x for x in sa))
        nbb = float(sum(x * x for x in sb))
        expect = (
            0
            if naa <= 0 or nbb <= 0
            else math.floor(dot / math.sqrt(naa * nbb) * 1000000 + 0.5)
        )
        r = out[l]
        assert r.n_first == counts[(l, 0)]
        assert r.n_second == counts[(l, 1)]
        assert r.centroid_cos_micro == expect
        # a cosine lives in [-1, 1] (the synthetic labels are not
        # guaranteed to cluster, so no positivity claim)
        assert -1000000 <= r.centroid_cos_micro <= 1000000


def test_2core_peeling_matches_python(spark, sf_dir):
    out = {r.round: r for r in _q("neardup_graph_2core")(spark, sf_dir).collect()}
    edges = set(_near_dup_edges(spark, sf_dir))
    nodes = {v for e in edges for v in e}
    assert (out[0].n_nodes, out[0].n_edges) == (len(nodes), len(edges))
    cur = set(edges)
    for rnd in (1, 2, 3):
        deg = Counter()
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= 2}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        assert (out[rnd].n_nodes, out[rnd].n_edges) == (len(keep), len(cur))
    # peeling only shrinks
    for a, b in zip(sorted(out), sorted(out)[1:]):
        assert out[b].n_nodes <= out[a].n_nodes
        assert out[b].n_edges <= out[a].n_edges


def test_systematic_sample_quota_and_determinism(spark, sf_dir):
    import hashlib

    out = {
        r.source: r
        for r in _q("systematic_sample_per_source")(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents").select("source", "doc_id").collect()
    groups: dict[str, list[int]] = {}
    for d in docs:
        groups.setdefault(d.source, []).append(d.doc_id)
    for src, ids in groups.items():
        ordered = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
        n = len(ids)
        k = 1 if n <= 20 else -(-n // 20)
        picked = ordered[::k]
        r = out[src]
        assert r.n_docs == n
        assert r.k_step == k
        assert r.n_sampled == len(picked)
        assert r.sampled_id_sum == sum(picked)
        # the every-k-th identity: exactly ceil(n/k) rows selected
        assert r.n_sampled == -(-n // k)


def test_pinball_loss_matches_python(spark, sf_dir):
    out = {
        r.event_type: r for r in _q("pinball_loss_eval")(spark, sf_dir).collect()
    }
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
        .collect()
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(
            (math.floor(r.value * 1000 + 0.5), r.event_id)
        )
    for t, vals in groups.items():
        n = len(vals)
        mean = sum(v for v, _ in vals) // n
        scores = sorted((abs(v - mean), eid) for v, eid in vals)
        k = min(n, math.ceil(0.9 * (n + 1)))
        qhat = scores[k - 1][0]
        tot = sum(
            9 * (s - qhat) if s >= qhat else qhat - s for s, _ in scores
        )
        r = out[t]
        assert (r.n, r.qhat_milli) == (n, qhat)
        assert r.pinball_x10_total == tot
        assert r.pinball_x10_mean == tot // n
        # the conformal q-hat (a ~0.9 sample quantile) should beat a
        # grossly wrong quantile under the tau=0.9 pinball loss
        bad = scores[0][0]  # the minimum score as "forecast"
        bad_tot = sum(
            9 * (s - bad) if s >= bad else bad - s for s, _ in scores
        )
        assert tot <= bad_tot


def test_pareto_8020_matches_python(spark, sf_dir):
    r = _q("supplier_pareto_8020")(spark, sf_dir).collect()[0]
    rev: Counter = Counter()
    for x in load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    ).collect():
        rev[x.l_suppkey] += math.floor(x.l_extendedprice * 100 + 0.5)
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    cum = 0
    for i, (_, c) in enumerate(ordered, start=1):
        cum += c
        if 5 * cum >= 4 * tot:
            break
    assert r.n_suppliers == len(rev)
    assert r.n_for_80pct == i
    assert r.head_share_micro == i * 1000000 // len(rev)
    assert r.revenue_share_micro == cum * 1000000 // tot
    # the crossing point covers at least 80% by construction
    assert r.revenue_share_micro >= 800000
