"""Pins for the round-4 additions: certified top-k soundness, BPE
encode boundary safety, PQ code determinism."""

from __future__ import annotations

import hashlib


def _docs(spark, tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_topk_certificate_is_sound(spark, tmp_path):
    """The emitted bound upper-bounds EVERY non-candidate word's true
    global count — even under a corpus skewed so one word is hot in a
    single shard (the case local-top-only pruning gets wrong)."""
    from kinesis_log_watcher_spark.queries.llm import (
        _TOPK_LOCAL,
        _TOPK_SHARDS,
        topk_words_certified,
    )

    # 40 distinct words with varying frequencies + a 'burst' word whose
    # occurrences all land in the docs of one md5 shard.
    texts = []
    for i in range(120):
        words = [f"w{j}" for j in range(40) if (i + j) % (1 + j % 7) == 0]
        texts.append(" ".join(words * 2) or "w0")
    shard_of = lambda doc_id: (  # noqa: E731
        int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        % _TOPK_SHARDS
    )
    burst_docs = [i for i in range(120) if shard_of(i) == 3][:10]
    for i in burst_docs:
        texts[i] = texts[i] + " " + " ".join(["burst"] * 30)

    sf = _docs(spark, tmp_path, texts)
    out = {r.word: r for r in topk_words_certified(spark, sf).collect()}
    assert out, "top-k must be non-empty"
    (bound,) = {r.bound for r in out.values()}

    # ground truth: exact global counts + exact candidate set
    from collections import Counter, defaultdict

    per_shard = defaultdict(Counter)
    total = Counter()
    for i, t in enumerate(texts):
        for w in t.lower().split():
            per_shard[shard_of(i)][w] += 1
            total[w] += 1
    cands = set()
    for sh, cnt in per_shard.items():
        local = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        cands |= {w for w, _ in local[:_TOPK_LOCAL]}
    non_cand_max = max(
        (n for w, n in total.items() if w not in cands), default=0
    )
    assert non_cand_max <= bound  # the certificate is sound
    for w, r in out.items():
        assert r.total == total[w]  # emitted totals are exact
        assert bool(r.certified) == (r.total >= bound)


def test_bpe_encode_is_symbol_boundary_safe(spark, tmp_path):
    """A merge pattern must never match across two symbols: after
    merging (a,b), the 'b'+'a' letters adjacent across the 'ab'|'a'
    symbol boundary must NOT satisfy a later (b,a) merge."""
    from kinesis_log_watcher_spark.queries.llm import _bpe_encoded_vocab

    # pair counts: (a,b) dominates, (b,a) second — both become merges.
    texts = [" ".join(["abab"] * 6 + ["ab"] * 8 + ["ba"] * 4)]
    sf = _docs(spark, tmp_path, texts)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    enc = {r.word: r.n_sym for r in _bpe_encoded_vocab(docs).collect()}
    # 'ab' -> one symbol; 'ba' -> one symbol (its own merge applies);
    # 'abab' -> |ab|a|b| after the leftmost non-overlapping (a,b) pass =
    # 3 symbols, and the boundary 'b','a' letters never merge.
    assert enc["ab"] == 1
    assert enc["ba"] == 1
    assert enc["abab"] == 3


def test_pq_codes_pick_matching_anchor(spark, tmp_path):
    """A corpus vector that IS one of the anchors (componentwise) must
    get ADC distance equal to the query's LUT distance to that anchor,
    summed over subspaces — the PQ estimate is exact for codebook
    points."""
    import numpy as np

    from kinesis_log_watcher_spark.queries.llm import ann_pq_adc_topk

    rng = np.random.RandomState(7)
    vecs = {i: rng.rand(64).astype("float32") for i in range(8)}  # anchors
    rows = [(i, [float(x) for x in v], 0) for i, v in vecs.items()]
    # vec 8 = copy of anchor 3; vecs 10..19 = queries (random)
    rows.append((8, [float(x) for x in vecs[3]], 0))
    for q in range(10, 20):
        rows.append((q, [float(x) for x in rng.rand(64).astype("float32")], 0))
    d = tmp_path / "sfpq"
    d.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))

    out = ann_pq_adc_topk(spark, str(d)).collect()
    assert out
    # vec 8's code in every subspace is anchor 3, so for any query its
    # est_d2 equals the exact quantized distance to anchor 3 — and any
    # OTHER corpus vector with the same codes ties exactly. Verify one
    # query's returned est_d2 for neighbor 8 against a direct compute.
    import math

    def quant(x):
        return math.floor(float(x) * 10_000_000 + 0.5)

    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, {})[r.neighbor_id] = r.est_d2
    hit = [(q, d2) for q, ns in by_q.items() for n, d2 in ns.items() if n == 8]
    for q, d2 in hit:
        exact = sum(
            (quant(a) - quant(b)) ** 2
            for a, b in zip(
                [r for r in rows if r[0] == q][0][1], vecs[3]
            )
        )
        assert d2 == exact


def test_ivf_multiprobe_dominates_single_probe(spark):
    """Multi-probe candidates are a superset of single-probe's, so its
    top-k dots dominate single-probe's rank-for-rank."""
    from kinesis_log_watcher_spark.queries.llm import (
        ann_ivf_multiprobe,
        ann_ivf_topk,
    )

    sf = "/root/testdata/sf0.001"
    single = {
        (r.q_id, r.rank): r.dot for r in ann_ivf_topk(spark, sf).collect()
    }
    multi = {
        (r.q_id, r.rank): r.dot
        for r in ann_ivf_multiprobe(spark, sf).collect()
    }
    assert single and multi
    assert len(multi) >= len(single)
    for key, d in single.items():
        assert key in multi and multi[key] >= d


def test_overlap_join_handchecked(spark, tmp_path):
    """Two users with one overlapping presence window, one disjoint
    pair — overlap length exact to the microsecond."""
    from datetime import datetime

    from kinesis_log_watcher_spark.queries.relational import (
        concurrent_session_pairs,
    )

    T = lambda m, s=0: datetime(2024, 1, 1, 12, m, s)  # noqa: E731
    rows = [
        # user 1: session 12:00-12:10 (+30min linger -> ends 12:40)
        (1, T(0), 1, "click", 1.0, "{}"),
        (2, T(10), 1, "click", 1.0, "{}"),
        # user 2: session starts 12:20 -> overlaps user 1 by 20 min
        (3, T(20), 2, "view", 1.0, "{}"),
        # user 3: session at 14:00 -> overlaps nobody
        (4, datetime(2024, 1, 1, 14, 0), 3, "view", 1.0, "{}"),
    ]
    d = tmp_path / "sfov"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))

    got = {
        (r.u1, r.u2): (r.n_overlaps, r.overlap_us)
        for r in concurrent_session_pairs(spark, str(d)).collect()
    }
    # user1 window [12:00, 12:40], user2 window [12:20, 12:50]:
    # overlap = 20 min = 1_200_000_000 us; user3 pairs with nobody.
    assert got == {(1, 2): (1, 1_200_000_000)}


def test_bootstrap_multiplicities_behave(spark):
    """Replicate effective sizes hover around N (Poisson(1) mean 1) and
    replicate means spread around the true mean."""
    from kinesis_log_watcher_spark.queries.base import load
    from kinesis_log_watcher_spark.queries.relational import (
        _BOOT_B,
        bootstrap_mean_ci,
    )

    sf = "/root/testdata/sf0.001"
    rows = bootstrap_mean_ci(spark, sf).collect()
    assert len(rows) == _BOOT_B
    n = load(spark, sf, "orders").count()
    for r in rows:
        assert abs(r.n_eff - n) < 0.2 * n  # Poisson(1) total ~ N ± sqrt(N)
    true_mean = (
        load(spark, sf, "orders").agg({"o_totalprice": "avg"}).collect()[0][0]
    )
    boot = sorted(r.boot_mean for r in rows)
    assert boot[0] < true_mean < boot[-1]
