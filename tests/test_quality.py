"""Quality-gate queries on handcheckable synthetic corpora."""

import pytest
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.queries import quality  # noqa: F401  (registers)
from kinesis_log_watcher_spark.queries.base import registry


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_gopher_gates_handcheck(spark, tmp_path, reg):
    # 40 words, all distinct except 'the the' (top word n=2, frac 0.05),
    # stopwords: 'the' x2 + 'a' -> 3 hits; mean word len within [3,10].
    good = " ".join(f"word{i:02d}" for i in range(37)) + " the the a"
    # 10 words -> fails the word-count floor
    short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # 50 words but one word is 30% of mass -> fails top_word_frac
    reps = " ".join(["spam"] * 15 + [f"tok{i:02d}" for i in range(33)]) + " the a"
    sf = _write_docs(spark, tmp_path, [good, short, reps])
    rows = {r["doc_id"]: r for r in reg["gopher_quality_gates"].fn(spark, sf).collect()}
    assert rows[0]["n_words"] == 40
    assert rows[0]["stop_hits"] == 3
    assert rows[0]["top_word_frac"] == 2 / 40
    assert rows[0]["gopher_pass"]
    assert rows[1]["n_words"] == 10 and not rows[1]["gopher_pass"]
    assert rows[2]["top_word_frac"] == 15 / 50 and not rows[2]["gopher_pass"]


def test_repetition_filter_handcheck(spark, tmp_path, reg):
    # 'x y' bigram appears 10/19 times -> top_bigram_frac way past 0.05
    loop = " ".join(["x", "y"] * 10)
    # all-distinct words -> every bigram and trigram unique (long enough
    # that the 1/total top share stays under the 0.05 ceiling)
    clean = " ".join(f"w{i:02d}" for i in range(40))
    sf = _write_docs(spark, tmp_path, [loop, clean])
    rows = {r["doc_id"]: r for r in reg["doc_repetition_filter"].fn(spark, sf).collect()}
    assert rows[0]["repetitive"]
    assert rows[0]["top_bigram_frac"] == 10 / 19
    assert not rows[1]["repetitive"]
    assert rows[1]["dup_trigram_frac"] == 0.0


def test_window_dedup_first_occurrence_wins(spark, tmp_path, reg):
    # doc1 repeats doc0's exact text -> every doc1 window is a duplicate;
    # doc2 is fresh -> zero duplicated windows.
    base = " ".join(f"t{i:02d}" for i in range(12))  # 12 toks -> 5 windows
    fresh = " ".join(f"u{i:02d}" for i in range(12))
    sf = _write_docs(spark, tmp_path, [base, base, fresh])
    rows = {r["doc_id"]: r for r in reg["cross_doc_window_dedup"].fn(spark, sf).collect()}
    assert rows[0]["n_windows"] == 5
    assert rows[0]["n_first"] == 5  # doc 0 owns every first occurrence
    assert rows[1]["n_first"] == 0 and rows[1]["dup_window_frac"] == 1.0
    assert rows[2]["dup_window_frac"] == 0.0


def test_exact_substring_dedup_span_merge(spark, tmp_path, reg):
    """The removed-token count is the UNION of duplicated 8-token window
    intervals (closed form Σ min(K, gap) over lag-sorted starts), and
    first corpus occurrence wins."""
    # doc1 duplicates doc0 entirely: 12 tokens → 5 dup windows at
    # starts 1..5, gaps of 1 → union = 8 + 4·1 = 12 tokens, ONE span.
    base = " ".join(f"t{i:02d}" for i in range(12))
    # doc2 embeds doc0's first 8 tokens in the middle of fresh text:
    # exactly one dup window → 8 removed tokens, one span.
    embed = (
        " ".join(f"f{i:02d}" for i in range(5))
        + " "
        + " ".join(f"t{i:02d}" for i in range(8))
        + " "
        + " ".join(f"g{i:02d}" for i in range(5))
    )
    sf = _write_docs(spark, tmp_path, [base, base, embed])
    rows = {r["doc_id"]: r for r in reg["exact_substring_dedup"].fn(spark, sf).collect()}
    assert 0 not in rows  # doc 0 owns every first occurrence — nothing removed
    assert rows[1]["dup_windows"] == 5
    assert rows[1]["removed_tokens"] == 12  # whole doc, merged into
    assert rows[1]["n_spans"] == 1  # one maximal span
    assert rows[1]["kept_frac"] == 0.0
    assert rows[2]["dup_windows"] == 1
    assert rows[2]["removed_tokens"] == 8
    assert rows[2]["n_spans"] == 1
    assert rows[2]["kept_frac"] == (18 - 8) / 18


def test_exact_substring_sa_spans_and_containment(spark, tmp_path, reg):
    """The SA-grade query emits maximal span EXTENTS, and its removed
    union covers everything the hash-windowed version removes (the
    VERDICT-r4 superset guarantee — equality, since md5 collisions do
    not occur on real corpora)."""
    base = " ".join(f"t{i:02d}" for i in range(12))
    embed = (
        " ".join(f"f{i:02d}" for i in range(5))
        + " "
        + " ".join(f"t{i:02d}" for i in range(8))
        + " "
        + " ".join(f"g{i:02d}" for i in range(5))
    )
    sf = _write_docs(spark, tmp_path, [base, base, embed])
    spans = reg["exact_substring_dedup_sa"].fn(spark, sf).collect()
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc1 = one maximal span covering the whole 12-token doc
    assert [
        (s["span_start"], s["span_end"], s["span_len"]) for s in by_doc[1]
    ] == [(1, 12, 12)]
    # doc2 = one 8-token span at the embedded copy (positions 6..13)
    assert [
        (s["span_start"], s["span_end"], s["span_len"]) for s in by_doc[2]
    ] == [(6, 13, 8)]
    assert 0 not in by_doc  # first occurrence kept

    # containment on the real corpus: per-doc union of SA spans >= the
    # window version's removed_tokens (spans never overlap, so the
    # union is SUM(span_len))
    real_sf = "/root/testdata/sf0.001"
    sa = {}
    for r in reg["exact_substring_dedup_sa"].fn(spark, real_sf).collect():
        sa[r["doc_id"]] = sa.get(r["doc_id"], 0) + r["span_len"]
    win = {
        r["doc_id"]: r["removed_tokens"]
        for r in reg["exact_substring_dedup"].fn(spark, real_sf).collect()
    }
    assert set(win) <= set(sa)
    for doc_id, removed in win.items():
        assert sa[doc_id] >= removed, doc_id


def test_quality_plans_partial_agg_no_cartesian(spark, reg):
    for name in (
        "gopher_quality_gates",
        "doc_repetition_filter",
        "cross_doc_window_dedup",
    ):
        df = reg[name].fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        # two-level aggregation: partial before the exchange
        assert plan.count("HashAggregate") >= 2, name


def test_auc_matches_sklearn_style_recompute(spark, sf_dir):
    from kinesis_log_watcher_spark.queries import registry
    from kinesis_log_watcher_spark.queries.quality import _score_label

    reg = registry()
    (row,) = reg["quality_score_auc"].fn(spark, sf_dir).collect()
    sl = [(r.score, r.y) for r in _score_label(spark, sf_dir).collect()]
    pos = [s for s, y in sl if y == 1]
    neg = [s for s, y in sl if y == 0]
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    # O(n_pos * n_neg) literal Mann-Whitney: wins + half-ties
    u2 = sum(2 for p in pos for n in neg if p > n) + sum(
        1 for p in pos for n in neg if p == n
    )
    assert row.u2 == u2
    assert abs(row.auc - u2 / (2 * len(pos) * len(neg))) < 1e-15
    assert 0.0 < row.auc < 1.0
    # the pinned FINDING on this corpus: the cheap scorer has no skill
    # at reproducing the Gopher gate (AUC ~= chance) — which is exactly
    # what this eval exists to catch before swapping gates for a scorer
    assert abs(row.auc - 0.5) < 0.15


def test_calibration_bins_partition_and_trend(spark, sf_dir):
    from kinesis_log_watcher_spark.queries import registry
    from kinesis_log_watcher_spark.queries.quality import _score_label

    reg = registry()
    rows = sorted(
        reg["quality_score_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(1, 11))
    n_docs = _score_label(spark, sf_dir).count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert r.pos_frac_nano == r.n_pos * 1_000_000_000 // r.n
    # with a no-skill scorer (see test_auc_...), the reliability curve
    # must be FLAT: no decile's pass rate strays far from the base rate
    base = sum(r.n_pos for r in rows) / n_docs
    for r in rows:
        assert abs(r.n_pos / r.n - base) < 0.35


def test_stump_training_is_the_true_argmax(spark, sf_dir):
    from kinesis_log_watcher_spark.queries import registry
    from kinesis_log_watcher_spark.queries.quality import (
        _STUMP_FEATURES,
        _score_label,  # noqa: F401  (same feature pipeline family)
    )

    reg = registry()
    rows = sorted(
        reg["stump_1r_training"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == [1, 2, 3]
    # brute-force the sweep in python over the same features
    from kinesis_log_watcher_spark.queries.base import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    from kinesis_log_watcher_spark.operators.text import STOPWORDS

    stops = set(STOPWORDS["en"])
    feats = []
    for d in docs:
        words = d.text.split(" ")
        n_words = len(words)
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        char_sum = sum(len(w) for w in words)
        stop_hits = sum(n for w, n in counts.items() if w in stops)
        top_n = max(counts.values())
        y = int(
            30 <= n_words <= 80
            and 3.0 <= char_sum / n_words <= 10.0
            and stop_hits >= 2
            and top_n / n_words <= 0.09
        )
        feats.append(
            {
                "n_words": n_words,
                "stop_micro": stop_hits * 1_000_000 // n_words,
                "mwl_micro": char_sum * 1_000_000 // n_words,
                "y": y,
            }
        )
    n = len(feats)
    cands = []
    for f in _STUMP_FEATURES:
        for thr in sorted({x[f] for x in feats}):
            ge_correct = sum(
                1
                for x in feats
                if (x[f] >= thr) == bool(x["y"])
            )
            best = max(ge_correct, n - ge_correct)
            direction = "ge" if ge_correct >= n - ge_correct else "lt"
            cands.append((-best, f, thr, direction))
    cands.sort()
    want = [
        (f, thr, d, -neg) for neg, f, thr, d in cands[:3]
    ]
    got = [(r.feature, r.thr, r.direction, r.n_correct) for r in rows]
    assert got == want
    for r in rows:
        assert r.acc_nano == r.n_correct * 1_000_000_000 // n
    # the best stump must beat the majority-class baseline
    base = max(sum(x["y"] for x in feats), n - sum(x["y"] for x in feats))
    assert rows[0].n_correct >= base
