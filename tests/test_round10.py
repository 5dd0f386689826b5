"""Round-10 retrieval/RAG-eval wave: closed-form invariants the oracle
hash-match can't state — metric-identity recomputes (recall/precision/
MRR/nDCG/RRF/sign-test formulas from the emitted counts), panel-design
properties (retriever A dominates B, k-monotone recall curves,
dcg <= idcg), cascade routing consistency, and streaming-twin equality
against the batch relations.
"""

from __future__ import annotations

import math

import pytest

from kinesis_log_watcher_spark.queries import registry


def _q(name):
    return registry()[name].fn


_NAMES = [
    "retrieval_recall_at_k",
    "retrieval_mrr_first_rank",
    "retrieval_ndcg_at10",
    "retrieval_recall_curve",
    "retrieval_failure_taxonomy",
    "retrieval_candidate_coverage",
    "reciprocal_rank_fusion",
    "rrf_sign_test",
    "two_stage_rerank_gain",
    "interleaving_ab_eval",
    "cascade_fallback_eval",
    "rag_context_packing",
    "rag_citation_precision_recall",
    "context_redundancy_audit",
    "retrieval_per_lang_parity",
    "semantic_cache_ttl_eval",
    "retrieval_eval_embeddings",
]

_TWINS = [
    ("stream_retrieval_coverage", "retrieval_candidate_coverage"),
    ("stream_semantic_cache_ttl", "semantic_cache_ttl_eval"),
]


@pytest.fixture(scope="module")
def r10(spark, sf_dir):
    """Every round-10 batch query in one concurrent burst (the round-9
    suite-speed shape), twins serially afterwards (replay_partitions
    mutates session confs and must not interleave)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=12) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES
        }
        out = {n: f.result() for n, f in futs.items()}
    for twin, _batch in _TWINS:
        out[twin] = _q(twin)(spark, sf_dir).collect()
    return out


def test_recall_at_k_accounting(r10):
    rows = r10["retrieval_recall_at_k"]
    assert len(rows) == 32
    a_hits = b_hits = 0
    for r in rows:
        assert 0 <= r["hits_5"] <= r["hits_10"] <= r["hits_20"] <= r["n_rel"]
        expect = 0 if r["n_rel"] == 0 else r["hits_10"] * 1_000_000 // r["n_rel"]
        assert r["recall10_micro"] == expect
        if r["retriever"] == "A":
            a_hits += r["hits_10"]
        else:
            b_hits += r["hits_10"]
    # the planted signal-to-noise makes A strictly sharper than B
    assert a_hits > b_hits


def test_mrr_reciprocal_identity(r10):
    rows = r10["retrieval_mrr_first_rank"]
    assert len(rows) == 32
    rr = {"A": 0, "B": 0}
    for r in rows:
        if r["first_rel_rank"] == 0:
            assert r["rr_micro"] == 0
        else:
            assert r["rr_micro"] == 1_000_000 // r["first_rel_rank"]
        rr[r["retriever"]] += r["rr_micro"]
    assert rr["A"] >= rr["B"]


def test_ndcg_bounded_by_ideal(r10):
    rows = r10["retrieval_ndcg_at10"]
    assert len(rows) == 32
    for r in rows:
        # the ideal ranking maximizes DCG by definition
        assert 0 <= r["dcg10"] <= r["idcg10"]
        assert 0 <= r["ndcg10_micro"] <= 1_000_000
        expect = (
            0 if r["idcg10"] == 0 else r["dcg10"] * 1_000_000 // r["idcg10"]
        )
        assert r["ndcg10_micro"] == expect


def test_recall_curve_monotone_in_k(r10):
    rows = r10["retrieval_recall_curve"]
    assert len(rows) == 12
    for retr in ("A", "B"):
        curve = sorted(
            (r["k"], r["mean_recall_micro"])
            for r in rows
            if r["retriever"] == retr
        )
        ks = [k for k, _ in curve]
        assert ks == [1, 2, 5, 10, 20, 50]
        means = [m for _, m in curve]
        assert means == sorted(means), f"recall@k not monotone for {retr}"
    for r in rows:
        assert r["n_queries"] == 16
        assert (
            0
            <= r["min_recall_micro"]
            <= r["mean_recall_micro"]
            <= r["max_recall_micro"]
            <= 1_000_000
        )


def test_failure_taxonomy_partitions_queries(r10):
    rows = r10["retrieval_failure_taxonomy"]
    per = {"A": 0, "B": 0}
    for r in rows:
        assert r["failure_class"] in ("missed", "shallow", "good")
        per[r["retriever"]] += r["n_queries"]
    assert per == {"A": 16, "B": 16}


def test_candidate_coverage_bounds(r10):
    rows = r10["retrieval_candidate_coverage"]
    assert len(rows) == 16
    for r in rows:
        assert r["rel_a"] <= min(r["cand_a"], r["n_rel"])
        assert r["rel_b"] <= min(r["cand_b"], r["n_rel"])
        for side in ("a", "b"):
            expect = (
                0
                if r["n_rel"] == 0
                else r[f"rel_{side}"] * 1_000_000 // r["n_rel"]
            )
            assert r[f"coverage_{side}_micro"] == expect


def test_rrf_winner_labels(r10):
    rows = r10["reciprocal_rank_fusion"]
    assert len(rows) == 16
    for r in rows:
        best = max(r["hits_a"], r["hits_b"])
        expect = (
            "rrf"
            if r["hits_rrf"] > best
            else ("single" if r["hits_rrf"] < best else "tie")
        )
        assert r["winner"] == expect
        # fusion can't fabricate relevance beyond the pooled lists
        assert r["hits_rrf"] <= r["n_rel"]


def test_sign_test_exact_binomial(r10):
    (r,) = r10["rrf_sign_test"]
    assert r["wins"] + r["losses"] + r["ties"] == 16
    assert r["n_eff"] == r["wins"] + r["losses"]
    n, w0 = r["n_eff"], r["wins"]
    tail = sum(math.comb(n, w) for w in range(w0, n + 1))
    assert r["p_one_sided_micro"] == tail * 1_000_000 // (1 << n)


def test_rerank_gain_identity_and_direction(r10):
    rows = r10["two_stage_rerank_gain"]
    assert len(rows) == 16
    total_gain = 0
    for r in rows:
        assert 0 <= r["ndcg5_stage1_micro"] <= 1_000_000
        assert 0 <= r["ndcg5_rerank_micro"] <= 1_000_000
        if r["idcg5"] > 0:
            # truncate-toward-zero like Spark div / DuckDB // — Python's
            # floor // would diverge on a negative, non-divisible gain
            d = r["dcg5_rerank"] - r["dcg5_stage1"]
            expect = (abs(d) * 1_000_000 // r["idcg5"]) * (
                1 if d >= 0 else -1
            )
            assert r["gain_micro"] == expect
        total_gain += r["gain_micro"]
    # the sharp cross-encoder improves A's list on average (panel tuning)
    assert total_gain > 0


def test_interleaving_credits(r10):
    rows = r10["interleaving_ab_eval"]
    assert len(rows) == 16
    for r in rows:
        # both top-10 lists are full at this panel, so the interleaved
        # list always fills its 10 slots
        assert r["n_interleaved"] == 10
        expect = (
            "A"
            if r["clicks_a"] > r["clicks_b"]
            else ("B" if r["clicks_a"] < r["clicks_b"] else "tie")
        )
        assert r["winner"] == expect


def test_cascade_routing_consistency(r10):
    rows = r10["cascade_fallback_eval"]
    assert len(rows) == 16
    n_fb = 0
    for r in rows:
        expect = r["hits_b"] if r["is_fallback"] else r["hits_a"]
        assert r["hits_cascade"] == expect
        n_fb += r["is_fallback"]
    # the tuned threshold routes SOME queries each way
    assert 0 < n_fb < 16


def test_context_packing_budget(r10):
    rows = r10["rag_context_packing"]
    assert len(rows) == 16
    for r in rows:
        assert r["tokens_packed"] <= 400
        assert r["n_rel_packed"] <= r["n_packed"]
        assert 0 <= r["best_rel_packed"] <= 3
        assert r["n_packed"] > 0  # candidate lists are never empty here


def test_citation_micros(r10):
    rows = r10["rag_citation_precision_recall"]
    assert len(rows) == 16
    for r in rows:
        assert r["n_good"] <= min(r["n_cited"], r["n_gold"])
        assert r["n_cited"] <= 5
        p = 0 if r["n_cited"] == 0 else r["n_good"] * 1_000_000 // r["n_cited"]
        rc = 0 if r["n_gold"] == 0 else r["n_good"] * 1_000_000 // r["n_gold"]
        assert r["cite_precision_micro"] == p
        assert r["cite_recall_micro"] == rc


def test_redundancy_identity(r10):
    rows = r10["context_redundancy_audit"]
    assert len(rows) == 16
    for r in rows:
        assert 1 <= r["n_sources"] <= r["n_docs"] <= 10
        assert r["max_single_source"] <= r["n_docs"]
        assert r["redundancy_micro"] == (
            (r["n_docs"] - r["n_sources"]) * 1_000_000 // r["n_docs"]
        )


def test_lang_parity_covers_langs(r10):
    rows = r10["retrieval_per_lang_parity"]
    assert sorted(r["lang"] for r in rows) == ["de", "en", "es", "fr", "zh"]
    for r in rows:
        assert r["n_hit"] <= r["n_rel"]
        expect = 0 if r["n_rel"] == 0 else r["n_hit"] * 1_000_000 // r["n_rel"]
        assert r["recall20_micro"] == expect


def test_cache_hit_accounting(r10):
    rows = r10["semantic_cache_ttl_eval"]
    assert rows, "at least one request bucket"
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_requests"]
        assert r["hit_rate_micro"] == (
            r["n_hits"] * 1_000_000 // r["n_requests"]
        )
    # the cache warms up: the first bucket never beats the best bucket
    first = min(rows, key=lambda r: r["bucket"])
    assert first["hit_rate_micro"] <= max(r["hit_rate_micro"] for r in rows)


def test_embedding_eval_identity(r10):
    rows = r10["retrieval_eval_embeddings"]
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["hits_10"] <= 10
        assert r["precision10_micro"] == r["hits_10"] * 1_000_000 // 10
        assert r["n_rel"] > 0
        if r["hits_10"] > 0:
            assert r["first_rel_rank"] >= 1


def _sorted_rows(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("twin,batch", _TWINS)
def test_streaming_twins_equal_batch(r10, twin, batch):
    assert _sorted_rows(r10[twin]) == _sorted_rows(r10[batch])


# ---------------------------------------------------------------------------
# wave 5: eval-ops extras
# ---------------------------------------------------------------------------

_NAMES5 = [
    "retrieval_map_at20",
    "ab_sample_ratio_mismatch",
    "embedding_drift_tvd",
    "slo_burn_rate_windows",
    "paraphrase_consistency_eval",
]


@pytest.fixture(scope="module")
def r10b(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=5) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES5
        }
        out = {n: f.result() for n, f in futs.items()}
    out["stream_srm_check"] = _q("stream_srm_check")(spark, sf_dir).collect()
    return out


def test_map_identity_and_ordering(r10b):
    rows = r10b["retrieval_map_at20"]
    assert len(rows) == 32
    totals = {"A": 0, "B": 0}
    for r in rows:
        assert 0 <= r["ap20_micro"] <= 1_000_000
        denom = min(r["n_rel"], 20)
        if denom > 0:
            assert r["ap20_micro"] == r["sum_prec_micro"] // denom
        totals[r["retriever"]] += r["ap20_micro"]
    # AP rewards early relevance; the sharper retriever wins
    assert totals["A"] > totals["B"]


def test_srm_chi2_identity(r10b):
    rows = r10b["ab_sample_ratio_mismatch"]
    assert len(rows) == 5  # one per event_type
    for r in rows:
        assert r["o_a"] + r["o_b"] == r["n"]
        d = 2 * r["o_a"] - r["n"]
        assert r["chi2_micro"] == d * d * 1_000_000 // r["n"]
        assert r["srm_flag"] == (r["chi2_micro"] >= 3_841_459)


def test_drift_monitor_flags_planted_shift(r10b):
    rows = r10b["embedding_drift_tvd"]
    assert sorted(r["dim"] for r in rows) == [1, 2]
    for r in rows:
        assert 0 <= r["tvd_micro"] <= 1_000_000
        assert r["drift_flag"] == (r["tvd_micro"] >= 50_000)
        # the planted +0.05 shift must be visible
        assert r["drift_flag"]


def test_slo_burn_identities(r10b):
    rows = r10b["slo_burn_rate_windows"]
    assert rows
    for r in rows:
        assert r["n_over"] <= r["n"]
        assert r["burn1_micro"] == r["n_over"] * 20 * 1_000_000 // r["n"]
        assert r["page_alert"] == (
            r["burn1_micro"] >= 2_000_000 and r["burn6_micro"] >= 1_000_000
        )


def test_paraphrase_pairs_grid(r10b):
    rows = r10b["paraphrase_consistency_eval"]
    assert len(rows) == 8
    for r in rows:
        assert r["q_hi"] == r["q_lo"] + 8
        assert 0 <= r["top10_overlap"] <= 10
        assert r["jaccard_micro"] == (
            r["top10_overlap"] * 1_000_000 // (20 - r["top10_overlap"])
        )


def test_stream_srm_equals_batch(r10b):
    assert _sorted_rows(r10b["stream_srm_check"]) == _sorted_rows(
        r10b["ab_sample_ratio_mismatch"]
    )


# ---------------------------------------------------------------------------
# wave 6: alignment-eval + index economics
# ---------------------------------------------------------------------------

_NAMES6 = [
    "reward_model_accuracy_eval",
    "best_of_n_reward_gain",
    "rm_length_gradient_audit",
    "curriculum_pacing_schedule",
    "ivf_build_cost_model",
]


@pytest.fixture(scope="module")
def r10c(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=5) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES6
        }
        return {n: f.result() for n, f in futs.items()}


def test_rm_accuracy_rises_with_preference_strength(r10c):
    rows = sorted(r10c["reward_model_accuracy_eval"], key=lambda r: r["gap_bucket"])
    assert 2 <= len(rows) <= 5
    for r in rows:
        assert r["accuracy_micro"] == r["n_correct"] * 1_000_000 // r["n_pairs"]
    # wide-gap pairs must be easier than coin-flip-close pairs
    assert rows[-1]["accuracy_micro"] > rows[0]["accuracy_micro"]
    assert rows[-1]["accuracy_micro"] >= 900_000


def test_best_of_n_monotone_and_overoptimization_gap(r10c):
    rows = sorted(r10c["best_of_n_reward_gain"], key=lambda r: r["n"])
    assert [r["n"] for r in rows] == [1, 2, 4]
    assert rows[0]["rm_gain_micro"] == 0
    rm = [r["mean_best_rm_micro"] for r in rows]
    q = [r["mean_best_qual_micro"] for r in rows]
    assert rm == sorted(rm) and q == sorted(q)
    # selecting on the noisy RM gains RM score faster than TRUE quality
    # relative to its own scale at n=4 vs n=1 (overoptimization shape)
    assert rows[2]["rm_gain_micro"] > 0


def test_length_gradient_visible(r10c):
    rows = sorted(r10c["rm_length_gradient_audit"], key=lambda r: r["len_bucket"])
    assert rows[-1]["len_bucket"] <= 9
    # the planted n_chars terms dominate bucket-level noise end-to-end
    assert rows[-1]["mean_rm_micro"] > rows[0]["mean_rm_micro"]
    assert rows[-1]["mean_qual_micro"] > rows[0]["mean_qual_micro"]


def test_curriculum_schedule_identities(r10c):
    rows = sorted(r10c["curriculum_pacing_schedule"], key=lambda r: r["stage"])
    cum = 0
    prev_diff = -1
    for r in rows:
        cum += r["stage_tokens"]
        assert r["cum_tokens"] == cum
        # value-range staging makes per-stage mean difficulty monotone
        assert r["mean_difficulty_micro"] > prev_diff
        prev_diff = r["mean_difficulty_micro"]


def test_ivf_cost_model_identities(r10c):
    rows = sorted(r10c["ivf_build_cost_model"], key=lambda r: r["nlist"])
    assert [r["nlist"] for r in rows] == [4, 8, 16]
    n_vecs = {r["n_vecs"] for r in rows}
    assert len(n_vecs) == 1  # every config assigns the same corpus
    for r in rows:
        assert r["n_cells_used"] <= r["nlist"]
        assert r["max_cell"] * r["n_cells_used"] >= r["n_vecs"]
        assert r["mean_cell_micro"] == r["n_vecs"] * 1_000_000 // r["n_cells_used"]
        assert r["est_probe2_rows"] == 2 * r["n_vecs"] // r["n_cells_used"]
    # more cells -> cheaper probes
    probes = [r["est_probe2_rows"] for r in rows]
    assert probes == sorted(probes, reverse=True)


def test_kv_cache_budget_accounting(spark, sf_dir):
    rows = _q("kv_cache_concurrency_budget")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["new_sessions"] <= r["active_sessions"]
        assert r["kv_tokens_held"] >= r["active_sessions"] * 50
        assert r["excess_tokens"] == max(0, r["kv_tokens_held"] - 100_000)
        assert r["over_budget"] == (r["kv_tokens_held"] > 100_000)
