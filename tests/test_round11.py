"""Round-11 wave: closed-form invariants the oracle hash-match can't
state — the Lindley closed form recomputed as the literal recursion,
cross-query identities (margin histogram -> beta ladder; tuner k=4 ==
throughput), truncating-division identities from emitted counts,
panel-design directions (confound visible, curves monotone, interior
cadence optimum), and streaming-twin equality against the batch
relations.
"""

from __future__ import annotations

import math

import pytest

from kinesis_log_watcher_spark.queries import registry


def _q(name):
    return registry()[name].fn


_NAMES = [
    "dpo_implicit_reward_margin",
    "dpo_beta_sensitivity_ladder",
    "dpo_margin_filter_curve",
    "rejection_sampling_efficiency",
    "winrate_verbosity_confound",
    "kto_unpaired_preference_eval",
    "preference_transitivity_audit",
    "continuous_batching_occupancy",
    "serving_backlog_lindley",
    "speculative_serving_throughput",
    "speculative_draft_len_tuner",
    "index_staleness_recall_curve",
    "index_rebuild_cadence_cost",
]

_TWINS = [
    ("stream_rejection_sampling", "rejection_sampling_efficiency"),
    ("stream_rebuild_cadence", "index_rebuild_cadence_cost"),
]


@pytest.fixture(scope="module")
def r11(spark, sf_dir):
    """Every round-11 batch query in one concurrent burst (the round-9
    suite-speed shape), twins serially afterwards (replay_partitions
    mutates session confs and must not interleave)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=13) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES
        }
        out = {n: f.result() for n, f in futs.items()}
    for twin, _ in _TWINS:
        out[twin] = _q(twin)(spark, sf_dir).collect()
    return out


# ---------------------------------------------------------------------------
# Wave 1: preference eval
# ---------------------------------------------------------------------------


def test_margin_histogram_buckets(r11):
    rows = {r["margin_bucket"]: r for r in r11["dpo_implicit_reward_margin"]}
    # pairs partition: every doc pairs at most once -> total == pairs
    assert sum(r["n_pairs"] for r in rows.values()) == 250
    for b, r in rows.items():
        assert -4 <= b <= 4
        # mean margin sits inside its (clamped) bucket range
        if b == 0:
            assert -100000 < r["mean_margin"] < 100000
        elif 0 < b < 4:
            assert b * 100000 <= r["mean_margin"] < (b + 1) * 100000
        elif -4 < b < 0:
            assert b * 100000 - 100000 < r["mean_margin"] <= b * 100000 + 100000
        elif b == 4:
            assert r["mean_margin"] >= 400000
        else:
            assert r["mean_margin"] <= -400000


def test_beta_ladder_matches_margin_histogram(r11):
    """The ladder's means must equal the literal sigmoid/-log-sigmoid
    ladder applied to the margin histogram — recomputed here with an
    independent sigmoid, same build-time rounding."""
    hist = {
        r["margin_bucket"]: r["n_pairs"]
        for r in r11["dpo_implicit_reward_margin"]
    }
    n = sum(hist.values())
    rows = {r["beta"]: r for r in r11["dpo_beta_sensitivity_ladder"]}
    assert set(rows) == {1, 5, 10}

    def center(b):
        return 0 if b == 0 else (abs(b) * 100000 + 50000) * (1 if b > 0 else -1)

    for beta, r in rows.items():
        assert r["n_pairs"] == n
        s_pref = s_loss = 0
        for b, cnt in hist.items():
            p = 1.0 / (1.0 + math.exp(-beta * center(b) / 1e6))
            s_pref += cnt * round(p * 1e6)
            s_loss += cnt * round(-math.log(p) * 1e6)
        assert r["mean_pref_prob_micro"] == s_pref // n
        assert r["mean_dpo_loss_micro"] == s_loss // n


def test_margin_filter_monotone(r11):
    rows = sorted(r11["dpo_margin_filter_curve"], key=lambda r: r["tau"])
    assert rows[0]["tau"] == 0 and rows[0]["n_retained"] == 250
    for a, b in zip(rows, rows[1:]):
        assert b["n_retained"] < a["n_retained"]
        assert b["agree_micro"] >= a["agree_micro"]
        assert b["mean_abs_margin"] > a["mean_abs_margin"]
    for r in rows:
        assert r["agree_micro"] == r["n_agree"] * 1_000_000 // r["n_retained"]


def test_rejection_sampling_curve(r11):
    rows = sorted(
        r11["rejection_sampling_efficiency"], key=lambda r: r["tau"]
    )
    assert rows[0]["tau"] == 0 and rows[0]["n_accepted"] == 500
    for a, b in zip(rows, rows[1:]):
        assert b["n_accepted"] < a["n_accepted"]
        # conditioning on rm >= tau raises both means (panel-tuned for
        # qual; mathematically guaranteed for rm)
        assert b["mean_rm_accepted"] > a["mean_rm_accepted"]
        assert b["mean_qual_accepted"] > a["mean_qual_accepted"]
        assert b["mean_rm_accepted"] >= b["tau"]


def test_verbosity_confound_visible(r11):
    rows = {r["len_rel"]: r for r in r11["winrate_verbosity_confound"]}
    assert sum(r["n_pairs"] for r in rows.values()) == 250
    # the RM's length term makes chosen-is-longer pairs easier
    assert rows[1]["rm_agree_micro"] > rows[-1]["rm_agree_micro"]
    # when chosen is longer, agreeing IS preferring the longer doc
    assert rows[1]["rm_agree_micro"] == rows[1]["rm_prefers_longer_micro"]
    # when chosen is shorter, the two rates must sum to 1
    assert (
        rows[-1]["rm_agree_micro"] + rows[-1]["rm_prefers_longer_micro"]
        <= 1_000_000
        <= rows[-1]["rm_agree_micro"]
        + rows[-1]["rm_prefers_longer_micro"]
        + 2  # truncation slack, one per rate
    )


def test_kto_separation(r11):
    rows = r11["kto_unpaired_preference_eval"]
    assert len(rows) == 20
    for r in rows:
        assert r["n_desirable"] + r["n_undesirable"] == 25
        assert (
            r["rm_separation"]
            == r["mean_rm_desirable"] - r["mean_rm_undesirable"]
        )
        # the RM inherits qual div 2, so desirable completions score
        # higher in every source slice
        assert r["rm_separation"] > 0


def test_transitivity_audit(r11):
    (r,) = r11["preference_transitivity_audit"]
    assert r["n_triads"] == 166  # 500 docs -> disjoint triads
    assert 0 < r["n_cyclic"] < r["n_triads"]
    assert r["cyclic_micro"] == r["n_cyclic"] * 1_000_000 // r["n_triads"]
    assert r["agree_ab_micro"] == r["n_agree_ab"] * 1_000_000 // r["n_triads"]
    # the noisy judge still beats a coin on gold pairs
    assert r["agree_ab_micro"] > 600_000


# ---------------------------------------------------------------------------
# Wave 2: serving economics
# ---------------------------------------------------------------------------


def test_occupancy_accounting(r11):
    rows = r11["continuous_batching_occupancy"]
    assert sum(r["n_turns"] for r in rows) == 1000  # every event is a turn
    for r in rows:
        assert r["occupancy"] == r["prefill_tokens"] + r["decode_tokens"]
        assert r["n_prefill"] <= r["n_turns"]
        assert (
            r["prefill_share_micro"]
            == r["prefill_tokens"] * 1_000_000 // r["occupancy"]
        )
        assert r["util_micro"] == r["occupancy"] * 1_000_000 // 120000
        assert r["saturated"] == (r["occupancy"] > 120000)
        # prefill cost bounds: 200..599 per opening turn
        assert 200 * r["n_prefill"] <= r["prefill_tokens"] < 600 * r["n_prefill"]


def test_lindley_closed_form_equals_recursion(r11):
    """The whole point of the query: the window closed form
    S_t - min(0, running_min(S)) must equal the literal Lindley
    recursion W_t = max(0, W_(t-1) + a_t - c) replayed in Python."""
    rows = sorted(r11["serving_backlog_lindley"], key=lambda r: r["tick"])
    assert len(rows) == 10  # 1000 events / 100 per tick
    w = 0
    for r in rows:
        w = max(0, w + r["work"] - 360)
        assert r["backlog"] == w
        assert r["busy"] == (w > 0)


def test_speculative_throughput_identities(r11):
    rows = r11["speculative_serving_throughput"]
    assert len(rows) == 20
    for r in rows:
        assert 55 <= r["accept_prob_pct"] <= 94
        assert 0 <= r["accepted_positions"] <= 4 * r["n_docs"]
        s_eff = r["accepted_positions"] + r["n_docs"]
        assert (
            r["mean_eff_tokens_micro"] == s_eff * 1_000_000 // r["n_docs"]
        )
        assert (
            r["speedup_micro"]
            == s_eff * 1_000_000 * 1000 // (r["n_docs"] * 1480)
        )


def test_draft_tuner_monotone_and_k4_matches_throughput(r11):
    tuner = {}
    for r in r11["speculative_draft_len_tuner"]:
        tuner[(r["source"], r["draft_len"])] = r
    assert len(tuner) == 80
    thru = {r["source"]: r for r in r11["speculative_serving_throughput"]}
    for src in thru:
        effs = [tuner[(src, k)]["mean_eff_tokens_micro"] for k in (1, 2, 4, 8)]
        # longer drafts never reduce effective tokens/step
        assert effs == sorted(effs)
        # the k=4 column IS the throughput query (same panel)
        assert effs[2] == thru[src]["mean_eff_tokens_micro"]
        assert (
            tuner[(src, 4)]["speedup_micro"] == thru[src]["speedup_micro"]
        )


# ---------------------------------------------------------------------------
# Wave 3: index freshness
# ---------------------------------------------------------------------------


def test_staleness_degrades_recall(r11):
    rows = sorted(
        r11["index_staleness_recall_curve"], key=lambda r: r["staleness_lag"]
    )
    assert [r["staleness_lag"] for r in rows] == [0, 100, 250, 500]
    for a, b in zip(rows, rows[1:]):
        assert b["n_candidates"] < a["n_candidates"]
        assert b["macro_recall10_micro"] < a["macro_recall10_micro"]
        assert b["n_hits_top10"] <= a["n_hits_top10"]


def test_cadence_cost_identities_and_interior_optimum(r11):
    rows = {r["rebuild_period"]: r for r in r11["index_rebuild_cadence_cost"]}
    assert set(rows) == {100, 200, 250, 500}
    for R, r in rows.items():
        assert r["n_rebuilds"] == 1000 // R
        assert r["n_docs"] == 500
        assert r["stale_cost"] == r["stale_slots"] * 3
        assert (
            r["build_cost"]
            == r["reindex_ops"] * 40 + (1000 // R) * 60000
        )
        assert r["total_cost"] == r["stale_cost"] + r["build_cost"]
        # each doc waits between 1 and R slots
        assert 500 <= r["stale_slots"] <= 500 * R
    # tuned interior optimum: rebuilding every 250 slots beats both ends
    assert rows[250]["total_cost"] < rows[100]["total_cost"]
    assert rows[250]["total_cost"] < rows[500]["total_cost"]


# ---------------------------------------------------------------------------
# Streaming twins
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("twin,batch", _TWINS)
def test_streaming_twins_equal_batch(r11, twin, batch):
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(tuple, r11[twin])) == sorted(map(tuple, r11[batch]))


# ---------------------------------------------------------------------------
# Wave 4: serving control + pipeline capacity
# ---------------------------------------------------------------------------

_NAMES4 = [
    "batch_size_latency_pareto",
    "context_window_overflow_audit",
    "retry_backoff_economics",
    "shard_skew_salting_audit",
]


@pytest.fixture(scope="module")
def r11d(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES4
        }
        return {n: f.result() for n, f in futs.items()}


def test_batch_pareto_tradeoffs(r11d):
    rows = sorted(r11d["batch_size_latency_pareto"], key=lambda r: r["batch_size"])
    assert [r["batch_size"] for r in rows] == [1, 4, 8, 16, 32]
    for r in rows:
        # ceil-batching identities from the emitted sums
        assert r["total_batches"] * r["batch_size"] >= r["total_arrivals"]
        assert r["fill_micro"] == r["total_arrivals"] * 1_000_000 // (
            r["total_batches"] * r["batch_size"]
        )
        svc = 40 + 12 * r["batch_size"]
        assert r["throughput_micro"] == r["total_arrivals"] * 1_000_000 // (
            r["total_batches"] * svc
        )
        assert r["wait_penalty_micro"] == svc * (
            r["batch_size"] - 1
        ) * 1_000_000 // (2 * r["batch_size"])
    # the pareto directions: throughput and wait both rise with B
    for a, b in zip(rows, rows[1:]):
        assert b["throughput_micro"] > a["throughput_micro"]
        assert b["wait_penalty_micro"] > a["wait_penalty_micro"]
        assert b["total_batches"] < a["total_batches"]
    assert rows[0]["wait_penalty_micro"] == 0  # B=1 never waits


def test_context_overflow_monotone(r11d):
    rows = sorted(
        r11d["context_window_overflow_audit"], key=lambda r: r["window_tokens"]
    )
    assert [r["window_tokens"] for r in rows] == [32, 64, 96, 128]
    for r in rows:
        assert r["overflow_micro"] == r["n_overflow"] * 1_000_000 // r["n_docs"]
        assert r["total_splits"] >= r["n_docs"]
    for a, b in zip(rows, rows[1:]):
        # larger windows: fewer overflows, less truncation loss, fewer
        # splits, but no monotonicity claim on padding (it see-saws)
        assert b["n_overflow"] < a["n_overflow"]
        assert b["tokens_lost_truncating"] < a["tokens_lost_truncating"]
        assert b["total_splits"] <= a["total_splits"]


def test_retry_economics_identities(r11d):
    rows = r11d["retry_backoff_economics"]
    assert len(rows) == 5
    for r in rows:
        assert 5 <= r["fail_prob_pct"] <= 34
        assert 1_000_000 <= r["mean_attempts_micro"] <= 4_000_000
        # with p <= 34%, four attempts nearly always succeed
        assert r["success_after_retries_micro"] >= 980_000
        assert r["wasted_attempts"] >= 0
    # higher fail prob -> more mean attempts (5 well-separated probs)
    by_p = sorted(rows, key=lambda r: r["fail_prob_pct"])
    atts = [r["mean_attempts_micro"] for r in by_p]
    assert atts == sorted(atts)


def test_salting_flattens_skew(r11d):
    rows = {r["strategy"]: r for r in r11d["shard_skew_salting_audit"]}
    assert set(rows) == {"hash", "salted"}
    for r in rows.values():
        assert r["n_shards"] <= 32
        assert r["max_load"] >= r["mean_load"]
        assert r["skew_micro"] == r["max_load"] * 1_000_000 // r["mean_load"]
        assert (
            r["top_share_micro"]
            == r["max_load"] * 1_000_000 // r["total_rows"]
        )
    assert rows["hash"]["total_rows"] == rows["salted"]["total_rows"]
    # the planted hot tenant dominates one hash shard; salting spreads
    # it over more shards and at least halves the hottest shard's share
    # of total load (skew_micro normalizes by PRESENT-shard mean, which
    # is misleading when the tiny-sf tenant space underfills the ring)
    assert rows["salted"]["n_shards"] >= rows["hash"]["n_shards"]
    assert (
        rows["salted"]["top_share_micro"] * 2
        < rows["hash"]["top_share_micro"]
    )
