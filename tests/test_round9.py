"""Round-9 model-eval wave: closed-form invariants the oracle
hash-match can't state — exact Python recomputes of the kappa/ECE/MH
formulas from the emitted counts, the skill-ordering of the synthetic
model panel, bootstrap-CI containment, and the decontamination
certificate's monotone retention curve.
"""

from __future__ import annotations

import hashlib

import pytest

from kinesis_log_watcher_spark.queries import registry


def _q(name):
    return registry()[name].fn


_NAMES = [
    "winrate_matrix_models",
    "model_agreement_kappa_matrix",
    "mcnemar_paired_models",
    "paired_bootstrap_winrate",
    "bt_model_strength_ci",
    "fleiss_kappa_annotators",
    "mantel_haenszel_winrate",
    "ece_calibration_bins",
    "judge_position_bias_audit",
    "decontaminated_eval_certificate",
]


_NAMES2 = [
    "paired_ttest_scores",
    "tost_equivalence_certificate",
    "krippendorff_alpha_binary",
    "passk_curve_models",
    "balanced_grader_assignment",
    "corpus_bleu2_decode_audit",
    "semantic_decontamination_embeddings",
    "elo_sequential_replay",
]

_TWINS = [
    ("stream_winrate_matrix", "winrate_matrix_models"),
    ("stream_ece_calibration", "ece_calibration_bins"),
    ("stream_mcnemar_paired", "mcnemar_paired_models"),
]


@pytest.fixture(scope="module")
def r9_all(spark, sf_dir):
    """EVERY round-9 registry execution in ONE 12-wide concurrent burst
    (the round-8b suite-speed shape), plus the three streaming twins
    run serially afterwards (replay_partitions mutates session confs
    and must not interleave)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=12) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES + _NAMES2
        }
        out = {n: f.result() for n, f in futs.items()}
    for twin, _batch in _TWINS:
        out[twin] = _q(twin)(spark, sf_dir).collect()
    return out


@pytest.fixture(scope="module")
def r9(r9_all):
    return {n: r9_all[n] for n in _NAMES}


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_MODEL_ORDER = ["m1", "m2", "m3", "m4"]


def test_winrate_matrix_accounting_and_skill_order(r9):
    rows = r9["winrate_matrix_models"]
    assert len(rows) == 6
    for r in rows:
        assert r["wins_a"] + r["wins_b"] + r["ties"] == r["n_items"]
        assert 0 <= r["winrate_a_micro"] <= 1_000_000
        # tie-split formula recompute
        assert r["winrate_a_micro"] == (
            (r["wins_a"] * 1_000_000 + r["ties"] * 500_000)
            // r["n_items"]
        )
        # pairs are emitted in model order, and the panel's planted
        # skill gradient means the lower-indexed model never loses the
        # pairwise comparison
        ia = _MODEL_ORDER.index(r["model_a"])
        ib = _MODEL_ORDER.index(r["model_b"])
        assert ia < ib
        assert r["winrate_a_micro"] >= 500_000


def test_kappa_matrix_formula_recompute(r9):
    rows = r9["model_agreement_kappa_matrix"]
    assert len(rows) == 6
    for r in rows:
        n = r["n_items"]
        po = (r["n_both"] + r["n_neither"]) * 1_000_000 // n
        assert r["po_micro"] == po
        assert r["kappa_micro"] <= 1_000_000
        # agreement beats chance on this panel (models share the item
        # difficulty signal)
        assert r["kappa_micro"] > 0


def test_mcnemar_exact_recompute(r9):
    (r,) = r9["mcnemar_paired_models"]
    assert (
        r["n_both"] + r["n_neither"] + r["n_only_a"] + r["n_only_b"]
        == r["n_items"]
    )
    b, c = r["n_only_a"], r["n_only_b"]
    if b + c == 0:
        assert r["chi2_cc_micro"] == 0
    else:
        d = max(abs(b - c) - 1, 0)
        assert r["chi2_cc_micro"] == d * d * 1_000_000 // (b + c)
        assert r["significant"] == (r["chi2_cc_micro"] >= 3_841_459)


def test_paired_bootstrap_ci_contains_point(r9):
    (r,) = r9["paired_bootstrap_winrate"]
    assert r["n_boot"] == 200
    assert r["ci_lo_micro"] <= r["ci_hi_micro"]
    # the identity replicate's point estimate sits inside the CI on
    # this corpus (a degenerate corpus could violate; the driver data
    # does not)
    assert r["ci_lo_micro"] <= r["point_delta_micro"] <= r["ci_hi_micro"]
    # m1 is strictly stronger than m2 by construction
    assert r["point_delta_micro"] > 0
    assert r["rejects_null"] == (
        r["ci_lo_micro"] > 0 or r["ci_hi_micro"] < 0
    )


def test_bt_strengths_track_skill_and_carry_ci(r9):
    rows = {r["model"]: r for r in r9["bt_model_strength_ci"]}
    assert set(rows) == set(_MODEL_ORDER)
    strengths = [rows[m]["strength_micro"] for m in _MODEL_ORDER]
    # planted skill gradient recovered by the MM iterations
    assert strengths == sorted(strengths, reverse=True)
    for r in rows.values():
        assert r["games_total"] > 0
        assert 0 <= r["wins_total"] <= r["games_total"]
        assert r["info_micro"] > 0
        assert r["ci_halfwidth_log_micro"] > 0


def test_fleiss_kappa_exact_python_recompute(r9, spark, sf_dir):
    (r,) = r9["fleiss_kappa_annotators"]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    errs = (50000, 100000, 150000, 200000, 250000)
    m = len(errs)
    agree_num = 0
    total1 = 0
    for row in docs:
        d = row["doc_id"]
        t = _h15(f"truth|{d}") % 2
        n1 = 0
        for a, e in enumerate(errs):
            flip = 1 if _h15(f"ann|{a + 1}|{d}") % 1_000_000 < e else 0
            n1 += (t + flip) % 2
        agree_num += n1 * (n1 - 1) + (m - n1) * (m - 1 - n1)
        total1 += n1
    n = len(docs)
    p_bar = agree_num * 1_000_000 // (n * m * (m - 1))
    p1 = total1 * 1_000_000 // (n * m)
    pe = (p1 * p1 + (1_000_000 - p1) * (1_000_000 - p1)) // 1_000_000
    kappa = (p_bar - pe) * 1_000_000 // (1_000_000 - pe)
    assert r["n_items"] == n
    assert r["p_bar_micro"] == p_bar
    assert r["p_e_micro"] == pe
    assert r["kappa_micro"] == kappa
    # 5-25% flip rates leave substantial agreement
    assert r["kappa_micro"] > 0


def test_mantel_haenszel_pooled_recompute(r9):
    rows = r9["mantel_haenszel_winrate"]
    assert 1 <= len(rows) <= 5
    num = sum(r["a"] * r["d"] * 1_000_000 // (r["a"] + r["b"] + r["c"] + r["d"]) for r in rows)
    den = sum(r["b"] * r["c"] * 1_000_000 // (r["a"] + r["b"] + r["c"] + r["d"]) for r in rows)
    expect = None if den == 0 else num * 1_000_000 // den
    for r in rows:
        # m1 vs m2 on the same docs: margins match stratum-wise
        assert r["a"] + r["b"] == r["c"] + r["d"]
        assert r["or_mh_micro"] == expect
    # m1 stronger than m2 => pooled OR above 1
    if expect is not None:
        assert expect > 1_000_000


def test_ece_window_recompute_and_planted_gap(r9):
    rows = r9["ece_calibration_bins"]
    assert rows
    ece = sum(r["n"] * r["gap_micro"] for r in rows) // sum(
        r["n"] for r in rows
    )
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert r["gap_micro"] == abs(r["acc_micro"] - r["mean_conf_micro"])
        assert r["ece_micro"] == ece
    # the construction plants ~150000 micro overconfidence
    assert 50_000 <= ece <= 250_000


def test_judge_bias_planted_and_consistent_pairs_truthful(r9):
    rows = r9["judge_position_bias_audit"]
    assert rows
    n = sum(r["n_items"] for r in rows)
    firstw = sum(r["first_win_micro"] * r["n_items"] for r in rows) // n
    cons = sum(r["consistency_micro"] * r["n_items"] for r in rows) // n
    # 20% planted position bias: first-shown wins noticeably above 50%
    assert firstw > 530_000
    # but most verdict pairs stay consistent
    assert cons > 600_000
    for r in rows:
        if r["consistent_accuracy_micro"] is not None:
            assert r["consistent_accuracy_micro"] >= 700_000


def test_decontamination_certificate_monotone_and_total(r9):
    rows = sorted(
        r9["decontaminated_eval_certificate"], key=lambda r: r["n_gram"]
    )
    assert [r["n_gram"] for r in rows] == [2, 3, 5]
    for r in rows:
        assert r["n_clean"] == r["n_eval"] - r["n_contaminated"]
        # the certificate: decontamination is total
        assert r["residual_overlap"] == 0
        assert 0 <= r["retention_micro"] <= 1_000_000
    # longer shingles contaminate fewer docs -> retention rises with n
    assert (
        rows[0]["retention_micro"]
        <= rows[1]["retention_micro"]
        <= rows[2]["retention_micro"]
    )
    # every row sees the same eval split
    assert len({r["n_eval"] for r in rows}) == 1


@pytest.fixture(scope="module")
def r9b(r9_all):
    return {n: r9_all[n] for n in _NAMES2}


def test_paired_ttest_recovers_planted_gap(r9b):
    (r,) = r9b["paired_ttest_scores"]
    # the construction plants a 150000-micro mean score gap m1-m2
    assert 100_000 <= r["mean_delta_micro"] <= 200_000
    assert r["significant"] is True
    # t2 formula recompute from the emitted exact moments
    n, sd, sd2 = r["n"], r["sd"], r["sd2"]
    v = n * sd2 - sd * sd
    assert r["t2_micro"] == sd * sd * (n - 1) * 1_000_000 // v


def test_tost_separates_clone_from_gap(r9b):
    rows = {r["pair"]: r for r in r9b["tost_equivalence_certificate"]}
    assert set(rows) == {"m2_vs_m2b", "m1_vs_m4"}
    # same-skill clone certifies equivalent; the 450000-micro gap never
    assert rows["m2_vs_m2b"]["equivalent"] is True
    assert rows["m1_vs_m4"]["equivalent"] is False


def test_krippendorff_bounds_and_positive_agreement(r9b):
    (r,) = r9b["krippendorff_alpha_binary"]
    # missing-at-random: pairable items < all items, values < 5*items
    assert 0 < r["n_items"]
    assert r["n_items"] * 2 <= r["n_values"] <= r["n_items"] * 5
    assert 0 <= r["p1"] <= r["n_values"]
    # 5-25% flip rates leave real agreement
    assert 0 < r["alpha_micro"] <= 1_000_000


def test_passk_curve_monotone(r9b):
    rows = sorted(r9b["passk_curve_models"], key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [1, 2, 4, 8]
    vals = [r["mean_passk_micro"] for r in rows]
    # pass@k is monotone nondecreasing in k, bounded by 1
    assert vals == sorted(vals)
    assert all(0 <= v <= 1_000_000 for v in vals)
    # k=1 equals the plain mean success rate of the 16-trial table
    assert len({r["n_items"] for r in rows}) == 1


def test_grader_assignment_balanced(r9b):
    rows = r9b["balanced_grader_assignment"]
    assert len(rows) == 8
    loads = [r["n_items"] for r in rows]
    for r in rows:
        assert r["max_load"] == max(loads)
        assert r["min_load"] == min(loads)
        assert r["balanced"] is True
        assert r["balanced"] == (
            r["max_load"] - r["min_load"] <= r["n_strata"]
        )


def test_bleu2_corruption_recovered(r9b):
    rows = r9b["corpus_bleu2_decode_audit"]
    assert rows
    for r in rows:
        # dropout-only shortening: hypothesis never longer than ref
        assert r["c_len"] <= r["r_len"]
        # ~25% corruption: unigram precision well below 1, above 0.5
        assert 500_000 <= r["p1_micro"] < 1_000_000
        # bigram precision below unigram (corruption breaks pairs)
        assert r["p2_micro"] <= r["p1_micro"]
        assert 0 < r["bp_micro"] <= 1_000_000
        # geometric-mean recompute
        import math

        geo = math.floor(math.sqrt(r["p1_micro"] * r["p2_micro"]))
        assert r["bleu2_micro"] == geo * r["bp_micro"] // 1_000_000


def test_semantic_decontamination_totals(r9b):
    (r,) = r9b["semantic_decontamination_embeddings"]
    assert r["n_clean"] == r["n_eval"] - r["n_contaminated"]
    assert r["residual_overlap"] == 0
    assert 0 <= r["retention_micro"] <= 1_000_000
    # 80/20 split roughly holds on the driver data
    total = r["n_train"] + r["n_eval"]
    assert total > 0
    assert 0.6 * total <= r["n_train"] <= 0.95 * total


def test_elo_replay_recovers_skill_order(r9b):
    rows = {r["model"]: r for r in r9b["elo_sequential_replay"]}
    assert set(rows) == {"m1", "m2", "m3", "m4"}
    ratings = {m: rows[m]["rating_milli"] for m in ["m1", "m2", "m3", "m4"]}
    # Elo with ~30 direct games per pair at sf0.001 is noisy on the
    # adjacent 150000-micro gaps (the top pair CAN flip); the 2-step
    # and 3-step gaps are far outside replay noise and must hold.
    assert ratings["m1"] > ratings["m3"]
    assert ratings["m1"] > ratings["m4"]
    assert ratings["m2"] > ratings["m4"]
    assert min(ratings, key=ratings.get) == "m4"
    # rating is zero-sum around the 1500.000 start
    assert sum(ratings.values()) == 4 * 1_500_000
    for r in rows.values():
        assert 0 <= r["n_wins"] <= r["n_games"]


def test_streaming_twins_equal_batch_exactly(r9_all):
    """The live-mergeability certificate beyond the shared oracle: the
    streaming twins' rows equal the batch queries' rows EXACTLY on the
    same corpus (complete-mode counting state is order-free, so any
    micro-batch split must converge to the batch aggregation)."""
    for twin, batch in _TWINS:
        got = sorted(map(tuple, r9_all[twin]))
        want = sorted(map(tuple, r9_all[batch]))
        assert got == want, f"{twin} diverged from {batch}"
        assert got, f"{twin} returned no rows"


_NAMES4 = [
    "token_fertility_by_lang",
    "judge_verbosity_bias_audit",
    "doremi_linear_reweight",
    "eval_dedup_inflation_audit",
]


@pytest.fixture(scope="module")
def r9c(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = {
            n: pool.submit(lambda n=n: _q(n)(spark, sf_dir).collect())
            for n in _NAMES4
        }
        return {n: f.result() for n, f in futs.items()}


def test_fertility_accounting(r9c):
    rows = r9c["token_fertility_by_lang"]
    assert rows
    for r in rows:
        assert r["total_tokens"] > 0
        assert r["chars_per_token_micro"] == (
            r["total_chars"] * 1_000_000 // r["total_tokens"]
        )
        assert r["tokens_per_doc_micro"] == (
            r["total_tokens"] * 1_000_000 // r["n_docs"]
        )
        # whitespace tokens average more than 1 char
        assert r["chars_per_token_micro"] > 1_000_000


def test_verbosity_bias_curve(r9c):
    rows = sorted(
        r9c["judge_verbosity_bias_audit"], key=lambda r: r["gap_bucket"]
    )
    assert rows
    # the planted bias grows with the length gap: the longer answer's
    # win rate rises across buckets while accuracy falls (endpoints
    # compared; middle buckets can wobble on small n)
    assert rows[-1]["longer_win_micro"] > rows[0]["longer_win_micro"]
    assert rows[-1]["accuracy_micro"] < rows[0]["accuracy_micro"]
    for r in rows:
        assert 0 <= r["accuracy_micro"] <= 1_000_000


def test_doremi_reweight_conserves_and_shifts_mass(r9c):
    rows = r9c["doremi_linear_reweight"]
    assert rows
    w0 = sum(r["w0_micro"] for r in rows)
    w1 = sum(r["w1_micro"] for r in rows)
    # truncating normalization: totals within one micro per domain
    assert 1_000_000 - len(rows) <= w0 <= 1_000_000
    assert 1_000_000 - len(rows) <= w1 <= 1_000_000
    for r in rows:
        assert r["delta_micro"] == r["w1_micro"] - r["w0_micro"]
    # the highest-excess domain gains share, within truncation slack
    hi = max(rows, key=lambda r: r["excess_micro"])
    assert hi["delta_micro"] >= -1


def test_eval_dedup_inflation_consistent(r9c):
    (r,) = r9c["eval_dedup_inflation_audit"]
    assert 0 < r["n_unique"] <= r["n_raw"]
    # the driver corpus is ~28% near-dup: dedup must remove something
    assert r["n_unique"] < r["n_raw"]
    assert (
        r["inflation_micro"]
        == r["winrate_raw_micro"] - r["winrate_dedup_micro"]
    )
