#!/usr/bin/env python
"""Physical-plan audit across the whole query registry.

For every registered batch query, compile the plan at a small SF and
grep the executed plan for the scale red flags that plan-shape tests
pin for a subset of queries — here applied to ALL of them:

- CartesianProduct / BroadcastNestedLoopJoin (O(n·m) joins)
- row-at-a-time Python evaluation (BatchEvalPython) — Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is fine
- parquet scans with no pushed filters *when the query filters*
- global Sort without a following limit (total-sort where TakeOrdered
  or cluster-sort would do)

Prints one line per query (OK or the flags hit) and exits nonzero if
any query trips a hard flag. Soft flags (global sort) are reported but
don't fail — some queries legitimately return full sorted output.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _manifest  # noqa: E402  (tools/_manifest.py — shared gate plumbing)

from kinesis_log_watcher_spark.queries import registry  # noqa: E402
from kinesis_log_watcher_spark.session import get_spark  # noqa: E402

STREAMING = {
    "stream_windowed_counts",
    "stream_sessionization_stateful",
    "stream_session_windows",
    "stream_click_purchase_join",
}

# Queries allowed to evaluate Python nodes (the documented Arrow-batched
# pandas paths: similarity UDAFs, multimodal mapInPandas, UDAF median).
ARROW_PYTHON_OK = re.compile(
    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|AggregateInPandas"
)

# Intentional nested-loop joins: all have a BOUNDED build side, so the
# "O(n·m)" is O(n·const) — the plan that survives scale-up. Anything not
# listed here that plans a BNLJ/cartesian is a real defect.
ALLOWED_BNLJ = {
    # non-equi (range) join against a ~4-row broadcast tier dimension
    "orders_tier_range_join": "tiny interval dim, non-equi by design",
    # uncorrelated scalar subquery: 1-row broadcast threshold
    "idle_rich_customers": "1-row scalar-subquery broadcast",
    "important_part_values": "1-row scalar-subquery broadcast",
    "top_supplier_revenue": "1-row scalar-subquery broadcast",
    "weighted_doc_sample": "1-row scalar-subquery broadcast",
    "bm25_doc_scores": "1-row corpus-stats broadcast",
    # 1-row corpus/graph-stats broadcasts (build side is exactly one row;
    # a keyless broadcast join beats a global empty-frame window, which
    # would single-partition the probe side)
    "unigram_logprob_buckets": "1-row corpus-stats broadcast",
    "dsir_importance_weights": "1-row corpus-stats broadcast",
    "pagerank_two_rounds": "1-row graph-stats broadcast",
    # brute-force ANN baseline: small broadcast query set vs the index
    # (the scale path is ann_ivf_topk — cell-pruned equi-join)
    "ann_cosine_topk_fast": "broadcast query set, brute-force baseline",
    # 1-row bound/merge-table broadcasts (same shape as the corpus-stats
    # rows above: build side is exactly one row by construction)
    "topk_words_certified": "1-row certificate-bound broadcast",
    "bpe_encode_compression": "1-row merge-table broadcast",
    "doc_bpe_token_counts": "1-row merge-table broadcast",
    "word_pair_pmi": "1-row corpus-stats broadcast",
    "hll_daily_merge": "1-row sketch-estimate/exact broadcasts",
    "hist_daily_merge": "1-row sketch-estimate/exact broadcasts",
    "cms_join_size_estimate": "1-row sketch-estimate/exact broadcasts",
    "class_balanced_downsample": "1-row class-floor broadcast",
    # round-5 additions, same 1-row-build-side shape
    "mg_shard_merge": "1-row trim-offset/err-bound broadcasts",
    "source_quantile_normalize": "1-row corpus-size broadcast",
    "source_quantile_normalize_hist": "1-row corpus-stats broadcast (the rank lookup itself is the bucketed equi-join)",
    "part_cooccurrence_topk": "1-row basket-count broadcast",
    "segment_type_chi2": "1-row total/dims broadcasts",
    "click_to_purchase_survival": "1-row cohort-size broadcast",
    "benford_price_audit": "1-row digit-total broadcast",
    "source_quota_apportion": "1-row budget/shortfall broadcasts",
    # round-8 wave B additions, same bounded-build-side shapes
    "shapley_source_coverage": "1-row v(full)-coverage broadcast "
    "(the subset algebra itself is equi-joined on bounded 16-row "
    "relations)",
    "bq_hamming_rerank": "4-row broadcast query panel vs the packed "
    "sign-bit index (the ann_cosine_topk_fast shape; the scale path "
    "composes with IVF/LSH pruning)",
    "stump_1r_training": "1-row class-total broadcast per feature sweep",
    "rendezvous_shard_rebalance": "9-row shard-enumeration broadcast (HRW weights are key x shard by definition)",
    # round-9 model-eval wave: same 1-row-build-side shape
    "balanced_grader_assignment": "1-row strata-count broadcast (the "
    "balance certificate's bound; loads ride a window on the bounded "
    "8-grader relation)",
    # round-5 mining family: same 1-row-build-side shape as above
    "kmv_theta_set_ops": "1-row sketch-stats/exact broadcasts",
    "kn_bigram_perplexity": "1-row bigram-type-total broadcast",
    "dirichlet_ql_scores": "1-row corpus-stats broadcast",
    "source_unigram_kl": "1-row corpus-token-total broadcast",
    "stream_minhash_overlap": "1-row register-count x 1-row exact broadcast",
    # iterated BPE training: each round joins the 1-row argmax merge
    # (the Sennrich loop's single selected pair) onto the vocab relation
    "bpe_train_k_rounds": "1-row per-round argmax-merge broadcast",
    # power iteration: per-round 1-row MAX(|w|) and norm broadcasts
    "pca_power_iteration": "1-row per-round norm/max broadcasts",
    "kmv_daily_merge": "1-row sketch-estimate/exact broadcasts",
    "lang_calibrated_ppl_buckets": "1-row corpus-stats broadcast",
    "rrf_hybrid_retrieval": "1-row query-norm/corpus-stats broadcasts",
    # round-6: the Heaps-curve bucketizer joins the 1-row MAX(doc_id)
    # span onto the first-seen relation
    "saturating_union_curve": "1-row corpus-span broadcast",
    # round-6 wave 2: 1-row stats broadcasts, plus NB's 5-row language
    # list crossed with the vocab to build the smoothing grid (build
    # side = the class list, bounded by the label alphabet)
    "naive_bayes_lang_classify": "5-row class-list x vocab smoothing grid",
    "daily_revenue_autocorr": "1-row n/mean broadcast onto the daily series",
    "time_decayed_user_scores": "1-row MAX(ts) reference-day broadcast",
    "kfold_assignment_stats": "1-row corpus-total broadcast",
    # round-6 wave 3: substring containment is not equi-joinable; the
    # build side is the bounded, human-curated blocklist by contract
    # (at thousands of phrases the documented swap is an Aho-Corasick
    # mapInPandas kernel, same broadcast shape)
    "blocklist_phrase_filter": "10-row curated-blocklist broadcast",
    "ks_two_sample_price": "1-row group-sizes broadcast onto the CDF cells",
    "community_modularity": "1-row edge/degree-stats broadcast combine",
    "revenue_cusum_changepoint": "1-row integer-mean broadcast onto the daily series",
    "customer_rfm_segmentation": "1-row max-order-date broadcast",
    "zone_map_skip_audit": "3-row literal predicate-panel broadcast",
    "revenue_runs_test": "1-row median broadcast onto the daily series",
    "flag_status_anova_twoway": "1-row fold-term broadcasts (3 scalar combines)",
    "ann_nprobe_recall_curve": "3-row nprobe-panel broadcast (non-equi rank join by design)",
    "revenue_periodogram": "1-row mean + 3-row period-panel broadcasts",
    # round-7: 1-row corpus-stat broadcasts + a value-band grid whose
    # build side is bounded by the sensitive-value DOMAIN, not rows
    "t_closeness_audit": "1-row n_total/n_bands + band-dimension broadcasts",
    "ordered_funnel_completion": "three 1-row stage-count broadcasts",
    "association_rules_lift": "1-row basket-count (n) broadcast onto the thresholded rules",
}


def audit_one(spark, name: str, fn, sf_dir: str) -> tuple[list[str], list[str]]:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hard, soft = [], []
    if "CartesianProduct" in plan:
        hard.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        if name in ALLOWED_BNLJ:
            soft.append(f"BNLJ (allowed: {ALLOWED_BNLJ[name]})")
        else:
            hard.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan:
        hard.append("row-at-a-time Python (BatchEvalPython)")
    # (pushdown/pruning presence is asserted per-query by the plan-shape
    # tests; this sweep focuses on join/Python/sort shape.)
    n_sorts = plan.count("Sort ")
    if "TakeOrderedAndProject" not in plan and n_sorts and "GlobalLimit" not in plan:
        # global sort without top-k — fine for full sorted output, flag soft
        if re.search(r"Sort \[.*\], true", plan):
            soft.append(f"global sort x{len(re.findall(r'Sort .*, true', plan))}")
    return hard, soft


# Manifest of the queries covered by the last CLEAN full audit run.
# The suite's registration gate (tests/test_plan_audit_gate.py) audits
# every registry entry NOT in this manifest — so a query registered
# after the last full audit cannot slip an unlisted BNLJ/cartesian past
# the gate (the r7 association_rules_lift miss). A clean full run
# rewrites the manifest.
MANIFEST_PATH = _manifest.manifest_path("plan_audit_manifest.json")


def load_manifest() -> set[str]:
    return _manifest.load_manifest(MANIFEST_PATH)


def write_manifest_if_changed(names: list[str], no_write: bool) -> None:
    _manifest.write_manifest_if_changed(MANIFEST_PATH, names, no_write)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-write"]
    no_write = "--no-write" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    audited: list[str] = []
    for name, q in registry().items():
        if name in STREAMING:
            continue
        try:
            hard, soft = audit_one(spark, name, q.fn, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            failures += 1
            continue
        audited.append(name)
        if hard:
            failures += 1
            print(f"FLAG  {name}: {', '.join(hard + soft)}")
        elif soft:
            print(f"note  {name}: {', '.join(soft)}")
        else:
            print(f"ok    {name}")
    print(f"\n{failures} hard-flagged queries")
    if not failures:
        write_manifest_if_changed(audited, no_write)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
