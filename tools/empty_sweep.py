#!/usr/bin/env python
"""Empty-input sweep across the whole batch-query registry.

Every batch query must survive EMPTY inputs — no exceptions, no spurious
rows beyond global-aggregate nulls. At 100 TB empty inputs are routine
(a pruned partition, a filter that matches nothing, an empty shard) and
an operator that throws on them kills the job.

A clean full run writes ``empty_sweep_manifest.json`` next to this file;
the SUITE (tests/test_empty_inputs.py) then sweeps only the registry
entries the manifest has never seen — a new query cannot register past
the empty-input gate, and the suite no longer pays the full ~190-query
sweep every run (the r8 <10:00 work). Rerun this tool after adding
queries (round closes do).

Usage: python tools/empty_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _manifest  # noqa: E402  (tools/_manifest.py — shared gate plumbing)

MANIFEST_PATH = _manifest.manifest_path("empty_sweep_manifest.json")

# Every stream_* query is a replay-backed Structured Streaming run: on
# (empty, NULL-ts sentinel) input the sweep would pay dataset staging
# plus multiple micro-batch jobs per query and assert the streaming
# harness, not the batch operators this sweep exists for. Degenerate
# streaming inputs are covered in tests/test_streaming_*.py.
def is_streaming(name: str) -> bool:
    return name.startswith("stream_")


# Queries whose output is a FIXED-cardinality relation independent of the
# input (an unpivoted check suite reports every check even on an empty
# load — with zero violations, which the check pins).
FIXED_CARDINALITY = {
    # the paraphrase panel has exactly 8 same-topic query pairs by
    # construction; the grid anchors them so an empty corpus reports
    # 8 all-zero pairs (the oracle returns the same 8 rows)
    "paraphrase_consistency_eval": 8,
    "orders_expectation_audit": 7,
    # the profile reports every column even of an empty load (n_total=0)
    "orders_column_profile": 6,
    # the Kinesis-simulator queries read the CUSTOM SOURCE, not the
    # driver tables — their output is a pure function of the simulator
    # parameters and ignores sf_dir entirely
    "kinesis_sim_batch_scan": 12,
    "kinesis_sim_render_e2e": 4,
    # reshard scans: parents x levels + children x levels
    "kinesis_sim_shard_split_scan": 18,
    "kinesis_sim_shard_merge_scan": 15,
    "kinesis_sim_split_render_e2e": 4,
    # the peeling trajectory always reports rounds 0..3
    "neardup_graph_2core": 4,
    # the FK audit reports every edge even over an empty load
    "fk_integrity_audit": 3,
    # the pipeline reports every stage even over an empty corpus
    # (all counts/metrics 0 — the oracle returns the same 6 rows)
    "curation_pipeline_e2e": 6,
    # the growth curve reports every checkpoint even over an empty
    # corpus (tokens/vocab 0 — the oracle returns the same 9 rows)
    "heaps_vocab_growth": 9,
    # the overlap curve reports every depth even over an empty load
    # (inter 0 — the oracle's depths CTE returns the same 10 rows)
    "rbo_ranking_overlap": 10,
    # the certificate reports every shingle width even over an empty
    # corpus (counts 0, retention 1000000 vacuously)
    "decontaminated_eval_certificate": 3,
}

# Only the watcher-surface family compiles templates (the process-global,
# non-reentrant compiler); everything else builds pure Column expressions
# and is safe to plan concurrently.
TEMPLATE_FAMILY = (
    "template_", "strftime_", "golayout_", "shorthost_", "lenient_json_",
)


def stage_empty_tables(spark, sf_dir: str, base: str) -> None:
    """Mirror the driver tables with identical schemas and 0 rows."""
    from kinesis_log_watcher_spark.queries.base import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).limit(0).write.parquet(f"{base}/{t}.parquet")


def sweep(spark, empty_sf_dir: str, items) -> list[str]:
    """Run (name, Query) pairs against the empty mirror, 12-wide (the
    sweep is driver-bound: each query costs plan/codegen, the data is
    empty; Catalyst and action submission are thread-safe). Returns
    failure strings; empty means the sweep is clean."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    build_lock = threading.Lock()

    def check(item) -> str | None:
        name, q = item
        try:
            if name.startswith(TEMPLATE_FAMILY):
                with build_lock:
                    df = q.fn(spark, empty_sf_dir)
            else:
                df = q.fn(spark, empty_sf_dir)
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001
            return f"{name}: {type(exc).__name__}: {exc}"
        if name in FIXED_CARDINALITY:
            if len(rows) != FIXED_CARDINALITY[name]:
                return (
                    f"{name}: {len(rows)} rows, expected the fixed "
                    f"{FIXED_CARDINALITY[name]}-row relation"
                )
            if name == "orders_expectation_audit" and any(
                r.violations != 0 for r in rows
            ):
                return f"{name}: nonzero violations from empty input"
            if name == "orders_column_profile" and any(
                r.n_total != 0 or r.n_nulls != 0 or r.n_distinct != 0
                for r in rows
            ):
                return f"{name}: nonzero counts from empty input"
            return None
        # global aggregates may return one all-null row; nothing should
        # fabricate more than that from empty inputs
        if len(rows) > 1:
            return f"{name}: {len(rows)} rows from empty input"
        return None

    with ThreadPoolExecutor(max_workers=12) as pool:
        return [f for f in pool.map(check, items) if f]


def load_manifest() -> set[str]:
    return _manifest.load_manifest(MANIFEST_PATH)


def main() -> int:
    import tempfile

    from kinesis_log_watcher_spark.queries import registry
    from kinesis_log_watcher_spark.session import get_spark

    argv = [a for a in sys.argv[1:] if a != "--no-write"]
    no_write = "--no-write" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    spark = get_spark(app_name="empty-sweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    items = [(n, q) for n, q in registry().items() if not is_streaming(n)]
    with tempfile.TemporaryDirectory(prefix="empty_sf_") as base:
        stage_empty_tables(spark, sf_dir, base)
        failures = sweep(spark, base, items)
    for f in failures:
        print(f"FLAG  {f}")
    print(f"\n{len(items)} queries swept, {len(failures)} failed")
    if not failures:
        _manifest.write_manifest_if_changed(
            MANIFEST_PATH, [n for n, _ in items], no_write
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
