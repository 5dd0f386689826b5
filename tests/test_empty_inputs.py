"""Every batch query must survive EMPTY inputs — no exceptions, no
spurious rows beyond global-aggregate nulls. At 100 TB empty inputs are
routine (a pruned partition, a filter that matches nothing, an empty
shard) and an operator that throws on them kills the job."""

from __future__ import annotations

import pytest

from kinesis_log_watcher_spark.queries import registry
from kinesis_log_watcher_spark.queries.base import TABLES, load

# Every stream_* query is a replay-backed Structured Streaming run:
# on (empty, NULL-ts sentinel) input the sweep would pay dataset
# staging plus multiple micro-batch jobs per query and assert the
# streaming harness, not the batch operators this sweep exists for.
# Degenerate-input streaming behavior is covered where it belongs, in
# the dedicated tests/test_streaming_*.py / test_watermark.py suites.
def _is_streaming(name: str) -> bool:
    return name.startswith("stream_")

# Queries whose output is a FIXED-cardinality relation independent of the
# input (an unpivoted check suite reports every check even on an empty
# load — with zero violations, which the assertion below pins).
FIXED_CARDINALITY = {
    "orders_expectation_audit": 7,
    # the profile reports every column even of an empty load (n_total=0)
    "orders_column_profile": 6,
    # the Kinesis-simulator queries read the CUSTOM SOURCE, not the
    # driver tables — their output is a pure function of the simulator
    # parameters and ignores sf_dir entirely
    "kinesis_sim_batch_scan": 12,
    "kinesis_sim_render_e2e": 4,
    # reshard scans: parents x levels + children x levels (split: 3 full
    # parents x3 + closed parent x3 + 2 children x3 = 18; merge: 2 full
    # parents x3 + 2 closed parents x3 + 1 child x3 = 15; the reshard
    # render certificate groups by the 4 content hosts)
    "kinesis_sim_shard_split_scan": 18,
    "kinesis_sim_shard_merge_scan": 15,
    "kinesis_sim_split_render_e2e": 4,
    # the peeling trajectory always reports rounds 0..3 (all-zero on an
    # empty graph)
    "neardup_graph_2core": 4,
    # the FK audit reports every edge even over an empty load (counting
    # aggregates yield one 0-row report per edge)
    "fk_integrity_audit": 3,
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """A mirror of the driver tables with identical schemas and 0 rows."""
    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load(spark, sf_dir, t).limit(0).write.parquet(str(base / f"{t}.parquet"))
    return str(base)


def test_every_batch_query_survives_empty_tables(spark, empty_sf_dir):
    # The sweep is driver-bound (each query costs plan/codegen, the data
    # is empty) — Catalyst and action submission are thread-safe, so an
    # 8-wide pool turns ~190 sequential executions into parallel ones.
    # The PYTHON-side builder runs under a lock: the template compiler
    # (and any other driver-side Python state a builder touches) is
    # process-global and not re-entrant; only the JVM-side collect()
    # parallelizes, which is where the time goes.
    import threading
    from concurrent.futures import ThreadPoolExecutor

    build_lock = threading.Lock()

    # Only the watcher-surface family compiles templates (the
    # process-global, non-reentrant compiler); everything else builds
    # pure Column expressions and is safe to plan concurrently.
    TEMPLATE_FAMILY = ("template_", "strftime_", "golayout_", "shorthost_",
                       "lenient_json_")

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

    items = [
        (n, q) for n, q in registry().items() if not _is_streaming(n)
    ]
    with ThreadPoolExecutor(max_workers=12) as pool:
        failures = [f for f in pool.map(check, items) if f]
    assert not failures, "\n".join(failures)
