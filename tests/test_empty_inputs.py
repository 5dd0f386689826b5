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
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """A mirror of the driver tables with identical schemas and 0 rows."""
    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load(spark, sf_dir, t).limit(0).write.parquet(str(base / f"{t}.parquet"))
    return str(base)


def test_every_batch_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, q in registry().items():
        if _is_streaming(name):
            continue
        try:
            rows = q.fn(spark, empty_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if name in FIXED_CARDINALITY:
            if len(rows) != FIXED_CARDINALITY[name]:
                failures.append(
                    f"{name}: {len(rows)} rows, expected the fixed "
                    f"{FIXED_CARDINALITY[name]}-row relation"
                )
            elif any(r.violations != 0 for r in rows):
                failures.append(f"{name}: nonzero violations from empty input")
            continue
        # global aggregates may return one all-null row; nothing should
        # fabricate more than that from empty inputs
        if len(rows) > 1:
            failures.append(f"{name}: {len(rows)} rows from empty input")
    assert not failures, "\n".join(failures)
