"""Empty-input registration gate.

The full registry-wide empty-input sweep lives in tools/empty_sweep.py
(a clean run writes its manifest); what the SUITE guarantees is that no
query can REGISTER past it: every registry entry absent from the last
clean full sweep's manifest is swept here, so a new query that throws on
empty inputs (a pruned partition, a filter matching nothing, an empty
shard — routine at 100 TB) fails the suite immediately, while the suite
no longer pays the ~190-query full sweep every run.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "empty_sweep",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "empty_sweep.py"),
)
empty_sweep = importlib.util.module_from_spec(_spec)
sys.modules["empty_sweep"] = empty_sweep
_spec.loader.exec_module(empty_sweep)


def _delta(names_only=True):
    from kinesis_log_watcher_spark.queries import registry

    manifest = empty_sweep.load_manifest()
    return [
        (n, q)
        for n, q in registry().items()
        if not empty_sweep.is_streaming(n) and n not in manifest
    ]


def test_manifest_fresh():
    """A missing/stale manifest would shrink the gate to nothing."""
    from kinesis_log_watcher_spark.queries import registry

    manifest = empty_sweep.load_manifest()
    assert manifest, (
        "tools/empty_sweep_manifest.json missing — run "
        "`python tools/empty_sweep.py` for a clean full sweep"
    )
    names = {
        n for n in registry() if not empty_sweep.is_streaming(n)
    }
    assert len(manifest & names) >= 0.9 * len(names), (
        "manifest stale: most of the registry is unswept — rerun the "
        "full sweep"
    )
    assert not (manifest - names), sorted(manifest - names)


def test_queries_added_since_last_full_sweep_survive_empty_tables(
    spark, sf_dir, tmp_path_factory
):
    """Sweep exactly the registry entries the last full sweep never saw
    (tools/empty_sweep.py sweep(), same checks). Empty delta → green
    without staging anything."""
    delta = _delta()
    if not delta:
        return
    base = tmp_path_factory.mktemp("empty_sf")
    empty_sweep.stage_empty_tables(spark, sf_dir, str(base))
    failures = empty_sweep.sweep(spark, str(base), delta)
    assert not failures, "\n".join(failures)


def test_sweep_actually_fires(spark, sf_dir, tmp_path_factory):
    """The gate must fire: a deliberately empty-hostile query (divides
    by a scalar count collected as a row that doesn't exist) is caught
    by the same sweep() the delta test runs."""

    class _Bad:
        def fn(self, spark_, d):
            from kinesis_log_watcher_spark.queries.base import load

            n = load(spark_, d, "orders").count()
            # throws on empty input — exactly the class the sweep exists
            # to catch
            if n == 0:
                raise ValueError("empty partition killed the job")
            return load(spark_, d, "orders").limit(1)

    from kinesis_log_watcher_spark.queries.base import load

    base = tmp_path_factory.mktemp("empty_sf_neg")
    # _Bad only reads orders — stage just that table, not the full mirror
    load(spark, sf_dir, "orders").limit(0).write.parquet(
        str(base / "orders.parquet")
    )
    failures = empty_sweep.sweep(spark, str(base), [("bad_query", _Bad())])
    assert failures and "bad_query" in failures[0]
