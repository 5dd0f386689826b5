"""Oracle-SQL hygiene gate (tools/oracle_lint.py): the whole registry
must lint clean, and each rule must actually fire on its incident class
(otherwise a passing sweep proves nothing)."""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

_spec = importlib.util.spec_from_file_location(
    "oracle_lint", "/root/repo/tools/oracle_lint.py"
)
oracle_lint = importlib.util.module_from_spec(_spec)
sys.modules["oracle_lint"] = oracle_lint
_spec.loader.exec_module(oracle_lint)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE VIEW t AS SELECT * FROM (VALUES (1, 2.0), (3, 0.0)) v(a, b)")
    return c


def test_rule_fires_on_hugeint_promotion(con):
    # the r5 key_skew_profile class: unguarded SUM(BIGINT) -> HUGEINT
    f = oracle_lint.lint_one(con, "x", "SELECT SUM(CAST(a AS BIGINT)) AS s FROM t")
    assert any("HUGEINT" in x for x in f)
    # the established guard passes
    f = oracle_lint.lint_one(
        con, "x", "SELECT CAST(SUM(CAST(a AS BIGINT)) AS BIGINT) AS s FROM t"
    )
    assert f == []


def test_rule_fires_on_computed_nan_not_on_null(con):
    f = oracle_lint.lint_one(con, "x", "SELECT CAST('nan' AS DOUBLE) AS r FROM t")
    assert any("NaN" in x for x in f)
    # plain NULL in a float column is NOT the divergence class (this
    # DuckDB yields NULL for 0/0 and zero-variance stddev — exactly why
    # the probe must not use pandas, which renders NULL as NaN)
    f = oracle_lint.lint_one(con, "x", "SELECT b / b AS r FROM t")
    assert f == []
    f = oracle_lint.lint_one(
        con, "x", "SELECT CASE WHEN a = 1 THEN b END AS r FROM t"
    )
    assert f == []


def test_rule_fires_on_inf_and_unordered_limit(con):
    f = oracle_lint.lint_one(con, "x", "SELECT 1e308 * b AS r FROM t")
    assert any("Inf" in x for x in f)
    f = oracle_lint.lint_one(con, "x", "SELECT a FROM t LIMIT 1")
    assert any("LIMIT" in x for x in f)
    f = oracle_lint.lint_one(con, "x", "SELECT a FROM t ORDER BY a LIMIT 1")
    assert f == []


def test_lint_manifest_fresh():
    """A missing/stale manifest would shrink the delta gate to nothing;
    require it to exist, cover the bulk of the registry, and name no
    ghost queries."""
    from kinesis_log_watcher_spark.queries import registry

    manifest = oracle_lint.load_manifest()
    assert manifest, (
        "tools/oracle_lint_manifest.json missing — run "
        "`python tools/oracle_lint.py` for a clean full lint"
    )
    names = {n for n, q in registry().items() if q.oracle}
    assert len(manifest & names) >= 0.9 * len(names), (
        "manifest stale: most of the registry is unlinted — rerun the "
        "full lint"
    )
    assert not (manifest - names), sorted(manifest - names)


def test_oracles_added_since_last_full_lint_are_clean():
    """Lint exactly the oracles the last clean full lint never saw —
    run the tool's own main() path with the `only` filter so CI and the
    CLI can't drift. Empty delta → main() lints nothing and stays green
    (and must NOT rewrite the manifest on a filtered run)."""
    from kinesis_log_watcher_spark.queries import registry

    manifest = oracle_lint.load_manifest()
    delta = sorted(
        n for n, q in registry().items() if q.oracle and n not in manifest
    )
    assert oracle_lint.main.__module__ == "oracle_lint"
    argv, sys.argv = sys.argv, (
        ["oracle_lint.py", "/root/testdata/sf0.001"] + (delta or ["__none__"])
    )
    try:
        assert oracle_lint.main() == 0
    finally:
        sys.argv = argv
    assert oracle_lint.load_manifest() == manifest
