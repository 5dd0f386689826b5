#!/usr/bin/env python
"""Oracle-SQL hygiene lint: catch engine-divergence-prone constructs
BEFORE they cost a correctness round.

The r5 `key_skew_profile` incident class: DuckDB silently promotes
integer aggregates to HUGEINT (SUM(BIGINT) -> INT128), which pandas
renders as object/float and the value-hash comparison then diverges
from Spark's BIGINT even though the math agrees. The repo's guard is
"CAST every aggregate at the aggregation site"; this lint enforces the
OUTCOME rather than the syntax, so it has no false positives on
guarded queries:

- **type check** (DESCRIBE, no execution): any output column typed
  HUGEINT / UHUGEINT / DECIMAL / FLOAT(32) / TIME is flagged — those
  are exactly the DuckDB types whose pandas materialization drifts
  from the Spark schema the driver hash-compares against.
- **value check** (executed at a small SF): any DOUBLE output column
  containing NaN or +/-Inf is flagged — DuckDB yields NaN where Spark
  yields NULL for 0/0, and zero-variance denominators are the classic
  source.
- **shape check** (regex): LIMIT without ORDER BY anywhere in the
  statement — a nondeterministic oracle can never be hash-stable.

Zero findings on the current registry is the contract
(tests/test_oracle_lint.py wires this into the suite); a new query
that trips a rule either adds the established guard (exact DECIMAL ->
BIGINT cast, NULLIF/CASE on the denominator, a deterministic ORDER BY
key) or earns an explicit entry in ALLOWED with a reason.

Usage: python tools/oracle_lint.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _manifest  # noqa: E402  (tools/_manifest.py — shared gate plumbing)

from kinesis_log_watcher_spark.queries.base import TABLES  # noqa: E402

# Queries allowed to trip a rule, with the reason the divergence class
# does not apply. Keep this SHORT — the point is that guards beat
# whitelist entries.
ALLOWED: dict[str, str] = {}

# Exact base types whose pandas materialization drifts from the Spark
# schema the driver hash-compares against. DECIMAL/TIMESTAMP are NOT
# here: explicit DECIMAL casts are the repo's exactness guard itself,
# and TIMESTAMP normalizes cleanly on both sides. The incident class is
# *implicit promotion* (HUGEINT) and narrow floats.
_BAD_TYPES = {"HUGEINT", "UHUGEINT", "INT128", "UINT128", "FLOAT", "TIME"}


def lint_one(con, name: str, sql: str) -> list[str]:
    findings: list[str] = []
    s = sql.upper()
    if re.search(r"\bLIMIT\b", s) and "ORDER BY" not in s:
        findings.append("LIMIT without ORDER BY (nondeterministic oracle)")

    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as exc:  # noqa: BLE001
        return [f"oracle does not parse: {exc}"]
    for cname, ctype, *_ in cols:
        base = ctype.strip().split("(")[0].upper()
        if base in _BAD_TYPES:
            findings.append(
                f"output column {cname} typed {ctype} "
                "(pandas materialization drifts from the Spark schema)"
            )

    # Value probe via fetchall, NOT .df(): pandas renders SQL NULL in a
    # float column as NaN, which would conflate legitimate NULLs (outer
    # joins, ROLLUP grouping keys) with the divergence class — a
    # COMPUTED NaN/Inf (0/0, log(0), zero variance).
    import math

    try:
        rows = con.execute(sql).fetchall()
    except Exception as exc:  # noqa: BLE001
        return findings + [f"oracle does not execute: {exc}"]
    colnames = [c[0] for c in cols]
    bad_nan: set[str] = set()
    bad_inf: set[str] = set()
    for row in rows:
        for cname, v in zip(colnames, row):
            if isinstance(v, float):
                if math.isnan(v):
                    bad_nan.add(cname)
                elif math.isinf(v):
                    bad_inf.add(cname)
    for cname in sorted(bad_nan):
        findings.append(
            f"column {cname} yields NaN (DuckDB NaN vs Spark NULL "
            "divergence; guard the denominator)"
        )
    for cname in sorted(bad_inf):
        findings.append(f"column {cname} yields +/-Inf")
    return findings


# Manifest of the oracles covered by the last CLEAN full lint run. The
# suite's registration gate (tests/test_oracle_lint.py) lints every
# registry entry NOT in this manifest, so a post-lint registration
# cannot slip a divergence-class oracle past the gate while the suite
# skips re-linting the settled registry. A clean FULL run (no `only`
# filter) rewrites it.
MANIFEST_PATH = _manifest.manifest_path("oracle_lint_manifest.json")


def load_manifest() -> set[str]:
    return _manifest.load_manifest(MANIFEST_PATH)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-write"]
    no_write = "--no-write" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from kinesis_log_watcher_spark.queries import registry

    # One DuckDB connection per worker thread (connections are not
    # thread-safe; cursors off one connection share its lock and
    # serialize). Each registers the same parquet views.
    local = threading.local()

    def con() -> duckdb.DuckDBPyConnection:
        if getattr(local, "con", None) is None:
            c = duckdb.connect()
            # each connection defaults to ALL cores for its internal
            # pipeline; 8 workers x 32 threads thrash the scheduler
            # (measured 14s -> 67s inside a busy suite process). Cap
            # per-connection parallelism so pool x threads ~ cores.
            c.execute("SET threads TO 4")
            for t in TABLES:
                c.execute(
                    f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            local.con = c
        return local.con

    items = [
        (name, q.oracle)
        for name, q in registry().items()
        if q.oracle and (not only or name in only)
    ]

    def run(item: tuple[str, str]) -> tuple[str, list[str]]:
        name, sql = item
        return name, lint_one(con(), name, sql)

    failures = 0
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, findings in pool.map(run, items):
            if not findings:
                continue
            if name in ALLOWED:
                print(
                    f"note  {name}: {'; '.join(findings)} "
                    f"(allowed: {ALLOWED[name]})"
                )
            else:
                failures += 1
                print(f"FLAG  {name}: {'; '.join(findings)}")
    print(f"\n{len(items)} oracles linted, {failures} flagged")
    if not failures and not only:
        _manifest.write_manifest_if_changed(
            MANIFEST_PATH, [name for name, _ in items], no_write,
            noun="oracles",
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
