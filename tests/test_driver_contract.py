"""Guards on the driver contract (__spark_entry__ + bench.py): these are
the interfaces the round harness consumes; breaking them silently would
void every other green test."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import __spark_entry__ as entrymod


def test_entry_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(oracles) <= set(qs), "every oracle key must be a query"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
    # at most a handful of rows-only entries; the gate is oracle coverage
    rows_only = set(qs) - set(oracles)
    assert len(rows_only) <= 2, f"too many un-oracled queries: {rows_only}"


def test_bench_emits_single_json_line(tmp_path):
    # Contract under test: ONE parseable stdout line within the
    # driver's tail budget, plus the full-fidelity sidecar file. A
    # 12-query subset exercises the identical code path (warm-up,
    # noop-materialize timing, budget fill, sidecar write) without the
    # ~3-minute full-registry run; SPARK_GRAFT_BENCH_FULL_PATH keeps
    # the committed per-round BENCH_FULL_LOCAL.json untouched.
    # 5 queries keep the contract exercise (warm-up, timing, budget
    # fill, sidecar) while shaving ~20s off the subprocess JVM run; the
    # mix still spans a join, a groupBy, a dedup, and a sketch.
    # 3 queries: a scan+agg, a top-k, and a dedup still walk every
    # contract branch (warm-up, timing, budget fill, sidecar, reruns)
    subset = "pricing_summary,top_orders,dedup_exact"
    full_out = tmp_path / "bench_full.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY=subset,
        SPARK_GRAFT_BENCH_FULL_PATH=str(full_out),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=560, env=env,
        cwd=os.path.dirname(os.path.abspath(entrymod.__file__)),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"bench must print exactly one line, got {len(lines)}"
    assert len(lines[0]) <= 2000, "stdout line exceeds the driver tail budget"
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert abs(d["sf"] - 0.001) < 1e-9
    assert d["n_queries"] == 3
    full = json.loads(full_out.read_text())
    assert set(full["queries"]) == set(subset.split(","))


def test_front_order_names_all_registered():
    # _FRONT is the static verification-priority prefix; a typo'd or
    # stale name would silently drop a query from first-pass sampling.
    from kinesis_log_watcher_spark.queries.base import _FRONT, registry

    reg = registry()
    missing = [n for n in _FRONT if n not in reg]
    assert not missing, f"_FRONT names not in registry: {missing}"
    assert len(set(_FRONT)) == len(_FRONT), "duplicate names in _FRONT"
