"""Archive-safety and run-order contracts for bench.py (round-10).

The committed BENCH_FULL_LOCAL.json is the cross-round performance
comparator — every self-adjudication (rerun detection, steal
attribution) reads it. Round 9 demonstrated two hazards this module
pins shut:

1. An unknown flag (``--subset``, not a real option) was silently
   ignored, ran the FULL registry, and overwrote the committed archive
   in the working tree. Unknown flags must now fail fast, and a full
   run without ``--commit`` must route to a .candidate sidecar.
2. The LPA graph family (three queries sharing the ``_lpa_labels``
   kernel) sat at adjacent run positions, so one hypervisor-steal burst
   inflated all three at once and cross-round comparison flagged the
   whole family (BENCH_r09's false positive). Family members must now
   run >=30 slots apart.

These tests are JVM-free (pure arg/order logic) except the fast
subprocess ones, which exit before Spark bring-up.
"""

from __future__ import annotations

import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_unknown_flag_fails_fast_without_touching_archives(tmp_path):
    # the r9 judge gotcha verbatim: --subset is not a flag
    out = subprocess.run(
        [sys.executable, "bench.py", "--subset", "a,b,c"],
        capture_output=True, text=True, timeout=60, cwd=REPO,
    )
    assert out.returncode == 2, out.stderr[-500:]
    assert "unrecognized arguments" in out.stderr
    # argparse exits in parse_args, before any archive write
    assert not os.path.exists(
        os.path.join(REPO, "BENCH_FULL_LOCAL.candidate.json.tmp")
    )


def test_no_match_only_exits_before_jvm():
    out = subprocess.run(
        [sys.executable, "bench.py", "--only", "no_such_query_xyz"],
        capture_output=True, text=True, timeout=120, cwd=REPO,
    )
    assert out.returncode != 0
    assert "no registered queries match" in (out.stderr + out.stdout)


def test_archive_routing():
    # only an explicit --commit full run may touch the committed file
    assert bench.archive_name(False, True) == "BENCH_FULL_LOCAL.json"
    assert bench.archive_name(False, False) == "BENCH_FULL_LOCAL.candidate.json"
    # subsets never hit the committed file, --commit or not
    assert bench.archive_name(True, False) == "BENCH_FULL_LOCAL.subset.json"
    assert bench.archive_name(True, True) == "BENCH_FULL_LOCAL.subset.json"


def test_parse_args_accepts_commit_and_only():
    ns = bench.parse_args(["--commit", "--only", "a,b"])
    assert ns.commit and ns.only == "a,b"
    ns = bench.parse_args([])
    assert not ns.commit and ns.only == ""


def test_family_spread_separates_lpa_trio():
    from kinesis_log_watcher_spark.queries import registry

    names = [n for n in registry() if n not in bench.SKIP]
    spread = bench.spread_families(names)
    # no query gained or lost
    assert sorted(spread) == sorted(names)
    for family in bench.FAMILY_SPREAD:
        pos = [spread.index(m) for m in family if m in spread]
        if len(pos) < 2:
            continue
        gaps = [b - a for a, b in zip(pos, pos[1:])]
        assert all(g >= bench._SPREAD_SLOTS for g in gaps), (
            f"family {family} at positions {pos}"
        )


def test_family_spread_noop_on_absent_members():
    # a subset missing the family must pass through untouched
    names = ["pricing_summary", "top_orders", "dedup_exact"]
    assert bench.spread_families(list(names)) == names


def test_family_spread_short_list_clamps():
    # fewer names than the spread distance: members go to the end, no
    # IndexError, nothing lost
    names = ["community_modularity", "x1", "neardup_graph_assortativity",
             "community_label_propagation", "x2"]
    spread = bench.spread_families(list(names))
    assert sorted(spread) == sorted(names)
    assert spread[0] == "community_modularity"
    # later members clamp to the tail
    assert spread[-2:] == ["neardup_graph_assortativity",
                           "community_label_propagation"]
