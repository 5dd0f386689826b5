#!/usr/bin/env python
"""Interleaved A/B of registry queries under two env-var settings.

Usage:
  python tools/ab_env.py VAR=old VAR=new REPS q1 q2 ...

Runs each query alternating arm A (first VAR=val) and arm B (second)
inside ONE JVM, REPS times each, and reports per-query min/median per
arm. Interleaving cancels host drift (bursty hypervisor steal on this
box makes one-shot absolute timings unusable); min-of-reps is the
noise-robust statistic the repo's optimization rounds compare.

Env values take effect because queries/base.py reads its tuning knobs
at query-build time. Multiple VAR=val pairs per arm may be separated
with commas: "A=1,B=2" "A=3,B=4".
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    arm_a, arm_b, reps_s, *names = sys.argv[1:]
    reps = int(reps_s)

    from kinesis_log_watcher_spark.queries import registry
    from kinesis_log_watcher_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="klw-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    def set_arm(spec: str) -> None:
        # keys starting with "spark." are runtime SQL confs (lets an arm
        # toggle AQE knobs); everything else is a process env var read
        # at query-build time.
        for pair in spec.split(","):
            k, _, v = pair.partition("=")
            if k.startswith("spark."):
                spark.conf.set(k, v)
            else:
                os.environ[k] = v

    def run(name: str) -> float:
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
        return dt

    # warm-up: one pass of the first query under each arm
    for arm in (arm_a, arm_b):
        set_arm(arm)
        run(names[0])

    res: dict[str, dict[str, list[float]]] = {n: {"A": [], "B": []} for n in names}
    for rep in range(reps):
        for name in names:
            # Alternate arm ORDER per rep: running the same query twice
            # back-to-back systematically favors whichever arm goes
            # second (identical-plan null pairs measured second-arm/first-
            # arm ratios of 0.64-0.9), so each arm must go first equally
            # often or marginal wins are harness artifacts.
            arms = (("A", arm_a), ("B", arm_b))
            if rep % 2:
                arms = arms[::-1]
            for arm_key, arm in arms:
                set_arm(arm)
                res[name][arm_key].append(run(name))
        print(f"-- rep {rep + 1}/{reps} done", file=sys.stderr)

    print(f"{'query':42s} {'A_min':>7s} {'B_min':>7s} {'B/A':>6s}   A={arm_a} B={arm_b}")
    ta = tb = 0.0
    for n in names:
        a = min(res[n]["A"])
        b = min(res[n]["B"])
        ta += a
        tb += b
        med_a = statistics.median(res[n]["A"])
        med_b = statistics.median(res[n]["B"])
        print(f"{n:42s} {a:7.2f} {b:7.2f} {b / a:6.2f}   med {med_a:.2f}/{med_b:.2f}")
    print(f"{'TOTAL(min)':42s} {ta:7.2f} {tb:7.2f} {tb / ta:6.2f}")


if __name__ == "__main__":
    main()
