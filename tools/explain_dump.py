#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/explain_dump.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query. Used by the
optimization rounds to record before/after physical plans
(plans/rNN/<query>_before.txt / _after.txt) so plan-shape claims in
OPTIMIZATION_rNN.md are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)

    from kinesis_log_watcher_spark.queries import registry
    from kinesis_log_watcher_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="klw-explain")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


if __name__ == "__main__":
    main()
