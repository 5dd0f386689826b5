#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Timing protocol: one untimed warm-up pass of the first query (JVM/codegen
warm-up), then each query timed as full execution to a driver-side
materialization (count on the result — forces every stage; results are
small aggregates so collection cost is negligible).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_log_watcher_spark.queries import registry  # noqa: E402
from kinesis_log_watcher_spark.session import get_spark  # noqa: E402

# Headline set: every registered query except the streaming replays
# (their micro-batch bootstrap cost is not a query-engine number; they
# are still correctness-gated via the registry).
SKIP = {
    "stream_windowed_counts",
    "stream_sessionization_stateful",
    "stream_session_windows",
    "stream_click_purchase_join",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="klw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    reg = registry()
    names = [n for n in reg if n not in SKIP]

    # warm-up (JVM, codegen, parquet footer caches)
    reg[names[0]].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
