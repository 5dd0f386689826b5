#!/usr/bin/env python
"""Watcher render-path throughput: rows/sec through the full
filter → envelope → template → line pipeline (the reference's per-record
hot path, main.go:247-293).

Context for the number: the reference's ceiling is the Kinesis service
limit — 2 MB/s/shard ≈ a few thousand records/s/shard (BASELINE.md §b).
The Spark pipeline is a codegen'd narrow projection, so its single-node
throughput is orders of magnitude above the per-shard service ceiling;
this tool records it so BASELINE.md can carry a measured figure.

Usage: python tools/throughput.py [n_records]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.session import get_spark
from kinesis_log_watcher_spark.sources.fixture import kinesis_records_fixture
from kinesis_log_watcher_spark.watcher import build_lines


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="klw-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    # n-row raw-record input: replicate the 1k fixture via explode — the
    # render path cost is per-row, independent of payload distinctness.
    base = kinesis_records_fixture(spark, n_records=1000)
    reps = n // 1000
    big = base.withColumn(
        "_r", F.explode(F.sequence(F.lit(1), F.lit(reps)))
    ).drop("_r")
    big.write.mode("overwrite").parquet("/tmp/klw_throughput_input")
    records = spark.read.parquet("/tmp/klw_throughput_input")
    total = records.count()

    # warm-up (codegen)
    build_lines(records.limit(1000)).count()

    t0 = time.perf_counter()
    out = build_lines(records).count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "watch_render_rows_per_sec",
                "value": round(total / dt),
                "unit": "rows/sec",
                "rows": total,
                "rendered": out,
                "seconds": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
