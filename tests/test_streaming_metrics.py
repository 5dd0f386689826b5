"""StreamingQueryListener metrics recorder: input-row accounting, state
rows, and watermark progression captured from a real replay."""

from __future__ import annotations

import time

from kinesis_log_watcher_spark.queries.base import load
from kinesis_log_watcher_spark.streaming.metrics import MetricsRecorder
from kinesis_log_watcher_spark.streaming.windows import run_windowed_counts


def test_recorder_accounts_every_input_row(spark, sf_dir):
    rec = MetricsRecorder.attach(spark)
    try:
        out = run_windowed_counts(spark, f"{sf_dir}/events.parquet")
        n_out = out.count()
        # listener callbacks are asynchronous: poll briefly for the
        # final progress event before folding
        deadline = time.time() + 30
        names = set()
        while time.time() < deadline:
            names = {r["name"] for r in rec.progress()}
            if any(n and n.startswith("windowed_counts_") for n in names):
                rows = [n for n in names if n and n.startswith("windowed_counts_")]
                s = rec.summary(rows[-1])
                if s["total_input_rows"] > 0:
                    break
            time.sleep(0.5)
    finally:
        rec.detach()
    qname = max(
        (n for n in names if n and n.startswith("windowed_counts_")),
        key=lambda n: int(n.rsplit("_", 1)[1]),
    )
    s = rec.summary(qname)
    n_events = load(spark, sf_dir, "events").count()
    assert s["total_input_rows"] == n_events
    assert s["n_batches"] >= 1
    assert s["max_state_rows"] >= n_out  # complete-mode agg state holds every window
