"""Streaming IVF index maintenance (streaming/annindex.py): the
incrementally maintained index must answer exactly like a full rebuild,
and the stream must actually land per-batch deltas (not fall back to
one batch-side pass)."""

from __future__ import annotations

import glob
import os

from kinesis_log_watcher_spark.queries import registry
from kinesis_log_watcher_spark.streaming.annindex import (
    run_stream_ivf_index_update,
)

SF = "/root/testdata/sf0.001"


def _key(rows):
    return sorted((r["q_id"], r["neighbor_id"], r["rank"]) for r in rows)


def test_incremental_index_equals_rebuild_and_lands_deltas(spark, monkeypatch):
    # capture the scratch root the runner allocates so we can inspect
    # the delta layout it wrote
    import kinesis_log_watcher_spark.streaming.annindex as ai

    roots: list[str] = []
    real = ai.__dict__["run_stream_ivf_index_update"]
    orig_scratch = None

    from kinesis_log_watcher_spark import staging

    orig_scratch = staging.scratch_dir

    def spy_scratch(prefix):
        d = orig_scratch(prefix)
        if prefix.startswith("ivf_stream_"):
            roots.append(d)
        return d

    monkeypatch.setattr(staging, "scratch_dir", spy_scratch)

    # base covers the anchors + query panel; everything >= 100 streams
    # in across 3 replay micro-batches
    out = real(spark, f"{SF}/embeddings.parquet", base_max_id=100).collect()
    assert len(roots) == 1
    batches = sorted(glob.glob(os.path.join(roots[0], "deltas", "batch=*")))
    assert len(batches) >= 2, "stream must land one delta dir per micro-batch"

    # every streamed vector assigned exactly once across base + deltas
    cells = spark.read.schema("vec_id bigint, cell bigint").parquet(
        os.path.join(roots[0], "base"),
        *batches,
    )
    ids = [r["vec_id"] for r in cells.select("vec_id").collect()]
    assert len(ids) == len(set(ids)) == 500 - 8  # all non-anchor vectors

    # merge-on-read probe == the build-everything-batch-side answer
    rebuild = registry()["ann_ivf_topk"].fn(spark, SF).collect()
    assert _key(out) == _key(rebuild)
