"""Streaming MinHash+LSH near-dup: a bounded replay must produce
EXACTLY the batch candidate-pair relation, for any micro-batch split —
bucket state carries across batches, pairs are emitted once per
colliding band, and the (doc_a < doc_b) normalization makes the pair
set independent of arrival order."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from kinesis_log_watcher_spark.operators.dedup import (
    exploded_shingles,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signature,
)
from kinesis_log_watcher_spark.streaming.neardup import (
    NUM_HASHES,
    BANDS,
    run_stream_neardup,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def doc_files(spark, tmp_path):
    """Three files; near-dup pairs span file boundaries."""
    base = " ".join(f"t{i:02d}" for i in range(20))
    variant = base.replace("t07", "x07")  # high-Jaccard neighbor of base
    fresh = " ".join(f"u{i:02d}" for i in range(20))
    batches = [
        [(0, base), (1, fresh)],
        [(2, base), (3, variant)],          # 2 dups 0 across batches
        [(4, base), (5, " ".join(f"v{i:02d}" for i in range(20)))],
    ]
    d = tmp_path / "docs_stream"
    d.mkdir()
    for i, batch in enumerate(batches, start=1):
        stage = tmp_path / f"stage{i}"
        _mk_docs(spark, batch).coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        dest = d / f"f{i}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(d)


def _as_set(df):
    return {(r.doc_a, r.doc_b, r.n_bands) for r in df.collect()}


def test_replay_matches_batch_any_split(spark, doc_files):
    docs = spark.read.parquet(doc_files)
    expected = _as_set(
        lsh_candidate_pairs(
            lsh_bands(
                minhash_signature(exploded_shingles(docs), NUM_HASHES),
                NUM_HASHES,
                BANDS,
            )
        )
    )
    assert expected  # identical docs collide in all bands
    assert any(n == BANDS for _, _, n in expected)
    got_split = _as_set(run_stream_neardup(spark, doc_files, max_files_per_trigger=1))
    got_single = _as_set(run_stream_neardup(spark, doc_files))
    assert got_split == expected
    assert got_single == expected
