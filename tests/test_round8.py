"""Round-8 operators: the real merge-table BPE tokenizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.operators.bpe import (
    DEFAULT_MERGES,
    bpe_encode,
    doc_token_counts,
    merge_ranks,
    vocab_token_counts,
)
from kinesis_log_watcher_spark.queries import registry


def _q(name):
    return registry()[name].fn


def test_bpe_encode_iterates_by_min_rank():
    """The defining property vs a rank-order single pass: (s, low) is
    rank 1 but 'low' only exists after ranks 11/12 fire — an iterative
    encoder reaches ONE token; a single rank-order pass cannot."""
    ranks = merge_ranks()
    assert bpe_encode("slow", ranks) == ["slow"]
    assert bpe_encode("low", ranks) == ["low"]
    # multi-symbol chain in proper order
    assert bpe_encode("table", ranks) == ["table"]
    assert bpe_encode("value", ranks) == ["value"]
    # min-rank choice: 'data' has (d,a) r8 and (t,a) r2 — (t,a) first
    assert bpe_encode("data", ranks) == ["da", "ta"]
    # no applicable merge → characters
    assert bpe_encode("fq", ranks) == ["f", "q"]
    assert bpe_encode("x", ranks) == ["x"]
    assert bpe_encode("", ranks) == []


def test_bpe_encode_merges_all_occurrences_leftmost():
    """One merge step consumes every occurrence, scanning left to right
    and resuming after each merge (the GPT-2 pass)."""
    ranks = {("a", "a"): 0}
    assert bpe_encode("aaaa", ranks) == ["aa", "aa"]
    assert bpe_encode("aaa", ranks) == ["aa", "a"]
    ranks2 = {("a", "a"): 0, ("aa", "aa"): 1}
    assert bpe_encode("aaaa", ranks2) == ["aaaa"]


def test_vocab_token_counts_mapinpandas(spark):
    df = spark.createDataFrame(
        [("slow",), ("table",), ("fq",)], "word string"
    )
    got = {r.word: (r.n_tokens, r.tokens)
           for r in vocab_token_counts(df).collect()}
    assert got == {
        "slow": (1, "slow"),
        "table": (1, "table"),
        "fq": (2, "f|q"),
    }


def test_doc_token_counts_exact(spark):
    docs = spark.createDataFrame(
        [(1, "slow table"), (2, "fq fq slow")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in doc_token_counts(docs).collect()}
    assert got == {1: (2, 2), 2: (3, 5)}


def test_bpe_budget_recompute(spark, sf_dir):
    """Recompute the per-source budget rollup from the per-word Python
    encoder — independent of both the Spark plan and the oracle CTE."""
    from kinesis_log_watcher_spark.queries.base import load

    ranks = merge_ranks(DEFAULT_MERGES)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    per_source: dict = {}
    for r in docs:
        words = r.text.lower().split(" ")
        n_tokens = sum(len(bpe_encode(w, ranks)) for w in words)
        s = per_source.setdefault(
            r.source, {"docs": 0, "words": 0, "tokens": 0, "chunks": 0}
        )
        s["docs"] += 1
        s["words"] += len(words)
        s["tokens"] += n_tokens
        s["chunks"] += (n_tokens + 63) // 64
    got = {r.source: r for r in _q("bpe_tokenize_budget")(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for src, s in per_source.items():
        g = got[src]
        assert (g.n_docs, g.words_total, g.tokens_total, g.chunks_64_total) == (
            s["docs"], s["words"], s["tokens"], s["chunks"]
        )
        assert g.tokens_per_word_micro == s["tokens"] * 1000000 // s["words"]


def test_bpe_vocab_encodings_certifies_symbols(spark, sf_dir):
    ranks = merge_ranks(DEFAULT_MERGES)
    rows = _q("bpe_vocab_encodings")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        enc = bpe_encode(r.word, ranks)
        assert r.tokens == "|".join(enc) and r.n_tokens == len(enc)
    # the out-of-order rank-1 witness is present in the corpus
    by_word = {r.word: r.tokens for r in rows}
    if "slow" in by_word:
        assert by_word["slow"] == "slow"


def test_bpe_corpus_flows_jvm_side(spark, sf_dir):
    """Scale posture: the only Python node is the Arrow-batched encoder
    over the DISTINCT vocabulary — the corpus-side explode/join/agg is
    JVM codegen (no BatchEvalPython anywhere)."""
    plan = _q("bpe_tokenize_budget")(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1
