"""Round-8 queries: the real merge-table BPE tokenizer as an operator.

The reference (a 416-line Kinesis tail/render CLI) has no tokenizer;
these queries extend the LLM-data-pipeline surface (SURVEY.md §7.5)
with the one training-data primitive the registry still approximated by
whitespace counts: EXACT token accounting through the public GPT-2-style
merge-table BPE algorithm (operators/bpe.py), the number that prices,
packs and budgets a training corpus.

Both queries run the encoder over the DISTINCT vocabulary through one
Arrow-batched mapInPandas stage; the DuckDB oracle recomputes the SAME
iterative min-rank merge loop off the SAME literal merge table with a
recursive CTE — a green row certifies the encoder symbol-for-symbol,
including the out-of-order (s, low) entry that only an iterative
encoder (not a rank-order single pass) can apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.operators.bpe import (
    DEFAULT_MERGES,
    doc_token_counts,
    vocab_token_counts,
)
from kinesis_log_watcher_spark.queries.base import load, register

_MERGE_VALUES = ", ".join(
    f"({rank + 1}, '{a}', '{b}')" for rank, (a, b) in enumerate(DEFAULT_MERGES)
)

# The shared oracle core: vocabulary → iterative min-rank BPE encode as
# a recursive CTE. Each step merges ALL occurrences (replace() scans
# left to right and resumes after each replacement — exactly the GPT-2
# merge pass) of the lowest-ranked pair present in the boundary-
# delimited symbol string; rows stop recursing when no table pair
# applies. `fin` is the terminal relation: (word, tokens, n_tokens).
_BPE_ENC_CTE = f"""
    m(rank, a, b) AS (VALUES {_MERGE_VALUES}),
    words AS (
      SELECT doc_id, source,
             unnest(string_split(lower(text), ' ')) AS word
      FROM documents),
    v AS (SELECT DISTINCT word FROM words),
    enc AS (
      SELECT word, '|' || regexp_replace(word, '(.)', '\\1|', 'g') AS s
      FROM v
      UNION ALL
      SELECT word,
             replace(s,
               (SELECT '|'||a||'|'||b||'|' FROM m
                WHERE contains(enc.s, '|'||a||'|'||b||'|')
                ORDER BY rank LIMIT 1),
               (SELECT '|'||a||b||'|' FROM m
                WHERE contains(enc.s, '|'||a||'|'||b||'|')
                ORDER BY rank LIMIT 1))
      FROM enc
      WHERE EXISTS (SELECT 1 FROM m
                    WHERE contains(enc.s, '|'||a||'|'||b||'|'))),
    fin AS (
      SELECT word,
             trim(s, '|') AS tokens,
             CAST(len(s) - len(replace(s, '|', '')) - 1 AS BIGINT)
               AS n_tokens
      FROM enc e
      WHERE NOT EXISTS (SELECT 1 FROM m
                        WHERE contains(e.s, '|'||a||'|'||b||'|')))
"""


@register(
    "bpe_vocab_encodings",
    f"""
    WITH RECURSIVE {_BPE_ENC_CTE}
    SELECT word, n_tokens, tokens FROM fin
    """,
    doc="The GPT-2-style merge-table BPE encoder certified symbol-for-"
    "symbol: every DISTINCT corpus word encoded by the iterative "
    "lowest-rank merge loop (operators/bpe.py bpe_encode, Arrow-batched "
    "mapInPandas), output as the exact '|'-joined token sequence. The "
    "oracle recomputes the loop as a DuckDB recursive CTE off the same "
    "literal merge table. The table's rank-1 entry (s, low) pairs a "
    "symbol built only by ranks 11/12, so a green row proves the "
    "encoder re-evaluates ranks each iteration — the real algorithm, "
    "not a single rank-order pass. Scale shape: the Python loop runs "
    "once per DISTINCT word (vocabulary-sized, corpus-independent); "
    "the merge table rides along as a task closure, never joined.",
)
def bpe_vocab_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).distinct()
    return vocab_token_counts(vocab).select("word", "n_tokens", "tokens")


@register(
    "bpe_tokenize_budget",
    f"""
    WITH RECURSIVE {_BPE_ENC_CTE},
    per_doc AS (
      SELECT w.doc_id, w.source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(f.n_tokens) AS BIGINT) AS n_tokens
      FROM words w JOIN fin f USING (word)
      GROUP BY w.doc_id, w.source)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS words_total,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM((n_tokens + 63) // 64) AS BIGINT) AS chunks_64_total,
           CAST(SUM(n_tokens) * 1000000 // SUM(n_words) AS BIGINT)
             AS tokens_per_word_micro
    FROM per_doc GROUP BY source
    """,
    doc="Exact token budgeting for training-data packing: per-document "
    "BPE token counts (operators/bpe.py doc_token_counts — encode the "
    "DISTINCT vocabulary once, equi-join counts back to the word "
    "stream) rolled up per source with the 64-token sequence-packing "
    "chunk count ceil(n_tokens/64) and the exact tokens-per-word micro "
    "ratio — the fertility statistic and the chunk budget that price a "
    "training run, which whitespace counting (the registry's previous "
    "approximation) cannot produce. Scale shape: corpus rows flow only "
    "through JVM explode/equi-join/two-level agg; Python touches "
    "|vocab| rows once.",
)
def bpe_tokenize_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_doc = doc_token_counts(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("words_total"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        F.sum(F.expr("(n_tokens + 63) div 64"))
        .cast("long")
        .alias("chunks_64_total"),
        F.expr("sum(n_tokens) * 1000000 div sum(n_words)")
        .cast("long")
        .alias("tokens_per_word_micro"),
    )
