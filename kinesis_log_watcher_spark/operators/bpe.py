"""Merge-table BPE tokenizer — the real (GPT-2-style) algorithm.

The public byte-pair-encoding tokenizer every modern LLM pipeline runs
(Sennrich et al. 2016 training; the GPT-2 encoder's application loop):
given a RANKED merge table, a word is encoded by repeatedly finding the
LOWEST-RANKED merge whose pair of adjacent symbols is present and merging
all its occurrences (leftmost first, resuming after each merge), until no
table pair applies. This differs from applying merges once each in rank
order: a later-ranked merge can build a symbol that an earlier-ranked
merge then consumes (e.g. table ``[(s,low), …, (l,o), (lo,w)]`` encodes
``slow`` to ONE token — ranks 11/12 build ``low``, then rank 1 fires).
Truncated or concatenated production merge tables have exactly this
shape, so the iterative loop is the correct semantics, not a nicety.

Spark shape (the 100 TB posture):
- the encoder runs over the DISTINCT vocabulary, never the corpus — one
  ``mapInPandas`` (Arrow-batched) stage on a vocabulary-sized relation;
  corpus-side token accounting is then a plain (word → n_tokens)
  equi-join + rollup, the same discipline as doc_bpe_token_counts
  (queries/llm.py). The Python loop cost is per DISTINCT word.
- the merge table is an input (production tables ship as static
  artifacts, e.g. GPT-2's vocab.bpe), broadcast implicitly as a task
  closure — bounded by vocab size (50k pairs ≈ 1 MB), never joined.

The whole reference (a Kinesis tail/render CLI, main.go:1-416) has no
tokenizer; this operator is part of the LLM-data-pipeline surface the
engine adds (SURVEY.md §7.5): exact token accounting is what prices and
packs a training corpus — whitespace counts misprice by 2-4x.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A small static merge table over the test corpus' alphabet, with
# multi-symbol chains and one deliberately out-of-order entry
# ((s, low) at rank 1 — its right symbol is only built by ranks 11/12)
# so every green result certifies the min-rank ITERATION, not a
# single pass in rank order.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("s", "low"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e"),
    ("t", "h"),
    ("th", "e"),
    ("d", "a"),
    ("da", "t"),
    ("dat", "a"),
    ("l", "o"),
    ("lo", "w"),
    ("e", "r"),
    ("v", "a"),
    ("va", "l"),
    ("u", "e"),
    ("val", "ue"),
    ("i", "n"),
    ("d", "o"),
    ("w", "in"),
)


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a ranked merge table — the GPT-2 loop:
    lowest-ranked applicable pair, merge all occurrences leftmost-first
    (resume after each merge), repeat until no pair applies."""
    syms: list[str] = list(word)
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank = len(ranks)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and r < best_rank:
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def merge_ranks(
    merges: Sequence[tuple[str, str]] = DEFAULT_MERGES,
) -> dict[tuple[str, str], int]:
    return {pair: rank for rank, pair in enumerate(merges)}


VOCAB_TOKENS_SCHEMA = "word string, n_tokens bigint, tokens string"


def vocab_token_counts(
    vocab: DataFrame,
    merges: Sequence[tuple[str, str]] = DEFAULT_MERGES,
    word_col: str = "word",
) -> DataFrame:
    """(word → n_tokens, tokens) over a DISTINCT-word relation via one
    Arrow-batched mapInPandas stage. ``tokens`` is the '|'-joined symbol
    sequence (the exact encoding, not just its length) so callers — and
    the DuckDB oracle — certify the encoder symbol-for-symbol."""
    ranks = merge_ranks(merges)

    def encode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            words = pdf[word_col].tolist()
            encs = [bpe_encode(w, ranks) for w in words]
            yield pd.DataFrame(
                {
                    "word": words,
                    "n_tokens": [len(e) for e in encs],
                    "tokens": ["|".join(e) for e in encs],
                }
            )

    return vocab.select(F.col(word_col)).mapInPandas(
        encode_batch, VOCAB_TOKENS_SCHEMA
    )


def doc_token_counts(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]] = DEFAULT_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-document BPE token counts: explode the lowercased
    whitespace word stream, encode the DISTINCT vocabulary once
    (vocab_token_counts), equi-join the counts back, roll up per doc.
    Scale shape: the Python encoder touches |vocab| rows; the corpus
    only flows through JVM explode/join/agg."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    )
    per_word = vocab_token_counts(words.select("word").distinct(), merges)
    return (
        words.join(per_word.select("word", "n_tokens"), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
