"""Text-analysis operators: language ID, quality scoring, token counting,
fingerprinting. All pure built-ins — per-row narrow maps that scale
linearly with input partitions; the only shuffles are the final
aggregations a query asks for."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword lists for the n-gram/stopword-vote heuristic.
# (A production system would use character n-gram profiles; the operator
# shape — token explode + broadcast stoplist join + per-doc argmax — is
# identical.)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "es": ["el", "la", "de", "y", "que", "los", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "les", "un", "est"],
    "zh": ["de5", "shi4", "le5", "zai4", "wo3", "you3", "he2"],
}

UND = "und"  # prediction when no stopword list scores any hit

# BPE-ish pre-tokenizer: letter runs | digit runs | single other glyphs.
# Space-only (not \s) so the regex behaves identically in Java and RE2.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def ws_token_count(text: Column) -> Column:
    return F.size(F.split(text, " ")).cast("long")


def regex_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def punct_count(text: Column) -> Column:
    return (
        F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    ).cast("long")


def _stop_hits_arr(toks: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def _mean_len_arr(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.size(toks)


def _quality_composition(
    stop_hits: Column, n_tokens: Column, punct: Column,
    n_chars: Column, mean_tok: Column,
) -> Column:
    """THE quality formula — defined once; the SQL oracle mirrors this
    exact op order so doubles match bit-for-bit:
    stop_ratio - punct_ratio + mean_token_len/10."""
    return (
        stop_hits.cast("double") / n_tokens
        - punct.cast("double") / n_chars
        + mean_tok / 10
    )


def stopword_hits(text: Column, lang: str = "en") -> Column:
    return _stop_hits_arr(F.split(text, " "), lang)


def mean_token_length(text: Column) -> Column:
    return _mean_len_arr(F.split(text, " "))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite quality score (see _quality_composition)."""
    return _quality_composition(
        stopword_hits(text),
        ws_token_count(text),
        punct_count(text),
        n_chars,
        mean_token_length(text),
    )


def quality_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_chars_col: str = "n_chars",
) -> DataFrame:
    """(id, n_tokens, n_punct, stop_hits, mean_token_len, quality) — the
    efficient shape of the per-doc quality metrics: the text is
    tokenized ONCE and the punctuation count computed ONCE into
    evaluate-once prep columns (functions/evalonce.gate); every metric
    derives from those, through the same building blocks as the
    Column-level helpers above — one source of truth for the arithmetic
    the SQL oracle mirrors."""
    from kinesis_log_watcher_spark.functions.evalonce import gate

    prepped = docs.select(
        F.col(id_col),
        F.col(n_chars_col),
        gate(F.split(F.col(text_col), " ")).alias("__toks"),
        gate(punct_count(F.col(text_col))).alias("__punct"),
    )
    toks, punct = F.col("__toks"), F.col("__punct")
    stop_hits = _stop_hits_arr(toks)
    n_tokens = F.size(toks).cast("long")
    mean_tok = _mean_len_arr(toks)
    quality = _quality_composition(
        stop_hits, n_tokens, punct, F.col(n_chars_col), mean_tok
    )
    return prepped.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        punct.alias("n_punct"),
        stop_hits.alias("stop_hits"),
        mean_tok.alias("mean_token_len"),
        quality.alias("quality"),
    )


# Polynomial rolling hash: h ← (h·B + tokhash) mod M, folded left→right
# over the token stream (order-SENSITIVE, unlike the sorted-bag
# fingerprint). Constants sized so the fold never overflows int64:
# acc < M = 2^31-1, acc·B < 2^51, + tokhash (< 16^7 = 2^28) < 2^52.
ROLL_B = 1_000_003
ROLL_M = 2_147_483_647  # 2^31 − 1


def _roll_token_hash(tok: Column) -> Column:
    """Token → 28-bit int via md5 prefix (engine-reproducible)."""
    return F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long")


def _roll_fold(tokens: Column) -> Column:
    """Fold rolling hash over an array of tokens."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(ROLL_B) + _roll_token_hash(t)) % F.lit(ROLL_M),
    )


def rolling_fingerprint(text: Column) -> Column:
    """Whole-document rolling hash (order-sensitive content id)."""
    return _roll_fold(F.split(text, " "))


def min_window_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min rolling hash over all
    `window`-token windows — robust to prefix/suffix edits because any
    shared w-token run yields the same candidate hash. Docs shorter than
    the window fall back to the whole-doc hash. Per-row cost is
    O(tokens·window), still a narrow map (no shuffle). Column-level
    convenience — ``fingerprint_frame`` is the fast path (tokens md5'd
    once instead of once per window)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    window_hashes = F.transform(
        F.sequence(F.lit(1), n - (window - 1)),
        lambda i: _roll_fold(F.slice(toks, i, window)),
    )
    return F.when(n >= window, F.array_min(window_hashes)).otherwise(
        _roll_fold(toks)
    )


def _roll_fold_hashed(hashes: Column) -> Column:
    """Fold the rolling hash over an array of already-hashed tokens."""
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLL_B) + h) % F.lit(ROLL_M),
    )


def fingerprint_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """(id, roll_fp, min_win_fp) for every document — the efficient
    shape of ``rolling_fingerprint`` + ``min_window_fingerprint``.

    Tokens are md5-hashed ONCE into an evaluate-once prep column
    (functions/evalonce.gate — higher-order functions are interpreted,
    so without the pin every window fold re-hashes its tokens: ~window×
    redundant md5 work per document). All folds then run over int64
    arrays. Still a narrow map: no shuffle, linear scale-out."""
    from kinesis_log_watcher_spark.functions.evalonce import gate

    th = F.transform(F.split(F.col(text_col), " "), _roll_token_hash)
    prepped = docs.select(F.col(id_col), gate(th).alias("__th"))
    thc = F.col("__th")
    win = F.transform(
        F.sequence(F.lit(1), F.size(thc) - (window - 1)),
        lambda i: _roll_fold_hashed(F.slice(thc, i, window)),
    )
    return prepped.select(
        F.col(id_col),
        _roll_fold_hashed(thc).alias("roll_fp"),
        F.when(F.size(thc) >= window, F.array_min(win))
        .otherwise(_roll_fold_hashed(thc))
        .alias("min_win_fp"),
    )


def stopword_table(spark) -> DataFrame:
    rows = [(lang, w) for lang, words in STOPWORDS.items() for w in words]
    return spark.createDataFrame(rows, "sw_lang string, w string")


def predict_language(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: explode tokens, broadcast-join the
    stoplist, count hits per (doc, lang), argmax with deterministic
    tie-break (hits desc, lang asc); no hits → 'und'.
    The argmax is a min(struct(-hits, lang)) aggregate — partial
    (map-side) combinable, unlike a ranking window which needs a full
    shuffle+sort per doc. The stoplist join is broadcast."""
    spark = docs.sparkSession
    toks = docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("w"))
    hits = (
        toks.join(F.broadcast(stopword_table(spark)), "w")
        .groupBy(id_col, "sw_lang")
        .agg(F.count("*").alias("hits"))
    )
    best = hits.groupBy(id_col).agg(
        F.min(F.struct((-F.col("hits")).alias("neg"), F.col("sw_lang").alias("lang")))
        .alias("top")
    ).select(id_col, F.col("top.lang").alias("pred_nonnull"))
    return docs.select(id_col).join(best, id_col, "left").select(
        id_col, F.coalesce(F.col("pred_nonnull"), F.lit(UND)).alias("pred_lang")
    )
