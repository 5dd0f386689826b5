"""Round-10 wave: retrieval / RAG-serving evaluation.

The one LLM-pipeline family the registry still lacked (round-9 verdict
item 3): offline evaluation of retrieval systems and the serving-side
decisions built on them — recall@k / MRR / nDCG@k over a planted
relevance panel, reciprocal-rank fusion, two-stage reranking,
interleaving A/B evaluation, cascade fallback, RAG context packing and
citation audits, plus streaming twins that share the batch oracle SQL
verbatim (the round-9 twin discipline).

The synthetic retrieval panel (mirrors round9's model panel design):
16 queries with topics q_id % 8; each document's topic and its graded
relevance (0-3) to a matching query are pure md5-draw functions of the
row — identical expressions in both dialects, one narrow per-row
projection at any corpus size. Relevance is SPARSE (15% of topic-
matched docs, ~9 gold docs per query at 500 docs — dense relevance
saturated every metric at 1.0 in panel tuning). Two retrievers score
every (query, doc) pair in exact integer micros:

    score_A = rel * 170000 + draw % 700000   (sharper)
    score_B = rel *  90000 + draw % 750000   (noisier)

and each "returns" the docs above its score cutoff. Tuned panel
behavior at sf0.01: macro recall@10 ~0.44 (A) vs ~0.19 (B); A's first
relevant rank saturates at 1 (a decent prod retriever's MRR does);
B's spreads 1..94 with real misses — so fusion, reranking,
interleaving and cascade operators all have genuine work.

Scale posture shared by the wave: the panel is an in-row 16-way literal
explode over the documents scan (no join); candidate lists are a
cutoff filter over it; every ranking window partitions by q_id over
the CANDIDATE subset (bounded by the cutoff — at production scale the
candidate lists come from the ANN index family, llm.py:515, and are
top-k bounded by construction); every metric finalizes on a bounded
per-query or per-(query, retriever) relation. Exact integer micros
throughout — no float accumulation, no exp/log (nDCG's log2 discounts
are Python build-time literal constants, embedded identically in both
dialects).

(No counterpart in reference main.go — the reference is a tail-and-
render CLI; this wave is gate-mandated engine surface.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_log_watcher_spark.queries.base import load, register
from kinesis_log_watcher_spark.queries.round9 import _h15

# ===========================================================================
# The synthetic retrieval panel
# ===========================================================================

_NQ = 16  # queries in the eval panel
_NT = 8   # planted topics; query q is about topic q % 8
_PCT_REL = 15  # % of topic-matched docs that are actually gold

# retriever weight on the relevance signal / noise modulus / cutoff
_W_A, _N_A, _CUT_A = 170000, 700000, 350000
_W_B, _N_B, _CUT_B = 90000, 750000, 400000


def _hs(expr: str) -> str:
    """DuckDB twin of _h15 (first 15 md5 hex chars as int64)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


_SQL_PANEL = f"""panel AS (
      SELECT q.q_id, d.doc_id, d.lang, d.source, d.n_chars,
             CASE WHEN {_hs("'rtp|' || CAST(d.doc_id AS VARCHAR)")} % {_NT}
                       = q.q_id % {_NT}
                   AND {_hs("'rs|' || CAST(q.q_id AS VARCHAR) || '|' "
                            "|| CAST(d.doc_id AS VARCHAR)")} % 100
                       < {_PCT_REL}
                  THEN 1 + {_hs("'rg|' || CAST(q.q_id AS VARCHAR) || '|' "
                                "|| CAST(d.doc_id AS VARCHAR)")} % 3
                  ELSE 0 END AS rel
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_NQ})) AS q_id) q)"""

_SQL_SCORED = f"""scored AS (
      SELECT *,
             rel * {_W_A}
               + {_hs("'ra|' || CAST(q_id AS VARCHAR) || '|' "
                      "|| CAST(doc_id AS VARCHAR)")} % {_N_A} AS sa,
             rel * {_W_B}
               + {_hs("'rb|' || CAST(q_id AS VARCHAR) || '|' "
                      "|| CAST(doc_id AS VARCHAR)")} % {_N_B} AS sb
      FROM panel)"""

_SQL_RA = f"""ra AS (
      SELECT q_id, doc_id, lang, source, n_chars, rel, sa,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY sa DESC, doc_id) AS BIGINT) AS rnk
      FROM scored WHERE sa >= {_CUT_A})"""

_SQL_RB = f"""rb AS (
      SELECT q_id, doc_id, lang, source, n_chars, rel, sb,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY sb DESC, doc_id) AS BIGINT) AS rnk
      FROM scored WHERE sb >= {_CUT_B})"""

_SQL_NREL = """nrel AS (
      SELECT q_id,
             CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel
      FROM panel GROUP BY q_id)"""

_SQL_CORE = f"{_SQL_PANEL},\n    {_SQL_SCORED},\n    {_SQL_RA},\n    {_SQL_RB},\n    {_SQL_NREL}"


def _draw(prefix: str, *cols) -> "F.Column":
    """md5 draw over prefix + '|'-joined columns, int64 (Spark side)."""
    parts = [F.lit(prefix)]
    for c in cols:
        parts.extend([F.lit("|"), c.cast("string")])
    return _h15(F.concat(*parts))


def _panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_NQ - 1))).alias("q_id"),
    )
    topic_d = _draw("rtp", F.col("doc_id")) % _NT
    sparse = _draw("rs", F.col("q_id"), F.col("doc_id")) % 100 < _PCT_REL
    grade = 1 + _draw("rg", F.col("q_id"), F.col("doc_id")) % 3
    rel = F.when(
        (topic_d == F.col("q_id") % _NT) & sparse, grade
    ).otherwise(F.lit(0))
    return d.select(
        F.col("q_id").cast("long").alias("q_id"),
        "doc_id",
        "lang",
        "source",
        "n_chars",
        rel.cast("long").alias("rel"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _panel(spark, sf_dir)
    sa = F.col("rel") * _W_A + _draw("ra", F.col("q_id"), F.col("doc_id")) % _N_A
    sb = F.col("rel") * _W_B + _draw("rb", F.col("q_id"), F.col("doc_id")) % _N_B
    return p.select(
        "*", sa.cast("long").alias("sa"), sb.cast("long").alias("sb")
    )


def _ranked(scored: DataFrame, score: str, cut: int) -> DataFrame:
    """One retriever's returned list: docs above its cutoff, ranked by
    score desc / doc_id asc (deterministic tie-break, both dialects).
    The window partitions by q_id over the cutoff-bounded candidate
    subset only — never the full corpus."""
    w = Window.partitionBy("q_id").orderBy(F.col(score).desc(), "doc_id")
    return (
        scored.filter(F.col(score) >= cut)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("q_id", "doc_id", "lang", "source", "n_chars", "rel",
                F.col(score).alias("score"), "rnk")
    )


def _nrel(panel: DataFrame) -> DataFrame:
    return panel.groupBy("q_id").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rel")
    )


def _both_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(retriever, q_id, doc_id, ..., rnk) for both systems, unioned."""
    sc = _scored(spark, sf_dir)
    ra = _ranked(sc, "sa", _CUT_A).withColumn("retriever", F.lit("A"))
    rb = _ranked(sc, "sb", _CUT_B).withColumn("retriever", F.lit("B"))
    return ra.unionByName(rb)


# nDCG discount table: round(1e6 / log2(rank+1)) for ranks 1..20,
# computed ONCE in Python at import time and embedded as literals in
# BOTH dialects — log2 at query time is not engine-stable (the r8/r9
# exact-integer discipline), a literal ladder is.
_DISC = {r: int(round(1_000_000 / math.log2(r + 1))) for r in range(1, 21)}


def _sql_disc(rank_expr: str, k: int) -> str:
    arms = " ".join(f"WHEN {r} THEN {_DISC[r]}" for r in range(1, k + 1))
    return f"CASE {rank_expr} {arms} ELSE 0 END"


def _disc_col(rank_col, k: int):
    expr = F.lit(0)
    for r in range(k, 0, -1):
        expr = F.when(rank_col == r, F.lit(_DISC[r])).otherwise(expr)
    return expr


_SQL_GAIN = "(CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END)"


def _gain_col():
    return (
        F.when(F.col("rel") == 0, 0)
        .when(F.col("rel") == 1, 1)
        .when(F.col("rel") == 2, 3)
        .otherwise(7)
    )


# ===========================================================================
# recall@k
# ===========================================================================


@register(
    "retrieval_recall_at_k",
    f"""
    WITH {_SQL_CORE},
    hits AS (
      SELECT q_id, 'A' AS retriever,
             CAST(SUM(CASE WHEN rnk <= 5 AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_5,
             CAST(SUM(CASE WHEN rnk <= 10 AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_10,
             CAST(SUM(CASE WHEN rnk <= 20 AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_20
      FROM ra GROUP BY q_id
      UNION ALL
      SELECT q_id, 'B' AS retriever,
             CAST(SUM(CASE WHEN rnk <= 5 AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(SUM(CASE WHEN rnk <= 10 AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(SUM(CASE WHEN rnk <= 20 AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM rb GROUP BY q_id)
    SELECT h.q_id, h.retriever, n.n_rel, h.hits_5, h.hits_10, h.hits_20,
           CASE WHEN n.n_rel = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(h.hits_10 * 1000000 // n.n_rel AS BIGINT)
           END AS recall10_micro
    FROM hits h JOIN nrel n USING (q_id)
    """,
    doc="Recall@5/10/20 per query per retriever over the planted "
    "relevance panel: how much of each query's relevant set the "
    "returned list surfaces in its first k slots, in truncating "
    "integer micros. THE first-order retrieval metric. Scale shape: "
    "panel = in-row 16-way explode over the documents scan; candidate "
    "ranking windows partition by q_id over the cutoff-bounded subset; "
    "per-query relevant totals are ONE partial-agg shuffle to 16 rows, "
    "broadcast back onto the 32-row hits relation. "
    "(No counterpart in reference main.go.)",
)
def retrieval_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    lists = _both_lists(spark, sf_dir)
    hits = lists.groupBy("q_id", "retriever").agg(
        *[
            F.sum(
                F.when((F.col("rnk") <= k) & (F.col("rel") > 0), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"hits_{k}")
            for k in (5, 10, 20)
        ]
    )
    nrel = _nrel(_panel(spark, sf_dir))
    return hits.join(F.broadcast(nrel), "q_id").select(
        "q_id",
        "retriever",
        "n_rel",
        "hits_5",
        "hits_10",
        "hits_20",
        F.when(F.col("n_rel") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("hits_10 * 1000000 div n_rel"))
        .cast("long")
        .alias("recall10_micro"),
    )


# ===========================================================================
# MRR / first relevant rank
# ===========================================================================

_SQL_FIRST = """first AS (
      SELECT q_id, 'A' AS retriever,
             MIN(CASE WHEN rel > 0 THEN rnk END) AS frr
      FROM ra GROUP BY q_id
      UNION ALL
      SELECT q_id, 'B' AS retriever,
             MIN(CASE WHEN rel > 0 THEN rnk END)
      FROM rb GROUP BY q_id)"""


@register(
    "retrieval_mrr_first_rank",
    f"""
    WITH {_SQL_CORE},
    {_SQL_FIRST}
    SELECT q_id, retriever,
           CAST(COALESCE(frr, 0) AS BIGINT) AS first_rel_rank,
           CASE WHEN frr IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST(1000000 // frr AS BIGINT)
           END AS rr_micro
    FROM first
    """,
    doc="First relevant rank and reciprocal rank per query per "
    "retriever (rank 0 = the list never surfaces a relevant doc): the "
    "MRR building block, with the reciprocal as truncating integer "
    "micros (1000000 // rank — exact in both engines, no float "
    "reciprocals). Scale shape: one partial-agg MIN per (query, "
    "retriever) over the cutoff-bounded candidate lists — 32 output "
    "rows regardless of corpus size. "
    "(No counterpart in reference main.go.)",
)
def retrieval_mrr_first_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    lists = _both_lists(spark, sf_dir)
    first = lists.groupBy("q_id", "retriever").agg(
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("frr")
    )
    return first.select(
        "q_id",
        "retriever",
        F.coalesce(F.col("frr"), F.lit(0)).cast("long").alias(
            "first_rel_rank"
        ),
        F.when(F.col("frr").isNull(), F.lit(0).cast("long"))
        .otherwise(F.expr("1000000 div frr"))
        .cast("long")
        .alias("rr_micro"),
    )


# ===========================================================================
# nDCG@10
# ===========================================================================


@register(
    "retrieval_ndcg_at10",
    f"""
    WITH {_SQL_CORE},
    dcg AS (
      SELECT q_id, 'A' AS retriever,
             CAST(SUM({_SQL_GAIN} * {_sql_disc('rnk', 10)}) AS BIGINT)
               AS dcg10
      FROM ra WHERE rnk <= 10 GROUP BY q_id
      UNION ALL
      SELECT q_id, 'B' AS retriever,
             CAST(SUM({_SQL_GAIN} * {_sql_disc('rnk', 10)}) AS BIGINT)
      FROM rb WHERE rnk <= 10 GROUP BY q_id),
    ideal AS (
      SELECT q_id, rel,
             ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY rel DESC, doc_id) AS irnk
      FROM panel WHERE rel > 0),
    idcg AS (
      SELECT q_id,
             CAST(SUM({_SQL_GAIN} * {_sql_disc('irnk', 10)}) AS BIGINT)
               AS idcg10
      FROM ideal WHERE irnk <= 10 GROUP BY q_id)
    SELECT d.q_id, d.retriever, d.dcg10, i.idcg10,
           CASE WHEN i.idcg10 = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(d.dcg10 * 1000000 // i.idcg10 AS BIGINT)
           END AS ndcg10_micro
    FROM dcg d JOIN idcg i USING (q_id)
    """,
    doc="nDCG@10 per query per retriever: graded gains (2^rel - 1 as a "
    "literal ladder) x positional discounts round(1e6/log2(rank+1)) "
    "precomputed in Python and embedded as IDENTICAL literal CASE "
    "ladders in both dialects — query-time log2 is not engine-stable, "
    "literals are; the ideal DCG ranks the query's own relevant set. "
    "All-integer DCG sums (<= 7e7), truncating micro normalization. "
    "Scale shape: top-10 slices of the bounded candidate windows; the "
    "ideal ranking windows over panel rows with rel > 0 only (~1/8 of "
    "the per-query panel). (No counterpart in reference main.go.)",
)
def retrieval_ndcg_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    lists = _both_lists(spark, sf_dir)
    dcg = (
        lists.filter(F.col("rnk") <= 10)
        .groupBy("q_id", "retriever")
        .agg(
            F.sum(_gain_col() * _disc_col(F.col("rnk"), 10))
            .cast("long")
            .alias("dcg10")
        )
    )
    panel = _panel(spark, sf_dir)
    w_ideal = Window.partitionBy("q_id").orderBy(
        F.col("rel").desc(), "doc_id"
    )
    idcg = (
        panel.filter(F.col("rel") > 0)
        .withColumn("irnk", F.row_number().over(w_ideal))
        .filter(F.col("irnk") <= 10)
        .groupBy("q_id")
        .agg(
            F.sum(_gain_col() * _disc_col(F.col("irnk"), 10))
            .cast("long")
            .alias("idcg10")
        )
    )
    return dcg.join(F.broadcast(idcg), "q_id").select(
        "q_id",
        "retriever",
        "dcg10",
        "idcg10",
        F.when(F.col("idcg10") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("dcg10 * 1000000 div idcg10"))
        .cast("long")
        .alias("ndcg10_micro"),
    )


# ===========================================================================
# recall curve (k sweep)
# ===========================================================================

_KS = (1, 2, 5, 10, 20, 50)


@register(
    "retrieval_recall_curve",
    f"""
    WITH {_SQL_CORE},
    hits AS (
      SELECT q_id, 'A' AS retriever, k.k,
             CAST(SUM(CASE WHEN rnk <= k.k AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits
      FROM ra CROSS JOIN (SELECT unnest([{', '.join(map(str, _KS))}]) AS k) k
      GROUP BY q_id, k.k
      UNION ALL
      SELECT q_id, 'B' AS retriever, k.k,
             CAST(SUM(CASE WHEN rnk <= k.k AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM rb CROSS JOIN (SELECT unnest([{', '.join(map(str, _KS))}]) AS k) k
      GROUP BY q_id, k.k),
    grid AS (
      SELECT n.q_id, n.n_rel, r.retriever, k.k
      FROM nrel n
      CROSS JOIN (SELECT unnest([{', '.join(map(str, _KS))}]) AS k) k
      CROSS JOIN (SELECT unnest(['A', 'B']) AS retriever) r),
    perq AS (
      SELECT g.q_id, g.retriever, g.k,
             CASE WHEN g.n_rel = 0 THEN 0
                  ELSE COALESCE(h.hits, 0) * 1000000 // g.n_rel
             END AS recall_micro
      FROM grid g
      LEFT JOIN hits h ON h.q_id = g.q_id AND h.retriever = g.retriever
                       AND h.k = g.k)
    SELECT CAST(k AS BIGINT) AS k, retriever,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(recall_micro) // COUNT(*) AS BIGINT)
             AS mean_recall_micro,
           CAST(MIN(recall_micro) AS BIGINT) AS min_recall_micro,
           CAST(MAX(recall_micro) AS BIGINT) AS max_recall_micro
    FROM perq GROUP BY k, retriever
    """,
    doc="Macro-averaged recall curve: recall@k for k in (1,2,5,10,20,"
    "50) per retriever, averaged over the 16 panel queries with "
    "min/max spread — the capacity-planning curve that answers 'how "
    "deep must the candidate list be'. Truncating integer micros; "
    "queries with empty candidate lists count as recall 0 via the "
    "nrel-anchored grid, not silently dropped. Scale shape: the k "
    "sweep is an in-row 6-way literal explode on the already-bounded "
    "candidate lists (no join); the final agg lands on a 12-row "
    "domain. (No counterpart in reference main.go.)",
)
def retrieval_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ks = F.array(*[F.lit(k) for k in _KS])
    lists = _both_lists(spark, sf_dir)
    hits = (
        lists.withColumn("k", F.explode(ks))
        .groupBy("q_id", "retriever", "k")
        .agg(
            F.sum(
                F.when((F.col("rnk") <= F.col("k")) & (F.col("rel") > 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("hits")
        )
    )
    grid = (
        _nrel(_panel(spark, sf_dir))
        .withColumn("k", F.explode(ks))
        .withColumn("retriever", F.explode(F.array(F.lit("A"), F.lit("B"))))
    )
    perq = grid.join(
        F.broadcast(hits), ["q_id", "retriever", "k"], "left"
    ).select(
        "q_id",
        "retriever",
        "k",
        F.when(F.col("n_rel") == 0, F.lit(0))
        .otherwise(
            F.expr("coalesce(hits, 0) * 1000000 div n_rel")
        )
        .cast("long")
        .alias("recall_micro"),
    )
    return perq.groupBy(
        F.col("k").cast("long").alias("k"), "retriever"
    ).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.expr("CAST(SUM(recall_micro) div COUNT(*) AS BIGINT)").alias(
            "mean_recall_micro"
        ),
        F.min("recall_micro").cast("long").alias("min_recall_micro"),
        F.max("recall_micro").cast("long").alias("max_recall_micro"),
    )


# ===========================================================================
# failure taxonomy
# ===========================================================================


@register(
    "retrieval_failure_taxonomy",
    f"""
    WITH {_SQL_CORE},
    {_SQL_FIRST},
    grid AS (
      SELECT n.q_id, r.retriever
      FROM nrel n CROSS JOIN (SELECT unnest(['A', 'B']) AS retriever) r),
    classed AS (
      SELECT g.q_id, g.retriever,
             CASE WHEN f.frr IS NULL OR f.frr > 10 THEN 'missed'
                  WHEN f.frr > 3 THEN 'shallow'
                  ELSE 'good' END AS failure_class
      FROM grid g
      LEFT JOIN first f ON f.q_id = g.q_id AND f.retriever = g.retriever)
    SELECT retriever, failure_class,
           CAST(COUNT(*) AS BIGINT) AS n_queries
    FROM classed GROUP BY retriever, failure_class
    """,
    doc="Per-retriever failure taxonomy over the panel queries: "
    "'missed' (no relevant doc in the top 10 — retrieval failed), "
    "'shallow' (first relevant at rank 4-10 — reranking would help), "
    "'good' (relevant in the top 3). The triage signal that tells an "
    "eval owner whether to fix the index or add a reranker. Queries "
    "with empty candidate lists class as 'missed' via the nrel-"
    "anchored grid. Scale shape: per-(query, retriever) MIN over "
    "bounded lists, then a 6-row classification agg. "
    "(No counterpart in reference main.go.)",
)
def retrieval_failure_taxonomy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lists = _both_lists(spark, sf_dir)
    first = lists.groupBy("q_id", "retriever").agg(
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("frr")
    )
    grid = _nrel(_panel(spark, sf_dir)).withColumn(
        "retriever", F.explode(F.array(F.lit("A"), F.lit("B")))
    )
    classed = grid.join(
        F.broadcast(first), ["q_id", "retriever"], "left"
    ).select(
        "retriever",
        F.when(
            F.col("frr").isNull() | (F.col("frr") > 10), F.lit("missed")
        )
        .when(F.col("frr") > 3, F.lit("shallow"))
        .otherwise(F.lit("good"))
        .alias("failure_class"),
    )
    return classed.groupBy("retriever", "failure_class").agg(
        F.count("*").cast("long").alias("n_queries")
    )


# ===========================================================================
# candidate coverage (the streamable counting view; its streaming twin
# shares this oracle verbatim — wave 4)
# ===========================================================================


@register(
    "retrieval_candidate_coverage",
    f"""
    WITH {_SQL_PANEL},
    {_SQL_SCORED},
    cov AS (
      SELECT q_id,
             CAST(SUM(CASE WHEN sa >= {_CUT_A} THEN 1 ELSE 0 END)
                  AS BIGINT) AS cand_a,
             CAST(SUM(CASE WHEN sb >= {_CUT_B} THEN 1 ELSE 0 END)
                  AS BIGINT) AS cand_b,
             CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel,
             CAST(SUM(CASE WHEN sa >= {_CUT_A} AND rel > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS rel_a,
             CAST(SUM(CASE WHEN sb >= {_CUT_B} AND rel > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS rel_b
      FROM scored GROUP BY q_id)
    SELECT q_id, cand_a, cand_b, n_rel, rel_a, rel_b,
           CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(rel_a * 1000000 // n_rel AS BIGINT)
           END AS coverage_a_micro,
           CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(rel_b * 1000000 // n_rel AS BIGINT)
           END AS coverage_b_micro
    FROM cov
    """,
    doc="Candidate-set coverage per query: how many docs each "
    "retriever's cutoff admits and what fraction of the relevant set "
    "survives it — the RECALL CEILING any downstream ranker inherits "
    "(rank-free, pure counting, so it streams: wave-4's "
    "stream_retrieval_coverage shares this oracle verbatim). Scale "
    "shape: one narrow projection over the panel explode + ONE "
    "partial-agg shuffle to the 16-query domain; no windows, no "
    "joins. (No counterpart in reference main.go.)",
)
def retrieval_candidate_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sc = _scored(spark, sf_dir)
    cov = sc.groupBy("q_id").agg(
        F.sum(F.when(F.col("sa") >= _CUT_A, 1).otherwise(0))
        .cast("long")
        .alias("cand_a"),
        F.sum(F.when(F.col("sb") >= _CUT_B, 1).otherwise(0))
        .cast("long")
        .alias("cand_b"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rel"),
        F.sum(
            F.when((F.col("sa") >= _CUT_A) & (F.col("rel") > 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("rel_a"),
        F.sum(
            F.when((F.col("sb") >= _CUT_B) & (F.col("rel") > 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("rel_b"),
    )
    micro = "CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT) ELSE CAST({} * 1000000 div n_rel AS BIGINT) END"
    return cov.select(
        "q_id",
        "cand_a",
        "cand_b",
        "n_rel",
        "rel_a",
        "rel_b",
        F.expr(micro.format("rel_a")).alias("coverage_a_micro"),
        F.expr(micro.format("rel_b")).alias("coverage_b_micro"),
    )
