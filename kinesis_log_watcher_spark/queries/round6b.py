"""Round-6 wave 3: trend/robust statistics, graph community detection,
lexical diversity, Zipf-law fitting, blocklist filtering, skyline
(Pareto frontier), weighted quantiles, greedy k-center coresets, and a
chained two-level streaming aggregation.

Every query keeps the repo-wide determinism contract (queries/base.py
module docstring): integer-exact arithmetic end to end, or doubles
derived from exact integers through an op sequence written identically
in both dialects, quantized to int64 once at the end (floor(x*k + 0.5)).
Every SUM in oracle SQL is CAST to BIGINT at the aggregation site (the
round-5 key_skew_profile HUGEINT lesson).

Reference parity note: the reference (/root/reference/main.go) is a
416-line Kinesis tailer with no analytics surface — these operators are
the SURVEY.md §2.2 "beyond-reference" engine surface, same family as
queries/round6.py and queries/mining.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.queries.base import load, register
from kinesis_log_watcher_spark.queries.mining import _NEARDUP_EDGE_CTE

# ---------------------------------------------------------------------------
# 1. revenue_trend_mann_kendall — exact trend test + Theil-Sen slope
# ---------------------------------------------------------------------------
#
# Mann-Kendall S and its tie-corrected variance are EXACT integer
# statistics (signs and counts); the Theil-Sen slope is the lower median
# of the pairwise slopes, each quantized to milli-units ONCE via the
# repo's floor(x*k + 0.5) convention before the (integer) median pick —
# so the whole test is hash-comparable with no float aggregation.

_MK_SQL = """
    WITH monthly AS (
      SELECT o_orderpriority AS pri,
             year(o_orderdate) * 12 + month(o_orderdate) AS m,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2),
    pairs AS (
      SELECT a.pri,
             CASE WHEN b.cnt > a.cnt THEN 1
                  WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn,
             CAST(floor((b.cnt - a.cnt) * 1000.0 / (b.m - a.m) + 0.5)
                  AS BIGINT) AS slope_milli,
             a.m AS am, b.m AS bm
      FROM monthly a JOIN monthly b ON a.pri = b.pri AND a.m < b.m),
    sstat AS (
      SELECT pri, CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1),
    med AS (
      SELECT pri, slope_milli AS theil_sen_slope_milli
      FROM (SELECT pri, slope_milli,
                   ROW_NUMBER() OVER (PARTITION BY pri
                                      ORDER BY slope_milli, am, bm) AS rn,
                   COUNT(*) OVER (PARTITION BY pri) AS p
            FROM pairs)
      WHERE rn = (p + 1) // 2),
    ties AS (
      SELECT pri,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT pri, cnt, CAST(COUNT(*) AS BIGINT) AS t
            FROM monthly GROUP BY 1, 2)
      GROUP BY 1),
    nm AS (
      SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_months FROM monthly
      GROUP BY 1)
    SELECT n.pri AS o_orderpriority, n.n_months, s.s_stat,
           n.n_months * (n.n_months - 1) * (2 * n.n_months + 5)
             - t.tie_term AS var_s_x18,
           m.theil_sen_slope_milli,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'flat' END AS trend
    FROM nm n
    JOIN sstat s ON s.pri = n.pri
    JOIN ties t ON t.pri = n.pri
    JOIN med m ON m.pri = n.pri
    """


@register(
    "revenue_trend_mann_kendall",
    _MK_SQL,
    doc="Mann-Kendall trend test + Theil-Sen slope over each priority's "
    "monthly order-count series: S = sum of pairwise sign differences, "
    "variance via the exact tie-corrected formula (kept as the x18 "
    "integer numerator — no division, no float), slope = lower median "
    "of milli-quantized pairwise slopes with a deterministic "
    "(slope, month-pair) tie-break. Scale shape: the ONLY fact-table "
    "pass is the (priority, month) count aggregation; the pair "
    "generator runs on the tiny monthly relation (P = n_months^2/2 "
    "pairs per priority, bounded by the calendar, not the data), so "
    "100 TB of orders costs one partial-agg shuffle and the test "
    "itself is constant work. The robust (rank-based) complement to "
    "groupwise_linear_fit's OLS trend.",
)
def revenue_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("pri"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = a.join(
        b, (F.col("a.pri") == F.col("b.pri")) & (F.col("a.m") < F.col("b.m"))
    ).select(
        F.col("a.pri").alias("pri"),
        F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
        .when(F.col("b.cnt") < F.col("a.cnt"), -1)
        .otherwise(0)
        .alias("sgn"),
        F.floor(
            (F.col("b.cnt") - F.col("a.cnt"))
            * F.lit(1000.0)
            / (F.col("b.m") - F.col("a.m"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("slope_milli"),
        F.col("a.m").alias("am"),
        F.col("b.m").alias("bm"),
    )
    sstat = pairs.groupBy("pri").agg(
        F.sum("sgn").cast("long").alias("s_stat")
    )
    w = Window.partitionBy("pri").orderBy("slope_milli", "am", "bm")
    med = (
        pairs.select(
            "pri",
            "slope_milli",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("pri")).alias("p"),
        )
        .filter(F.col("rn") == F.expr("(p + 1) div 2"))
        .select("pri", F.col("slope_milli").alias("theil_sen_slope_milli"))
    )
    ties = (
        monthly.groupBy("pri", "cnt")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("pri")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    nm = monthly.groupBy("pri").agg(F.count("*").cast("long").alias("n_months"))
    out = (
        nm.join(sstat, "pri")
        .join(ties, "pri")
        .join(med, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_months",
            "s_stat",
            (
                F.col("n_months")
                * (F.col("n_months") - 1)
                * (2 * F.col("n_months") + 5)
                - F.col("tie_term")
            ).alias("var_s_x18"),
            "theil_sen_slope_milli",
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("flat")
            .alias("trend"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# 2. spearman_quantity_discount — rank correlation via joint histogram
# ---------------------------------------------------------------------------
#
# Spearman rho with AVERAGE ranks for ties, decomposed so the fact table
# is scanned once into a (flag, qty, discount) joint histogram and every
# rank is derived from value-marginal counts: with B = rows strictly
# below value v and f = rows at v, 2*avg_rank = 2*(B + f) - f + 1 —
# an exact integer ("rank2"). All five co-moment sums then come from the
# tiny cell relation. No per-row window, no global sort — the classic
# O(n log n) rank step becomes one partial-agg shuffle.

_SP_SQL = """
    WITH cells AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qv,
             CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS dv,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2, 3),
    xm AS (
      SELECT flag, qv,
             2 * SUM(fx) OVER (PARTITION BY flag ORDER BY qv
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - fx + 1 AS r2x
      FROM (SELECT flag, qv, CAST(SUM(cnt) AS BIGINT) AS fx
            FROM cells GROUP BY 1, 2)),
    ym AS (
      SELECT flag, dv,
             2 * SUM(fy) OVER (PARTITION BY flag ORDER BY dv
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - fy + 1 AS r2y
      FROM (SELECT flag, dv, CAST(SUM(cnt) AS BIGINT) AS fy
            FROM cells GROUP BY 1, 2)),
    m AS (
      SELECT c.flag,
             CAST(SUM(c.cnt) AS BIGINT) AS n,
             CAST(SUM(c.cnt * x.r2x) AS BIGINT) AS sx,
             CAST(SUM(c.cnt * y.r2y) AS BIGINT) AS sy,
             CAST(SUM(c.cnt * x.r2x * x.r2x) AS BIGINT) AS sxx,
             CAST(SUM(c.cnt * y.r2y * y.r2y) AS BIGINT) AS syy,
             CAST(SUM(c.cnt * x.r2x * y.r2y) AS BIGINT) AS sxy
      FROM cells c
      JOIN xm x ON x.flag = c.flag AND x.qv = c.qv
      JOIN ym y ON y.flag = c.flag AND y.dv = c.dv
      GROUP BY 1)
    SELECT flag AS l_returnflag, n AS n_rows,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0
                  OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0
                THEN 0
                ELSE CAST(floor(
                  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) END AS rho_micro
    FROM m
    """


@register(
    "spearman_quantity_discount",
    _SP_SQL,
    doc="Spearman rank correlation (average ranks for ties) between "
    "quantity and discount per returnflag — the distribution-free "
    "complement to price_quantity_correlation's Pearson r. The rank "
    "step is decomposed through the joint (flag, qty, discount) "
    "histogram: 2*avg_rank is an exact integer derived from marginal "
    "cumulative counts, so there is NO per-row ranking window and no "
    "global sort — the fact table is scanned once into cells bounded "
    "by |qty values| x |discount values|, and every co-moment is an "
    "exact int64 sum over that tiny relation. rho is quantized to "
    "int64 micro-units once, from identical double op sequences in "
    "both dialects. At 100 TB the plan is one partial-agg shuffle; "
    "the int64 co-moments hold to ~4n^3 < 2^63 per group (document "
    "DECIMAL(38) as the swap past ~1e6 rows/group x 4e5 rank width).",
)
def spearman_quantity_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qv"),
            F.floor(F.col("l_discount") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("dv"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .persist()
    )

    def margin(col: str, out: str) -> DataFrame:
        f = cells.groupBy("flag", col).agg(F.sum("cnt").cast("long").alias("f"))
        w = (
            Window.partitionBy("flag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return f.select(
            "flag",
            col,
            (2 * F.sum("f").over(w) - F.col("f") + 1).alias(out),
        )

    xm = margin("qv", "r2x")
    ym = margin("dv", "r2y")
    m = (
        cells.join(xm, ["flag", "qv"])
        .join(ym, ["flag", "dv"])
        .groupBy("flag")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(F.col("cnt") * F.col("r2x")).cast("long").alias("sx"),
            F.sum(F.col("cnt") * F.col("r2y")).cast("long").alias("sy"),
            F.sum(F.col("cnt") * F.col("r2x") * F.col("r2x"))
            .cast("long")
            .alias("sxx"),
            F.sum(F.col("cnt") * F.col("r2y") * F.col("r2y"))
            .cast("long")
            .alias("syy"),
            F.sum(F.col("cnt") * F.col("r2x") * F.col("r2y"))
            .cast("long")
            .alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    denx = nd * sxxd - sxd * sxd
    deny = nd * syyd - syd * syd
    rho = F.floor(
        (nd * sxyd - sxd * syd) / F.sqrt(denx * deny) * 1000000 + F.lit(0.5)
    ).cast("long")
    return m.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").alias("n_rows"),
        F.when((denx <= 0) | (deny <= 0), F.lit(0).cast("long"))
        .otherwise(rho)
        .alias("rho_micro"),
    )


# ---------------------------------------------------------------------------
# 3. community_label_propagation — 2 synchronous LPA rounds
# ---------------------------------------------------------------------------

_LPA_SQL = f"""
    WITH {_NEARDUP_EDGE_CTE},
    nbrs AS (
      SELECT vec_a AS node, vec_b AS nbr FROM edges
      UNION ALL SELECT vec_b, vec_a FROM edges),
    l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
    v1 AS (
      SELECT n.node, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
      FROM nbrs n JOIN l0 l ON l.node = n.nbr GROUP BY 1, 2),
    l1 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM v1) WHERE rn = 1),
    v2 AS (
      SELECT n.node, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
      FROM nbrs n JOIN l1 l ON l.node = n.nbr GROUP BY 1, 2),
    l2 AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM v2) WHERE rn = 1),
    sizes AS (
      SELECT lbl, CAST(COUNT(*) AS BIGINT) AS sz FROM l2 GROUP BY 1)
    SELECT l2.node AS vec_id, l2.lbl AS community, s.sz AS community_size
    FROM l2 JOIN sizes s ON s.lbl = l2.lbl
    """


def _lpa_labels(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared LPA kernel: (edges, labels-after-2-sync-rounds). Used by
    community_label_propagation and community_modularity."""
    from kinesis_log_watcher_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    edges = embedding_near_dup_pairs(emb, threshold=0.35).select(
        "vec_a", "vec_b"
    )
    nbrs = (
        edges.select(F.col("vec_a").alias("node"), F.col("vec_b").alias("nbr"))
        .unionAll(
            edges.select(
                F.col("vec_b").alias("node"), F.col("vec_a").alias("nbr")
            )
        )
        .persist()
    )
    labels = nbrs.select("node").distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in (1, 2):
        votes = (
            nbrs.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("lbl")
                ),
                "nbr",
            )
            .groupBy("node", "lbl")
            .agg(F.count("*").cast("long").alias("c"))
        )
        labels = (
            votes.select(
                "node", "lbl", F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return edges, labels


@register(
    "community_label_propagation",
    _LPA_SQL,
    doc="Synchronous label propagation (2 rounds) over the verified "
    "near-dup graph (same LSH-banded, cosine>=0.35 edge set as "
    "neardup_graph_triangles): labels init to node ids; each round "
    "every node adopts its neighbors' MODE label with a deterministic "
    "min-label tie-break. Distinct from dedup_clusters' connected "
    "components: LPA finds DENSE communities (a bridge edge doesn't "
    "merge two cliques, because mode voting outweighs it). Scale "
    "shape: each round is one equi-join (adjacency x labels) + one "
    "count aggregation + one per-node top-1 — all hash-partitioned by "
    "node id, state is one label per node, and the synchronous "
    "mode/min-tie-break semantics are replay-deterministic (unlike "
    "async LPA). The oracle states both rounds as explicit CTEs.",
)
def community_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, labels = _lpa_labels(spark, sf_dir)
    sizes = labels.groupBy("lbl").agg(
        F.count("*").cast("long").alias("community_size")
    )
    return labels.join(sizes, "lbl").select(
        F.col("node").alias("vec_id"),
        F.col("lbl").alias("community"),
        "community_size",
    )


# ---------------------------------------------------------------------------
# 4. doc_lexical_diversity — Simpson index / TTR / hapax rate per doc
# ---------------------------------------------------------------------------

_LEX_SQL = """
    WITH tc AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL)
      GROUP BY 1, 2),
    st AS (
      SELECT doc_id,
             CAST(SUM(f) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(f * (f - 1)) AS BIGINT) AS rep_num,
             CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM tc GROUP BY 1)
    SELECT doc_id, n_tokens, n_distinct,
           CAST(n_distinct * 1000000 // n_tokens AS BIGINT) AS ttr_micro,
           CAST(CASE WHEN n_tokens < 2 THEN 0
                     ELSE rep_num * 1000000 // (n_tokens * (n_tokens - 1))
                END AS BIGINT) AS simpson_micro,
           CAST(n_hapax * 1000000 // n_tokens AS BIGINT) AS hapax_micro
    FROM st
    """


@register(
    "doc_lexical_diversity",
    _LEX_SQL,
    doc="Lexical-diversity profile per document: type-token ratio, "
    "Simpson repeat index sum f(f-1)/(n(n-1)) (the probability two "
    "random token draws collide — high = templated/boilerplate text, "
    "a standard pretraining-corpus quality signal), and hapax-legomenon "
    "rate. All three are exact integer rationals in micro-units — no "
    "float anywhere. Distinct from doc_quality_scores (length/stopword "
    "ratios) and doc_repetition_filter (positional n-gram repeats): "
    "this is the frequency-spectrum view. Scale shape: one explode -> "
    "(doc, token) count -> per-doc fold; everything hash-partitions by "
    "doc_id, no window, no sort.",
)
def doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tc = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("f"))
    )
    st = tc.groupBy("doc_id").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.col("f") * (F.col("f") - 1)).cast("long").alias("rep_num"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    return st.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr("n_distinct * 1000000 div n_tokens").alias("ttr_micro"),
        F.when(F.col("n_tokens") < 2, F.lit(0).cast("long"))
        .otherwise(
            F.expr("rep_num * 1000000 div (n_tokens * (n_tokens - 1))")
        )
        .alias("simpson_micro"),
        F.expr("n_hapax * 1000000 div n_tokens").alias("hapax_micro"),
    )


# ---------------------------------------------------------------------------
# 5. zipf_law_fit — log-log OLS over the per-language frequency spectrum
# ---------------------------------------------------------------------------
#
# ln(rank) / ln(freq) are each quantized to int64 micro-nats ONCE per
# point (the RRF/KN-perplexity convention: libm's last ulp differs
# across engines, so never SUM raw doubles), then every OLS moment is an
# exact integer sum and the slope/intercept come from identical double
# closed forms.

_ZIPF_TOP = 100

_ZIPF_SQL = f"""
    WITH tf AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)
      GROUP BY 1, 2),
    rk AS (
      SELECT lang, f,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY f DESC, tok) AS r
      FROM tf),
    pts AS (
      SELECT lang,
             CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
               AS xq,
             CAST(floor(ln(CAST(f AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
               AS yq
      FROM rk WHERE r <= {_ZIPF_TOP}),
    m AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(yq) AS BIGINT) AS sy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx,
             CAST(SUM(xq * yq) AS BIGINT) AS sxy
      FROM pts GROUP BY 1),
    fit AS (
      SELECT lang, n_points, sx, sy,
             CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
             CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
      FROM m)
    SELECT lang, n_points,
           CASE WHEN den <= 0 THEN 0
                ELSE CAST(floor(num / den * 1000000 + 0.5) AS BIGINT)
           END AS slope_micro,
           CASE WHEN den <= 0 THEN 0
                ELSE CAST(floor((CAST(sy AS DOUBLE) - num / den
                                 * CAST(sx AS DOUBLE))
                                / CAST(n_points AS DOUBLE) + 0.5) AS BIGINT)
           END AS intercept_micro
    FROM fit
    """


@register(
    "zipf_law_fit",
    _ZIPF_SQL,
    doc="Zipf's-law exponent per language: OLS slope of ln(freq) on "
    f"ln(rank) over each language's top-{_ZIPF_TOP} token frequencies "
    "(slope ~ -1 for natural text; a corpus whose exponent drifts is a "
    "generation/dedup red flag). Each point's ln() is quantized to "
    "int64 micro-nats BEFORE any aggregation (float addition is not "
    "associative; libm last-ulps differ across engines), so the OLS "
    "moments are exact integers and the slope/intercept are identical "
    "double closed forms quantized once. Scale shape: one explode -> "
    "(lang, token) count; the ranking window runs on the per-language "
    "VOCABULARY relation (bounded by vocabulary size, not corpus "
    "size), and the fit itself is per-language constant work.",
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tf = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("long").alias("f"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("f").desc(), F.col("tok"))
    pts = (
        tf.select("lang", "f", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= _ZIPF_TOP)
        .select(
            "lang",
            F.floor(F.log(F.col("r").cast("double")) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("xq"),
            F.floor(F.log(F.col("f").cast("double")) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("yq"),
        )
    )
    m = pts.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
    )
    npd = F.col("n_points").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    den = npd * F.col("sxx").cast("double") - sxd * sxd
    num = npd * F.col("sxy").cast("double") - sxd * syd
    return m.select(
        "lang",
        "n_points",
        F.when(den <= 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(num / den * 1000000 + F.lit(0.5)).cast("long")
        )
        .alias("slope_micro"),
        F.when(den <= 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor((syd - num / den * sxd) / npd + F.lit(0.5)).cast("long")
        )
        .alias("intercept_micro"),
    )


# ---------------------------------------------------------------------------
# 6. blocklist_phrase_filter — broadcast multi-phrase containment audit
# ---------------------------------------------------------------------------

# The blocklist is part of the operator definition (both dialects embed
# the same literal list). Substring containment cannot be an equi-join;
# the correct distributed plan for a SMALL pattern set is a broadcast
# nested-loop against the corpus — the build side is the (bounded,
# human-curated) blocklist, never data-sized.
_BLOCKLIST = (
    ("slow fast", "perf"),
    ("fast table", "perf"),
    ("scan slow", "perf"),
    ("batch window spark", "exec"),
    ("scan query big", "exec"),
    ("stream customer group", "exec"),
    ("hash value table", "schema"),
    ("table value part", "schema"),
    ("the line sort", "noise"),
    ("a a the", "noise"),
)

_BL_VALUES = ",\n             ".join(
    f"('{p}', '{c}')" for p, c in _BLOCKLIST
)

_BL_SQL = f"""
    WITH bl(phrase, category) AS (
      VALUES {_BL_VALUES}),
    hits AS (
      SELECT d.doc_id, b.phrase, b.category
      FROM documents d CROSS JOIN bl b
      WHERE strpos(d.text, b.phrase) > 0)
    SELECT category,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT phrase) AS BIGINT) AS n_phrases_hit
    FROM hits GROUP BY 1
    """


@register(
    "blocklist_phrase_filter",
    _BL_SQL,
    doc="Safety/blocklist filtering: audit the corpus against a curated "
    "multi-phrase blocklist (category-tagged literal substrings), "
    "reporting per category how many documents and phrase occurrences "
    "match. Substring containment is not equi-joinable, so the plan is "
    "the one a 100 TB corpus wants: broadcast the (bounded, curated) "
    "phrase list and stream the corpus through a nested-loop "
    "containment filter — per-row cost is |blocklist| instr() calls, "
    "zero shuffle until the final tiny category rollup. The build side "
    "is the blocklist BY CONTRACT (same bounded-broadcast whitelist "
    "family as the 1-row scalar crossJoins; at thousands of phrases "
    "the swap is an Aho-Corasick mapInPandas kernel, same join shape). "
    "Complements doc_pii_scrub (regex redaction) with exact-phrase "
    "screening.",
)
def blocklist_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bl = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(_BLOCKLIST), "phrase string, category string"
        )
    )
    hits = docs.join(bl, F.instr(F.col("text"), F.col("phrase")) > 0)
    return hits.groupBy("category").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_hits"),
        F.countDistinct("phrase").cast("long").alias("n_phrases_hit"),
    )


# ---------------------------------------------------------------------------
# 7. pareto_frontier_orders — 2D skyline without a global sort
# ---------------------------------------------------------------------------

_SKY_SQL = """
    WITH pts AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS dd
      FROM orders),
    grp AS (
      SELECT cents, MAX(dd) AS gmax FROM pts GROUP BY 1),
    cnt AS (
      SELECT cents, dd, CAST(COUNT(*) AS BIGINT) AS c
      FROM pts GROUP BY 1, 2),
    frontier AS (
      SELECT g.cents, g.gmax FROM grp g
      WHERE NOT EXISTS (SELECT 1 FROM grp h
                        WHERE h.cents > g.cents AND h.gmax >= g.gmax))
    SELECT f.cents AS price_cents, f.gmax AS last_day, c.c AS n_orders
    FROM frontier f JOIN cnt c ON c.cents = f.cents AND c.dd = f.gmax
    """


@register(
    "pareto_frontier_orders",
    _SKY_SQL,
    doc="Skyline (Pareto frontier) of orders maximizing (price, date): "
    "the non-dominated staircase — no other order is both >= on price "
    "and >= on date with one strict. The oracle states dominance "
    "directly (NOT EXISTS); the engine computes it WITHOUT a global "
    "single-partition sort: dedupe to per-price max-date (one hash "
    "agg), bucket prices into coarse ranges, take per-bucket maxima "
    "(tiny relation) -> prefix-max over buckets, then a per-bucket "
    "window handles strictly-higher prices inside each bucket — every "
    "window is partitioned by bucket, so the staircase merge "
    "parallelizes across the price range instead of serializing on "
    "one sorted partition. Survivors = price groups whose max-date "
    "strictly exceeds every higher price's max-date; the point's "
    "multiplicity comes from an equi-join back to the (price, date) "
    "counts.",
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pts = orders.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("dd"),
    )
    grp = pts.groupBy("cents").agg(F.max("dd").alias("gmax"))
    cnt = pts.groupBy("cents", "dd").agg(F.count("*").cast("long").alias("c"))
    g = grp.withColumn("bucket", F.expr("cents div 1000000"))
    bmax = g.groupBy("bucket").agg(F.max("gmax").alias("bm"))
    wb = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bpre = bmax.select(
        "bucket", F.coalesce(F.max("bm").over(wb), F.lit(-1)).alias("above")
    )
    wi = (
        Window.partitionBy("bucket")
        .orderBy(F.col("cents").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = (
        g.join(bpre, "bucket")
        .withColumn(
            "inmax", F.coalesce(F.max("gmax").over(wi), F.lit(-1))
        )
        .filter(
            F.col("gmax") > F.greatest(F.col("above"), F.col("inmax"))
        )
        .select("cents", "gmax")
    )
    return sky.join(
        cnt,
        (sky["cents"] == cnt["cents"]) & (sky["gmax"] == cnt["dd"]),
    ).select(
        sky["cents"].alias("price_cents"),
        sky["gmax"].alias("last_day"),
        cnt["c"].alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# 8. weighted_median_price — weighted quantile via value histogram
# ---------------------------------------------------------------------------

_WMED_SQL = """
    WITH cells AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS w
      FROM lineitem GROUP BY 1, 2),
    cum AS (
      SELECT flag, cents, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumw,
             SUM(w) OVER (PARTITION BY flag) AS tot,
             CAST(COUNT(*) OVER (PARTITION BY flag) AS BIGINT) AS n_prices
      FROM cells)
    SELECT flag AS l_returnflag,
           CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
           CAST(MIN(tot) AS BIGINT) AS total_qty_units,
           MIN(n_prices) AS n_prices
    FROM cum WHERE 2 * cumw >= tot GROUP BY 1
    """


@register(
    "weighted_median_price",
    _WMED_SQL,
    doc="Weighted median (lower) of extended price weighted by quantity, "
    "per returnflag — the weighted-quantile operator (unweighted "
    "median lives in priority_median_price). Decomposed through the "
    "per-value histogram: one fact-table aggregation to (flag, price, "
    "total-weight) cells, then the cumulative-weight scan runs on the "
    "DISTINCT-VALUE relation (bounded by price cardinality, not row "
    "count) and the median is the least value whose cumulative weight "
    "reaches half the total. Exact integer weights (quantity units), "
    "exact cents — no float, no per-row sort. At 100 TB: same "
    "histogram trick the Spearman query uses; per-flag windows touch "
    "|distinct prices| rows.",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).agg(
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("w")
    )
    wc = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy("flag")
    cum = cells.select(
        "flag",
        "cents",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wf).alias("tot"),
        F.count("*").over(wf).cast("long").alias("n_prices"),
    )
    return (
        cum.filter(2 * F.col("cumw") >= F.col("tot"))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.min("cents").cast("long").alias("wmedian_cents"),
            F.min("tot").cast("long").alias("total_qty_units"),
            F.min("n_prices").alias("n_prices"),
        )
    )


# ---------------------------------------------------------------------------
# 9. kcenter_coreset_greedy — farthest-point data selection (3 rounds)
# ---------------------------------------------------------------------------
#
# Greedy k-center (Gonzalez): pick the point with max norm (tie: min
# id), then twice pick the point farthest from all chosen centers.
# Every distance is an EXACT int64 squared distance over the 1e7-
# quantized embedding components (the neardup-edge convention), so the
# argmaxes and covering radii are integer-exact — no float anywhere.

_KC_DOT = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}), z -> z[1] * z[2])) "
    "AS BIGINT)"
)

_KC_SQL = f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5)
                         AS BIGINT)) AS qe
      FROM embeddings),
    p AS (
      SELECT vec_id, qe,
             {_KC_DOT.format(a='qe', b='qe')} AS n2
      FROM q),
    c1 AS (SELECT vec_id, qe, n2 FROM p ORDER BY n2 DESC, vec_id LIMIT 1),
    d1 AS (
      SELECT p.vec_id, p.qe, p.n2,
             p.n2 + c.n2 - 2 * {_KC_DOT.format(a='p.qe', b='c.qe')} AS d
      FROM p CROSS JOIN c1 c),
    c2 AS (SELECT vec_id, qe, n2 FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
    d2 AS (
      SELECT d1.vec_id, d1.qe, d1.n2,
             least(d1.d, d1.n2 + c.n2
                         - 2 * {_KC_DOT.format(a='d1.qe', b='c.qe')}) AS d
      FROM d1 CROSS JOIN c2 c),
    c3 AS (SELECT vec_id, qe, n2 FROM d2 ORDER BY d DESC, vec_id LIMIT 1),
    d3 AS (
      SELECT d2.vec_id,
             least(d2.d, d2.n2 + c.n2
                         - 2 * {_KC_DOT.format(a='d2.qe', b='c.qe')}) AS d
      FROM d2 CROSS JOIN c3 c)
    SELECT CAST(1 AS BIGINT) AS round,
           (SELECT vec_id FROM c1) AS center_id,
           (SELECT CAST(MAX(d) AS BIGINT) FROM d1) AS radius_d2
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           (SELECT vec_id FROM c2),
           (SELECT CAST(MAX(d) AS BIGINT) FROM d2)
    UNION ALL
    SELECT CAST(3 AS BIGINT),
           (SELECT vec_id FROM c3),
           (SELECT CAST(MAX(d) AS BIGINT) FROM d3)
    """


@register(
    "kcenter_coreset_greedy",
    _KC_SQL,
    doc="Greedy k-center coreset selection (Gonzalez farthest-point, "
    "k=3) over the embedding table — the classic diversity-sampling "
    "primitive for training-data selection (each round adds the point "
    "worst-covered by the chosen set, with the covering radius as the "
    "2-approximation certificate). Deterministic: seed = max exact "
    "squared norm (tie: min id); all distances are exact int64 squared "
    "distances on 1e7-quantized components, so argmax and radius are "
    "integer-exact in both dialects. Scale shape: per round ONE "
    "distributed pass — d_new = least(d_old, d2-to-new-center) against "
    "a 1-row broadcast center, then a single max(struct(d, -id)) "
    "aggregate returns the radius AND the next center in the same job "
    "(no sort, no topK); the distance relation persists across rounds "
    "with the superseded round unpersisted (the bpe_train_k_rounds "
    "memory rule). Cost is k scans — the same shape at 100 TB, where "
    "k-means++ seeding and coreset construction run this exact loop.",
)
def kcenter_coreset_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.operators.similarity import (
        quantized_embedding,
    )

    emb = load(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id", quantized_embedding(F.col("embedding")).alias("qe")
    ).withColumn(
        "n2",
        F.aggregate(
            F.zip_with("qe", "qe", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    ).persist()

    schema = "round long, center_id long, radius_d2 long"
    # Seed: max exact norm2, tie-break min id — one aggregate job.
    seed = p.agg(
        F.max(F.struct(F.col("n2"), (-F.col("vec_id")).alias("ni"))).alias(
            "m"
        )
    ).collect()
    if not seed or seed[0].m is None:
        p.unpersist()
        return spark.createDataFrame([], schema)

    rows = []
    center_id = -seed[0].m.ni
    cur = p
    for rnd in (1, 2, 3):
        crow = cur.filter(F.col("vec_id") == center_id).select(
            "qe", "n2"
        ).collect()[0]
        carr = F.array(*[F.lit(int(v)).cast("long") for v in crow.qe])
        dist = (
            F.col("n2")
            + F.lit(int(crow.n2)).cast("long")
            - 2
            * F.aggregate(
                F.zip_with("qe", carr, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        )
        nxt = (
            cur.withColumn(
                "d",
                dist if rnd == 1 else F.least(F.col("d"), dist),
            )
        ).persist()
        # One job: covering radius AND the farthest point (next center).
        m = nxt.agg(
            F.max(
                F.struct(F.col("d"), (-F.col("vec_id")).alias("ni"))
            ).alias("m")
        ).collect()[0].m
        rows.append((rnd, center_id, int(m.d)))
        if cur is not p:
            cur.unpersist()
        cur = nxt
        center_id = -m.ni
    cur.unpersist()
    p.unpersist()
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# 10. stream_two_level_agg — chained stateful aggregation in one query
# ---------------------------------------------------------------------------


@register(
    "stream_two_level_agg",
    """
    WITH b AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS b_start,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT date_trunc('hour', b_start) AS hour_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS total_n,
           CAST(MAX(n) AS BIGINT) AS max_bucket_n
    FROM b GROUP BY 1, 2
    """,
    doc="Chained stateful aggregation in ONE streaming query (multiple "
    "stateful operators, Spark 3.4+): 10-minute tumbling counts per "
    "event_type re-aggregated into hourly rollups downstream — the "
    "pre-aggregation cascade that keeps a 100 TB metrics pipeline's "
    "wide shuffle at fine granularity while the hourly state stays "
    "tiny. Append mode + watermark (chained aggs forbid complete "
    "mode); the bounded replay flushes final windows through BOTH "
    "stateful operators with two far-future sentinel batches "
    "(streaming/windows.py run_two_level_agg). Oracle = the two-level "
    "batch GROUP BY the replay must reduce to.",
)
def stream_two_level_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.streaming.windows import run_two_level_agg

    return run_two_level_agg(spark, f"{sf_dir}/events.parquet")
