"""Round-8 wave B: sketch estimation audits, privacy-preserving
collection, spatial bucketing, and paradox detection.

The reference (dacut/kinesis-log-watcher, a 416-line Go CLI that tails a
Kinesis stream and renders log lines — main.go) has none of this
surface; these queries extend the LLM-data-pipeline / analytics families
(SURVEY.md §7.5) with four primitives a 100 TB curation stack runs
routinely:

- AMS (Alon-Matias-Szegedy) tug-of-war F2 sketch, the classic streaming
  second-moment estimator, certified against the exact F2 in-row;
- randomized response (Warner), the local-DP collection mechanism, with
  its unbiased debiasing estimate certified against the true count;
- grid-cell (geohash-style) spatial bucketing — the equi-join shape
  that replaces the quadratic distance cross-join;
- Simpson's-paradox detection, the aggregation-reversal audit every
  observational metric pipeline needs before it trusts a pooled rate.

House disciplines throughout: every random draw is a deterministic
md5-derived integer computed IDENTICALLY in both dialects; all
statistics are exact int64 (micro-quantized where fractional); no
cross joins — scalar "global" values ride bounded-domain windows, not
1-row broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.queries.base import load, register


def _h15(col):
    """First 15 md5 hex chars as a nonnegative int64 (house hash-draw
    convention, identical to DuckDB CAST('0x'||substr(md5(x),1,15) AS
    BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ===========================================================================
# AMS tug-of-war F2 sketch
# ===========================================================================

_AMS_S = 16  # independent estimators


@register(
    "ams_f2_sketch_estimate",
    f"""
    WITH freq AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id),
    sk AS (
      SELECT e.estimator,
             CAST(SUM((1 - 2 * (CAST('0x' || substr(md5(
                      'ams' || CAST(e.estimator AS VARCHAR) || '|'
                      || CAST(f.user_id AS VARCHAR)), 1, 15) AS BIGINT)
                      % 2)) * f.n) AS BIGINT) AS z,
             CAST(SUM(f.n * f.n) AS BIGINT) AS f2_exact
      FROM freq f
      CROSS JOIN (SELECT unnest(range(0, {_AMS_S})) AS estimator) e
      GROUP BY e.estimator)
    SELECT CAST(estimator AS BIGINT) AS estimator, z,
           CAST(z * z AS BIGINT) AS x,
           f2_exact,
           CAST(SUM(z * z) OVER () // {_AMS_S} AS BIGINT) AS est_mean,
           CAST(abs(SUM(z * z) OVER () // {_AMS_S} - f2_exact) * 1000000
                // f2_exact AS BIGINT) AS rel_err_micro
    FROM sk
    """,
    doc="AMS tug-of-war F2 sketch (Alon-Matias-Szegedy '96): 16 "
    "independent +/-1-signed running sums over the user-frequency "
    "vector of events; each Z_j^2 is an unbiased estimate of the "
    "second moment F2 = sum(n_u^2) (the self-join size of events on "
    "user_id, the number a join planner wants before it picks a "
    "strategy). Signs are the deterministic md5 draw computed "
    "identically in both dialects; the exact F2 rides the SAME "
    "aggregation pass (each estimator group sees every user once), so "
    "a green row certifies estimator and ground truth together, and "
    "the mean-estimate/relative-error columns ride a window over the "
    "bounded 16-row sketch relation — no 1-row broadcast join "
    "anywhere. Scale shape: one shuffle to the frequency vector, then "
    "a 16x explode of the (bounded-by-distinct-users) vector into a "
    "16-row sketch; at petabyte row counts the signed sums exceed "
    "int64 when total events approach 3e9 per estimator-sign — the "
    "documented swap is DECIMAL(38,0) for z*z, counters stay exact. "
    "(No counterpart in reference main.go.)",
)
def ams_f2_sketch_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    freq = events.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    sk = (
        freq.select(
            "user_id",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(_AMS_S - 1))).alias(
                "estimator"
            ),
        )
        .select(
            "estimator",
            (
                (
                    1
                    - 2
                    * (
                        _h15(
                            F.concat(
                                F.lit("ams"),
                                F.col("estimator").cast("string"),
                                F.lit("|"),
                                F.col("user_id").cast("string"),
                            )
                        )
                        % 2
                    )
                )
                * F.col("n")
            ).alias("zn"),
            (F.col("n") * F.col("n")).alias("nn"),
        )
        .groupBy("estimator")
        .agg(
            F.sum("zn").cast("long").alias("z"),
            F.sum("nn").cast("long").alias("f2_exact"),
        )
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    est = F.floor(
        F.sum(F.col("z") * F.col("z")).over(wall) / F.lit(_AMS_S)
    ).cast("long")
    return sk.select(
        F.col("estimator").cast("long").alias("estimator"),
        "z",
        (F.col("z") * F.col("z")).cast("long").alias("x"),
        "f2_exact",
        est.alias("est_mean"),
        F.floor(
            F.abs(est - F.col("f2_exact")) * 1000000 / F.col("f2_exact")
        )
        .cast("long")
        .alias("rel_err_micro"),
    )


# ===========================================================================
# Randomized response (Warner's local-DP mechanism) with debiasing
# ===========================================================================


@register(
    "randomized_response_debias",
    """
    WITH flips AS (
      SELECT o_orderstatus AS status,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS truth,
             CASE WHEN CAST('0x' || substr(md5(
                      'rr|' || CAST(o_orderkey AS VARCHAR)), 1, 15)
                      AS BIGINT) % 4 < 3
                  THEN CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END
                  ELSE 1 - CASE WHEN o_orderpriority = '1-URGENT'
                                THEN 1 ELSE 0 END
             END AS reported
      FROM orders)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(truth) AS BIGINT) AS true_cnt,
           CAST(SUM(reported) AS BIGINT) AS observed_cnt,
           CAST((4 * SUM(reported) - COUNT(*)) * 500000 AS BIGINT)
             AS est_micro,
           CAST((4 * SUM(reported) - COUNT(*)) * 500000
                - SUM(truth) * 1000000 AS BIGINT) AS err_micro
    FROM flips GROUP BY status
    """,
    doc="Randomized response (Warner 1965, the local-DP collection "
    "mechanism): each order reports its is-urgent bit truthfully with "
    "p=3/4 and flipped with p=1/4 (ln(3)-LDP), drawn from the "
    "deterministic md5 coin computed identically in both dialects; "
    "the collector then debiases with the closed-form unbiased "
    "estimator n_hat = (4*observed - n)/2, emitted as exact micros "
    "(x500000 keeps the /2 exact in int64). err_micro certifies the "
    "estimate against the ground truth the mechanism hides. The "
    "privacy-preserving telemetry primitive for collecting corpus "
    "statistics without seeing any row's true bit. Scale shape: one "
    "narrow map + one partial-agg shuffle on the bounded status "
    "domain. (No counterpart in reference main.go.)",
)
def randomized_response_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    truth = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    keep = (
        _h15(F.concat(F.lit("rr|"), F.col("o_orderkey").cast("string"))) % 4
        < 3
    )
    flips = orders.select(
        F.col("o_orderstatus").alias("status"),
        truth.alias("truth"),
        F.when(keep, truth).otherwise(1 - truth).alias("reported"),
    )
    return flips.groupBy("status").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("truth").cast("long").alias("true_cnt"),
        F.sum("reported").cast("long").alias("observed_cnt"),
        ((4 * F.sum("reported") - F.count("*")) * 500000)
        .cast("long")
        .alias("est_micro"),
        (
            (4 * F.sum("reported") - F.count("*")) * 500000
            - F.sum("truth") * 1000000
        )
        .cast("long")
        .alias("err_micro"),
    )


# ===========================================================================
# Simpson's-paradox (aggregation reversal) audit
# ===========================================================================


@register(
    "simpson_paradox_audit",
    """
    WITH strata AS (
      SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_year,
             CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN l_discount > 0.05
                           AND l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_t,
             CAST(SUM(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN l_discount <= 0.05
                           AND l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r_c
      FROM lineitem GROUP BY 1),
    pooled AS (
      SELECT *,
             SUM(n_t) OVER () AS pn_t, SUM(r_t) OVER () AS pr_t,
             SUM(n_c) OVER () AS pn_c, SUM(r_c) OVER () AS pr_c
      FROM strata)
    SELECT ship_year, n_t, r_t, n_c, r_c,
           CAST(sign(r_t * n_c - r_c * n_t) AS BIGINT) AS dir_stratum,
           CAST(sign(pr_t * pn_c - pr_c * pn_t) AS BIGINT) AS dir_pooled,
           CAST(sign(r_t * n_c - r_c * n_t)
                * sign(pr_t * pn_c - pr_c * pn_t) AS BIGINT) = -1
             AS reversed
    FROM pooled
    """,
    doc="Simpson's-paradox audit: does the pooled association between "
    "deep discounting (l_discount > 0.05) and returns (l_returnflag = "
    "'R') reverse inside any ship-year stratum? Rate comparisons are "
    "exact integer cross-multiplications (r_t*n_c vs r_c*n_t), never "
    "float division; the pooled direction is recovered from the SAME "
    "7-row stratum relation by window sums (pooled counts are the "
    "stratum sums), so no second scan and no 1-row broadcast join. "
    "The aggregation-reversal gate an observational metrics pipeline "
    "runs before trusting any pooled rate. Scale shape: one "
    "partial-agg shuffle to a bounded 7-row relation; windows run on "
    "that bounded domain. (No counterpart in reference main.go.)",
)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    t = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    r = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    strata = li.groupBy(
        F.year(F.to_date("l_shipdate")).cast("long").alias("ship_year")
    ).agg(
        F.sum(t).cast("long").alias("n_t"),
        F.sum(t * r).cast("long").alias("r_t"),
        F.sum(1 - t).cast("long").alias("n_c"),
        F.sum((1 - t) * r).cast("long").alias("r_c"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pooled = strata.select(
        "*",
        F.sum("n_t").over(wall).alias("pn_t"),
        F.sum("r_t").over(wall).alias("pr_t"),
        F.sum("n_c").over(wall).alias("pn_c"),
        F.sum("r_c").over(wall).alias("pr_c"),
    )
    def isign(x):
        return (
            F.when(x > 0, 1).when(x < 0, -1).otherwise(0).cast("long")
        )

    ds = isign(F.col("r_t") * F.col("n_c") - F.col("r_c") * F.col("n_t"))
    dp = isign(
        F.col("pr_t") * F.col("pn_c") - F.col("pr_c") * F.col("pn_t")
    )
    return pooled.select(
        "ship_year",
        "n_t",
        "r_t",
        "n_c",
        "r_c",
        ds.alias("dir_stratum"),
        dp.alias("dir_pooled"),
        ((ds * dp) == -1).alias("reversed"),
    )


# ===========================================================================
# Grid-cell (geohash-style) spatial bucketed join
# ===========================================================================

# 15-degree cells in micro-degrees: 12 latitude bands x 24 longitude
# bands = 288 cells. Coordinates are synthesized deterministically from
# the entity keys (TPC-H has no geography), identically in both
# dialects.
_GEO_CELL = 15_000_000


@register(
    "geohash_cell_pair_stats",
    f"""
    WITH cust AS (
      SELECT c_custkey,
             CAST('0x' || substr(md5('glat|' || CAST(c_custkey AS VARCHAR)),
                  1, 15) AS BIGINT) % 180000000 - 90000000 AS lat,
             CAST('0x' || substr(md5('glon|' || CAST(c_custkey AS VARCHAR)),
                  1, 15) AS BIGINT) % 360000000 - 180000000 AS lon
      FROM customer),
    supp AS (
      SELECT s_suppkey,
             CAST('0x' || substr(md5('glat|s' || CAST(s_suppkey AS VARCHAR)),
                  1, 15) AS BIGINT) % 180000000 - 90000000 AS lat,
             CAST('0x' || substr(md5('glon|s' || CAST(s_suppkey AS VARCHAR)),
                  1, 15) AS BIGINT) % 360000000 - 180000000 AS lon
      FROM supplier),
    cc AS (
      SELECT *, ((lat + 90000000) // {_GEO_CELL}) * 24
                + ((lon + 180000000) // {_GEO_CELL}) AS cell
      FROM cust),
    sc AS (
      SELECT *, ((lat + 90000000) // {_GEO_CELL}) * 24
                + ((lon + 180000000) // {_GEO_CELL}) AS cell
      FROM supp)
    SELECT CAST(cc.cell AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN((cc.lat - sc.lat) * (cc.lat - sc.lat)
                    + (cc.lon - sc.lon) * (cc.lon - sc.lon)) AS BIGINT)
             AS min_d2,
           CAST(SUM(CASE WHEN (cc.lat - sc.lat) * (cc.lat - sc.lat)
                              + (cc.lon - sc.lon) * (cc.lon - sc.lon)
                              < 25000000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_5deg
    FROM cc JOIN sc ON cc.cell = sc.cell
    GROUP BY cc.cell
    """,
    doc="Spatial bucketed join (the geohash pattern): customers and "
    "suppliers get deterministic md5-synthesized micro-degree "
    "coordinates, land in 15-degree grid cells (12x24=288), and "
    "customer-supplier proximity stats aggregate per cell over an "
    "EQUI-join on cell id — the shape that replaces the quadratic "
    "all-pairs distance cross-join at scale. Distances are exact "
    "integer squared micro-degrees (equirectangular; max term 4.5e14, "
    "int64-safe). Scale shape: both sides shuffle once on the cell "
    "key; per-cell pair volume is bounded by cell granularity — at "
    "higher density the grid refines (more cells, same join shape) "
    "and boundary-crossing pairs are found by the standard "
    "neighbor-cell replication, both leaving the plan an equi-join. "
    "This query certifies the cell assignment + same-cell pair "
    "algebra. (No counterpart in reference main.go.)",
)
def geohash_cell_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def with_coords(df: DataFrame, key: str, tag: str) -> DataFrame:
        k = F.col(key).cast("string")
        lat = (
            _h15(F.concat(F.lit("glat|" + tag), k)) % 180000000 - 90000000
        )
        lon = (
            _h15(F.concat(F.lit("glon|" + tag), k)) % 360000000 - 180000000
        )
        return df.select(
            lat.alias("lat"),
            lon.alias("lon"),
        ).select(
            "lat",
            "lon",
            (
                F.floor((F.col("lat") + 90000000) / _GEO_CELL) * 24
                + F.floor((F.col("lon") + 180000000) / _GEO_CELL)
            )
            .cast("long")
            .alias("cell"),
        )

    cc = with_coords(load(spark, sf_dir, "customer"), "c_custkey", "")
    sc = (
        with_coords(load(spark, sf_dir, "supplier"), "s_suppkey", "s")
        .withColumnRenamed("lat", "slat")
        .withColumnRenamed("lon", "slon")
    )
    d2 = (F.col("lat") - F.col("slat")) * (
        F.col("lat") - F.col("slat")
    ) + (F.col("lon") - F.col("slon")) * (F.col("lon") - F.col("slon"))
    return (
        cc.join(sc, "cell")
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min(d2).cast("long").alias("min_d2"),
            F.sum(F.when(d2 < 25000000000000, 1).otherwise(0))
            .cast("long")
            .alias("n_within_5deg"),
        )
    )


# ===========================================================================
# Greedy maximum-coverage document selection (budgeted set cover)
# ===========================================================================

_COVER_K = 4  # selection rounds


def _cover_pick_sql(dw: str, cov: str, exclude: str) -> str:
    """One greedy round in the oracle dialect: argmax uncovered-word
    gain over doc->word sets, ties to the smallest doc_id."""
    excl = f"AND d.doc_id NOT IN (SELECT doc_id FROM {exclude})" if exclude else ""
    notin = f"AND d.word NOT IN (SELECT word FROM {cov})" if cov else ""
    return f"""(
      SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
      FROM {dw} d WHERE 1=1 {notin} {excl}
      GROUP BY d.doc_id ORDER BY gain DESC, d.doc_id LIMIT 1)"""


@register(
    "greedy_set_cover_docs",
    f"""
    WITH dw AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(string_split(text, ' ')) - 1),
               i -> array_to_string(
                      list_slice(string_split(text, ' '), i, i + 2), ' ')
             ))) AS word
      FROM documents
      WHERE len(string_split(text, ' ')) >= 3),
    p1 AS {_cover_pick_sql('dw', '', '')},
    c1 AS (SELECT DISTINCT word FROM dw JOIN p1 USING (doc_id)),
    p2 AS {_cover_pick_sql('dw', 'c1', 'p1')},
    c2 AS (SELECT word FROM c1 UNION
           SELECT word FROM dw JOIN p2 USING (doc_id)),
    px AS (SELECT doc_id FROM p1 UNION SELECT doc_id FROM p2),
    p3 AS {_cover_pick_sql('dw', 'c2', 'px')},
    c3 AS (SELECT word FROM c2 UNION
           SELECT word FROM dw JOIN p3 USING (doc_id)),
    py AS (SELECT doc_id FROM px UNION SELECT doc_id FROM p3),
    p4 AS {_cover_pick_sql('dw', 'c3', 'py')},
    c4 AS (SELECT word FROM c3 UNION
           SELECT word FROM dw JOIN p4 USING (doc_id))
    SELECT 1 AS round, p1.doc_id, p1.gain,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c1) AS covered_cum
    FROM p1
    UNION ALL SELECT 2, p2.doc_id, p2.gain,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c2) FROM p2
    UNION ALL SELECT 3, p3.doc_id, p3.gain,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c3) FROM p3
    UNION ALL SELECT 4, p4.doc_id, p4.gain,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c4) FROM p4
    """,
    doc="Greedy maximum-coverage selection (the classic (1-1/e) "
    "set-cover greedy): 4 rounds, each picking the document whose "
    "3-token shingle set covers the most still-uncovered shingles "
    "(ties to the smallest doc_id) — the submodular data-selection "
    "primitive behind 'pick the k docs that cover the most n-grams' "
    "corpus curation. The engine runs the loop as K bounded driver "
    "iterations, each ONE anti-join (uncovered words) + partial-agg "
    "argmax; the covered set is only the union of at most K picked "
    "documents' words, so the anti-join build side stays broadcast-"
    "small by construction. The oracle unrolls the same 4 rounds as "
    "CTEs. Scale shape: per round one shuffle on the word key over "
    "the doc->word relation (persisted across rounds); the argmax is "
    "a two-phase top-1 (WindowGroupLimit), never a global sort; "
    "driver-side data is K scalar picks. (No counterpart in "
    "reference main.go.)",
)
def greedy_set_cover_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.operators.dedup import exploded_shingles
    from kinesis_log_watcher_spark.queries.base import finalize_unpersist

    docs = load(spark, sf_dir, "documents")
    dw = (
        exploded_shingles(docs)
        .withColumnRenamed("shingle", "word")
        .persist()
    )
    picked: list[int] = []
    rows = []
    cum = 0
    for rnd in range(1, _COVER_K + 1):
        cand = dw
        if picked:
            # covered = union of the picked docs' shingle sets — at most
            # K documents' worth, broadcast-small by construction; the
            # greedy gain is |words(d) \ covered| via one anti-join.
            cand = cand.filter(~F.col("doc_id").isin(picked)).join(
                F.broadcast(
                    dw.filter(F.col("doc_id").isin(picked)).select("word")
                ),
                "word",
                "left_anti",
            )
        gains = cand.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("gain")
        )
        w = Window.orderBy(F.col("gain").desc(), F.col("doc_id").asc())
        pick = (
            gains.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "gain")
            .collect()
        )
        if not pick:
            break
        doc_id, gain = pick[0]["doc_id"], pick[0]["gain"]
        picked.append(doc_id)
        # the round's gain IS the newly-covered count (distinct-per-doc
        # shingles minus already-covered), so the cumulative coverage is
        # a running sum — no extra count job per round.
        cum += gain
        rows.append((rnd, doc_id, gain, cum))
    out = spark.createDataFrame(
        rows, "round int, doc_id long, gain long, covered_cum long"
    ).select(
        F.col("round").cast("int").alias("round"),
        "doc_id",
        "gain",
        "covered_cum",
    )
    return finalize_unpersist(out, dw)


# ===========================================================================
# SAX symbolization + motif counting over the daily revenue series
# ===========================================================================


@register(
    "sax_daily_revenue_motifs",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    sym AS (
      SELECT prio, day,
             ((ROW_NUMBER() OVER (PARTITION BY prio
                                  ORDER BY cents, day) - 1) * 4)
               // COUNT(*) OVER (PARTITION BY prio) AS s
      FROM daily),
    words AS (
      SELECT prio,
             s * 64
             + lead(s, 1) OVER w * 16
             + lead(s, 2) OVER w * 4
             + lead(s, 3) OVER w AS word
      FROM sym
      WINDOW w AS (PARTITION BY prio ORDER BY day))
    SELECT prio, CAST(word AS BIGINT) AS word,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM words WHERE word IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="SAX (symbolic aggregate approximation) motif discovery over "
    "the per-priority daily revenue series: each day's exact-cents "
    "revenue maps to a quartile symbol 0-3 by rank within its series "
    "(rank-based symbolization — exact integers, no z-normalization "
    "floats), consecutive 4-day symbol windows form base-4 motif "
    "words, and the query counts every motif's occurrences — the "
    "repeated-pattern primitive behind time-series indexing "
    "(Lin/Keogh SAX) re-expressed as rank + lead windows. Scale "
    "shape: one partial-agg shuffle to the bounded (priority x day) "
    "domain (~12k rows regardless of order volume — the histogram-"
    "family pattern); every window runs on that bounded relation. "
    "(No counterpart in reference main.go.)",
)
def sax_daily_revenue_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.functions.exact import dec

    orders = load(spark, sf_dir, "orders")
    epoch = F.lit("1970-01-01")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.to_date("o_orderdate"), epoch).cast("long").alias(
            "day"
        ),
    ).agg(
        F.sum((dec(F.col("o_totalprice"), 12, 2) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wrank = Window.partitionBy("prio").orderBy("cents", "day")
    wall = Window.partitionBy("prio").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sym = daily.select(
        "prio",
        "day",
        F.floor(
            (F.row_number().over(wrank) - 1) * 4 / F.count("*").over(wall)
        ).alias("s"),
    )
    wday = Window.partitionBy("prio").orderBy("day")
    words = sym.select(
        "prio",
        (
            F.col("s") * 64
            + F.lead("s", 1).over(wday) * 16
            + F.lead("s", 2).over(wday) * 4
            + F.lead("s", 3).over(wday)
        ).alias("word"),
    ).filter(F.col("word").isNotNull())
    return words.groupBy("prio", F.col("word").cast("long").alias("word")).agg(
        F.count("*").cast("long").alias("n")
    )
