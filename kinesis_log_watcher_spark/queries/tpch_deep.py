"""Deep multi-join analytical queries (TPC-H Q2/3/4/5/6/7/8/9/10/11/12/13/
14/15/16/17/18/19/20/21/22 analogues — all 21 joinful queries of the suite —
adapted to the driver schema: no partsupp/commitdate/shipmode columns, so
predicates use the columns that exist, and Q2/Q20's partsupp relation is
derived from lineitem as the observed part↔supplier supply history).

These go beyond the single-join coverage in queries/relational.py: join
*chains* (up to 6-way), non-equi semi-join correlation, conditional
aggregation ratios, agg-derived thresholds re-joined against the fact
table, and disjunctive join predicates. The point at 100 TB scale:

- every dimension (region/nation/supplier/part/customer) is broadcast —
  the lineitem/orders fact tables are never shuffled *for a dim join*;
- the only shuffle-joins are fact⋈fact on l_orderkey/o_orderkey, where
  both sides hash-partition on the join key (AQE handles skew);
- aggregates are map-side partial (hash agg before the exchange);
- top-k is TakeOrderedAndProject (no total sort);
- all money aggregates are exact DECIMAL → double (see functions/exact):
  bit-identical to DuckDB and partitioning-independent at any scale.

Reference parity note: the reference (main.go:1-416) has no joins at all —
this whole family is SURVEY.md §2.2 surface ("our engine will still
provide them").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.exact import davg, dec, dsum
from kinesis_log_watcher_spark.queries.base import load, register

_DISC_SQL = "CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))"


def _disc_price() -> F.Column:
    """extendedprice*(1-discount) in exact decimal (matches _DISC_SQL)."""
    return dec(F.col("l_extendedprice"), 9, 2) * (
        F.lit(1) - dec(F.col("l_discount"), 3, 2)
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, group, top-k by revenue
# --------------------------------------------------------------------------


@register(
    "shipping_priority_topk",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 analogue: broadcast customer ⋈ orders, shuffle-join "
    "lineitem on orderkey, hash agg, TakeOrdered top-10.",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    # customer is dimension-scale → broadcast into orders; the surviving
    # orders ⋈ lineitem join shuffles both sides on the order key.
    joined = li.join(
        orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — late-shipment order counts: non-equi correlated EXISTS (semi join)
# --------------------------------------------------------------------------


@register(
    "late_shipment_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 analogue: EXISTS with a non-equi correlate "
    "(l_shipdate > o_orderdate + 60d) → left-semi join on the equi key "
    "with the interval predicate as join residual; no pre-agg of lineitem.",
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join, customer and supplier same nation
# --------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 analogue: 6-way join where every non-fact side "
    "(customer/supplier/nation/region) broadcasts; the only shuffle is "
    "orders ⋈ lineitem on the order key. The c_nationkey = s_nationkey "
    "residual keeps only 'local' sales.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(
            orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )


# --------------------------------------------------------------------------
# Q7 — nation-to-nation trade flows by ship year
# --------------------------------------------------------------------------


@register(
    "nation_trade_flows",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND n1.n_name <> n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 analogue: fact⋈fact shuffle on orderkey plus four "
    "broadcast dims (nation twice, aliased); cross-nation filter as a "
    "post-join residual; group by (supp, cust, year).",
)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
    ).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


# --------------------------------------------------------------------------
# Q8 — market share of one supplier nation inside one customer region
# --------------------------------------------------------------------------


@register(
    "market_share_by_year",
    f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           (CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN {_DISC_SQL} END) AS DOUBLE)
            / CAST(SUM({_DISC_SQL}) AS DOUBLE)) AS mkt_share
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
    doc="TPC-H Q8 analogue: conditional-sum / total-sum ratio per year. "
    "Both sums exact decimal → one double division (engine-identical). "
    "NATION_* names only exist in the synthetic nation table at "
    "sf0.001/0.01/0.1 via n_name — NB the testdata uses NATION_i names.",
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _disc_price()
    agg = j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", vol))
        .cast("double")
        .alias("_nation_rev"),
        F.sum(vol).cast("double").alias("_total_rev"),
    )
    return agg.select(
        "o_year", (F.col("_nation_rev") / F.col("_total_rev")).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: who returned the most revenue last quarter
# --------------------------------------------------------------------------


@register(
    "returned_items_topk",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 analogue: quarter of orders ⋈ returned lineitems, "
    "customer+nation broadcast, top-20 by revenue (TakeOrdered).",
)
def returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 — promo revenue ratio: conditional aggregation over a broadcast join
# --------------------------------------------------------------------------


@register(
    "promo_revenue_ratio",
    f"""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_SQL} END) AS DOUBLE)
            / CAST(SUM({_DISC_SQL}) AS DOUBLE)) AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    GROUP BY ALL
    """,
    doc="TPC-H Q14 analogue: single-row conditional ratio; part broadcast; "
    "both sums exact decimal, one double multiply+divide in fixed order.",
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _disc_price()
    agg = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double").alias("_promo"),
        F.sum(vol).cast("double").alias("_total"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("_promo") / F.col("_total")).alias("promo_pct")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity revenue: per-part average re-joined to the fact
# --------------------------------------------------------------------------


@register(
    "small_qty_avg_yearly",
    """
    WITH part_avg AS (
        SELECT l_partkey AS pa_partkey,
               (CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)
                / COUNT(l_quantity)) AS avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT (CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0)
           AS avg_yearly
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN part_avg ON pa_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < 0.5 * avg_qty
    GROUP BY ALL
    """,
    doc="TPC-H Q17 analogue: aggregate lineitem per part (shuffle on "
    "l_partkey), re-join the threshold to the same fact on the same key "
    "(co-partitioned — no second shuffle of the agg side), filter, sum. "
    "avg is exact-sum/count (one double division both engines).",
)
def small_qty_avg_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        davg(F.col("l_quantity"), 9, 2).alias("avg_qty")
    )
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
    )
    return j.agg(
        (dsum(F.col("l_extendedprice"), 9, 2) / F.lit(7.0)).alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING-derived key set semi-joined back
# --------------------------------------------------------------------------


@register(
    "large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey AS big_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT big_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 analogue: exact-decimal HAVING over the fact, the "
    "surviving key set left-semi-joined back on the same shuffle key, "
    "customer broadcast, top-100 by order value.",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"), 9, 2)).alias("_qty"))
        .filter(F.col("_qty") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    j = (
        li.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), 9, 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive brand/size/quantity predicates over a broadcast join
# --------------------------------------------------------------------------


@register(
    "brand_size_qty_revenue",
    f"""
    SELECT CAST(SUM({_DISC_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    GROUP BY ALL
    """,
    doc="TPC-H Q19 analogue: disjunctive mixed-side predicates — the "
    "per-side conjuncts (brand∈{1,2,3}, quantity≤30) are still pushable "
    "below the broadcast join; the cross-side OR evaluates as residual.",
)
def brand_size_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Derived single-side prefilters keep both scans small before the join.
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


# --------------------------------------------------------------------------
# Q22 — idle rich customers: scalar subquery threshold + anti join
# --------------------------------------------------------------------------


@register(
    "idle_rich_customers",
    """
    SELECT n_name,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT (CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                               / COUNT(c_acctbal))
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 analogue: scalar-subquery threshold (exact avg) + "
    "left-anti join against recent orders + broadcast nation + hash agg. "
    "(Anti-join scoped to orders since 2000 so the result is non-empty "
    "at every SF — all-time would be 0 rows in the synthetic data.)",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = load(spark, sf_dir, "nation")
    # Scalar subquery: computed as a 1-row aggregate, cross-broadcast into
    # the filter (exactly what Catalyst does for an uncorrelated scalar
    # subquery in SQL form).
    avg_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(davg(F.col("c_acctbal")).alias("avg_bal"))
    )
    j = (
        cust.join(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_custs"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
    )


# --------------------------------------------------------------------------
# Q6 — pure scan-aggregate revenue delta (no joins: the pushdown showcase)
# --------------------------------------------------------------------------


@register(
    "forecast_revenue_delta",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
             AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 analogue: single-table scan-aggregate — every predicate "
    "pushes into the parquet scan and the projection reads 4 columns; at "
    "100 TB this is the I/O-bound showcase (no shuffle at all, one "
    "map-side partial + one 1-row exchange).",
)
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec(F.col("l_extendedprice"), 9, 2) * dec(F.col("l_discount"), 3, 2))
        .cast("double")
        .alias("revenue_delta"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q9 — profit by supplier nation × ship year over a name-matched part set
# --------------------------------------------------------------------------


@register(
    "nation_year_profit",
    """
    SELECT n_name AS nation,
           CAST(year(l_shipdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                      * (1 - CAST(l_discount AS DECIMAL(3,2)))
                    - CAST(p_retailprice AS DECIMAL(9,2))
                      * CAST(l_quantity AS DECIMAL(4,1))
                      * CAST(0.05 AS DECIMAL(3,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 analogue (no partsupp table: supply cost proxied as 5% "
    "of retail price × quantity, in exact decimal). Plan: the LIKE-"
    "filtered part set, supplier, and nation all broadcast — the fact "
    "table shuffles once, for the final (nation, year) aggregate.",
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    profit = _disc_price() - dec(F.col("p_retailprice"), 9, 2) * dec(
        F.col("l_quantity"), 4, 1
    ) * F.lit(0.05).cast("decimal(3,2)")
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# Q11 — parts whose lineitem value exceeds a global-total threshold
# --------------------------------------------------------------------------


@register(
    "important_part_values",
    f"""
    WITH pv AS (
      SELECT l_partkey, SUM({_DISC_SQL}) AS val
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE val > (SELECT SUM({_DISC_SQL}) * 0.0006 FROM lineitem)
    """,
    doc="TPC-H Q11 analogue: per-group aggregate filtered against a "
    "global-aggregate threshold (uncorrelated scalar subquery). Plan: "
    "both aggregates are map-side partial; the 1-row global total "
    "broadcasts into the filter — no second pass over the fact table "
    "for the comparison.",
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("val"))
    total = li.agg(
        (F.sum(_disc_price()) * F.lit(0.0006).cast("decimal(5,4)")).alias("threshold")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


# --------------------------------------------------------------------------
# Q12 — conditional (high/low priority) line counts per return flag
# --------------------------------------------------------------------------


@register(
    "returnflag_priority_lines",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_tax > 0.04
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 analogue (no shipmode column: return flag groups, tax "
    "band filters): fact⋈fact equi-join with the filter pushed to the "
    "lineitem scan, conditional aggregation via CASE inside SUM — one "
    "shuffle for the join, map-side partial for the 3-group agg.",
)
def returnflag_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_tax") > 0.04)
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left join + double aggregate)
# --------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 analogue: LEFT OUTER join with a join-condition filter "
    "(not a WHERE — zero-order customers must survive), COUNT over a "
    "nullable key, then a second aggregate over the first's output. The "
    "histogram shape: two shuffles total, the second over tiny data.",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    c_orders = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (agg-max scalar filter)
# --------------------------------------------------------------------------


@register(
    "top_supplier_revenue",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, SUM({_DISC_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 analogue: quarterly revenue per supplier, then keep "
    "the max (ties kept — exact decimal comparison, so the 'view used "
    "twice' shape is deterministic). Plan: one fact aggregate reused for "
    "both the max scalar and the filter; supplier broadcasts.",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("total_rev"))
        .localCheckpoint(eager=False)  # reuse: max scalar + filter, one compute
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


# --------------------------------------------------------------------------
# Q16 — distinct supplier counts per part attribute, excluding bad suppliers
# --------------------------------------------------------------------------


@register(
    "part_supplier_counts",
    """
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_type <> 'ECONOMY'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 analogue (lineitem stands in for partsupp): COUNT "
    "DISTINCT per (brand, size) with a NOT-IN exclusion — compiled as a "
    "broadcast anti-join against the (tiny) negative-balance supplier "
    "set, part broadcast, distinct-agg two-phase (partial distinct "
    "map-side before the exchange).",
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who alone held up multi-supplier orders
# --------------------------------------------------------------------------


@register(
    "waiting_supplier_ranking",
    """
    WITH late_lines AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    marked AS (
      SELECT l_orderkey, l_suppkey, is_late,
             COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
               AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END)
               OVER (PARTITION BY l_orderkey) AS n_late_supp
      FROM late_lines)
    SELECT s_name, COUNT(*) AS numwait
    FROM marked JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late AND n_supp > 1 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 analogue (late = shipped >90d after order date): the "
    "EXISTS (another supplier in the order) / NOT EXISTS (another LATE "
    "supplier) pair rewritten as per-order distinct counts over a window "
    "— ONE pass over the fact join instead of two correlated self-joins; "
    "same rows by construction (a late line is 'alone late' iff "
    "n_late_supp = 1). Top-10 with name tiebreak.",
)
def waiting_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lines = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .alias("is_late"),
    )
    w = Window.partitionBy("l_orderkey")
    marked = lines.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        marked.filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part within a region
# --------------------------------------------------------------------------


@register(
    "min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'),
    costed AS (
      SELECT p_partkey, p_name, s_name, s_acctbal, n_name, supply_cost,
             MIN(supply_cost) OVER (PARTITION BY p_partkey) AS best_cost
      FROM supply
      JOIN eu ON s_suppkey = l_suppkey
      JOIN part ON p_partkey = l_partkey
      WHERE p_size <= 15 AND p_type = 'ECONOMY')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM costed
    WHERE supply_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 analogue (no partsupp table: supply cost = cheapest "
    "observed sale per part/supplier pair). The correlated "
    "min-subquery becomes a window MIN over the aggregated supply "
    "relation — one pass, no re-join against a second aggregate. Plan "
    "at scale: lineitem aggregates map-side partial on (part, supp); "
    "supplier⋈nation⋈region and part are broadcast dims; the window "
    "partitions the ALREADY-aggregated (small) relation, never the "
    "fact table; top-100 is TakeOrderedAndProject with a total-order "
    "tiebreak (s_name, p_partkey unique per row).",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_name")
    costed = (
        supply.join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costed.withColumn("best_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("best_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost"
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q20 — suppliers concentrating a part's volume into one year
# --------------------------------------------------------------------------


@register(
    "part_share_suppliers",
    """
    WITH target_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shares AS (
      SELECT l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate <  TIMESTAMP '1997-01-01'
                      THEN l_quantity ELSE 0 END) AS qty_96,
             SUM(l_quantity) AS qty_total
      FROM lineitem JOIN target_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey, l_partkey)
    SELECT DISTINCT s_name, s_acctbal
    FROM shares
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA' AND 2 * qty_96 > qty_total
    ORDER BY s_name
    """,
    doc="TPC-H Q20 analogue (no partsupp availqty: a supplier qualifies "
    "when their 1996 shipments of a 'red%' part exceed half their "
    "all-time volume of that part — same nested-aggregate-threshold "
    "shape). The EXISTS chain is a semi-join: target parts broadcast "
    "into the lineitem scan (filter before the shuffle), conditional "
    "sums are map-side partial on (supp, part), and the comparison is "
    "exact integer arithmetic (2*SUM(x) > SUM(y), quantities integral) "
    "— no 0.5 float factor to diverge across engines. Supplier side "
    "reduces via left-semi against the qualifying pair set.",
)
def part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_shipdate", "l_quantity"
    )
    in_96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    shares = (
        li.join(F.broadcast(target), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_96, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
                "qty_96"
            ),
            F.sum("l_quantity").alias("qty_total"),
        )
        .filter(F.lit(2) * F.col("qty_96") > F.col("qty_total"))
        .select("l_suppkey")
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        supp.join(shares, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
