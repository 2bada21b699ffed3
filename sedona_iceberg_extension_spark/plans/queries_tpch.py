"""Extended relational inventory — TPC-H-shaped queries over the driver
tables (SURVEY.md §2 Tier D: joins, aggregation, windows, set ops, rollup,
anti/semi joins, disjunctive pushdown — all delegated to native Catalyst).

Every query follows the FIXTURES.md conventions: total ORDER BY, ROUND on
float aggregates, identical aliases on both sides, BIGINT casts in DuckDB.

Scale notes: dimension joins (nation, region, part, supplier) are
broadcast-able and Catalyst broadcasts them from size estimates; fact-fact
joins (lineitem ⋈ orders) shuffle on the join key with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- q7-ish: volume shipping between nations (6-way join) ------------------

def q7_volume_shipping(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    sn = nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("revenue"), "supp_nation", "cust_nation")
        .limit(20)
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name
ORDER BY revenue DESC, supp_nation, cust_nation
LIMIT 20
"""


# --- q10-ish: returned-item revenue per customer ---------------------------

def q10_returned_items(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- q14-ish: promotion revenue share --------------------------------------

def q14_promo_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(F.round(
            100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev), 6).alias("promo_revenue_pct"))
    )


Q14_SQL = """
SELECT ROUND(100 * SUM(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- q15-ish: top supplier by revenue (window argmax, no scalar collect) ---

def q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    w = Window.orderBy(F.desc("total_revenue"), F.asc("l_suppkey"))
    top = rev.withColumn("_rk", F.rank().over(w)).filter(F.col("_rk") <= 5).drop("_rk")
    return (
        top.join(F.broadcast(sup), top["l_suppkey"] == sup["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.desc("total_revenue"), "s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
), ranked AS (
  SELECT l_suppkey, total_revenue,
         RANK() OVER (ORDER BY total_revenue DESC, l_suppkey) AS rk
  FROM rev
)
SELECT s_suppkey, s_name, total_revenue
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rk <= 5
ORDER BY total_revenue DESC, s_suppkey
"""


# --- q18-ish: large-volume orders (HAVING over fact-fact join) -------------

def q18_large_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


# --- q19-ish: disjunctive pushdown (OR of AND blocks) ----------------------

def q19_disjunctive(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 35)))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 50)))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


# --- q22-ish: idle wealthy customers (anti-join + scalar subquery) ---------

def q22_idle_customers(spark, sf_dir):
    """Above-average-balance customers with no large order (anti-join with a
    filtered build side + broadcast scalar subquery)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("a")))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("a")))
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- rollup: multi-level revenue totals ------------------------------------

def q_rollup_revenue(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .select(F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
                F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
                "revenue", "n_orders")
        .orderBy("region", "nation")
    )


QROLLUP_SQL = """
SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY region, nation
"""


# --- window top-N per group ------------------------------------------------

def q_top_parts_per_brand(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"),
                                              F.asc("p_partkey"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_brand", "rk")
    )


QTOPPARTS_SQL = """
SELECT p_brand, rk, p_partkey, p_name, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
) t
WHERE rk <= 3
ORDER BY p_brand, rk
"""


# --- set operations --------------------------------------------------------

def q_set_ops(spark, sf_dir):
    """Nations having suppliers EXCEPT nations having BUILDING customers,
    UNION nations having both (INTERSECT) tagged differently."""
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    sup_nat = (sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
               .select("n_name"))
    cust_nat = (cust.filter(F.col("c_mktsegment") == "BUILDING")
                .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
                .select("n_name"))
    only_sup = sup_nat.exceptAll(cust_nat).distinct() \
        .withColumn("category", F.lit("suppliers_only"))
    both = sup_nat.intersect(cust_nat) \
        .withColumn("category", F.lit("both"))
    return only_sup.unionByName(both).orderBy("category", "n_name")


QSETOPS_SQL = """
WITH sup_nat AS (
  SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
), cust_nat AS (
  SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_mktsegment = 'BUILDING'
)
SELECT n_name, 'suppliers_only' AS category
FROM (SELECT DISTINCT n_name FROM (SELECT * FROM sup_nat EXCEPT ALL SELECT * FROM cust_nat))
UNION ALL
SELECT n_name, 'both' AS category
FROM (SELECT n_name FROM sup_nat INTERSECT SELECT n_name FROM cust_nat)
ORDER BY category, n_name
"""





# --- event funnel: lag window over the clickstream ---------------------------

def q_event_funnel(spark, sf_dir):
    """Per-user view→click conversion lag: for each click, the time since the
    user's previous view (lag window) — the clickstream-shape window query."""
    ev = _t(spark, sf_dir, "events").withColumn("_us", F.unix_micros("ts"))
    # order and subtract in explicit microseconds: the parquet carries nanos
    # (truncated to micros on load), so ts-ordering ties must be broken the
    # same way on both engines
    w = Window.partitionBy("user_id").orderBy(F.col("_us").asc(),
                                              F.col("event_id").asc())
    flagged = ev.withColumn(
        "prev_view_us",
        F.last(F.when(F.col("event_type") == "view", F.col("_us")),
               ignorenulls=True).over(
                   w.rowsBetween(Window.unboundedPreceding, -1)))
    return (
        flagged.filter((F.col("event_type") == "click")
                       & F.col("prev_view_us").isNotNull())
        .select("user_id", "event_id",
                ((F.col("_us") - F.col("prev_view_us")) / F.lit(1000000))
                .cast("long").alias("secs_since_view"))
        .orderBy("user_id", "event_id")
    )


QFUNNEL_SQL = """
SELECT user_id, event_id,
       CAST((us - prev_view_us) // 1000000 AS BIGINT) AS secs_since_view
FROM (
  SELECT user_id, event_id, us, event_type,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_us
  FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
) t
WHERE event_type = 'click' AND prev_view_us IS NOT NULL
ORDER BY user_id, event_id
"""


# --- q9-ish: yearly revenue by supplier nation -------------------------------

def q9_yearly_nation_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- exact percentile aggregation ------------------------------------------

def q_price_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per return flag — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation definition,
    so the match is exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
             F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
             F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


QPCT_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- as-of join: clicks to latest prior view -------------------------------

def q_asof_click_view(spark, sf_dir):
    """As-of join (operators.asof): each click matched to the user's most
    recent view at-or-before it.  Oracle: DuckDB's native ASOF LEFT JOIN.
    The right side is aggregated to unique (user, ts) first — ASOF tie
    semantics over duplicate timestamps are engine-defined otherwise."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "event_id", "us", "value")
    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id", "us")
             .agg(F.round(F.max("value"), 9).alias("view_value")))
    out = asof_join(clicks, views, on="user_id",
                    left_ts="us", right_ts="us")
    return (
        out.select("user_id", "event_id",
                   F.round("value", 9).alias("click_value"),
                   "view_value_r")
        .orderBy("user_id", "event_id")
    )


QASOF_SQL = """
SELECT c.user_id, c.event_id,
       ROUND(c.value, 9) AS click_value,
       v.view_value AS view_value_r
FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value
      FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, us, ROUND(MAX(value), 9) AS view_value
                FROM (SELECT user_id, epoch_us(ts) AS us, value
                      FROM events WHERE event_type = 'view')
                GROUP BY user_id, us) v
  ON c.user_id = v.user_id AND v.us <= c.us
ORDER BY c.user_id, c.event_id
"""


TPCH_QUERIES = {
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL, False),
    "q10_returned_items": (q10_returned_items, Q10_SQL, True),
    "q14_promo_share": (q14_promo_share, Q14_SQL, False),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL, False),
    "q18_large_orders": (q18_large_orders, Q18_SQL, True),
    "q19_disjunctive": (q19_disjunctive, Q19_SQL, False),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL, False),
    "rollup_revenue": (q_rollup_revenue, QROLLUP_SQL, False),
    "top_parts_per_brand": (q_top_parts_per_brand, QTOPPARTS_SQL, False),
    "set_ops_nations": (q_set_ops, QSETOPS_SQL, False),
    "event_funnel_lag": (q_event_funnel, QFUNNEL_SQL, False),
    "q9_yearly_nation_revenue": (q9_yearly_nation_revenue, Q9_SQL, False),
    "price_percentiles": (q_price_percentiles, QPCT_SQL, False),
    "asof_click_view": (q_asof_click_view, QASOF_SQL, False),
}
