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
    """Aggregate by the narrow ``o_custkey`` key right after the orders
    join and attach the customer/nation attribute columns AFTER the
    aggregation (round 15, guide §2.3 "aggregate before you shuffle"):
    ``c_custkey`` is the join key itself and ``c_name``/``c_acctbal``/
    ``n_name`` are functionally dependent on it, so grouping pre- vs
    post-join partitions the fact rows identically and the attached
    attributes are the same — row-identical output (oracle-checked),
    but the 600k-row fact stage now does ONE broadcast probe and hashes
    a single long instead of three probes and a 4-column string-bearing
    group key, and the shuffle carries |custkey| aggregated rows without
    the attribute payload."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )
    return (
        agg.join(cust, agg["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
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
    from ..functions.timeops import epoch_micros

    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("_us", epoch_micros(ev, "ts"))
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
    """Per-item amounts become exact integer CENTS before the sum —
    ``floor(x*100 + 0.5)`` is pure IEEE arithmetic (identical bit-for-bit
    on both engines, unlike decimal-string ROUND, where Spark's BigDecimal
    HALF_UP and DuckDB's numeric round can pick different cents at a
    product midpoint), and a BIGINT cent sum is order-free — immune to the
    partial-agg summation-order ulp that flipped a ROUND(...,2) midpoint
    against the oracle at sf0.001."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100 + F.lit(0.5)).cast("long")
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(cents) / F.lit(100.0), 2).alias("revenue"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                 AS BIGINT)) / 100.0, 2) AS revenue
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

    from ..functions.timeops import epoch_micros

    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("us", epoch_micros(ev, "ts"))
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


# --- q2-shaped: min-cost supplier per part (correlated-min via window) ------

def q2_min_cost_supplier(spark, sf_dir):
    """For each STANDARD part under size 10, the supplier offering the lowest
    unit price (lineitem is the part-supplier bridge; this schema has no
    partsupp).  The reference pattern is TPC-H q2's correlated MIN subquery;
    here it is a rank-1 window over the (part, supplier) price matrix —
    one shuffle on p_partkey instead of a re-scan per part."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    unit = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6)
             .alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("unit_price"),
                                                F.asc("l_suppkey"))
    best = unit.withColumn("_rk", F.row_number().over(w)) \
        .filter(F.col("_rk") == 1).drop("_rk")
    return (
        best.join(F.broadcast(sup), best["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select("p_partkey", "p_name", "s_name",
                F.col("n_name").alias("supp_nation"), "unit_price")
        .orderBy("p_partkey")
    )


Q2_SQL = """
WITH unit AS (
  SELECT p_partkey, p_name, l_suppkey,
         ROUND(MIN(l_extendedprice / l_quantity), 6) AS unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size < 10
  GROUP BY p_partkey, p_name, l_suppkey
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY unit_price, l_suppkey) AS rk
  FROM unit
)
SELECT p_partkey, p_name, s_name, n_name AS supp_nation, unit_price
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rk = 1
ORDER BY p_partkey
"""


# --- q4-shaped: order priority count with EXISTS (left-semi join) ----------

def q4_priority_exists(spark, sf_dir):
    """TPC-H q4 pattern: orders in one quarter having at least one large
    lineitem — EXISTS compiles to a left-semi join (no row multiplication,
    build side is the filtered lineitem projection)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    big_lines = _t(spark, sf_dir, "lineitem") \
        .filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(big_lines, orders["o_orderkey"] == big_lines["l_orderkey"],
                    "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q8-shaped: market share of one nation within a region -----------------

def q8_market_share(spark, sf_dir):
    """TPC-H q8 pattern: NATION_3's share of supplier revenue to EUROPE
    customers per order year — conditional-sum over a 7-way star join;
    all dimension sides broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sn = nat.select(F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"))
    cnat = (cust.join(F.broadcast(nat),
                      cust["c_nationkey"] == nat["n_nationkey"])
            .join(F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("c_custkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cnat, orders["o_custkey"] == cnat["c_custkey"], "left_semi")
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev)
                  .otherwise(0.0)) / F.sum(rev), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


# --- q11-shaped: value concentration (HAVING vs scalar subquery) -----------

def q11_value_concentration(spark, sf_dir):
    """TPC-H q11 pattern: parts whose shipped value from NATION_0 suppliers
    exceeds 0.1% of that nation's total — the global total is a one-row
    aggregate broadcast into the HAVING comparison, never recomputed
    per-group."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    nat_lines = (
        li.join(F.broadcast(
            sup.join(F.broadcast(nat),
                     sup["s_nationkey"] == nat["n_nationkey"])
            .select("s_suppkey")),
            li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
    )
    per_part = nat_lines.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice")).alias("_value"))
    total = per_part.agg(
        F.sum("_value").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_value") > F.col("_total") * 0.001)
        .select("l_partkey", F.round("_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH nat_lines AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_0')
)
SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS part_value
FROM nat_lines
GROUP BY l_partkey
HAVING SUM(l_extendedprice) > (SELECT SUM(l_extendedprice) FROM nat_lines) * 0.001
ORDER BY part_value DESC, l_partkey
"""


# --- q12-shaped: priority class counts per return flag ---------------------

def q12_priority_class(spark, sf_dir):
    """TPC-H q12 pattern (CASE-WHEN priority buckets): per return flag, how
    many 1997 shipments belong to urgent/high vs lower priorities — a single
    fact-fact shuffle join then conditional counts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q13-shaped: customer order-count distribution -------------------------

def q13_order_distribution(spark, sf_dir):
    """TPC-H q13: distribution of customers by how many URGENT orders they
    placed — left outer join (so zero-order customers survive) feeding a
    second aggregation over the first's result."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q16-shaped: supplier count per part attribute ------------------------

def q16_supplier_counts(spark, sf_dir):
    """TPC-H q16 pattern: distinct suppliers per (brand, type, size) over the
    lineitem bridge, excluding suppliers in deficit (NOT IN ⇒ broadcast
    anti-join).  COUNT(DISTINCT) shuffles once on the group key."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3") & F.col("p_size").isin(1, 4, 7))
    bad_sup = _t(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(bad_sup), li["l_suppkey"] == bad_sup["s_suppkey"],
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3' AND p_size IN (1, 4, 7)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q17-shaped: small-quantity order revenue (correlated AVG) -------------

def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H q17: revenue from lineitems below 20% of their part's average
    quantity.  The correlated AVG subquery becomes one aggregation over
    lineitem re-joined on p_partkey — two passes over lineitem, no per-row
    subquery execution."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li_p = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    avg_qty = (li_p.groupBy(F.col("p_partkey").alias("_avg_key"))
               .agg((F.avg("l_quantity") * 0.2).alias("_qty_cap")))
    return (
        li_p.join(F.broadcast(avg_qty), li_p["p_partkey"] == F.col("_avg_key"))
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_lines"))
    )


Q17_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey)
"""


# --- q20-shaped: high-volume suppliers of promo parts ----------------------

def q20_promo_suppliers(spark, sf_dir):
    """TPC-H q20 pattern: suppliers who shipped over 400 units of PROMO parts
    in 1997 — a semi-join chain (part filter → per-supplier volume → HAVING →
    supplier semi-join); only supplier keys cross the shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    promo = _t(spark, sf_dir, "part") \
        .filter(F.col("p_type") == "PROMO").select("p_partkey")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    heavy = (
        li.join(F.broadcast(promo), li["l_partkey"] == promo["p_partkey"],
                "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 400)
        .select("l_suppkey")
    )
    return (
        sup.join(F.broadcast(heavy), sup["s_suppkey"] == heavy["l_suppkey"],
                 "left_semi")
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name AS supp_nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 400)
ORDER BY s_suppkey
"""


# --- q21-shaped: sole at-fault supplier in multi-supplier orders -----------

def q21_sole_fault_supplier(spark, sf_dir):
    """TPC-H q21 pattern: in finalized multi-supplier orders, suppliers who
    were the only one with returned ('R') lines.  The EXISTS / NOT-EXISTS
    pair is evaluated as per-order supplier/fault cardinalities (one
    aggregation) instead of two correlated probes per lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    lo = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]) \
        .select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R",
                               F.col("l_suppkey"))).alias("_n_fault"))
    culprit = (
        lo.filter(F.col("l_returnflag") == "R")
        .join(per_order.filter((F.col("_n_supp") > 1)
                               & (F.col("_n_fault") == 1)),
              "l_orderkey", "left_semi")
        .select("l_orderkey", "l_suppkey").distinct()
    )
    return (
        culprit.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey, l_returnflag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lo l1
  WHERE l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lo l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lo l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
) t
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- CUBE grouping sets -----------------------------------------------------

def q_cube_revenue(spark, sf_dir):
    """CUBE over (orderstatus, orderpriority): all four grouping-set levels
    in one pass (Catalyst expands to a single Expand+aggregate — one
    shuffle, not four queries)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .select(F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
                F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
                "revenue", "n_orders")
        .orderBy("status", "priority")
    )


QCUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


# --- pivot ------------------------------------------------------------------

def q_pivot_returnflag(spark, sf_dir):
    """Pivot: revenue per nation × return flag as columns (the DataFrame
    ``pivot`` API compiles to the same single-pass conditional aggregation
    the oracle spells out)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .withColumn("_rev", rev)
        .groupBy("n_name")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("_rev"), 2))
        .select(F.col("n_name").alias("nation"),
                F.col("A").alias("rev_a"), F.col("N").alias("rev_n"),
                F.col("R").alias("rev_r"))
        .orderBy("nation")
    )


QPIVOT_SQL = """
SELECT n_name AS nation,
       ROUND(SUM(CASE WHEN l_returnflag = 'A'
                      THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_a,
       ROUND(SUM(CASE WHEN l_returnflag = 'N'
                      THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_n,
       ROUND(SUM(CASE WHEN l_returnflag = 'R'
                      THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_r
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY nation
"""


# --- skew-safe two-phase count distinct -------------------------------------

def q_skew_count_distinct(spark, sf_dir):
    """Per-user distinct event types through the salted two-phase aggregate
    (operators.skew.salted_count_distinct): phase 1 dedups (key, salt,
    value) partials, phase 2 merges — a hot key's values spread over all
    salt buckets instead of one reducer.  Values match the plain
    COUNT(DISTINCT) oracle exactly."""
    from ..operators import skew

    ev = _t(spark, sf_dir, "events")
    return (
        skew.salted_count_distinct(ev, "user_id", "event_type")
        .withColumnRenamed("n_distinct", "n_event_types")
        .orderBy("user_id")
    )


QSKEWCD_SQL = """
SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --- window-function breadth ------------------------------------------------

def q_window_breadth(spark, sf_dir):
    """The full ranking/analytic window surface in one query: rank flavours
    (row_number/rank/dense_rank/ntile/percent_rank/cume_dist) and value
    windows (lead/lag/first/nth) over customer balances per market segment —
    one shuffle on the partition key serves every function."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"),
                                                   F.asc("c_custkey"))
    return (
        cust.select(
            "c_mktsegment", "c_custkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
            F.round(F.lead("c_acctbal", 1).over(w), 2).alias("next_bal"),
            F.round(F.lag("c_acctbal", 1).over(w), 2).alias("prev_bal"),
            F.round(F.first("c_acctbal").over(w), 2).alias("top_bal"),
            F.round(F.nth_value("c_acctbal", 3).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)), 2).alias("third_bal"))
        .filter(F.col("rn") <= 25)
        .orderBy("c_mktsegment", "rn")
    )


QWINDOW_SQL = """
SELECT c_mktsegment, c_custkey, rn, rk, drk, quartile, pct_rank, cume,
       next_bal, prev_bal, top_bal, third_bal
FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(ROW_NUMBER() OVER w AS INT) AS rn,
         CAST(RANK() OVER w AS INT) AS rk,
         CAST(DENSE_RANK() OVER w AS INT) AS drk,
         CAST(NTILE(4) OVER w AS INT) AS quartile,
         ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
         ROUND(CUME_DIST() OVER w, 9) AS cume,
         ROUND(LEAD(c_acctbal, 1) OVER w, 2) AS next_bal,
         ROUND(LAG(c_acctbal, 1) OVER w, 2) AS prev_bal,
         ROUND(FIRST_VALUE(c_acctbal) OVER w, 2) AS top_bal,
         ROUND(NTH_VALUE(c_acctbal, 3) OVER
               (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS third_bal
  FROM customer
  WHERE c_custkey <= 500
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
) t
WHERE rn <= 25
ORDER BY c_mktsegment, rn
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
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL, False),
    "q4_priority_exists": (q4_priority_exists, Q4_SQL, False),
    "q8_market_share": (q8_market_share, Q8_SQL, False),
    "q11_value_concentration": (q11_value_concentration, Q11_SQL, False),
    "q12_priority_class": (q12_priority_class, Q12_SQL, False),
    "q13_order_distribution": (q13_order_distribution, Q13_SQL, False),
    "q16_supplier_counts": (q16_supplier_counts, Q16_SQL, False),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL, False),
    "q20_promo_suppliers": (q20_promo_suppliers, Q20_SQL, False),
    "q21_sole_fault_supplier": (q21_sole_fault_supplier, Q21_SQL, False),
    "window_breadth": (q_window_breadth, QWINDOW_SQL, False),
    "cube_revenue": (q_cube_revenue, QCUBE_SQL, False),
    "pivot_returnflag": (q_pivot_returnflag, QPIVOT_SQL, False),
    "skew_count_distinct": (q_skew_count_distinct, QSKEWCD_SQL, False),
}
