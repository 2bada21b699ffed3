"""Round-8 continuation inventory (wave 16+): nonparametric statistics,
inequality / association measures, and ML-data-pipeline utilities.

Same contract as every plans module (FIXTURES.md): each declared query has
an exactly-mirrored DuckDB oracle — total ORDER BY, identical aliases,
ROUND on float outputs with ``+ 0.0`` where a rounded value could be -0.0,
``CAST(... AS BIGINT)`` around integer SUMs so DuckDB never widens to
HUGEINT.

Determinism notes specific to this module:

- The rank-based tests (Mann-Whitney U, Kruskal-Wallis H) never materialize
  per-row ranks: ranks are computed per DISTINCT value from exclusive
  prefix-sums of tie-group counts, and the *doubled* average rank
  ``2*cum_before + t + 1`` is an exact BIGINT — so every rank sum is exact
  integer arithmetic and the z / H statistics are deterministic functions
  of integers (no float-summation-order wobble at all).
- Theil / Lorenz / Cramér's V reduce to ratios of a handful of aggregate
  sums; inputs are scaled per the robust-stats convention so partials stay
  small, and outputs are ROUNDed at 6 (or 4 for test statistics).

Reference parity note: the reference (`/root/reference/`) delegates all
relational/statistical breadth to the engine under it (SURVEY.md §2 Tier
D); this tier is the beyond-reference analytics surface a production user
of that stack runs on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table

R8B_QUERIES: dict = {}


# --- lineitem_mann_whitney --------------------------------------------------

def q_lineitem_mann_whitney(spark, sf_dir):
    """Mann-Whitney U rank-sum test: do returned lines ('R') have a
    different l_extendedprice distribution than kept lines?  Tie-aware
    normal approximation, no continuity correction.

    Scale shape: one groupBy over DISTINCT prices (domain-bounded: prices
    are cents-quantized, so the distinct set grows with the price domain,
    not the row count), one ordered prefix-sum window over that distinct
    table, one scalar finish.  The doubled average rank
    ``2*cum_before + t + 1`` keeps every rank sum in exact BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    per_val = (li.groupBy(F.col("l_extendedprice").alias("v"))
               .agg(F.sum(F.when(F.col("l_returnflag") == "R", 1)
                          .otherwise(0)).cast("long").alias("c1"),
                    F.sum(F.when(F.col("l_returnflag") != "R", 1)
                          .otherwise(0)).cast("long").alias("c2")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = (per_val
              .withColumn("t", F.col("c1") + F.col("c2"))
              .withColumn("cum_before",
                          F.coalesce(F.sum("t").over(w), F.lit(0)))
              .withColumn("rank2", 2 * F.col("cum_before") + F.col("t") + 1))
    agg = ranked.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * F.col("rank2")).cast("long").alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long").alias("tt"))
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    n = n1 + n2
    u1 = (F.col("r1x2").cast("double") - F.col("n1").cast("double")
          * (F.col("n1").cast("double") + 1)) / 2.0
    var_u = n1 * n2 / 12.0 * ((n + 1)
                              - F.col("tt").cast("double") / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / F.sqrt(var_u)
    return agg.select(
        F.col("n1").alias("n_returned"), F.col("n2").alias("n_kept"),
        F.round(u1, 1).alias("u_stat"),
        F.round(z, 4).alias("z_stat"))


_QMANNWHITNEY_SQL = """
WITH per_val AS (
  SELECT l_extendedprice AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM lineitem GROUP BY l_extendedprice
), ranked AS (
  SELECT c1, c2, c1 + c2 AS t,
         2 * COALESCE(SUM(c1 + c2) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (c1 + c2) + 1 AS rank2
  FROM per_val
), agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 * rank2) AS BIGINT) AS r1x2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tt
  FROM ranked
)
SELECT n1 AS n_returned, n2 AS n_kept,
       ROUND((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE)
              * (CAST(n1 AS DOUBLE) + 1)) / 2.0, 1) + 0.0 AS u_stat,
       ROUND(((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE)
               * (CAST(n1 AS DOUBLE) + 1)) / 2.0
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                    * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
                       - CAST(tt AS DOUBLE)
                         / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                            * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                               - 1)))), 4) + 0.0 AS z_stat
FROM agg
"""

R8B_QUERIES["lineitem_mann_whitney"] = (
    q_lineitem_mann_whitney, _QMANNWHITNEY_SQL, False)


# --- orders_kruskal_wallis --------------------------------------------------

def q_orders_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H test: does o_totalprice differ across the five
    order priorities?  Tie-corrected H; per-priority mean ranks reported
    alongside the (replicated) global statistic, kl_term-style, so the
    output is a per-group row set.

    Scale shape: one (value, priority) aggregation, one DISTINCT-value
    prefix-sum window for ranks (domain-bounded), one 5-row finish; the
    H statistic is a deterministic function of exact BIGINT rank sums."""
    orders = load_table(spark, sf_dir, "orders")
    vp = (orders.groupBy(F.col("o_totalprice").alias("v"),
                         F.col("o_orderpriority").alias("pri"))
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    v = vp.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = (v.withColumn("cum_before",
                           F.coalesce(F.sum("t").over(w), F.lit(0)))
              .withColumn("rank2", 2 * F.col("cum_before") + F.col("t") + 1))
    per_pri = (vp.join(ranked.select("v", "rank2"), "v")
               .groupBy("pri")
               .agg(F.sum("c").cast("long").alias("nj"),
                    F.sum(F.col("c") * F.col("rank2")).cast("long")
                    .alias("rj2")))
    tie = v.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long").alias("tt"),
        F.sum("t").cast("long").alias("n"))
    nD = F.col("n").cast("double")
    h_raw_sum = (F.col("rj2").cast("double") / 2.0) \
        * (F.col("rj2").cast("double") / 2.0) / F.col("nj").cast("double")
    per = per_pri.crossJoin(F.broadcast(tie))
    agg = (per.groupBy("n", "tt")
           .agg(F.sum(h_raw_sum).alias("s")))
    h = (12.0 / (nD * (nD + 1)) * F.col("s") - 3.0 * (nD + 1)) \
        / (1.0 - F.col("tt").cast("double") / (nD * nD * nD - nD))
    hrow = agg.select(F.col("n"), F.round(h, 4).alias("h_stat"))
    return (per_pri.crossJoin(F.broadcast(hrow))
            .select("pri", "nj",
                    F.round(F.col("rj2").cast("double")
                            / (2.0 * F.col("nj").cast("double")), 6)
                    .alias("mean_rank"),
                    "h_stat")
            .orderBy("pri"))


_QKRUSKAL_SQL = """
WITH vp AS (
  SELECT o_totalprice AS v, o_orderpriority AS pri,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY o_totalprice, o_orderpriority
), vt AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM vp GROUP BY v
), ranked AS (
  SELECT v,
         2 * COALESCE(SUM(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS rank2
  FROM vt
), per_pri AS (
  SELECT pri, CAST(SUM(c) AS BIGINT) AS nj,
         CAST(SUM(c * rank2) AS BIGINT) AS rj2
  FROM vp JOIN ranked USING (v) GROUP BY pri
), tie AS (
  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tt,
         CAST(SUM(t) AS BIGINT) AS n
  FROM vt
), agg AS (
  SELECT n, tt,
         SUM((CAST(rj2 AS DOUBLE) / 2.0) * (CAST(rj2 AS DOUBLE) / 2.0)
             / CAST(nj AS DOUBLE)) AS s
  FROM per_pri CROSS JOIN tie GROUP BY n, tt
), hrow AS (
  SELECT ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * s
                - 3.0 * (CAST(n AS DOUBLE) + 1))
               / (1.0 - CAST(tt AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 4) + 0.0
           AS h_stat
  FROM agg
)
SELECT pri, nj,
       ROUND(CAST(rj2 AS DOUBLE) / (2.0 * CAST(nj AS DOUBLE)), 6) + 0.0
         AS mean_rank,
       h_stat
FROM per_pri CROSS JOIN hrow
ORDER BY pri
"""

R8B_QUERIES["orders_kruskal_wallis"] = (
    q_orders_kruskal_wallis, _QKRUSKAL_SQL, False)


# --- nation_theil_index -----------------------------------------------------

def q_nation_theil_index(spark, sf_dir):
    """Theil T inequality index of customer lifetime spend within each
    nation: T = L/S - ln(S/n) from the sufficient statistics
    (n, S = sum x, L = sum x ln x) — scale-invariant, so spend is scaled
    /1e5 per the robust-stats convention to keep partials small.

    Scale shape: orders -> per-customer spend (one keyed shuffle),
    customer join for the nation key, one 25-row nation aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    spend = (orders.groupBy("o_custkey")
             .agg((F.sum("o_totalprice") / 100000.0).alias("x")))
    j = (spend.join(cust, spend.o_custkey == cust.c_custkey)
         .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey))
    agg = (j.groupBy("n_name")
           .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                F.sum("x").alias("s"),
                F.sum(F.col("x") * F.log("x")).alias("l")))
    theil = (F.col("l") / F.col("s")
             - F.log(F.col("s") / F.col("n_customers").cast("double")))
    return (agg.select("n_name", "n_customers",
                       F.round(theil, 6).alias("theil"))
            .orderBy("n_name"))


_QTHEIL_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(o_totalprice) / 100000.0 AS x
  FROM orders GROUP BY o_custkey
), agg AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(x) AS s, SUM(x * ln(x)) AS l
  FROM spend
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, n_customers,
       ROUND(l / s - ln(s / CAST(n_customers AS DOUBLE)), 6) + 0.0 AS theil
FROM agg
ORDER BY n_name
"""

R8B_QUERIES["nation_theil_index"] = (
    q_nation_theil_index, _QTHEIL_SQL, False)


# --- revenue_lorenz_deciles -------------------------------------------------

def q_revenue_lorenz_deciles(spark, sf_dir):
    """Lorenz curve of customer revenue concentration: customers in
    ascending-revenue deciles (ntile ordered by revenue then custkey, so
    ties are deterministic), cumulative revenue share per decile — the
    curve behind the Gini/Pareto diagnostics.

    Scale note: the decile assignment is a global sort (the operator's
    semantics); the windowed share runs over the 10-row decile table.
    Revenue differences between customers are >= one cent, far above
    float-summation wobble, so the sort order is engine-stable."""
    orders = load_table(spark, sf_dir, "orders")
    rev = (orders.groupBy("o_custkey")
           .agg((F.sum("o_totalprice") / 100000.0).alias("r")))
    d = rev.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("r", "o_custkey")))
    per = (d.groupBy("decile")
           .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                F.sum("r").alias("rd")))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (per.withColumn("cum_share",
                           F.round(F.sum("rd").over(w)
                                   / F.sum("rd").over(tot), 6))
            .select("decile", "n_customers", "cum_share")
            .orderBy("decile"))


_QLORENZ_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(o_totalprice) / 100000.0 AS r
  FROM orders GROUP BY o_custkey
), d AS (
  SELECT r, ntile(10) OVER (ORDER BY r, o_custkey) AS decile FROM rev
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers, SUM(r) AS rd
  FROM d GROUP BY decile
)
SELECT decile, n_customers,
       ROUND(SUM(rd) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / SUM(rd) OVER (), 6) + 0.0 AS cum_share
FROM per
ORDER BY decile
"""

R8B_QUERIES["revenue_lorenz_deciles"] = (
    q_revenue_lorenz_deciles, _QLORENZ_SQL, False)


# --- lineitem_cramers_v -----------------------------------------------------

def q_lineitem_cramers_v(spark, sf_dir):
    """Cramér's V association between l_returnflag and l_linestatus —
    the normalized effect size on top of the chi-square machinery
    (priority_status_chisq covers the test; this reports the strength).
    Entirely exact-integer contingency arithmetic until the final
    divisions."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = (li.groupBy(F.col("l_returnflag").alias("rf"),
                       F.col("l_linestatus").alias("ls"))
            .agg(F.count(F.lit(1)).cast("long").alias("o")))
    rm = cell.groupBy("rf").agg(F.sum("o").cast("long").alias("row_n"))
    cm = cell.groupBy("ls").agg(F.sum("o").cast("long").alias("col_n"))
    dims = cell.agg(
        F.countDistinct("rf").cast("long").alias("r"),
        F.countDistinct("ls").cast("long").alias("c"),
        F.sum("o").cast("long").alias("n"))
    e = (F.col("row_n").cast("double") * F.col("col_n").cast("double")
         / F.col("n").cast("double"))
    chi_terms = (cell.join(F.broadcast(rm), "rf")
                 .join(F.broadcast(cm), "ls")
                 .crossJoin(F.broadcast(dims))
                 .select("r", "c", "n",
                         ((F.col("o").cast("double") - e)
                          * (F.col("o").cast("double") - e) / e)
                         .alias("term")))
    agg = chi_terms.groupBy("r", "c", "n").agg(F.sum("term").alias("chi2"))
    k = F.least(F.col("r"), F.col("c")).cast("double") - 1.0
    return agg.select(
        F.col("n").alias("n_rows"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(F.col("chi2"), 4).alias("chi2"),
        F.round(F.sqrt(F.col("chi2") / (F.col("n").cast("double") * k)), 6)
        .alias("cramers_v"))


_QCRAMERSV_SQL = """
WITH cell AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM lineitem GROUP BY l_returnflag, l_linestatus
), rm AS (
  SELECT rf, CAST(SUM(o) AS BIGINT) AS row_n FROM cell GROUP BY rf
), cm AS (
  SELECT ls, CAST(SUM(o) AS BIGINT) AS col_n FROM cell GROUP BY ls
), dims AS (
  SELECT CAST(COUNT(DISTINCT rf) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT ls) AS BIGINT) AS c,
         CAST(SUM(o) AS BIGINT) AS n
  FROM cell
), agg AS (
  SELECT r, c, n,
         SUM((CAST(o AS DOUBLE)
              - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                  / CAST(n AS DOUBLE))
             / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
                / CAST(n AS DOUBLE))) AS chi2
  FROM cell JOIN rm USING (rf) JOIN cm USING (ls) CROSS JOIN dims
  GROUP BY r, c, n
)
SELECT n AS n_rows, (r - 1) * (c - 1) AS dof,
       ROUND(chi2, 4) + 0.0 AS chi2,
       ROUND(sqrt(chi2 / (CAST(n AS DOUBLE)
                          * (CAST(LEAST(r, c) AS DOUBLE) - 1.0))), 6) + 0.0
         AS cramers_v
FROM agg
"""

R8B_QUERIES["lineitem_cramers_v"] = (
    q_lineitem_cramers_v, _QCRAMERSV_SQL, False)
