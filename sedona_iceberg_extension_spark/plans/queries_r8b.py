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
    # the contingency table (~6 rows) feeds FOUR consumers, so the
    # corpus groupBy executes 4x per query.  Deliberately left redundant
    # (r13 materialization A/B: cache/local-relation sharing measured
    # +225% at sf0.1 — the four copies run as parallel stages of one
    # job; see q_lineitem_robust_stats for the full numbers).
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


# --- source_token_js_divergence ---------------------------------------------

from ..pipeline import text as _text
from .sql_shared import TOKS_SQL as _TOKS_SQL


def q_source_token_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence of each source's token distribution
    against the corpus mix, over the top-500 corpus terms (deterministic
    cutoff: count DESC, term ASC; distributions renormalized within that
    vocabulary) — the symmetric, bounded companion to source_lang_kl for
    corpus-composition monitoring.

    Scale shape: one token aggregation, a 500-row broadcast vocabulary,
    a sources x vocab grid (|sources| * 500 rows) — never doc x vocab."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("source",
                        F.explode(_text.tokens(F.col("text"))).alias("term"))
            .filter(F.col("term") != ""))
    corpus = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("qc"))
    vocab = (corpus
             .withColumn("rk", F.row_number().over(
                 Window.orderBy(F.col("qc").desc(), F.col("term").asc())))
             .filter(F.col("rk") <= 500).drop("rk"))
    qtot = vocab.agg(F.sum("qc").cast("long").alias("qt"))
    sc = (toks.join(F.broadcast(vocab.select("term")), "term")
          .groupBy("source", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    stot = sc.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    grid = (stot.crossJoin(F.broadcast(vocab))
            .join(sc, ["source", "term"], "left")
            .crossJoin(F.broadcast(qtot))
            .withColumn("c", F.coalesce(F.col("c"), F.lit(0))))
    p = F.col("c").cast("double") / F.col("ns").cast("double")
    q = F.col("qc").cast("double") / F.col("qt").cast("double")
    m = (p + q) / 2.0
    term = (F.when(F.col("c") > 0, 0.5 * p * F.log(p / m)).otherwise(0.0)
            + 0.5 * q * F.log(q / m))
    return (grid.groupBy("source", "ns")
            .agg(F.round(F.sum(term), 6).alias("js"))
            .select("source", F.col("ns").alias("n_vocab_tokens"), "js")
            .orderBy("source"))


_QJS_SQL = f"""
WITH toks AS (
  SELECT source, t.term
  FROM (SELECT source, {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
), corpus AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS qc FROM toks GROUP BY term
), vocab AS (
  SELECT term, qc
  FROM (SELECT term, qc, row_number() OVER (ORDER BY qc DESC, term ASC)
            AS rk FROM corpus)
  WHERE rk <= 500
), qtot AS (
  SELECT CAST(SUM(qc) AS BIGINT) AS qt FROM vocab
), sc AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks SEMI JOIN vocab USING (term)
  GROUP BY source, term
), stot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM sc GROUP BY source
), grid AS (
  SELECT stot.source, stot.ns, vocab.term, vocab.qc, qtot.qt,
         COALESCE(sc.c, 0) AS c
  FROM stot CROSS JOIN vocab CROSS JOIN qtot
  LEFT JOIN sc ON sc.source = stot.source AND sc.term = vocab.term
)
SELECT source, ns AS n_vocab_tokens,
       ROUND(SUM(
         CASE WHEN c > 0 THEN 0.5 * (CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
              * ln((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
                   / ((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)
                       + CAST(qc AS DOUBLE) / CAST(qt AS DOUBLE)) / 2.0))
              ELSE 0.0 END
         + 0.5 * (CAST(qc AS DOUBLE) / CAST(qt AS DOUBLE))
           * ln((CAST(qc AS DOUBLE) / CAST(qt AS DOUBLE))
                / ((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)
                    + CAST(qc AS DOUBLE) / CAST(qt AS DOUBLE)) / 2.0))), 6)
         + 0.0 AS js
FROM grid
GROUP BY source, ns
ORDER BY source
"""

R8B_QUERIES["source_token_js_divergence"] = (
    q_source_token_js_divergence, _QJS_SQL, False)


# --- daily_revenue_theil_sen ------------------------------------------------

def q_daily_revenue_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend of 1996 daily revenue: the median of all
    pairwise slopes over the 366-day series — the outlier-immune
    alternative to the OLS trend.

    Scale shape: the pair set is day x day over a YEAR-bounded aggregate
    (366 rows -> 66,795 pairs), a broadcast self-join of a tiny table —
    the quadratic blowup is over the calendar, never the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    days = (orders
            .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
            .groupBy(F.datediff(F.col("o_orderdate"),
                                F.lit("1996-01-01").cast("date")).alias("d"))
            .agg((F.sum("o_totalprice") / 100000.0).alias("r")))
    a = days.select(F.col("d").alias("d1"), F.col("r").alias("r1"))
    b = days.select(F.col("d").alias("d2"), F.col("r").alias("r2"))
    pairs = (a.join(F.broadcast(b), F.col("d2") > F.col("d1"))
             .select(((F.col("r2") - F.col("r1"))
                      / (F.col("d2") - F.col("d1")).cast("double"))
                     .alias("slope")))
    stats = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("med"))
    nd = days.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (nd.crossJoin(stats)
            .select("n_days", "n_pairs",
                    F.round(F.col("med"), 6).alias("ts_slope")))


_QTHEILSEN_SQL = """
WITH days AS (
  SELECT date_diff('day', DATE '1996-01-01', o_orderdate) AS d,
         SUM(o_totalprice) / 100000.0 AS r
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
), pairs AS (
  SELECT (b.r - a.r) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM days a JOIN days b ON b.d > a.d
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS med
  FROM pairs
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM days
)
SELECT n_days, n_pairs, ROUND(med, 6) + 0.0 AS ts_slope
FROM nd CROSS JOIN stats
"""

R8B_QUERIES["daily_revenue_theil_sen"] = (
    q_daily_revenue_theil_sen, _QTHEILSEN_SQL, False)


# --- orders_breusch_pagan ---------------------------------------------------

def q_orders_breusch_pagan(spark, sf_dir):
    """Breusch-Pagan heteroscedasticity screen on the daily-revenue
    trend: OLS of daily revenue on the day index, then the auxiliary
    regression of squared residuals on the day index; LM = n * R²_aux.
    Every pass is centered against separately-aggregated means (no
    raw-moment cancellation), mirrored as chained CTEs.

    Scale shape: three aggregation passes over the day-level table
    (calendar-bounded), scalar finishes via broadcast cross joins."""
    orders = load_table(spark, sf_dir, "orders")
    days = (orders.groupBy(F.datediff(F.col("o_orderdate"),
                                      F.lit("1995-01-01").cast("date"))
                           .alias("x"))
            .agg((F.sum("o_totalprice") / 100000.0).alias("y")))
    m = days.agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.avg(F.col("x").cast("double")).alias("mx"),
                 F.avg("y").alias("my"))
    c1 = (days.crossJoin(F.broadcast(m))
          .agg(F.first("n").alias("n"), F.first("mx").alias("mx"),
               F.first("my").alias("my"),
               F.sum((F.col("x") - F.col("mx"))
                     * (F.col("x") - F.col("mx"))).alias("sxx"),
               F.sum((F.col("x") - F.col("mx"))
                     * (F.col("y") - F.col("my"))).alias("sxy")))
    coef = c1.select(
        "n", "mx", "my", "sxx",
        (F.col("sxy") / F.col("sxx")).alias("b1"),
        (F.col("my") - F.col("sxy") / F.col("sxx") * F.col("mx")).alias("b0"))
    resid = (days.crossJoin(F.broadcast(coef))
             .withColumn("e2", (F.col("y") - F.col("b0")
                                - F.col("b1") * F.col("x"))
                         * (F.col("y") - F.col("b0")
                            - F.col("b1") * F.col("x"))))
    me2 = (resid.groupBy("n", "mx", "sxx", "b0", "b1")
           .agg(F.avg("e2").alias("me2")))
    aux = (resid.join(F.broadcast(me2.select("me2")))
           .groupBy("n", "sxx", "b0", "b1", "me2")
           .agg(F.sum((F.col("x") - F.col("mx"))
                      * (F.col("e2") - F.col("me2"))).alias("sxe"),
                F.sum((F.col("e2") - F.col("me2"))
                      * (F.col("e2") - F.col("me2"))).alias("see")))
    r2 = (F.col("sxe") * F.col("sxe")) / (F.col("sxx") * F.col("see"))
    return aux.select(
        F.col("n").alias("n_days"),
        F.round("b0", 6).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(F.col("n").cast("double") * r2, 4).alias("lm_stat"))


_QBP_SQL = """
WITH days AS (
  SELECT date_diff('day', DATE '1995-01-01', o_orderdate) AS x,
         SUM(o_totalprice) / 100000.0 AS y
  FROM orders GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(x AS DOUBLE)) AS mx,
         AVG(y) AS my
  FROM days
), c1 AS (
  SELECT n, mx, my,
         SUM((x - mx) * (x - mx)) AS sxx,
         SUM((x - mx) * (y - my)) AS sxy
  FROM days CROSS JOIN m GROUP BY n, mx, my
), coef AS (
  SELECT n, mx, my, sxx, sxy / sxx AS b1, my - sxy / sxx * mx AS b0
  FROM c1
), resid AS (
  SELECT days.x, coef.n, coef.mx, coef.sxx, coef.b0, coef.b1,
         (y - b0 - b1 * x) * (y - b0 - b1 * x) AS e2
  FROM days CROSS JOIN coef
), me2t AS (
  SELECT n, mx, sxx, b0, b1, AVG(e2) AS me2
  FROM resid GROUP BY n, mx, sxx, b0, b1
), aux AS (
  SELECT r.n, r.sxx, r.b0, r.b1, me2t.me2,
         SUM((r.x - r.mx) * (r.e2 - me2t.me2)) AS sxe,
         SUM((r.e2 - me2t.me2) * (r.e2 - me2t.me2)) AS see
  FROM resid r CROSS JOIN me2t
  GROUP BY r.n, r.sxx, r.b0, r.b1, me2t.me2
)
SELECT n AS n_days,
       ROUND(b0, 6) + 0.0 AS b0,
       ROUND(b1, 6) + 0.0 AS b1,
       ROUND((sxe * sxe) / (sxx * see), 6) + 0.0 AS r2_aux,
       ROUND(CAST(n AS DOUBLE) * (sxe * sxe) / (sxx * see), 4) + 0.0
         AS lm_stat
FROM aux
"""

R8B_QUERIES["orders_breusch_pagan"] = (
    q_orders_breusch_pagan, _QBP_SQL, False)


# --- events_durbin_watson ---------------------------------------------------

def q_events_durbin_watson(spark, sf_dir):
    """Durbin-Watson autocorrelation statistic on the residuals of the
    daily event-count trend: detrend counts with closed-form OLS (exact
    integer sufficient statistics — x and y are both integers, so the
    coefficients are deterministic), then DW = sum of squared successive
    residual differences over the residual sum of squares.

    Scale shape: one day-level aggregation (the events table spans ~61
    days), a scalar OLS finish, and one ordered lag window over the
    day table — the same bounded-window trade as ship_survival_km."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.datediff(F.date_trunc("day", F.col("ts")),
                                  F.lit("2024-01-01").cast("date"))
                       .alias("x"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    m = days.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"))
    nD = F.col("n").cast("double")
    b1 = ((nD * F.col("sxy").cast("double")
           - F.col("sx").cast("double") * F.col("sy").cast("double"))
          / (nD * F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx").cast("double")))
    coef = m.select(
        "n", b1.alias("b1"),
        ((F.col("sy").cast("double") - b1 * F.col("sx").cast("double")) / nD)
        .alias("b0"))
    resid = (days.crossJoin(F.broadcast(coef))
             .withColumn("e", F.col("y").cast("double") - F.col("b0")
                         - F.col("b1") * F.col("x").cast("double")))
    w = Window.orderBy("x")
    dw = (resid.withColumn("ep", F.lag("e").over(w))
          .agg(F.first("n").alias("n"), F.first("b1").alias("b1"),
               F.sum(F.when(F.col("ep").isNotNull(),
                            (F.col("e") - F.col("ep"))
                            * (F.col("e") - F.col("ep"))).otherwise(0.0))
               .alias("num"),
               F.sum(F.col("e") * F.col("e")).alias("den")))
    return dw.select(
        F.col("n").alias("n_days"),
        F.round("b1", 6).alias("trend_slope"),
        F.round(F.col("num") / F.col("den"), 4).alias("dw_stat"))


_QDW_SQL = """
WITH days AS (
  SELECT date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM days
), coef AS (
  SELECT n,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b1,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS b0
  FROM m
), resid AS (
  SELECT n, b1, x, CAST(y AS DOUBLE) - b0 - b1 * CAST(x AS DOUBLE) AS e
  FROM days CROSS JOIN coef
), lagged AS (
  SELECT n, b1, e, lag(e) OVER (ORDER BY x) AS ep FROM resid
)
SELECT n AS n_days,
       ROUND(b1, 6) + 0.0 AS trend_slope,
       ROUND(SUM(CASE WHEN ep IS NOT NULL
                      THEN (e - ep) * (e - ep) ELSE 0.0 END)
             / SUM(e * e), 4) + 0.0 AS dw_stat
FROM lagged
GROUP BY n, b1
"""

R8B_QUERIES["events_durbin_watson"] = (
    q_events_durbin_watson, _QDW_SQL, False)


# --- doc_bm25_topk ----------------------------------------------------------

def _bm25_parts(spark, sf_dir):
    """Shared BM25 pipeline (k1=1.2, b=0.75, deterministic 5-term query at
    df-ranks 10..14): returns (toks, dl, per_doc) for doc_bm25_topk and the
    RM3 expansion query."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id",
                        F.explode(_text.tokens(F.col("text"))).alias("term"))
            .filter(F.col("term") != ""))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    n_av = dl.agg(F.count(F.lit(1)).cast("long").alias("nd"),
                  F.sum("dl").cast("long").alias("tottok"))
    dfreq = (toks.distinct().groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("df")))
    qterms = (dfreq.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("df").desc(), F.col("term").asc())))
        .filter((F.col("rk") >= 10) & (F.col("rk") <= 14))
        .select("term", "df"))
    tf = (toks.join(F.broadcast(qterms), "term")
          .groupBy("doc_id", "term", "df")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    scored = (tf.join(dl, "doc_id").crossJoin(F.broadcast(n_av)))
    avgdl = F.col("tottok").cast("double") / F.col("nd").cast("double")
    idf = F.log((F.col("nd").cast("double") - F.col("df").cast("double")
                 + 0.5) / (F.col("df").cast("double") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    part = idf * tfd * 2.2 / (tfd + 1.2 * (1.0 - 0.75
                                           + 0.75 * F.col("dl").cast("double")
                                           / avgdl))
    per_doc = (scored.withColumn("part", part)
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
                    F.round(F.sum("part"), 6).alias("score")))
    return toks, dl, per_doc


def q_doc_bm25_topk(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75) over the corpus for a
    deterministic 5-term query (document-frequency ranks 10..14, df DESC
    term ASC — mid-frequency terms, so the query is neither stopwords nor
    hapaxes), returning the top-20 documents by rounded score with doc_id
    tiebreak.

    Scale shape: term stats are one token aggregation; the query-term
    set (5 rows) broadcasts into the tf join, so scoring touches only
    postings of the query terms — the classic impact-ordered retrieval
    shape, never a full corpus scan per query."""
    _, _, per_doc = _bm25_parts(spark, sf_dir)
    top = (per_doc.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())))
        .filter(F.col("rk") <= 20))
    return (top.select("doc_id", "n_terms_hit", "score",
                       F.col("rk").cast("int").alias("rank"))
            .orderBy("rank"))


# shared BM25 CTE chain (toks .. per_doc) — reused by doc_bm25_topk and
# the RM3 expansion query so the two oracles cannot drift apart
_QBM25_CORE = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), n_av AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(dl) AS BIGINT) AS tottok
  FROM dl
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
), qterms AS (
  SELECT term, df
  FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC)
            AS rk FROM dfreq)
  WHERE rk BETWEEN 10 AND 14
), tf AS (
  SELECT doc_id, term, df, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks JOIN qterms USING (term)
  GROUP BY doc_id, term, df
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         ROUND(SUM(
           ln((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
              / (CAST(df AS DOUBLE) + 0.5) + 1.0)
           * CAST(tf AS DOUBLE) * 2.2
           / (CAST(tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
                       / (CAST(tottok AS DOUBLE) / CAST(nd AS DOUBLE))))), 6)
           AS score
  FROM tf JOIN dl USING (doc_id) CROSS JOIN n_av
  GROUP BY doc_id
)
"""

_QBM25_SQL = _QBM25_CORE + """
SELECT doc_id, n_terms_hit, score, rank
FROM (SELECT doc_id, n_terms_hit, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                  AS INT) AS rank
      FROM per_doc)
WHERE rank <= 20
ORDER BY rank
"""

R8B_QUERIES["doc_bm25_topk"] = (q_doc_bm25_topk, _QBM25_SQL, False)


# =============================================================================
# Wave 17 — lakehouse maintenance + feature engineering
# =============================================================================

# --- compaction_bin_packing ---------------------------------------------------

def q_compaction_bin_packing(spark, sf_dir):
    """Bin-pack compaction planning over a deterministic file inventory —
    the maintenance procedure an Iceberg table runs (rewrite_data_files
    binpack strategy): derive one "file" per (ship-year, ship-month) of
    lineitem with its row count as the size proxy, order files largest
    first (size DESC, then year/month ASC for ties), and assign each file
    to the output bin of its starting cumulative offset against a target
    bin size of ceil(total/8).  Report per-bin file count, rows, and fill
    ratio.

    Scale shape: the inventory aggregation is the only data-sized shuffle;
    planning runs over the file list itself (thousands of rows for a
    100 TB table, never data rows) with one ordered prefix-sum window."""
    li = load_table(spark, sf_dir, "lineitem")
    files = (li.groupBy(F.year("l_shipdate").alias("y"),
                        F.month("l_shipdate").alias("m"))
             .agg(F.count(F.lit(1)).cast("long").alias("size")))
    total = files.agg(F.sum("size").cast("long").alias("tot"))
    w = (Window.orderBy(F.col("size").desc(), F.col("y").asc(),
                        F.col("m").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = (files.crossJoin(F.broadcast(total))
              .withColumn("target", F.ceil(F.col("tot") / F.lit(8.0))
                          .cast("long"))
              .withColumn("off", F.coalesce(
                  F.sum("size").over(w), F.lit(0)).cast("long"))
              .withColumn("bin", F.floor(F.col("off") / F.col("target"))
                          .cast("long")))
    return (packed.groupBy("bin", "target")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum("size").cast("long").alias("bin_rows"))
            .select("bin", "n_files", "bin_rows",
                    (F.round(F.col("bin_rows") / F.col("target").cast("double"),
                             6) + F.lit(0.0)).alias("fill_ratio"))
            .orderBy("bin"))


_QCOMPACT_SQL = """
WITH files AS (
  SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
         CAST(COUNT(*) AS BIGINT) AS size
  FROM lineitem GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(size) AS BIGINT) AS tot FROM files
), packed AS (
  SELECT f.size,
         CAST(CEIL(t.tot / 8.0) AS BIGINT) AS target,
         CAST(COALESCE(SUM(f.size) OVER (
             ORDER BY f.size DESC, f.y ASC, f.m ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS off
  FROM files f CROSS JOIN tot t
)
SELECT CAST(FLOOR(off / target) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(size) AS BIGINT) AS bin_rows,
       ROUND(CAST(SUM(size) AS BIGINT) / CAST(target AS DOUBLE), 6) + 0.0
         AS fill_ratio
FROM packed
GROUP BY bin, target
ORDER BY bin
"""

R8B_QUERIES["compaction_bin_packing"] = (
    q_compaction_bin_packing, _QCOMPACT_SQL, False)


# --- spatial_zorder_stats -----------------------------------------------------

def _morton_spread(col):
    """Spread the low 16 bits of ``col`` so a zero bit separates each —
    the classic magic-number interleave, BIGINT-exact in both engines."""
    v = col.bitwiseAND(F.lit(0xFFFF))
    v = (v.bitwiseOR(F.shiftleft(v, 8))).bitwiseAND(F.lit(0x00FF00FF))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x33333333))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x55555555))
    return v


def q_spatial_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering audit — the metric behind Iceberg's
    rewrite_data_files(sort_order => zorder(x, y)): interleave the bits of
    the quantized customer coordinates, split the table into 64
    equal-count chunks under (a) z-order and (b) primary-key order, and
    compare mean per-chunk x/y spans.  Tight spans mean a range predicate
    touches few chunks (files); the ratio quantifies the clustering win.

    Scale shape: the Morton code is pure bit arithmetic in whole-stage
    codegen; each ordering costs one sort (at scale: one range exchange);
    chunk stats are one groupBy over 64 groups."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 360).cast("long").alias("qx"),
        ((F.col("c_custkey") * 7) % 180).cast("long").alias("qy"))
    pts = pts.withColumn(
        "morton",
        _morton_spread(F.col("qx"))
        .bitwiseOR(F.shiftleft(_morton_spread(F.col("qy")), 1)))
    n = pts.count()

    def chunk_spans(df, order_col, tag):
        w = Window.orderBy(F.col(order_col).asc(), F.col("k").asc())
        return (df.withColumn("rn", F.row_number().over(w))
                .withColumn("chunk",
                            F.floor((F.col("rn") - 1) * 64 / F.lit(n))
                            .cast("long"))
                .groupBy("chunk")
                .agg((F.max("qx") - F.min("qx")).alias("xs"),
                     (F.max("qy") - F.min("qy")).alias("ys"))
                .agg(F.round(F.avg("xs"), 6).alias(f"x_span_{tag}"),
                     F.round(F.avg("ys"), 6).alias(f"y_span_{tag}")))

    z = chunk_spans(pts, "morton", "z")
    s = chunk_spans(pts, "k", "seq")
    return (z.crossJoin(s)
            .select(F.lit(n).cast("long").alias("n_points"),
                    "x_span_z", "y_span_z", "x_span_seq", "y_span_seq",
                    F.round((F.col("x_span_z") + F.col("y_span_z"))
                            / (F.col("x_span_seq") + F.col("y_span_seq")), 6)
                    .alias("locality_ratio")))


_QZORDER_SQL = """
WITH pts AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 360 AS BIGINT) AS qx,
         CAST((c_custkey * 7) % 180 AS BIGINT) AS qy
  FROM customer
), spread AS (
  SELECT k, qx, qy, sx.v4 AS sx, sy.v4 AS sy
  FROM pts,
  LATERAL (
    SELECT ((v3 | (v3 << 1)) & 1431655765) AS v4
    FROM (SELECT ((v2 | (v2 << 2)) & 858993459) AS v3
          FROM (SELECT ((v1 | (v1 << 4)) & 252645135) AS v1x,
                       ((v1 | (v1 << 4)) & 252645135) AS v2
                FROM (SELECT (((qx & 65535) | ((qx & 65535) << 8))
                              & 16711935) AS v1)))) sx,
  LATERAL (
    SELECT ((v3 | (v3 << 1)) & 1431655765) AS v4
    FROM (SELECT ((v2 | (v2 << 2)) & 858993459) AS v3
          FROM (SELECT ((v1 | (v1 << 4)) & 252645135) AS v2
                FROM (SELECT (((qy & 65535) | ((qy & 65535) << 8))
                              & 16711935) AS v1)))) sy
), coded AS (
  SELECT k, qx, qy, (sx | (sy << 1)) AS morton,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM spread
), zc AS (
  SELECT CAST(FLOOR((row_number() OVER (ORDER BY morton ASC, k ASC) - 1)
                    * 64 / n) AS BIGINT) AS chunk, qx, qy
  FROM coded
), sc AS (
  SELECT CAST(FLOOR((row_number() OVER (ORDER BY k ASC) - 1)
                    * 64 / n) AS BIGINT) AS chunk, qx, qy
  FROM coded
), zs AS (
  SELECT ROUND(AVG(xs), 6) AS x_span_z, ROUND(AVG(ys), 6) AS y_span_z
  FROM (SELECT MAX(qx) - MIN(qx) AS xs, MAX(qy) - MIN(qy) AS ys
        FROM zc GROUP BY chunk)
), ss AS (
  SELECT ROUND(AVG(xs), 6) AS x_span_seq, ROUND(AVG(ys), 6) AS y_span_seq
  FROM (SELECT MAX(qx) - MIN(qx) AS xs, MAX(qy) - MIN(qy) AS ys
        FROM sc GROUP BY chunk)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_points,
       x_span_z, y_span_z, x_span_seq, y_span_seq,
       ROUND((x_span_z + y_span_z) / (x_span_seq + y_span_seq), 6)
         AS locality_ratio
FROM zs CROSS JOIN ss
"""

R8B_QUERIES["spatial_zorder_stats"] = (
    q_spatial_zorder_stats, _QZORDER_SQL, False)


# --- customer_target_encoding -------------------------------------------------

def q_customer_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding of c_nationkey against account
    balance — the leakage-free categorical encoding a feature pipeline
    computes before training: each row's encoding is the mean target of
    its group EXCLUDING the row itself, ``(sum - own) / (cnt - 1)``.
    Balances are cents-quantized, so group sums run in exact BIGINT cents
    and the encoding is a deterministic integer ratio — zero
    float-summation-order risk.

    Scale shape: one groupBy over the category domain, broadcast back —
    never a self-join; the per-row finish is pure arithmetic."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    grp = (cust.groupBy("c_nationkey")
           .agg(F.sum(cents).cast("long").alias("gsum"),
                F.count(F.lit(1)).cast("long").alias("gcnt")))
    return (cust.join(F.broadcast(grp), "c_nationkey")
            .select(F.col("c_custkey").alias("custkey"),
                    F.col("c_nationkey").cast("long").alias("nationkey"),
                    (F.round(F.when(F.col("gcnt") > 1,
                                    (F.col("gsum") - cents).cast("double")
                                    / (F.col("gcnt") - 1).cast("double"))
                             / 100.0, 6) + F.lit(0.0)).alias("loo_enc"))
            .orderBy("custkey")
            .limit(20))


_QTENC_SQL = """
WITH grp AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS gsum,
         CAST(COUNT(*) AS BIGINT) AS gcnt
  FROM customer GROUP BY c_nationkey
)
SELECT c.c_custkey AS custkey,
       CAST(c.c_nationkey AS BIGINT) AS nationkey,
       ROUND(CASE WHEN g.gcnt > 1
                  THEN CAST(g.gsum - CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                            AS DOUBLE)
                       / CAST(g.gcnt - 1 AS DOUBLE) END / 100.0, 6) + 0.0
         AS loo_enc
FROM customer c JOIN grp g USING (c_nationkey)
ORDER BY custkey
LIMIT 20
"""

R8B_QUERIES["customer_target_encoding"] = (
    q_customer_target_encoding, _QTENC_SQL, False)


# --- feature_hashing_collisions -----------------------------------------------

from ..pipeline.text import portable_hash64 as _hash64


def q_feature_hashing_collisions(spark, sf_dir):
    """Hashing-trick audit: map every distinct corpus term into D=4096
    feature buckets with the portable 60-bit hash and measure the
    collision profile (buckets used, max load, singleton share) — the
    check a feature pipeline runs before committing to a hashed
    vectorizer width.

    Scale shape: distinct-terms aggregation, then a 4096-row bucket
    aggregation; output is one row."""
    docs = load_table(spark, sf_dir, "documents")
    terms = (docs.select(F.explode(_text.tokens(F.col("text"))).alias("term"))
             .filter(F.col("term") != "")
             .distinct())
    loads = (terms
             .select(F.pmod(_hash64(F.col("term"), "feat"), F.lit(4096))
                     .alias("bucket"))
             .groupBy("bucket")
             .agg(F.count(F.lit(1)).cast("long").alias("load")))
    return (loads.agg(
        F.sum("load").cast("long").alias("n_terms"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.max("load").cast("long").alias("max_load"),
        F.sum(F.when(F.col("load") == 1, 1).otherwise(0)).cast("long")
        .alias("n_singletons"))
        .select("n_terms", "n_buckets_used", "max_load", "n_singletons",
                (F.round(F.lit(1.0) - F.col("n_buckets_used")
                         / F.col("n_terms").cast("double"), 6) + F.lit(0.0))
                .alias("collision_rate")))


_QFEATH_SQL = f"""
WITH terms AS (
  SELECT DISTINCT t.term
  FROM (SELECT {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
), loads AS (
  SELECT ('0x' || substr(md5(term || '#feat'), 1, 15))::BIGINT % 4096
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS load
  FROM terms GROUP BY 1
)
SELECT CAST(SUM(load) AS BIGINT) AS n_terms,
       CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
       CAST(MAX(load) AS BIGINT) AS max_load,
       CAST(SUM(CASE WHEN load = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_singletons,
       ROUND(1.0 - CAST(COUNT(*) AS BIGINT)
             / CAST(SUM(load) AS DOUBLE), 6) + 0.0 AS collision_rate
FROM loads
"""

R8B_QUERIES["feature_hashing_collisions"] = (
    q_feature_hashing_collisions, _QFEATH_SQL, False)


# --- embedding_mmr_topk -------------------------------------------------------

from ..pipeline.dedup import cosine_sim as _cos


def q_embedding_mmr_topk(spark, sf_dir):
    """Maximal Marginal Relevance retrieval: re-rank the top-50 cosine
    candidates of a query vector (vec_id 0) into a diversified top-10 —
    greedy argmax of ``0.7*relevance - 0.3*max_sim_to_selected``.

    Determinism: relevance and pairwise sims are ROUNDed at 6 before the
    greedy; every greedy comparison runs on the BIGINT score
    ``round(score*1e7)`` (the ideal scores live exactly on the 1e-7
    lattice, so the integer is ulp-safe) with vec_id ASC tie-break — the
    oracle unrolls the same 10 steps as chained CTEs.

    Scale shape: candidate generation is the distributed work (broadcast
    query row over the corpus, one top-k window); the greedy runs on the
    driver over the 50-candidate pool (50 rel rows + 50x49 sim rows,
    bounded by construction like the IVF codebook collects)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("vec"))
    qv = base.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qv"))
    scored = (base.filter(F.col("vec_id") != 0)
              .crossJoin(F.broadcast(qv))
              .withColumn("cos", _cos(F.col("vec"), F.col("qv"))))
    wtop = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    cands = (scored.withColumn("rk", F.row_number().over(wtop))
             .filter(F.col("rk") <= 50)
             .select("vec_id", "vec", F.round("cos", 6).alias("rel")))
    pairs = (cands.alias("a")
             .join(F.broadcast(cands.select(F.col("vec_id").alias("ib"),
                                            F.col("vec").alias("bv"))),
                   F.col("a.vec_id") != F.col("ib"))
             .select(F.col("a.vec_id").alias("ia"), "ib",
                     F.round(_cos(F.col("a.vec"), F.col("bv")), 6)
                     .alias("sim")))
    rel = {r["vec_id"]: r["rel"]
           for r in cands.select("vec_id", "rel").collect()}
    sim = {(r["ia"], r["ib"]): r["sim"] for r in pairs.collect()}
    selected, rows = [], []
    for rank in range(1, 11):
        best = None
        for vid, rv in rel.items():
            if vid in selected:
                continue
            if not selected:
                score = rv
            else:
                ms = max(sim[(vid, s)] for s in selected)
                score = 0.7 * rv - 0.3 * ms
            key = (int(round(score * 1e7)), -vid)
            if best is None or key > best[0]:
                best = (key, vid, rv)
        selected.append(best[1])
        rows.append((rank, best[1], best[2], best[0][0]))
    out = spark.createDataFrame(
        rows, "rank INT, vec_id BIGINT, rel DOUBLE, mmr_e7 BIGINT")
    return out.orderBy("rank")


def _mmr_sql() -> str:
    steps = ["""s1 AS MATERIALIZED (
  SELECT 1 AS rank, vec_id, rel,
         CAST(ROUND(rel * 1e7) AS BIGINT) AS mmr_e7
  FROM c ORDER BY CAST(ROUND(rel * 1e7) AS BIGINT) DESC, vec_id ASC LIMIT 1
), sel1 AS MATERIALIZED (SELECT vec_id FROM s1)"""]
    for t in range(2, 11):
        steps.append(f"""s{t} AS MATERIALIZED (
  SELECT {t} AS rank, c.vec_id, c.rel,
         CAST(ROUND((0.7 * c.rel - 0.3 * mx.ms) * 1e7) AS BIGINT) AS mmr_e7
  FROM c JOIN (SELECT ia, MAX(sim) AS ms FROM p
               WHERE ib IN (SELECT vec_id FROM sel{t-1}) GROUP BY ia) mx
    ON mx.ia = c.vec_id
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t-1})
  ORDER BY mmr_e7 DESC, c.vec_id ASC LIMIT 1
), sel{t} AS MATERIALIZED (SELECT vec_id FROM sel{t-1} UNION ALL SELECT vec_id FROM s{t})""")
    union = "\nUNION ALL\n".join(f"SELECT * FROM s{t}" for t in range(1, 11))
    return f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), q AS MATERIALIZED (SELECT vec AS qv FROM base WHERE vec_id = 0),
c AS MATERIALIZED (
  SELECT vec_id, vec,
         ROUND(list_cosine_similarity(vec, qv), 6) AS rel
  FROM (SELECT b.vec_id, b.vec, q.qv,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(b.vec, q.qv) DESC,
                          b.vec_id ASC) AS rk
        FROM base b CROSS JOIN q WHERE b.vec_id <> 0)
  WHERE rk <= 50
), p AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         ROUND(list_cosine_similarity(a.vec, b.vec), 6) AS sim
  FROM c a JOIN c b ON a.vec_id <> b.vec_id
), {", ".join(steps)}
SELECT rank, vec_id, rel, mmr_e7 FROM ({union}) ORDER BY rank
"""


R8B_QUERIES["embedding_mmr_topk"] = (
    q_embedding_mmr_topk, _mmr_sql(), False)


# =============================================================================
# Wave 18 — graph ranking, forecasting, keyword extraction, model eval,
# tail statistics
# =============================================================================

# --- part_hits_scores ---------------------------------------------------------

def q_part_hits_scores(spark, sf_dir):
    """HITS hubs-and-authorities over the supplier->part supply graph
    (distinct lineitem edges): two full hub/authority sweeps, unnormalized
    — every iteration is a BIGINT sum of BIGINT scores, so the whole
    power iteration is integer-exact with zero float-order risk; scores
    are normalized by the max only at output.  Top-20 authority parts.

    Scale shape: each half-iteration is one edge-keyed join + groupBy (the
    canonical distributed HITS step); score tables are |S| / |P| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(F.col("l_suppkey").alias("s"),
                      F.col("l_partkey").alias("p")).distinct()
    # a0 = 1 for every part  =>  h1(s) = out-degree
    h1 = edges.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("h1"))
    a1 = (edges.join(h1, "s")
          .groupBy("p").agg(F.sum("h1").cast("long").alias("a1")))
    h2 = (edges.join(a1, "p")
          .groupBy("s").agg(F.sum("a1").cast("long").alias("h2")))
    a2 = (edges.join(h2, "s")
          .groupBy("p").agg(F.sum("h2").cast("long").alias("a2")))
    mx = a2.agg(F.max("a2").alias("mx"))
    w = Window.orderBy(F.col("a2").desc(), F.col("p").asc())
    return (a2.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 20)
            .crossJoin(F.broadcast(mx))
            .select(F.col("p").alias("partkey"),
                    F.col("a2").alias("auth_raw"),
                    F.round(F.col("a2").cast("double")
                            / F.col("mx").cast("double"), 6)
                    .alias("auth_norm"),
                    F.col("rk").cast("int").alias("rank"))
            .orderBy("rank"))


_QHITS_SQL = """
WITH edges AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
), h1 AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS h1 FROM edges GROUP BY s
), a1 AS (
  SELECT p, CAST(SUM(h1) AS BIGINT) AS a1
  FROM edges JOIN h1 USING (s) GROUP BY p
), h2 AS (
  SELECT s, CAST(SUM(a1) AS BIGINT) AS h2
  FROM edges JOIN a1 USING (p) GROUP BY s
), a2 AS (
  SELECT p, CAST(SUM(h2) AS BIGINT) AS a2
  FROM edges JOIN h2 USING (s) GROUP BY p
), mx AS (SELECT MAX(a2) AS mx FROM a2)
SELECT p AS partkey, a2 AS auth_raw,
       ROUND(CAST(a2 AS DOUBLE) / CAST(mx AS DOUBLE), 6) AS auth_norm,
       CAST(rk AS INT) AS rank
FROM (SELECT p, a2, row_number() OVER (ORDER BY a2 DESC, p ASC) AS rk
      FROM a2) t CROSS JOIN mx
WHERE rk <= 20
ORDER BY rank
"""

R8B_QUERIES["part_hits_scores"] = (q_part_hits_scores, _QHITS_SQL, False)


# --- events_holt_forecast -----------------------------------------------------

def q_events_holt_forecast(spark, sf_dir):
    """Holt's linear-trend exponential smoothing over the daily event
    count series (alpha=0.6, beta=0.3, init l1=y1, b1=0), forecasting
    horizons 1..7.  The recursion is a fixed left-to-right fold, so both
    engines execute bit-identical IEEE sequences; only the output is
    ROUNDed.

    Scale shape: one day-keyed aggregation (data-sized), then a native
    ``F.aggregate`` fold over the day-domain-bounded series (~61 elems) in
    a single row — no Python, no driver loop."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("y")))
    series = days.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("sv"))
    acc0 = F.struct(F.lit(0).cast("int").alias("n"),
                    F.lit(0.0).alias("l"), F.lit(0.0).alias("b"))
    new_l = lambda acc, e: F.when(acc["n"] == 0, e["y"]).otherwise(
        0.6 * e["y"] + 0.4 * (acc["l"] + acc["b"]))
    fold = F.aggregate(
        F.col("sv"), acc0,
        lambda acc, e: F.struct(
            (acc["n"] + 1).alias("n"),
            new_l(acc, e).alias("l"),
            F.when(acc["n"] == 0, F.lit(0.0)).otherwise(
                0.3 * (new_l(acc, e) - acc["l"]) + 0.7 * acc["b"])
            .alias("b")))
    final = series.select(fold.alias("f")).select(
        F.col("f.n").cast("long").alias("n_days"),
        F.col("f.l").alias("l"), F.col("f.b").alias("b"))
    h = spark.range(1, 8).select(F.col("id").alias("horizon"))
    return (final.crossJoin(F.broadcast(h))
            .select("n_days", "horizon",
                    (F.round(F.col("l") + F.col("horizon") * F.col("b"), 6)
                     + F.lit(0.0)).alias("forecast"))
            .orderBy("horizon"))


_QHOLT_SQL = """
WITH RECURSIVE days AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y
        FROM events GROUP BY 1)
), holt AS (
  SELECT i, y AS l, CAST(0.0 AS DOUBLE) AS b FROM days WHERE i = 1
  UNION ALL
  SELECT d.i,
         0.6 * d.y + 0.4 * (h.l + h.b),
         0.3 * ((0.6 * d.y + 0.4 * (h.l + h.b)) - h.l) + 0.7 * h.b
  FROM holt h JOIN days d ON d.i = h.i + 1
), fin AS (
  SELECT i AS n_days, l, b FROM holt
  WHERE i = (SELECT MAX(i) FROM days)
)
SELECT n_days, CAST(h.range AS BIGINT) AS horizon,
       ROUND(l + CAST(h.range AS BIGINT) * b, 6) + 0.0 AS forecast
FROM fin CROSS JOIN range(1, 8) h
ORDER BY horizon
"""

R8B_QUERIES["events_holt_forecast"] = (
    q_events_holt_forecast, _QHOLT_SQL, False)


# --- doc_keyword_rake ---------------------------------------------------------

from ..pipeline.text import _STOPWORDS as _RAKE_STOPS


def q_doc_keyword_rake(spark, sf_dir):
    """RAKE keyword extraction over the corpus: candidate phrases are
    maximal runs of non-stopword tokens (gaps-and-islands per document,
    capped at 4 tokens), word score = degree/frequency over all phrase
    instances, phrase score = sum of word scores.  Top-15 distinct
    phrases by ROUNDed score.

    Scale shape: one posexplode (data-sized), one per-doc window for the
    island ids, then phrase/word aggregations — everything keyed, no
    cross join; the stopword test is a broadcast literal array."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select(
        "doc_id",
        F.posexplode(_text.tokens(F.col("text"))).alias("ord", "term"))
        .filter((F.col("term") != "") & ~F.col("term").isin(*_RAKE_STOPS)))
    wdoc = Window.partitionBy("doc_id").orderBy("ord")
    isl = toks.withColumn(
        "island", F.col("ord") - F.row_number().over(wdoc))
    phrases = (isl.groupBy("doc_id", "island")
               .agg(F.concat_ws(
                   " ",
                   F.transform(
                       F.array_sort(F.collect_list(F.struct("ord", "term"))),
                       lambda s: s["term"])).alias("phrase"),
                    F.count(F.lit(1)).cast("long").alias("plen"))
               .filter(F.col("plen") <= 4))
    words = phrases.select(
        "plen", F.explode(F.split(F.col("phrase"), " ")).alias("w"))
    wstats = (words.groupBy("w")
              .agg(F.count(F.lit(1)).cast("long").alias("freq"),
                   F.sum("plen").cast("long").alias("deg")))
    wscore = F.col("deg").cast("double") / F.col("freq").cast("double")
    scored = (phrases.select("phrase").distinct()
              .select("phrase",
                      F.explode(F.split(F.col("phrase"), " ")).alias("w"))
              .join(wstats, "w")
              .groupBy("phrase")
              .agg(F.round(F.sum(wscore), 6).alias("score")))
    w = Window.orderBy(F.col("score").desc(), F.col("phrase").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 15)
            .select("rank", "phrase", "score")
            .orderBy("rank"))


_RAKE_STOPS_SQL = "['" + "','".join(_RAKE_STOPS) + "']"

_QRAKE_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.ord, t.term
  FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term,
                       unnest(range(1, len(tk) + 1)) AS ord) t
  WHERE t.term <> '' AND NOT list_contains({_RAKE_STOPS_SQL}, t.term)
), isl AS (
  SELECT doc_id, ord, term,
         ord - row_number() OVER (PARTITION BY doc_id ORDER BY ord)
           AS island
  FROM toks
), phrases AS (
  SELECT doc_id, island,
         string_agg(term, ' ' ORDER BY ord) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM isl GROUP BY doc_id, island
  HAVING COUNT(*) <= 4
), words AS (
  SELECT plen, unnest(string_split(phrase, ' ')) AS w FROM phrases
), wstats AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM words GROUP BY w
), scored AS (
  SELECT p.phrase,
         ROUND(SUM(CAST(ws.deg AS DOUBLE) / CAST(ws.freq AS DOUBLE)), 6)
           AS score
  FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w
        FROM (SELECT DISTINCT phrase FROM phrases)) p
  JOIN wstats ws USING (w)
  GROUP BY p.phrase
)
SELECT CAST(rank AS INT) AS rank, phrase, score
FROM (SELECT phrase, score,
             row_number() OVER (ORDER BY score DESC, phrase ASC) AS rank
      FROM scored)
WHERE rank <= 15
ORDER BY rank
"""

R8B_QUERIES["doc_keyword_rake"] = (q_doc_keyword_rake, _QRAKE_SQL, False)


# --- langid_eval_metrics ------------------------------------------------------

def _langid_case_sql() -> str:
    """The lang-id argmax as a DuckDB CASE — same lexicons and alphabetical
    tie-break as pipeline.text.lang_id (mirrors queries_quality's builder)."""
    scores = {}
    for lang, lex in _text.LANG_LEXICONS.items():
        arr = "['" + "','".join(lex) + "']"
        scores[lang] = (f"len(list_filter({_TOKS_SQL},"
                        f" t -> list_contains({arr}, t)))")
    mx = "greatest(" + ", ".join(scores.values()) + ")"
    case = f"CASE WHEN {mx} <= 0 THEN 'und'"
    for lang in sorted(scores):
        case += f" WHEN {scores[lang]} = {mx} THEN '{lang}'"
    return case + " END"


def q_langid_eval_metrics(spark, sf_dir):
    """Per-class precision / recall / F1 of the n-gram lang-id heuristic
    against the labeled ``lang`` column — the model-evaluation report on
    top of the confusion matrix (classes = labeled languages; a class's
    precision is NULL-safe against zero predictions).

    Scale shape: one pass computes (labeled, detected) pairs; three
    class-keyed aggregations over the tiny class domain finish it."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(F.col("lang").alias("labeled"),
                        _text.lang_id(F.col("text")).alias("detected"))
    tp = (pairs.filter(F.col("labeled") == F.col("detected"))
          .groupBy(F.col("labeled").alias("cls"))
          .agg(F.count(F.lit(1)).cast("long").alias("tp")))
    lab = (pairs.groupBy(F.col("labeled").alias("cls"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_labeled")))
    det = (pairs.groupBy(F.col("detected").alias("cls"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_detected")))
    j = (lab.join(tp, "cls", "left").join(det, "cls", "left")
         .withColumn("tp", F.coalesce(F.col("tp"), F.lit(0)))
         .withColumn("n_detected", F.coalesce(F.col("n_detected"), F.lit(0))))
    prec = F.when(F.col("n_detected") > 0,
                  F.col("tp").cast("double")
                  / F.col("n_detected").cast("double"))
    rec = F.col("tp").cast("double") / F.col("n_labeled").cast("double")
    f1 = F.when((F.col("n_detected") > 0) & (F.col("tp") > 0),
                2.0 * prec * rec / (prec + rec)).otherwise(0.0)
    return (j.select("cls", "n_labeled", "n_detected", "tp",
                     F.round(prec, 6).alias("precision"),
                     F.round(rec, 6).alias("recall"),
                     F.round(f1, 6).alias("f1"))
            .orderBy("cls"))


_QLEVAL_SQL = f"""
WITH pairs AS (
  SELECT lang AS labeled, {_langid_case_sql()} AS detected FROM documents
), tp AS (
  SELECT labeled AS cls, CAST(COUNT(*) AS BIGINT) AS tp
  FROM pairs WHERE labeled = detected GROUP BY labeled
), lab AS (
  SELECT labeled AS cls, CAST(COUNT(*) AS BIGINT) AS n_labeled
  FROM pairs GROUP BY labeled
), det AS (
  SELECT detected AS cls, CAST(COUNT(*) AS BIGINT) AS n_detected
  FROM pairs GROUP BY detected
)
SELECT lab.cls, lab.n_labeled,
       COALESCE(det.n_detected, 0) AS n_detected,
       COALESCE(tp.tp, 0) AS tp,
       ROUND(CASE WHEN COALESCE(det.n_detected, 0) > 0
                  THEN CAST(COALESCE(tp.tp, 0) AS DOUBLE)
                       / CAST(det.n_detected AS DOUBLE) END, 6) AS precision,
       ROUND(CAST(COALESCE(tp.tp, 0) AS DOUBLE)
             / CAST(lab.n_labeled AS DOUBLE), 6) AS recall,
       ROUND(CASE WHEN COALESCE(det.n_detected, 0) > 0
                    AND COALESCE(tp.tp, 0) > 0
                  THEN 2.0 * (CAST(tp.tp AS DOUBLE)
                              / CAST(det.n_detected AS DOUBLE))
                       * (CAST(tp.tp AS DOUBLE)
                          / CAST(lab.n_labeled AS DOUBLE))
                       / (CAST(tp.tp AS DOUBLE)
                          / CAST(det.n_detected AS DOUBLE)
                          + CAST(tp.tp AS DOUBLE)
                            / CAST(lab.n_labeled AS DOUBLE))
                  ELSE 0.0 END, 6) AS f1
FROM lab LEFT JOIN tp USING (cls) LEFT JOIN det USING (cls)
ORDER BY cls
"""

R8B_QUERIES["langid_eval_metrics"] = (
    q_langid_eval_metrics, _QLEVAL_SQL, False)


# --- orders_hill_tail ---------------------------------------------------------

def q_orders_hill_tail(spark, sf_dir):
    """Hill estimator of the Pareto tail index of o_totalprice: over the
    top k=500 order values (price DESC, orderkey ASC deterministic cut),
    alpha = k / sum(ln(x_i / x_threshold)) with the threshold at rank
    k+1 — the heavy-tail diagnostic a pricing/risk pipeline runs before
    assuming finite moments.

    Scale shape: at scale the top-(k+1) cut is a TopK sort (no full
    sort materialization); the finish sums 500 logs."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    top = (orders.select("o_totalprice", "o_orderkey")
           .withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= 501))
    thr = top.filter(F.col("rk") == 501).select(
        F.col("o_totalprice").alias("thr"))
    agg = (top.filter(F.col("rk") <= 500)
           .crossJoin(F.broadcast(thr))
           .agg(F.count(F.lit(1)).cast("long").alias("k"),
                F.sum(F.log(F.col("o_totalprice") / F.col("thr")))
                .alias("slog"),
                F.min("thr").alias("threshold")))
    return agg.select(
        "k", F.round("threshold", 2).alias("threshold"),
        F.round(F.col("k").cast("double") / F.col("slog"), 6)
        .alias("hill_alpha"),
        F.round(F.col("slog") / F.col("k").cast("double"), 6)
        .alias("mean_excess_log"))


_QHILL_SQL = """
WITH top AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rk
  FROM orders
), thr AS (
  SELECT o_totalprice AS thr FROM top WHERE rk = 501
)
SELECT CAST(COUNT(*) AS BIGINT) AS k,
       ROUND(MIN(thr), 2) AS threshold,
       ROUND(CAST(COUNT(*) AS BIGINT) / SUM(ln(o_totalprice / thr)), 6)
         AS hill_alpha,
       ROUND(SUM(ln(o_totalprice / thr)) / CAST(COUNT(*) AS BIGINT), 6)
         AS mean_excess_log
FROM top CROSS JOIN thr
WHERE rk <= 500
"""

R8B_QUERIES["orders_hill_tail"] = (q_orders_hill_tail, _QHILL_SQL, False)


# =============================================================================
# Wave 19 — distribution distance, dispersion, SPC, seasonal decomposition,
# tokenizer sizing
# =============================================================================

# --- orders_emd_priority ------------------------------------------------------

def q_orders_emd_priority(spark, sf_dir):
    """1-D earth mover's distance (Wasserstein-1) between the
    o_totalprice distributions of URGENT and LOW priority orders —
    computed exactly as the area between the two empirical CDFs:
    sum over sorted distinct values of |n2*cum1 - n1*cum2| * gap /
    (n1*n2).  The cumulative terms are exact BIGINT cross-products, so
    the only float work is the final scaled sum (margin >> the 1e-6
    output grain).

    Scale shape: one distinct-value aggregation (domain-bounded), one
    ordered prefix-sum window, one scalar finish — never a pairwise
    transport problem."""
    orders = load_table(spark, sf_dir, "orders")
    sel = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    per_val = (sel.groupBy(F.col("o_totalprice").alias("v"))
               .agg(F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                          .otherwise(0)).cast("long").alias("c1"),
                    F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1)
                          .otherwise(0)).cast("long").alias("c2")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("v")
    cum = (per_val
           .withColumn("cum1", F.sum("c1").over(w).cast("long"))
           .withColumn("cum2", F.sum("c2").over(w).cast("long"))
           .withColumn("gap", F.lead("v").over(wnext) - F.col("v")))
    tot = cum.agg(F.max("cum1").alias("n1"), F.max("cum2").alias("n2"))
    d = (cum.filter(F.col("gap").isNotNull())
         .crossJoin(F.broadcast(tot))
         .select((F.abs(F.col("n2") * F.col("cum1")
                        - F.col("n1") * F.col("cum2")).cast("double")
                  * F.col("gap")).alias("term"),
                 "n1", "n2"))
    return (d.groupBy("n1", "n2")
            .agg(F.round(F.sum("term")
                         / (F.col("n1") * F.col("n2")).cast("double"), 6)
                 .alias("emd"))
            .select(F.col("n1").alias("n_urgent"),
                    F.col("n2").alias("n_low"), "emd"))


_QEMD_SQL = """
WITH per_val AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_totalprice
), cum AS (
  SELECT v,
         CAST(SUM(c1) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum2,
         lead(v) OVER (ORDER BY v) - v AS gap
  FROM per_val
), tot AS (
  SELECT MAX(cum1) AS n1, MAX(cum2) AS n2 FROM cum
)
SELECT n1 AS n_urgent, n2 AS n_low,
       ROUND(SUM(CAST(abs(n2 * cum1 - n1 * cum2) AS DOUBLE) * gap)
             / CAST(n1 * n2 AS DOUBLE), 6) AS emd
FROM cum CROSS JOIN tot
WHERE gap IS NOT NULL
GROUP BY n1, n2
"""

R8B_QUERIES["orders_emd_priority"] = (
    q_orders_emd_priority, _QEMD_SQL, False)


# --- events_fano_burstiness ---------------------------------------------------

def q_events_fano_burstiness(spark, sf_dir):
    """Fano factor (index of dispersion, sample-variance / mean) of the
    daily count series per event type, over the FULL day domain (days a
    type is silent count as zero — dropping them would bias the variance
    down).  fano = (n*S2 - S1^2) / ((n-1)*S1): a deterministic function
    of exact BIGINT sums.  fano >> 1 flags bursty event types.

    Scale shape: one (type, day) aggregation, a broadcast day-domain
    grid to materialize the zeros, one 5-row finish."""
    ev = load_table(spark, sf_dir, "events")
    td = (ev.groupBy(F.col("event_type").alias("t"),
                     F.to_date("ts").alias("day"))
          .agg(F.count(F.lit(1)).cast("long").alias("y")))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    types = td.select("t").distinct()
    grid = (types.crossJoin(F.broadcast(days))
            .join(td, ["t", "day"], "left")
            .withColumn("y", F.coalesce(F.col("y"), F.lit(0))))
    agg = (grid.groupBy("t")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("y").cast("long").alias("s1"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("s2")))
    return (agg.select(
        F.col("t").alias("event_type"), F.col("n").alias("n_days"),
        F.round(F.col("s1").cast("double") / F.col("n").cast("double"), 6)
        .alias("mean_daily"),
        F.round((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                .cast("double")
                / ((F.col("n") - 1) * F.col("s1")).cast("double"), 6)
        .alias("fano"))
        .orderBy("event_type"))


_QFANO_SQL = """
WITH td AS (
  SELECT event_type AS t, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
types AS (SELECT DISTINCT t FROM td),
grid AS (
  SELECT types.t, days.day, COALESCE(td.y, 0) AS y
  FROM types CROSS JOIN days
  LEFT JOIN td ON td.t = types.t AND td.day = days.day
), agg AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s1,
         CAST(SUM(y * y) AS BIGINT) AS s2
  FROM grid GROUP BY t
)
SELECT t AS event_type, n AS n_days,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_daily,
       ROUND(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / CAST((n - 1) * s1 AS DOUBLE), 6) AS fano
FROM agg
ORDER BY event_type
"""

R8B_QUERIES["events_fano_burstiness"] = (
    q_events_fano_burstiness, _QFANO_SQL, False)


# --- lineitem_control_chart ---------------------------------------------------

def q_lineitem_control_chart(spark, sf_dir):
    """Shewhart individuals control chart over the daily shipped-line
    counts: center = mean, limits = mean +/- 3 * sample stddev (both
    deterministic functions of exact BIGINT sums), reporting only the
    out-of-control days.  Counts are integers and the limits are
    irrational (sqrt), so the flag comparison can never sit on a tie.

    Scale shape: one day-keyed aggregation, one broadcast scalar row of
    limits, one filter."""
    li = load_table(spark, sf_dir, "lineitem")
    days = (li.groupBy(F.to_date("l_shipdate").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    stats = days.agg(F.count(F.lit(1)).cast("long").alias("n"),
                     F.sum("y").cast("long").alias("s1"),
                     F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"))
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))\
        .cast("double") / (F.col("n") * (F.col("n") - 1)).cast("double")
    lim = stats.select(mean.alias("mu"), F.sqrt(var).alias("sd"))
    return (days.crossJoin(F.broadcast(lim))
            .filter((F.col("y") > F.col("mu") + 3.0 * F.col("sd"))
                    | (F.col("y") < F.col("mu") - 3.0 * F.col("sd")))
            .select(F.col("day").cast("string").alias("day"), "y",
                    F.round(F.col("mu"), 6).alias("center"),
                    F.round(F.col("mu") - 3.0 * F.col("sd"), 6).alias("lcl"),
                    F.round(F.col("mu") + 3.0 * F.col("sd"), 6).alias("ucl"),
                    F.when(F.col("y") > F.col("mu"), F.lit("high"))
                    .otherwise(F.lit("low")).alias("side"))
            .orderBy("day"))


_QSPC_SQL = """
WITH days AS (
  SELECT CAST(l_shipdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s1,
         CAST(SUM(y * y) AS BIGINT) AS s2
  FROM days
), lim AS (
  SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
              / CAST(n * (n - 1) AS DOUBLE)) AS sd
  FROM s
)
SELECT CAST(day AS VARCHAR) AS day, y,
       ROUND(mu, 6) AS center,
       ROUND(mu - 3.0 * sd, 6) AS lcl,
       ROUND(mu + 3.0 * sd, 6) AS ucl,
       CASE WHEN y > mu THEN 'high' ELSE 'low' END AS side
FROM days CROSS JOIN lim
WHERE y > mu + 3.0 * sd OR y < mu - 3.0 * sd
ORDER BY day
"""

R8B_QUERIES["lineitem_control_chart"] = (
    q_lineitem_control_chart, _QSPC_SQL, False)


# --- events_seasonal_decompose ------------------------------------------------

def q_events_seasonal_decompose(spark, sf_dir):
    """Classical ratio-to-moving-average seasonal decomposition of the
    daily event counts: trend = centered 7-day moving average (full
    windows only), seasonal index per ISO weekday = mean of y/trend.
    The trend is an exact integer ratio (sum-of-7 / 7); the per-weekday
    mean averages ~4 small doubles, far inside the 1e-6 grain.

    Scale shape: one day aggregation, one 7-row sliding window over the
    day-domain-bounded series, one 7-row finish."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = (days
          .withColumn("w_n", F.count(F.lit(1)).over(w7))
          .withColumn("w_s", F.sum("y").over(w7).cast("long"))
          .filter(F.col("w_n") == 7)
          .withColumn("ratio", F.col("y").cast("double") * 7.0
                      / F.col("w_s").cast("double")))
    return (tr.groupBy(F.dayofweek("day").cast("long").alias("weekday"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_obs"),
                 F.round(F.avg("ratio"), 6).alias("seasonal_index"))
            .orderBy("weekday"))


_QSEAS_SQL = """
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), tr AS (
  SELECT day, y,
         COUNT(*) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w_n,
         CAST(SUM(y) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS w_s
  FROM days
)
SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS weekday,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(AVG(CAST(y AS DOUBLE) * 7.0 / CAST(w_s AS DOUBLE)), 6)
         AS seasonal_index
FROM tr
WHERE w_n = 7
GROUP BY 1
ORDER BY weekday
"""

R8B_QUERIES["events_seasonal_decompose"] = (
    q_events_seasonal_decompose, _QSEAS_SQL, False)


# --- corpus_vocab_coverage ----------------------------------------------------

def q_corpus_vocab_coverage(spark, sf_dir):
    """Tokenizer-sizing curve: what fraction of total token mass do the
    top-{100, 500, 1000, 2000, 5000} corpus terms cover?  Pure integer
    prefix sums at the cut points — the budget curve a BPE/vocab
    decision reads before committing to a vocabulary size.

    Scale shape: one term aggregation, one ordered prefix sum over the
    vocab-sized table, a 5-row broadcast join of cut points."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (docs.select(F.explode(_text.tokens(F.col("text"))).alias("term"))
          .filter(F.col("term") != "")
          .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c")))
    wr = Window.orderBy(F.col("c").desc(), F.col("term").asc())
    wc = wr.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (tc.withColumn("rk", F.row_number().over(wr).cast("long"))
              .withColumn("cum", F.sum("c").over(wc).cast("long")))
    tot = ranked.agg(F.max("cum").alias("tot"),
                     F.max("rk").alias("n_vocab"))
    cuts = spark.range(0, 5).select(
        F.element_at(F.array(*[F.lit(k) for k in (100, 500, 1000, 2000,
                                                  5000)]),
                     (F.col("id") + 1).cast("int")).alias("k"))
    # a cut beyond the vocabulary covers everything: clamp via n_vocab
    return (cuts.crossJoin(F.broadcast(tot))
            .join(ranked.select(F.col("rk").alias("k_eff"),
                                F.col("cum").alias("cum")),
                  F.least(F.col("k"), F.col("n_vocab")) == F.col("k_eff"))
            .select(F.col("k").cast("long").alias("vocab_k"),
                    F.col("k_eff").cast("long").alias("k_effective"),
                    F.col("n_vocab").cast("long").alias("n_vocab"),
                    F.round(F.col("cum").cast("double")
                            / F.col("tot").cast("double"), 6)
                    .alias("coverage"))
            .orderBy("vocab_k"))


_QVCOV_SQL = f"""
WITH tc AS (
  SELECT t.term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
  GROUP BY t.term
), ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY c DESC, term ASC) AS BIGINT)
           AS rk,
         CAST(SUM(c) OVER (ORDER BY c DESC, term ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM tc
), tot AS (
  SELECT MAX(cum) AS tot, MAX(rk) AS n_vocab FROM ranked
), cuts AS (
  SELECT CAST(unnest([100, 500, 1000, 2000, 5000]) AS BIGINT) AS k
)
SELECT cuts.k AS vocab_k, r.rk AS k_effective, tot.n_vocab,
       ROUND(CAST(r.cum AS DOUBLE) / CAST(tot.tot AS DOUBLE), 6)
         AS coverage
FROM cuts CROSS JOIN tot
JOIN ranked r ON r.rk = least(cuts.k, tot.n_vocab)
ORDER BY vocab_k
"""

R8B_QUERIES["corpus_vocab_coverage"] = (
    q_corpus_vocab_coverage, _QVCOV_SQL, False)


# =============================================================================
# Wave 20 — relevance feedback, metric-learning mining, Markov analysis,
# audio activity detection, multivariate outliers
# =============================================================================

# --- doc_rm3_expansion --------------------------------------------------------

def q_doc_rm3_expansion(spark, sf_dir):
    """RM3-style pseudo-relevance feedback on top of the BM25 query: take
    the top-10 feedback documents, weight each by its normalized BM25
    score, and score candidate expansion terms by
    ``w(t) = sum_d (tf(t,d)/dl(d)) * score_d/sum(score)`` — excluding the
    original query terms and stopwords.  Top-15 expansion terms.

    Scale shape: the feedback set is 10 rows (broadcast); the candidate
    tf pass touches only those 10 documents' postings — the expansion
    never rescans the corpus."""
    toks, dl, per_doc = _bm25_parts(spark, sf_dir)
    top10 = (per_doc.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())))
        .filter(F.col("rk") <= 10)
        .select("doc_id", "score"))
    ssum = top10.agg(F.sum("score").alias("ssum"))
    fb = (top10.crossJoin(F.broadcast(ssum))
          .select("doc_id", (F.col("score") / F.col("ssum")).alias("nw")))
    # original query terms (df ranks 10..14) — recompute to exclude
    dfreq = (toks.distinct().groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("df")))
    qterms = (dfreq.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("df").desc(), F.col("term").asc())))
        .filter((F.col("rk") >= 10) & (F.col("rk") <= 14))
        .select("term"))
    tf = (toks.join(F.broadcast(fb), "doc_id")
          .filter(~F.col("term").isin(*_RAKE_STOPS))
          .join(F.broadcast(qterms), "term", "left_anti")
          .groupBy("doc_id", "term", "nw")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    scored = (tf.join(dl, "doc_id")
              .groupBy("term")
              .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                   F.round(F.sum(F.col("tf").cast("double")
                                 / F.col("dl").cast("double")
                                 * F.col("nw")), 6).alias("weight")))
    w = Window.orderBy(F.col("weight").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 15)
            .select("rank", "term", "n_docs", "weight")
            .orderBy("rank"))


_QRM3_SQL = _QBM25_CORE + f""", top10 AS (
  SELECT doc_id, score
  FROM (SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
        FROM per_doc)
  WHERE rk <= 10
), fb AS (
  SELECT doc_id, score / (SELECT SUM(score) FROM top10) AS nw FROM top10
), texp AS (
  SELECT t.doc_id, t.term, fb.nw, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN fb ON fb.doc_id = t.doc_id
  WHERE NOT list_contains({_RAKE_STOPS_SQL}, t.term)
    AND t.term NOT IN (SELECT term FROM qterms)
  GROUP BY t.doc_id, t.term, fb.nw
), scored AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(SUM(CAST(tf AS DOUBLE) / CAST(dl.dl AS DOUBLE) * nw), 6)
           AS weight
  FROM texp JOIN dl USING (doc_id)
  GROUP BY term
)
SELECT CAST(rank AS INT) AS rank, term, n_docs, weight
FROM (SELECT term, n_docs, weight,
             row_number() OVER (ORDER BY weight DESC, term ASC) AS rank
      FROM scored)
WHERE rank <= 15
ORDER BY rank
"""

R8B_QUERIES["doc_rm3_expansion"] = (q_doc_rm3_expansion, _QRM3_SQL, False)


# --- embedding_triplet_mining -------------------------------------------------

def q_embedding_triplet_mining(spark, sf_dir):
    """Hard-triplet mining for metric learning: for each anchor
    (vec_id < 30), the hardest positive (same label, LOWEST cosine) and
    the hardest negative (different label, HIGHEST cosine), with the
    triplet margin.  Negative margins flag label regions that overlap in
    embedding space — exactly the triplets a contrastive trainer wants.

    Scale shape: anchors broadcast against the corpus (at scale the
    negative side would come from an ANN index — the brute-force pass is
    the recall baseline, same as cosine_topk); two windows pick the
    extremes."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("vec"))
    anchors = (base.filter(F.col("vec_id") < 30)
               .select(F.col("vec_id").alias("a_id"),
                       F.col("label").alias("a_label"),
                       F.col("vec").alias("a_vec")))
    pairs = (base.crossJoin(F.broadcast(anchors))
             .filter(F.col("vec_id") != F.col("a_id"))
             .withColumn("cos", _cos(F.col("vec"), F.col("a_vec"))))
    wpos = Window.partitionBy("a_id").orderBy(
        F.col("cos").asc(), F.col("vec_id").asc())
    pos = (pairs.filter(F.col("label") == F.col("a_label"))
           .withColumn("rk", F.row_number().over(wpos))
           .filter(F.col("rk") == 1)
           .select("a_id", F.col("vec_id").alias("pos_id"),
                   F.round("cos", 6).alias("pos_cos")))
    wneg = Window.partitionBy("a_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc())
    neg = (pairs.filter(F.col("label") != F.col("a_label"))
           .withColumn("rk", F.row_number().over(wneg))
           .filter(F.col("rk") == 1)
           .select("a_id", F.col("vec_id").alias("neg_id"),
                   F.round("cos", 6).alias("neg_cos")))
    return (pos.join(neg, "a_id")
            .select(F.col("a_id").alias("anchor_id"),
                    "pos_id", "pos_cos", "neg_id", "neg_cos",
                    (F.round(F.col("pos_cos") - F.col("neg_cos"), 6)
                     + F.lit(0.0)).alias("margin"))
            .orderBy("anchor_id"))


_QTRIP_SQL = """
WITH base AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
), anchors AS (
  SELECT vec_id AS a_id, label AS a_label, vec AS a_vec
  FROM base WHERE vec_id < 30
), pairs AS (
  SELECT a.a_id, a.a_label, b.vec_id, b.label,
         list_cosine_similarity(b.vec, a.a_vec) AS cos
  FROM base b CROSS JOIN anchors a
  WHERE b.vec_id <> a.a_id
), pos AS (
  SELECT a_id, vec_id AS pos_id, ROUND(cos, 6) AS pos_cos
  FROM (SELECT a_id, vec_id, cos,
               row_number() OVER (PARTITION BY a_id
                   ORDER BY cos ASC, vec_id ASC) AS rk
        FROM pairs WHERE label = a_label)
  WHERE rk = 1
), neg AS (
  SELECT a_id, vec_id AS neg_id, ROUND(cos, 6) AS neg_cos
  FROM (SELECT a_id, vec_id, cos,
               row_number() OVER (PARTITION BY a_id
                   ORDER BY cos DESC, vec_id ASC) AS rk
        FROM pairs WHERE label <> a_label)
  WHERE rk = 1
)
SELECT a_id AS anchor_id, pos_id, pos_cos, neg_id, neg_cos,
       ROUND(pos_cos - neg_cos, 6) + 0.0 AS margin
FROM pos JOIN neg USING (a_id)
ORDER BY anchor_id
"""

R8B_QUERIES["embedding_triplet_mining"] = (
    q_embedding_triplet_mining, _QTRIP_SQL, False)


# --- events_markov_stationary -------------------------------------------------

def q_events_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain: row-
    normalized first-order transition matrix (per-user (ts, event_id)
    ordering, same convention as event_transitions), then 20 synchronous
    power-iteration steps from the uniform vector.  Transition
    probabilities are exact integer ratios; each step is a 5-term sum.

    Scale shape: the transition count is the only data-sized job; the
    matrix is |types|^2 rows (25 here — bounded by the type domain, the
    IRLS/codebook collect precedent), so the 20 steps run as a driver
    fold over sorted states; a larger state space would swap in the
    join-per-step PageRank shape unchanged."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (ev.withColumn("next_type", F.lead("event_type").over(w))
             .filter(F.col("next_type").isNotNull())
             .groupBy(F.col("event_type").alias("from_t"),
                      F.col("next_type").alias("to_t"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    states = trans.select(F.col("from_t").alias("t")).distinct()
    closed = (trans.join(states.select(F.col("t").alias("to_t")), "to_t"))
    rowtot = (closed.groupBy("from_t")
              .agg(F.sum("n").cast("long").alias("rt")))
    mat = (closed.join(rowtot, "from_t")
           .select("from_t", "to_t",
                   (F.col("n").cast("double") / F.col("rt").cast("double"))
                   .alias("pr")))
    rows = mat.collect()  # |types|^2 rows, bounded by the type domain
    sts = sorted({r["from_t"] for r in rows})
    pr = {(r["from_t"], r["to_t"]): r["pr"] for r in rows}
    pi = {t: 1.0 / float(len(sts)) for t in sts}
    for _ in range(20):
        pi = {t2: sum(pi[t1] * pr.get((t1, t2), 0.0) for t1 in sts)
              for t2 in sts}
    out = spark.createDataFrame(
        [(t, pi[t]) for t in sts], "event_type STRING, p DOUBLE")
    return (out.select("event_type", F.round("p", 6).alias("stationary_p"))
            .orderBy("event_type"))


def _markov_sql(iters: int = 20) -> str:
    sql = """
WITH trans AS MATERIALIZED (
  SELECT from_t, to_t, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT event_type AS from_t,
               lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_t
        FROM events)
  WHERE to_t IS NOT NULL
  GROUP BY from_t, to_t
), states AS MATERIALIZED (
  SELECT DISTINCT from_t AS t FROM trans
), closed AS MATERIALIZED (
  SELECT tr.from_t, tr.to_t, tr.n
  FROM trans tr JOIN states s ON s.t = tr.to_t
), rowtot AS MATERIALIZED (
  SELECT from_t, CAST(SUM(n) AS BIGINT) AS rt FROM closed GROUP BY from_t
), mat AS MATERIALIZED (
  SELECT c.from_t, c.to_t, CAST(c.n AS DOUBLE) / CAST(r.rt AS DOUBLE) AS pr
  FROM closed c JOIN rowtot r USING (from_t)
), p0 AS MATERIALIZED (
  SELECT t, 1.0 / (SELECT CAST(COUNT(*) AS DOUBLE) FROM states) AS p
  FROM states
)"""
    for i in range(iters):
        sql += f""", p{i + 1} AS MATERIALIZED (
  SELECT m.to_t AS t, SUM(p.p * m.pr) AS p
  FROM p{i} p JOIN mat m ON m.from_t = p.t
  GROUP BY m.to_t
)"""
    sql += (f"\nSELECT t AS event_type, ROUND(p, 6) AS stationary_p "
            f"FROM p{iters} ORDER BY event_type")
    return sql


R8B_QUERIES["events_markov_stationary"] = (
    q_events_markov_stationary, _markov_sql(), False)


# --- multimodal_energy_segments -------------------------------------------------

def q_multimodal_energy_segments(spark, sf_dir):
    """Energy-threshold activity detection over the framed synthetic
    audio (multimodal.audio_chunk_energy, 32-byte payload, 8-byte
    frames): frames with byte-sum energy > 1024 are 'active'; consecutive
    active frames merge into segments (gaps-and-islands) — the VAD-style
    segmentation stage of an audio ingestion pipeline, value-checked per
    segment (a real decoder would swap in behind the same frame/energy
    contract).

    Scale shape: the Python stage is Arrow-batched mapInPandas; the
    merge is one per-doc window over frame indices."""
    from ..pipeline import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    payloads = docs.select(
        "doc_id",
        F.unhex(F.concat(F.md5("text"), F.md5("text"))).alias("payload"))
    frames = mm.audio_chunk_energy(payloads, "doc_id", "payload",
                                   frame_bytes=8)
    active = frames.filter(F.col("energy") > 1024)
    wdoc = Window.partitionBy("id").orderBy("frame_idx")
    segs = (active.withColumn(
        "island", F.col("frame_idx") - F.row_number().over(wdoc))
        .groupBy("id", "island")
        .agg(F.min("frame_idx").cast("int").alias("start_frame"),
             F.max("frame_idx").cast("int").alias("end_frame"),
             F.count(F.lit(1)).cast("long").alias("n_frames"),
             F.sum("energy").cast("long").alias("seg_energy")))
    return (segs.select(F.col("id").alias("doc_id"), "start_frame",
                        "end_frame", "n_frames", "seg_energy")
            .orderBy("doc_id", "start_frame"))


def _vad_sql() -> str:
    frames = []
    for kf in range(4):
        terms = " + ".join(
            f"('0x' || substr(h, {(kf * 8 + i) * 2 + 1}, 2))::BIGINT"
            for i in range(8))
        frames.append(
            f"SELECT doc_id, CAST({kf} AS INT) AS frame_idx, "
            f"CAST({terms} AS BIGINT) AS energy FROM h")
    u = " UNION ALL ".join(frames)
    return f"""
WITH h AS (
  SELECT doc_id, md5(text) || md5(text) AS h FROM documents
  WHERE doc_id < 100
), frames AS ({u}),
active AS (
  SELECT doc_id, frame_idx, energy,
         frame_idx - row_number() OVER (PARTITION BY doc_id
             ORDER BY frame_idx) AS island
  FROM frames WHERE energy > 1024
)
SELECT doc_id, CAST(MIN(frame_idx) AS INT) AS start_frame,
       CAST(MAX(frame_idx) AS INT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS seg_energy
FROM active
GROUP BY doc_id, island
ORDER BY doc_id, start_frame
"""


R8B_QUERIES["multimodal_energy_segments"] = (
    q_multimodal_energy_segments, _vad_sql(), False)


# --- customer_mahalanobis_outliers ----------------------------------------------

def q_customer_mahalanobis_outliers(spark, sf_dir):
    """Bivariate Mahalanobis outliers over (account balance, order
    count) per customer: the 2x2 covariance and its closed-form inverse
    are exact integer ratios (balances in BIGINT cents, counts BIGINT),
    so d^2 is a deterministic rational function of exact sums — the
    multivariate anomaly detector next to the univariate z-score one.
    Top-10 customers by d^2.

    Scale shape: one join + per-customer aggregation, one 5-number
    moment pass broadcast back — never a covariance over collected
    data."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    oc = (orders.groupBy("o_custkey")
          .agg(F.count(F.lit(1)).cast("long").alias("y")))
    pts = (cust.select(F.col("c_custkey").alias("ck"),
                       F.round(F.col("c_acctbal") * 100).cast("long")
                       .alias("x"))
           .join(oc, F.col("ck") == F.col("o_custkey"), "left")
           .withColumn("y", F.coalesce(F.col("y"), F.lit(0))))
    m = pts.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
                F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"))
    n = F.col("n").cast("double")
    mx, my = F.col("sx") / n, F.col("sy") / n
    vxx = F.col("sxx") / n - mx * mx
    vyy = F.col("syy") / n - my * my
    vxy = F.col("sxy") / n - mx * my
    det = vxx * vyy - vxy * vxy
    dx, dy = F.col("x") - mx, F.col("y") - my
    d2 = (dx * (vyy * dx - vxy * dy) + dy * (vxx * dy - vxy * dx)) / det
    scored = (pts.crossJoin(F.broadcast(m))
              .select(F.col("ck").alias("custkey"),
                      (F.col("x").cast("double") / 100.0).alias("acctbal"),
                      F.col("y").alias("n_orders"),
                      F.round(d2, 6).alias("d2")))
    w = Window.orderBy(F.col("d2").desc(), F.col("custkey").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 10)
            .select("rank", "custkey", "acctbal", "n_orders", "d2")
            .orderBy("rank"))


_QMAHA_SQL = """
WITH pts AS (
  SELECT c.c_custkey AS ck,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x,
         COALESCE(oc.y, 0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS y
             FROM orders GROUP BY o_custkey) oc
    ON oc.o_custkey = c.c_custkey
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts
), scored AS (
  SELECT ck AS custkey, CAST(x AS DOUBLE) / 100.0 AS acctbal,
         y AS n_orders,
         ROUND((
           (x - sx / CAST(n AS DOUBLE))
             * ((syy / CAST(n AS DOUBLE)
                 - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                  * (x - sx / CAST(n AS DOUBLE))
                - (sxy / CAST(n AS DOUBLE)
                   - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                  * (y - sy / CAST(n AS DOUBLE)))
           + (y - sy / CAST(n AS DOUBLE))
             * ((sxx / CAST(n AS DOUBLE)
                 - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                  * (y - sy / CAST(n AS DOUBLE))
                - (sxy / CAST(n AS DOUBLE)
                   - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                  * (x - sx / CAST(n AS DOUBLE)))
         ) / ((sxx / CAST(n AS DOUBLE)
               - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
              * (syy / CAST(n AS DOUBLE)
                 - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
              - (sxy / CAST(n AS DOUBLE)
                 - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                * (sxy / CAST(n AS DOUBLE)
                   - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))),
           6) AS d2
  FROM pts CROSS JOIN m
)
SELECT CAST(rank AS INT) AS rank, custkey, acctbal, n_orders, d2
FROM (SELECT custkey, acctbal, n_orders, d2,
             row_number() OVER (ORDER BY d2 DESC, custkey ASC) AS rank
      FROM scored)
WHERE rank <= 10
ORDER BY rank
"""

R8B_QUERIES["customer_mahalanobis_outliers"] = (
    q_customer_mahalanobis_outliers, _QMAHA_SQL, False)


# =============================================================================
# Wave 21 — readability, nearest-centroid classification, association rules,
# winsorized statistics, layout pruning
# =============================================================================

# --- doc_readability_scores ---------------------------------------------------

def q_doc_readability_scores(spark, sf_dir):
    """Flesch reading-ease profile per source: corpus-level
    words-per-sentence and syllables-per-word (vowel-group proxy) from
    exact integer counts, then the classic
    ``206.835 - 1.015*(W/S) - 84.6*(Syl/W)`` formula — the readability
    gate of a text-quality filtering pipeline.

    Scale shape: three regexp counters per row inside whole-stage
    codegen, one source-keyed aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        _text.token_count(F.col("text")).cast("long").alias("w"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long")
        .alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
        .cast("long").alias("syl"))
    agg = (per.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("w").cast("long").alias("w"),
                F.sum("s").cast("long").alias("s"),
                F.sum("syl").cast("long").alias("syl")))
    wps = F.when(F.col("s") > 0,
                 F.col("w").cast("double") / F.col("s").cast("double"))
    spw = F.col("syl").cast("double") / F.col("w").cast("double")
    return (agg.select(
        "source", "n_docs",
        F.round(wps, 6).alias("words_per_sentence"),
        F.round(spw, 6).alias("syllables_per_word"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6).alias("flesch"))
        .orderBy("source"))


_QREAD_SQL = f"""
WITH per AS (
  SELECT source,
         CAST(len({_TOKS_SQL}) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS syl
  FROM documents
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS w, CAST(SUM(s) AS BIGINT) AS s,
         CAST(SUM(syl) AS BIGINT) AS syl
  FROM per GROUP BY source
)
SELECT source, n_docs,
       ROUND(CASE WHEN s > 0 THEN CAST(w AS DOUBLE) / CAST(s AS DOUBLE)
             END, 6) AS words_per_sentence,
       ROUND(CAST(syl AS DOUBLE) / CAST(w AS DOUBLE), 6)
         AS syllables_per_word,
       ROUND(CASE WHEN s > 0
                  THEN 206.835
                       - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                       - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
             END, 6) AS flesch
FROM agg
ORDER BY source
"""

R8B_QUERIES["doc_readability_scores"] = (
    q_doc_readability_scores, _QREAD_SQL, False)


# --- embedding_centroid_classifier ----------------------------------------------

def q_embedding_centroid_classifier(spark, sf_dir):
    """Nearest-centroid (Rocchio) classification: per-label mean vectors
    (components ROUNDed at 9 so cross-partition summation order cannot
    leak into the argmax — the IRLS convention), then every vector is
    assigned to the most-cosine-similar centroid; per-label accuracy.

    Scale shape: centroids via one (label, dim) aggregation after a
    posexplode; classification broadcasts the |labels| centroid rows —
    the corpus is scanned twice, never self-joined."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("vec"))
    comps = base.select(
        "label", F.posexplode("vec").alias("dim", "val"))
    cent = (comps.groupBy("label", "dim")
            .agg(F.round(F.avg("val"), 9).alias("cv")))
    carr = (cent.groupBy(F.col("label").alias("c_label"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"]).alias("cvec")))
    scored = (base.crossJoin(F.broadcast(carr))
              .withColumn("cos", _cos(F.col("vec"), F.col("cvec"))))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("c_label").asc())
    pred = (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "label", F.col("c_label").alias("pred")))
    return (pred.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.when(F.col("pred") == F.col("label"), 1)
                       .otherwise(0)).cast("long").alias("n_correct"))
            .select(F.col("label").cast("long").alias("label"), "n",
                    "n_correct",
                    F.round(F.col("n_correct").cast("double")
                            / F.col("n").cast("double"), 6)
                    .alias("accuracy"))
            .orderBy("label"))


_QCENTROID_SQL = """
WITH base AS MATERIALIZED (
  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
), comps AS (
  SELECT label, unnest(range(1, len(vec) + 1)) AS dim,
         unnest(vec) AS val
  FROM base
), cent AS (
  SELECT label, dim, ROUND(AVG(val), 9) AS cv
  FROM comps GROUP BY label, dim
), carr AS MATERIALIZED (
  SELECT label AS c_label, list(cv ORDER BY dim) AS cvec
  FROM cent GROUP BY label
), pred AS (
  SELECT vec_id, label, c_label AS pred
  FROM (SELECT b.vec_id, b.label, c.c_label,
               row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY list_cosine_similarity(b.vec, c.cvec) DESC,
                            c.c_label ASC) AS rk
        FROM base b CROSS JOIN carr c)
  WHERE rk = 1
)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM pred
GROUP BY label
ORDER BY label
"""

R8B_QUERIES["embedding_centroid_classifier"] = (
    q_embedding_centroid_classifier, _QCENTROID_SQL, False)


# --- brand_assoc_rules --------------------------------------------------------

def q_brand_assoc_rules(spark, sf_dir):
    """Directed association rules A=>B over per-order brand baskets with
    the full measure set — support, confidence, lift, leverage,
    conviction — all exact integer ratios of basket counts; top-15 rules
    by (lift DESC, brands ASC).  Completes the market-basket tier beyond
    the plain lift query.

    Scale shape: one distinct (order, brand) projection, one self-join
    keyed on the order (bounded by brands-per-order), count tables are
    brand- and pair-sized."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # the basket projection feeds the marginals, the total, and the
    # pair self-join (3 executions of the join+distinct).  Deliberately
    # left redundant — r13 materialization A/B: cache() +10% at sf0.1
    # (see q_lineitem_robust_stats for the full numbers).
    bo = (li.join(pt, li.l_partkey == pt.p_partkey)
          .select("l_orderkey", "p_brand").distinct())
    n_b = bo.groupBy(F.col("p_brand").alias("b"))\
        .agg(F.count(F.lit(1)).cast("long").alias("nb"))
    nn = bo.select("l_orderkey").distinct()\
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = bo.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("ba"))
    b = bo.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("bb"))
    nab = (a.join(b, "ok").filter(F.col("ba") != F.col("bb"))
           .groupBy("ba", "bb").agg(F.count(F.lit(1)).cast("long")
                                    .alias("nab")))
    j = (nab.join(F.broadcast(n_b.select(F.col("b").alias("ba"),
                                         F.col("nb").alias("na"))), "ba")
         .join(F.broadcast(n_b.select(F.col("b").alias("bb"),
                                      F.col("nb").alias("nbb"))), "bb")
         .crossJoin(F.broadcast(nn)))
    nD = F.col("n").cast("double")
    supp = F.col("nab").cast("double") / nD
    conf = F.col("nab").cast("double") / F.col("na").cast("double")
    supb = F.col("nbb").cast("double") / nD
    lift = supp / ((F.col("na").cast("double") / nD) * supb)
    lev = supp - (F.col("na").cast("double") / nD) * supb
    conv = F.when(F.col("nab") == F.col("na"), F.lit(None))\
        .otherwise((1.0 - supb) / (1.0 - conf))
    scored = j.select(
        F.col("ba").alias("antecedent"), F.col("bb").alias("consequent"),
        F.col("nab").alias("n_both"),
        F.round(supp, 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
        F.round(lev, 6).alias("leverage"),
        F.round(conv, 6).alias("conviction"))
    w = Window.orderBy(F.col("lift").desc(), F.col("antecedent").asc(),
                       F.col("consequent").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 15)
            .orderBy("rank"))


_QASSOC_SQL = """
WITH bo AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_b AS (
  SELECT p_brand AS b, CAST(COUNT(*) AS BIGINT) AS nb FROM bo GROUP BY 1
), nn AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM bo
), nab AS (
  SELECT a.p_brand AS ba, b.p_brand AS bb, CAST(COUNT(*) AS BIGINT) AS nab
  FROM bo a JOIN bo b ON a.l_orderkey = b.l_orderkey
  WHERE a.p_brand <> b.p_brand
  GROUP BY 1, 2
), j AS (
  SELECT nab.ba, nab.bb, nab.nab, na.nb AS na, nbb.nb AS nbb, nn.n
  FROM nab JOIN n_b na ON na.b = nab.ba
  JOIN n_b nbb ON nbb.b = nab.bb
  CROSS JOIN nn
), scored AS (
  SELECT ba AS antecedent, bb AS consequent, nab AS n_both,
         ROUND(CAST(nab AS DOUBLE) / CAST(n AS DOUBLE), 6) AS support,
         ROUND(CAST(nab AS DOUBLE) / CAST(na AS DOUBLE), 6) AS confidence,
         ROUND((CAST(nab AS DOUBLE) / CAST(n AS DOUBLE))
               / ((CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(nbb AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS lift,
         ROUND(CAST(nab AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(nbb AS DOUBLE) / CAST(n AS DOUBLE)), 6)
           AS leverage,
         ROUND(CASE WHEN nab = na THEN NULL
                    ELSE (1.0 - CAST(nbb AS DOUBLE) / CAST(n AS DOUBLE))
                         / (1.0 - CAST(nab AS DOUBLE) / CAST(na AS DOUBLE))
               END, 6) AS conviction
  FROM j
)
SELECT CAST(rank AS INT) AS rank, antecedent, consequent, n_both, support,
       confidence, lift, leverage, conviction
FROM (SELECT *, row_number() OVER (ORDER BY lift DESC, antecedent ASC,
                                   consequent ASC) AS rank
      FROM scored)
WHERE rank <= 15
ORDER BY rank
"""

R8B_QUERIES["brand_assoc_rules"] = (q_brand_assoc_rules, _QASSOC_SQL, False)


# --- customer_winsorized_stats ------------------------------------------------

def q_customer_winsorized_stats(spark, sf_dir):
    """Winsorized account-balance statistics per market segment: clip at
    the segment's [p10, p90] (cut points ROUNDed at 1e-6 BEFORE the clip
    — the cross-engine percentile-interpolation convention), then mean of
    the clipped values in dollars.  The robust-aggregation step between
    raw means and the full robust-stats query.

    Scale shape: percentiles per segment in one aggregation, broadcast
    back for the clip; no sort of the raw data survives the plan."""
    cust = load_table(spark, sf_dir, "customer")
    v = F.col("c_acctbal")
    cuts = (cust.groupBy("c_mktsegment")
            .agg(F.round(F.expr("percentile(c_acctbal, 0.1)"), 6)
                 .alias("lo"),
                 F.round(F.expr("percentile(c_acctbal, 0.9)"), 6)
                 .alias("hi")))
    clipped = (cust.join(F.broadcast(cuts), "c_mktsegment")
               .withColumn("wv", F.least(F.greatest(v, F.col("lo")),
                                         F.col("hi"))))
    return (clipped.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.min("lo"), 6).alias("p10"),
                 F.round(F.min("hi"), 6).alias("p90"),
                 F.round(F.sum(F.col("wv") / 1e4) * 1e4
                         / F.count(F.lit(1)).cast("double"), 6)
                 .alias("winsor_mean"))
            .orderBy("segment"))


_QWINSOR_SQL = """
WITH cuts AS (
  SELECT c_mktsegment,
         ROUND(quantile_cont(c_acctbal, 0.1), 6) AS lo,
         ROUND(quantile_cont(c_acctbal, 0.9), 6) AS hi
  FROM customer GROUP BY c_mktsegment
), clipped AS (
  SELECT c.c_mktsegment, cuts.lo, cuts.hi,
         least(greatest(c.c_acctbal, cuts.lo), cuts.hi) AS wv
  FROM customer c JOIN cuts USING (c_mktsegment)
)
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(lo), 6) AS p10, ROUND(MIN(hi), 6) AS p90,
       ROUND(SUM(wv / 1e4) * 1e4 / CAST(COUNT(*) AS DOUBLE), 6)
         AS winsor_mean
FROM clipped
GROUP BY c_mktsegment
ORDER BY segment
"""

R8B_QUERIES["customer_winsorized_stats"] = (
    q_customer_winsorized_stats, _QWINSOR_SQL, False)


# --- scan_pruning_stats -------------------------------------------------------

def q_scan_pruning_stats(spark, sf_dir):
    """File-skipping effectiveness of two physical layouts — the number
    an Iceberg manifest-pruning pass would report: split lineitem into 32
    equal files (a) in natural (orderkey, linenumber) write order and
    (b) sorted by ship date, compute per-file min/max ship-date stats,
    and count the files a one-month predicate must read under each
    layout.  Pure metadata arithmetic once the per-file stats exist.

    Scale shape: two range-partition sorts (the real cost a table
    rewrite would pay), then stats and overlap tests on the 32-row file
    inventory."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.to_date("l_shipdate").alias("sd"))
    n = li.count()

    def layout(order_cols, tag):
        w = Window.orderBy(*order_cols)
        return (li.withColumn("rn", F.row_number().over(w))
                .withColumn("f", F.floor((F.col("rn") - 1) * 32
                                         / F.lit(n)).cast("long"))
                .groupBy("f")
                .agg(F.min("sd").alias("lo"), F.max("sd").alias("hi"))
                .select(F.lit(tag).alias("layout"), "f", "lo", "hi"))

    nat = layout([F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
                 "natural")
    srt = layout([F.col("sd").asc(), F.col("l_orderkey").asc(),
                  F.col("l_linenumber").asc()], "shipdate_sorted")
    files = nat.unionByName(srt)
    p_lo, p_hi = F.lit("1994-03-01").cast("date"), \
        F.lit("1994-04-01").cast("date")
    return (files.groupBy("layout")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum(F.when((F.col("lo") < p_hi) & (F.col("hi") >= p_lo),
                              1).otherwise(0)).cast("long")
                 .alias("n_files_read"))
            .select("layout", "n_files", "n_files_read",
                    F.round(F.col("n_files_read").cast("double")
                            / F.col("n_files").cast("double"), 6)
                    .alias("read_fraction"))
            .orderBy("layout"))


_QPRUNE_SQL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS sd
  FROM lineitem
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM li),
nat AS (
  SELECT 'natural' AS layout,
         CAST(FLOOR((row_number() OVER (ORDER BY l_orderkey, l_linenumber)
                     - 1) * 32 / n.n) AS BIGINT) AS f,
         sd
  FROM li CROSS JOIN n
), srt AS (
  SELECT 'shipdate_sorted' AS layout,
         CAST(FLOOR((row_number() OVER (ORDER BY sd, l_orderkey,
                                        l_linenumber)
                     - 1) * 32 / n.n) AS BIGINT) AS f,
         sd
  FROM li CROSS JOIN n
), files AS (
  SELECT layout, f, MIN(sd) AS lo, MAX(sd) AS hi
  FROM (SELECT * FROM nat UNION ALL SELECT * FROM srt)
  GROUP BY layout, f
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN lo < DATE '1994-04-01'
                      AND hi >= DATE '1994-03-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_files_read,
       ROUND(CAST(SUM(CASE WHEN lo < DATE '1994-04-01'
                            AND hi >= DATE '1994-03-01'
                           THEN 1 ELSE 0 END) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS read_fraction
FROM files
GROUP BY layout
ORDER BY layout
"""

R8B_QUERIES["scan_pruning_stats"] = (q_scan_pruning_stats, _QPRUNE_SQL, False)


# =============================================================================
# Wave 22 — search autocomplete, arrival-process stats, ER blocking,
# kNN-graph audit, snapshot retention
# =============================================================================

# --- part_name_autocomplete ---------------------------------------------------

def q_part_name_autocomplete(spark, sf_dir):
    """Autocomplete index build: for the 10 most frequent 4-character
    prefixes of part-name tokens, the top-3 completions by token
    frequency — the (prefix -> completions) posting table a search box
    serves.  All counts integer-exact; ties break lexicographically.

    Scale shape: one token aggregation, one prefix aggregation, one
    windowed top-3 per prefix — every stage keyed, vocabulary-sized."""
    part = load_table(spark, sf_dir, "part")
    toks = (part.select(F.explode(F.split(F.lower(F.col("p_name")), " "))
                        .alias("tok"))
            .filter(F.length("tok") >= 4))
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pre = tc.withColumn("prefix", F.substring("tok", 1, 4))
    ptot = (pre.groupBy("prefix")
            .agg(F.sum("c").cast("long").alias("pc")))
    wp = Window.orderBy(F.col("pc").desc(), F.col("prefix").asc())
    top_pre = (ptot.withColumn("prk", F.row_number().over(wp))
               .filter(F.col("prk") <= 10))
    wc = Window.partitionBy("prefix").orderBy(
        F.col("c").desc(), F.col("tok").asc())
    return (pre.join(F.broadcast(top_pre.select("prefix", "pc")), "prefix")
            .withColumn("rk", F.row_number().over(wc).cast("int"))
            .filter(F.col("rk") <= 3)
            .select("prefix", F.col("pc").alias("prefix_freq"), "rk",
                    F.col("tok").alias("completion"),
                    F.col("c").alias("completion_freq"))
            .orderBy("prefix", "rk"))


_QAUTOC_SQL = """
WITH toks AS (
  SELECT t.tok
  FROM (SELECT string_split(lower(p_name), ' ') AS tk FROM part),
       LATERAL (SELECT unnest(tk) AS tok) t
  WHERE len(t.tok) >= 4
), tc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
), pre AS (
  SELECT tok, c, substr(tok, 1, 4) AS prefix FROM tc
), ptot AS (
  SELECT prefix, CAST(SUM(c) AS BIGINT) AS pc FROM pre GROUP BY prefix
), top_pre AS (
  SELECT prefix, pc
  FROM (SELECT prefix, pc,
               row_number() OVER (ORDER BY pc DESC, prefix ASC) AS prk
        FROM ptot)
  WHERE prk <= 10
)
SELECT prefix, pc AS prefix_freq, CAST(rk AS INT) AS rk,
       tok AS completion, c AS completion_freq
FROM (SELECT p.prefix, tp.pc, p.tok, p.c,
             row_number() OVER (PARTITION BY p.prefix
                 ORDER BY p.c DESC, p.tok ASC) AS rk
      FROM pre p JOIN top_pre tp USING (prefix))
WHERE rk <= 3
ORDER BY prefix, rk
"""

R8B_QUERIES["part_name_autocomplete"] = (
    q_part_name_autocomplete, _QAUTOC_SQL, False)


# --- events_inter_arrival_stats -------------------------------------------------

def q_events_inter_arrival_stats(spark, sf_dir):
    """Inter-arrival-time statistics per event type: gaps in exact
    microseconds ((ts, event_id)-ordered lag), mean / CV from exact
    BIGINT sums, and the Goh-Barabasi burstiness B = (cv-1)/(cv+1) —
    the arrival-process companion to the count-based Fano factor
    (B ~ 0 is Poisson-like, B -> 1 is bursty).

    Scale shape: one per-type window for the lag, one 5-row moment
    finish; everything after the window is integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = (ev.select("event_type",
                      F.unix_micros(F.col("ts").cast("timestamp"))
                      .alias("us"),
                      "event_id")
            .withColumn("gap", F.expr("(us - lag(us) OVER (PARTITION BY "
                                      "event_type ORDER BY us, event_id)) "
                                      "DIV 1000"))
            .filter(F.col("gap").isNotNull()))
    agg = (gaps.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("gap").cast("long").alias("s1"),
                F.sum(F.col("gap") * F.col("gap")).cast("long").alias("s2")))
    n = F.col("n").cast("double")
    mean_s = F.col("s1").cast("double") / n / 1e3
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    # n*s2 can pass 2^63: the numerator runs in double (identical single
    # IEEE multiply/subtract in both engines — deterministic)
    var = (n * s2d - s1d * s1d) / (n * (n - 1.0))
    cv = F.sqrt(var) / (F.col("s1").cast("double") / n)
    return (agg.select(
        "event_type", F.col("n").alias("n_gaps"),
        F.round(mean_s, 6).alias("mean_gap_s"),
        F.round(cv, 6).alias("cv"),
        F.round((cv - 1.0) / (cv + 1.0), 6).alias("burstiness"))
        .orderBy("event_type"))


_QIAT_SQL = """
WITH gaps AS (
  SELECT event_type,
         (us - lag(us) OVER (PARTITION BY event_type
              ORDER BY us, event_id)) // 1000 AS gap
  FROM (SELECT event_type, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events)
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gap) AS BIGINT) AS s1,
         CAST(SUM(gap * gap) AS BIGINT) AS s2
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1e3, 6)
         AS mean_gap_s,
       ROUND(sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv,
       ROUND((sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
              / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0)
             / (sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) + 1.0), 6)
         AS burstiness
FROM agg
ORDER BY event_type
"""

R8B_QUERIES["events_inter_arrival_stats"] = (
    q_events_inter_arrival_stats, _QIAT_SQL, False)


# --- customer_entity_blocking ---------------------------------------------------

def q_customer_entity_blocking(spark, sf_dir):
    """Entity-resolution blocking audit: block customers on
    (market segment, acctbal percentile-free bucket of width $1000) and
    report the candidate-pair budget — block count, max/mean block size,
    candidate pairs sum(b*(b-1)/2), and the reduction ratio vs the naive
    n*(n-1)/2 all-pairs comparison.  All integer-exact.

    Scale shape: one groupBy over the blocking key; the audit reads only
    the block-size histogram — the decision input BEFORE anyone runs the
    quadratic matcher."""
    cust = load_table(spark, sf_dir, "customer")
    blocks = (cust.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bkt"))
        .agg(F.count(F.lit(1)).cast("long").alias("b")))
    tot = cust.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = (blocks.crossJoin(F.broadcast(tot))
           .groupBy("n")
           .agg(F.count(F.lit(1)).cast("long").alias("n_blocks"),
                F.max("b").cast("long").alias("max_block"),
                F.sum("b").cast("long").alias("n_rows"),
                F.sum(F.col("b") * (F.col("b") - 1) / 2).cast("long")
                .alias("cand_pairs")))
    naive = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    return agg.select(
        F.col("n").alias("n_customers"), "n_blocks", "max_block",
        F.round(F.col("n_rows").cast("double")
                / F.col("n_blocks").cast("double"), 6).alias("mean_block"),
        F.col("cand_pairs"),
        F.round(F.lit(1.0) - F.col("cand_pairs").cast("double") / naive, 6)
        .alias("reduction_ratio"))


_QBLOCK_SQL = """
WITH blocks AS (
  SELECT c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bkt,
         CAST(COUNT(*) AS BIGINT) AS b
  FROM customer GROUP BY 1, 2
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer)
SELECT n AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(MAX(b) AS BIGINT) AS max_block,
       ROUND(CAST(SUM(b) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_block,
       CAST(SUM(b * (b - 1) / 2) AS BIGINT) AS cand_pairs,
       ROUND(1.0 - CAST(SUM(b * (b - 1) / 2) AS BIGINT)
             / (CAST(n AS DOUBLE) * (n - 1) / 2), 6) AS reduction_ratio
FROM blocks CROSS JOIN tot
GROUP BY n
"""

R8B_QUERIES["customer_entity_blocking"] = (
    q_customer_entity_blocking, _QBLOCK_SQL, False)


# --- embedding_knn_graph_stats ----------------------------------------------

def q_embedding_knn_graph_stats(spark, sf_dir):
    """kNN-graph construction audit (k=5, cosine): reciprocity rate
    (fraction of directed edges whose reverse edge also exists — the
    symmetry an HNSW/NN-descent index builder monitors), in-degree
    dispersion (max and hub count at >2k), and the same-label edge
    fraction (the homophily a label-propagation step would exploit).
    Integer-exact once the top-k edges are fixed.

    Scale shape: the exact kNN pass is the brute-force baseline
    (broadcast queries, window top-k — cosine_topk); the audit itself
    is two edge-keyed aggregations and a self-join on the reversed
    key."""
    from ..pipeline import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("vec"))
    topk = sim.cosine_topk(base, base, k=6, q_vec="vec", d_vec="vec")
    edges = (topk.filter(F.col("query_id") != F.col("data_id"))
             .withColumn("rk2", F.row_number().over(
                 Window.partitionBy("query_id")
                 .orderBy(F.col("rank").asc())))
             .filter(F.col("rk2") <= 5)
             .select(F.col("query_id").alias("src"),
                     F.col("data_id").alias("dst")))
    rec = (edges.alias("e")
           .join(edges.select(F.col("src").alias("dst"),
                              F.col("dst").alias("src")),
                 ["src", "dst"], "left_semi")
           .agg(F.count(F.lit(1)).cast("long").alias("n_recip")))
    indeg = (edges.groupBy("dst")
             .agg(F.count(F.lit(1)).cast("long").alias("d")))
    ind = indeg.agg(F.max("d").cast("long").alias("max_in"),
                    F.sum(F.when(F.col("d") > 10, 1).otherwise(0))
                    .cast("long").alias("n_hubs"))
    lbl = base.select("vec_id", "label")
    same = (edges
            .join(lbl.select(F.col("vec_id").alias("src"),
                             F.col("label").alias("sl")), "src")
            .join(lbl.select(F.col("vec_id").alias("dst"),
                             F.col("label").alias("dl")), "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                 F.sum(F.when(F.col("sl") == F.col("dl"), 1).otherwise(0))
                 .cast("long").alias("n_same")))
    return (same.crossJoin(F.broadcast(rec)).crossJoin(F.broadcast(ind))
            .select("n_edges",
                    F.round(F.col("n_recip").cast("double")
                            / F.col("n_edges").cast("double"), 6)
                    .alias("reciprocity"),
                    "max_in", "n_hubs",
                    F.round(F.col("n_same").cast("double")
                            / F.col("n_edges").cast("double"), 6)
                    .alias("same_label_frac")))


_QKNNG_SQL = """
WITH base AS MATERIALIZED (
  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
), edges AS MATERIALIZED (
  SELECT src, dst
  FROM (SELECT q.vec_id AS src, d.vec_id AS dst,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(d.vec, q.vec) DESC,
                            d.vec_id ASC) AS rk
        FROM base q CROSS JOIN base d
        WHERE q.vec_id <> d.vec_id)
  WHERE rk <= 5
), rec AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
  FROM edges e
  WHERE EXISTS (SELECT 1 FROM edges r
                WHERE r.src = e.dst AND r.dst = e.src)
), ind AS (
  SELECT CAST(MAX(d) AS BIGINT) AS max_in,
         CAST(SUM(CASE WHEN d > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_hubs
  FROM (SELECT dst, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY dst)
), same AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END)
              AS BIGINT) AS n_same
  FROM edges e
  JOIN base ls ON ls.vec_id = e.src
  JOIN base ld ON ld.vec_id = e.dst
)
SELECT n_edges,
       ROUND(CAST(n_recip AS DOUBLE) / CAST(n_edges AS DOUBLE), 6)
         AS reciprocity,
       max_in, n_hubs,
       ROUND(CAST(n_same AS DOUBLE) / CAST(n_edges AS DOUBLE), 6)
         AS same_label_frac
FROM same CROSS JOIN rec CROSS JOIN ind
"""

R8B_QUERIES["embedding_knn_graph_stats"] = (
    q_embedding_knn_graph_stats, _QKNNG_SQL, False)


# --- snapshot_retention_expiry --------------------------------------------------

def q_snapshot_retention_expiry(spark, sf_dir):
    """Snapshot retention driven end-to-end: create a versioned table
    (4 files), append (2 more), bin-pack compact (1), then
    ``expire(keep_last=1)`` — the expire_snapshots maintenance procedure.
    Reports manifests dropped, data files physically removed (the 6
    pre-compaction files, no longer referenced by any retained
    manifest), versions left, and the row count read after expiry
    (unchanged — retention must never change query results).

    Cites the reference's Iceberg maintenance surface
    (/root/reference/README.md quickstart table lifecycle)."""
    import tempfile

    from ..operators.snapshots import SnapshotTable

    nation = load_table(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="snapexp_") + "/nation"
    t = SnapshotTable.create(spark, path, nation.repartition(4))
    t.append(spark, nation.filter(F.col("n_regionkey") == 0).repartition(2))
    t.compact(spark)
    res = t.expire(keep_last=1)
    n_left = len(t.versions())
    rows = t.read(spark).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"))
    return rows.select(
        F.lit(res["manifests_dropped"]).cast("long")
        .alias("manifests_dropped"),
        F.lit(res["files_removed"]).cast("long").alias("files_removed"),
        F.lit(n_left).cast("long").alias("versions_left"),
        "n_rows")


_QEXPIRE_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nation),
     r AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nation
           WHERE n_regionkey = 0)
SELECT CAST(2 AS BIGINT) AS manifests_dropped,
       CAST(6 AS BIGINT) AS files_removed,
       CAST(1 AS BIGINT) AS versions_left,
       n.c + r.c AS n_rows
FROM n CROSS JOIN r
"""

R8B_QUERIES["snapshot_retention_expiry"] = (
    q_snapshot_retention_expiry, _QEXPIRE_SQL, False)


# =============================================================================
# Wave 23 — boilerplate detection, spectral analysis, decile migration,
# factorial ANOVA, seasonal exponential smoothing
# =============================================================================

# --- doc_sentence_dedup -------------------------------------------------------

def q_doc_sentence_dedup(spark, sf_dir):
    """Sentence-level boilerplate detection (the CCNet-style dedup grain
    below document level): split on sentence punctuation, trim, keep
    sentences >= 20 chars, hash, and report per source the sentence
    count, distinct count, duplication rate, and the multiplicity of the
    worst boilerplate sentence.  All counts integer-exact.

    Scale shape: explode + two keyed aggregations; the hash keeps the
    dedup key fixed-width no matter the sentence length."""
    docs = load_table(spark, sf_dir, "documents")
    sents = (docs.select(
        "source",
        F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s"))
        .select("source", F.trim(F.col("s")).alias("s"))
        .filter(F.length("s") >= 20)
        .select("source", _hash64(F.col("s"), "sent").alias("h")))
    per = (sents.groupBy("source", "h")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    return (per.groupBy("source")
            .agg(F.sum("c").cast("long").alias("n_sentences"),
                 F.count(F.lit(1)).cast("long").alias("n_distinct"),
                 F.max("c").cast("long").alias("max_multiplicity"))
            .select("source", "n_sentences", "n_distinct",
                    F.round(F.lit(1.0) - F.col("n_distinct").cast("double")
                            / F.col("n_sentences").cast("double"), 6)
                    .alias("dup_rate"),
                    "max_multiplicity")
            .orderBy("source"))


_QSENT_SQL = """
WITH sents AS (
  SELECT source,
         ('0x' || substr(md5(s || '#sent'), 1, 15))::BIGINT AS h
  FROM (SELECT source, trim(t.s) AS s
        FROM (SELECT source, string_split_regex(text, '[.!?]+') AS ss
              FROM documents),
             LATERAL (SELECT unnest(ss) AS s) t)
  WHERE len(s) >= 20
), per AS (
  SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c
  FROM sents GROUP BY source, h
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_sentences,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(1.0 - CAST(COUNT(*) AS BIGINT)
             / CAST(SUM(c) AS DOUBLE), 6) AS dup_rate,
       CAST(MAX(c) AS BIGINT) AS max_multiplicity
FROM per
GROUP BY source
ORDER BY source
"""

R8B_QUERIES["doc_sentence_dedup"] = (q_doc_sentence_dedup, _QSENT_SQL, False)


# --- events_periodogram_dft ---------------------------------------------------

def q_events_periodogram_dft(spark, sf_dir):
    """Single-frequency DFT power of the mean-centered daily event-count
    series at candidate periods {7, 14, 30} days — the periodicity
    detector behind seasonal-model selection (the weekly peak should
    dominate).  Centered values are exact rationals; the trig terms are
    single libm calls on identical doubles.

    Scale shape: one day aggregation; each period is a 2-term sum over
    the day-domain-bounded series."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    w = Window.orderBy("day")
    idx = days.withColumn("t", F.row_number().over(w).cast("long") - 1)
    tot = idx.agg(F.sum("y").cast("long").alias("s"),
                  F.count(F.lit(1)).cast("long").alias("n"))
    periods = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(7), F.lit(14), F.lit(30)),
                     (F.col("id") + 1).cast("int")).cast("long")
        .alias("prd"))
    two_pi = 6.283185307179586
    g = (idx.crossJoin(F.broadcast(tot))
         .crossJoin(F.broadcast(periods))
         .withColumn("yc", F.col("y").cast("double")
                     - F.col("s").cast("double") / F.col("n").cast("double"))
         .withColumn("arg", F.lit(two_pi)
                     * (F.col("t") % F.col("prd")).cast("double")
                     / F.col("prd").cast("double")))
    agg = (g.groupBy("prd", "n")
           .agg(F.sum(F.col("yc") * F.cos("arg")).alias("c"),
                F.sum(F.col("yc") * F.sin("arg")).alias("sn")))
    power = (F.col("c") * F.col("c") + F.col("sn") * F.col("sn")) \
        / F.col("n").cast("double")
    return (agg.select(F.col("prd").alias("period_days"),
                       F.round(power, 4).alias("power"))
            .orderBy("period_days"))


_QDFT_SQL = """
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), idx AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1 AS t, y
  FROM days
), tot AS (
  SELECT CAST(SUM(y) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM idx
), periods AS (SELECT CAST(unnest([7, 14, 30]) AS BIGINT) AS prd),
g AS (
  SELECT p.prd, tot.n,
         CAST(y AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS yc,
         6.283185307179586 * CAST(idx.t % p.prd AS DOUBLE)
           / CAST(p.prd AS DOUBLE) AS arg
  FROM idx CROSS JOIN tot CROSS JOIN periods p
), agg AS (
  SELECT prd, n, SUM(yc * cos(arg)) AS c, SUM(yc * sin(arg)) AS sn
  FROM g GROUP BY prd, n
)
SELECT prd AS period_days,
       ROUND((c * c + sn * sn) / CAST(n AS DOUBLE), 4) AS power
FROM agg
ORDER BY period_days
"""

R8B_QUERIES["events_periodogram_dft"] = (
    q_events_periodogram_dft, _QDFT_SQL, False)


# --- customer_decile_migration --------------------------------------------------

def q_customer_decile_migration(spark, sf_dir):
    """Year-over-year spend-decile migration: rank customers into
    deciles by total 1996 spend and again by 1997 spend (exact-cents
    sums; decile = floor((rank-1)*10/n) with (spend DESC, custkey)
    tie-break — never NTILE, whose tie rule differs between engines),
    and report, per 1996 decile, how many customers stayed, moved up,
    or moved down.  The churn-risk migration matrix, all integer-exact.

    Scale shape: two year-keyed aggregations, two rank windows over the
    customer-sized tables, one join on custkey."""
    orders = load_table(spark, sf_dir, "orders")

    def deciles(year):
        spend = (orders.filter(F.year("o_orderdate") == year)
                 .groupBy("o_custkey")
                 .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                            .cast("long")).cast("long").alias("cents")))
        w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey").asc())
        n = spend.count()
        return (spend.withColumn("rk", F.row_number().over(w))
                .withColumn("dec", F.floor((F.col("rk") - 1) * 10
                                           / F.lit(n)).cast("long"))
                .select(F.col("o_custkey").alias("ck"), "dec"))

    d94 = deciles(1996).withColumnRenamed("dec", "d94")
    d95 = deciles(1997).withColumnRenamed("dec", "d95")
    j = d94.join(d95, "ck")
    return (j.groupBy(F.col("d94").alias("decile_1996"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.when(F.col("d95") == F.col("d94"), 1).otherwise(0))
                 .cast("long").alias("n_stay"),
                 F.sum(F.when(F.col("d95") < F.col("d94"), 1).otherwise(0))
                 .cast("long").alias("n_up"),
                 F.sum(F.when(F.col("d95") > F.col("d94"), 1).otherwise(0))
                 .cast("long").alias("n_down"),
                 F.round(F.avg(F.col("d95").cast("double")), 6)
                 .alias("mean_dec_1997"))
            .orderBy("decile_1996"))


_QDECMIG_SQL = """
WITH s94 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
), s95 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
), d94 AS (
  SELECT o_custkey AS ck,
         CAST(FLOOR((row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
                     - 1) * 10 / (SELECT COUNT(*) FROM s94)) AS BIGINT)
           AS d94
  FROM s94
), d95 AS (
  SELECT o_custkey AS ck,
         CAST(FLOOR((row_number() OVER (ORDER BY cents DESC, o_custkey ASC)
                     - 1) * 10 / (SELECT COUNT(*) FROM s95)) AS BIGINT)
           AS d95
  FROM s95
)
SELECT d94 AS decile_1996, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d95 = d94 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stay,
       CAST(SUM(CASE WHEN d95 < d94 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN d95 > d94 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_down,
       ROUND(AVG(CAST(d95 AS DOUBLE)), 6) AS mean_dec_1997
FROM d94 JOIN d95 USING (ck)
GROUP BY d94
ORDER BY decile_1996
"""

R8B_QUERIES["customer_decile_migration"] = (
    q_customer_decile_migration, _QDECMIG_SQL, False)


# --- orders_twoway_anova ------------------------------------------------------

def q_orders_twoway_anova(spark, sf_dir):
    """Two-way factorial ANOVA with interaction on order value:
    factors priority (5) x order-weekday (7), weighted (Type-I-style)
    sums of squares from cell sufficient statistics
    {n_ab, S_ab, Q_ab} — SSA/SSB from marginal means, SSAB from the
    interaction contrast n_ab*(m_ab - m_a - m_b + m)^2, SSE = Q - sum
    n_ab*m_ab^2.  Inputs scaled /1e5 per the ANOVA convention so every
    squared sum stays O(1e3); F statistics ROUNDed at 4.

    Scale shape: ONE cell aggregation over the data; everything after
    runs on the 35-cell table."""
    orders = load_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice") / F.lit(100000.0)
    cells = (orders.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.dayofweek("o_orderdate").cast("long").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum(y).alias("s"),
             F.sum(y * y).alias("q")))
    am = (cells.groupBy("a")
          .agg((F.sum("s") / F.sum("n").cast("double")).alias("ma")))
    bm = (cells.groupBy("b")
          .agg((F.sum("s") / F.sum("n").cast("double")).alias("mb")))
    gt = cells.agg(F.sum("n").cast("long").alias("nn"),
                   F.sum("s").alias("ss"), F.sum("q").alias("qq"),
                   F.count(F.lit(1)).cast("long").alias("n_cells"),
                   F.countDistinct("a").cast("long").alias("ka"),
                   F.countDistinct("b").cast("long").alias("kb"))
    j = (cells.join(F.broadcast(am), "a").join(F.broadcast(bm), "b")
         .crossJoin(F.broadcast(gt)))
    m = F.col("ss") / F.col("nn").cast("double")
    mab = F.col("s") / F.col("n").cast("double")
    nD = F.col("n").cast("double")
    terms = j.select(
        "nn", "qq", "ss", "n_cells", "ka", "kb",
        (nD * (F.col("ma") - m) * (F.col("ma") - m) / 7.0).alias("ta"),
        (nD * (F.col("mb") - m) * (F.col("mb") - m) / 5.0).alias("tb"),
        (nD * (mab - F.col("ma") - F.col("mb") + m)
         * (mab - F.col("ma") - F.col("mb") + m)).alias("tab"),
        (nD * mab * mab).alias("tfit"))
    # ta/tb are divided by the co-factor level count so summing the cell
    # rows reproduces the marginal-level sums exactly once
    agg = (terms.groupBy("nn", "qq", "ss", "n_cells", "ka", "kb")
           .agg(F.sum("ta").alias("ssa"), F.sum("tb").alias("ssb"),
                F.sum("tab").alias("ssab"), F.sum("tfit").alias("fit")))
    sse = F.col("qq") - F.col("fit")
    dfe = (F.col("nn") - F.col("n_cells")).cast("double")
    mse = sse / dfe
    fa = (F.col("ssa") / (F.col("ka") - 1).cast("double")) / mse
    fb = (F.col("ssb") / (F.col("kb") - 1).cast("double")) / mse
    fab = (F.col("ssab") / ((F.col("ka") - 1)
                            * (F.col("kb") - 1)).cast("double")) / mse
    return agg.select(
        F.col("nn").alias("n"), F.col("n_cells"),
        F.round(fa, 4).alias("f_priority"),
        F.round(fb, 4).alias("f_weekday"),
        F.round(fab, 4).alias("f_interaction"))


_QANOVA2_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS a,
         CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(o_totalprice / 100000.0) AS s,
         SUM((o_totalprice / 100000.0) * (o_totalprice / 100000.0)) AS q
  FROM orders GROUP BY 1, 2
), am AS (
  SELECT a, SUM(s) / CAST(SUM(n) AS DOUBLE) AS ma FROM cells GROUP BY a
), bm AS (
  SELECT b, SUM(s) / CAST(SUM(n) AS DOUBLE) AS mb FROM cells GROUP BY b
), gt AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(s) AS ss, SUM(q) AS qq,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS kb
  FROM cells
), terms AS (
  SELECT nn, qq, ss, n_cells, ka, kb,
         CAST(n AS DOUBLE) * (ma - ss / CAST(nn AS DOUBLE))
           * (ma - ss / CAST(nn AS DOUBLE)) / 7.0 AS ta,
         CAST(n AS DOUBLE) * (mb - ss / CAST(nn AS DOUBLE))
           * (mb - ss / CAST(nn AS DOUBLE)) / 5.0 AS tb,
         CAST(n AS DOUBLE)
           * (s / CAST(n AS DOUBLE) - ma - mb + ss / CAST(nn AS DOUBLE))
           * (s / CAST(n AS DOUBLE) - ma - mb + ss / CAST(nn AS DOUBLE))
           AS tab,
         CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))
           * (s / CAST(n AS DOUBLE)) AS tfit
  FROM cells JOIN am USING (a) JOIN bm USING (b) CROSS JOIN gt
), agg AS (
  SELECT nn, qq, ss, n_cells, ka, kb,
         SUM(ta) AS ssa, SUM(tb) AS ssb, SUM(tab) AS ssab,
         SUM(tfit) AS fit
  FROM terms GROUP BY nn, qq, ss, n_cells, ka, kb
)
SELECT nn AS n, n_cells,
       ROUND((ssa / CAST(ka - 1 AS DOUBLE))
             / ((qq - fit) / CAST(nn - n_cells AS DOUBLE)), 4)
         AS f_priority,
       ROUND((ssb / CAST(kb - 1 AS DOUBLE))
             / ((qq - fit) / CAST(nn - n_cells AS DOUBLE)), 4)
         AS f_weekday,
       ROUND((ssab / CAST((ka - 1) * (kb - 1) AS DOUBLE))
             / ((qq - fit) / CAST(nn - n_cells AS DOUBLE)), 4)
         AS f_interaction
FROM agg
"""

R8B_QUERIES["orders_twoway_anova"] = (
    q_orders_twoway_anova, _QANOVA2_SQL, False)


# --- events_holt_winters ------------------------------------------------------

def q_events_holt_winters(spark, sf_dir):
    """Holt-Winters additive triple exponential smoothing over the daily
    event counts (alpha=0.6, beta=0.3, gamma=0.4, weekly season m=7;
    init: l=y1, b=0, seasonals 0), forecasting horizons 1..7 with the
    rotating seasonal buffer.  The recursion is a fixed left fold with a
    7-slot list state — bit-identical IEEE sequences in both engines.

    Scale shape: one day aggregation, then a native ``F.aggregate`` fold
    carrying struct(l, b, seasonal array) over the ~61-element series."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("y")))
    series = days.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("sv"))
    zeros = F.array(*[F.lit(0.0)] * 7)
    acc0 = F.struct(F.lit(0).cast("int").alias("n"),
                    F.lit(0.0).alias("l"), F.lit(0.0).alias("b"),
                    zeros.alias("s"))
    # s[1] (1-based element_at) is the seasonal slot of the CURRENT step;
    # each step rotates: new list = s[2..7] ++ [updated slot]
    new_l = lambda acc, e: F.when(acc["n"] == 0, e["y"]).otherwise(
        0.6 * (e["y"] - F.element_at(acc["s"], 1))
        + 0.4 * (acc["l"] + acc["b"]))
    new_b = lambda acc, e: F.when(acc["n"] == 0, F.lit(0.0)).otherwise(
        0.3 * (new_l(acc, e) - acc["l"]) + 0.7 * acc["b"])
    new_s = lambda acc, e: F.when(acc["n"] == 0, F.lit(0.0)).otherwise(
        0.4 * (e["y"] - new_l(acc, e))
        + 0.6 * F.element_at(acc["s"], 1))
    fold = F.aggregate(
        F.col("sv"), acc0,
        lambda acc, e: F.struct(
            (acc["n"] + 1).alias("n"),
            new_l(acc, e).alias("l"),
            new_b(acc, e).alias("b"),
            F.concat(F.slice(acc["s"], 2, 6),
                     F.array(new_s(acc, e))).alias("s")))
    final = series.select(fold.alias("f")).select(
        F.col("f.n").cast("long").alias("n_days"),
        F.col("f.l").alias("l"), F.col("f.b").alias("b"),
        F.col("f.s").alias("s"))
    h = spark.range(1, 8).select(F.col("id").alias("horizon"))
    return (final.crossJoin(F.broadcast(h))
            .select("n_days", "horizon",
                    (F.round(F.col("l")
                             + F.col("horizon").cast("double") * F.col("b")
                             + F.element_at(
                                 F.col("s"),
                                 F.col("horizon").cast("int")), 6)
                     + F.lit(0.0)).alias("forecast"))
            .orderBy("horizon"))


_QHW_SQL = """
WITH RECURSIVE days AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y
        FROM events GROUP BY 1)
), hw AS (
  SELECT i, y AS l, CAST(0.0 AS DOUBLE) AS b,
         [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS s
  FROM days WHERE i = 1
  UNION ALL
  SELECT d.i,
         0.6 * (d.y - h.s[1]) + 0.4 * (h.l + h.b),
         0.3 * ((0.6 * (d.y - h.s[1]) + 0.4 * (h.l + h.b)) - h.l)
           + 0.7 * h.b,
         h.s[2:7]
           || [0.4 * (d.y - (0.6 * (d.y - h.s[1]) + 0.4 * (h.l + h.b)))
               + 0.6 * h.s[1]]
  FROM hw h JOIN days d ON d.i = h.i + 1
), fin AS (
  SELECT i AS n_days, l, b, s FROM hw
  WHERE i = (SELECT MAX(i) FROM days)
)
SELECT n_days, CAST(h.range AS BIGINT) AS horizon,
       ROUND(l + CAST(h.range AS DOUBLE) * b
             + s[CAST(h.range AS INT)], 6) + 0.0 AS forecast
FROM fin CROSS JOIN range(1, 8) h
ORDER BY horizon
"""

R8B_QUERIES["events_holt_winters"] = (
    q_events_holt_winters, _QHW_SQL, False)


# =============================================================================
# Wave 24 — conformal prediction, audience overlap, inventory EOQ,
# tokenizer fertility, quantile-loss forecast evaluation
# =============================================================================

# --- orders_conformal_interval --------------------------------------------------

def q_orders_conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval for the seasonal-naive daily
    revenue forecast: absolute residuals on the first 70% of
    forecastable days (date order) calibrate q_hat = the
    ceil((n_cal+1)*0.9)-th smallest residual (a RANK selection — exact,
    no quantile interpolation), and the held-out 30% reports the
    empirical coverage of +/- q_hat.  Distribution-free uncertainty for
    any point forecast.

    Scale shape: reuses the day-level forecast joins; calibration and
    evaluation are two passes over the day-count-sized table."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd")
                            .alias("day"))
             .agg(F.round(F.sum("o_totalprice"), 6).alias("rev")))
    l7 = daily.select(F.col("day").alias("d7"), F.col("rev").alias("r7"))
    l14 = daily.select(F.col("day").alias("d14"), F.col("rev").alias("r14"))
    l21 = daily.select(F.col("day").alias("d21"), F.col("rev").alias("r21"))
    dd = F.to_date("day")
    j = (daily
         .join(l7, F.date_format(F.date_sub(dd, 7), "yyyy-MM-dd")
               == F.col("d7"))
         .join(l14, F.date_format(F.date_sub(dd, 14), "yyyy-MM-dd")
               == F.col("d14"))
         .join(l21, F.date_format(F.date_sub(dd, 21), "yyyy-MM-dd")
               == F.col("d21")))
    fc = (F.col("r7") + F.col("r14") + F.col("r21")) / F.lit(3.0)
    res = j.select("day",
                   F.round(F.abs(F.col("rev") - fc), 6).alias("ar"))
    w = Window.orderBy("day")
    idx = res.withColumn("rn", F.row_number().over(w))
    nf = idx.count()
    ncal = int(nf * 7 // 10)
    k = min(ncal, -(-(ncal + 1) * 9 // 10))  # ceil((ncal+1)*0.9), clamped
    cal = idx.filter(F.col("rn") <= ncal)
    wq = Window.orderBy(F.col("ar").asc(), F.col("day").asc())
    qhat = (cal.withColumn("qr", F.row_number().over(wq))
            .filter(F.col("qr") == k)
            .select(F.col("ar").alias("q_hat")))
    ev = (idx.filter(F.col("rn") > ncal)
          .crossJoin(F.broadcast(qhat)))
    return (ev.groupBy("q_hat")
            .agg(F.count(F.lit(1)).cast("long").alias("n_eval"),
                 F.sum(F.when(F.col("ar") <= F.col("q_hat"), 1)
                       .otherwise(0)).cast("long").alias("n_covered"))
            .select(F.lit(ncal).cast("long").alias("n_cal"), "n_eval",
                    F.round("q_hat", 6).alias("q_hat"),
                    F.round(F.col("n_covered").cast("double")
                            / F.col("n_eval").cast("double"), 6)
                    .alias("coverage")))


def _conformal_sql() -> str:
    return """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1
), j AS (
  SELECT d.day, ROUND(abs(d.rev - (l7.rev + l14.rev + l21.rev) / 3.0), 6)
           AS ar
  FROM daily d
  JOIN daily l7
    ON strftime(CAST(d.day AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d') = l7.day
  JOIN daily l14
    ON strftime(CAST(d.day AS DATE) - INTERVAL 14 DAY, '%Y-%m-%d')
       = l14.day
  JOIN daily l21
    ON strftime(CAST(d.day AS DATE) - INTERVAL 21 DAY, '%Y-%m-%d')
       = l21.day
), idx AS (
  SELECT day, ar, row_number() OVER (ORDER BY day) AS rn FROM j
), nn AS (
  SELECT CAST(COUNT(*) * 7 // 10 AS BIGINT) AS ncal FROM idx
), kk AS (
  SELECT ncal,
         least(ncal, CAST(CEIL((ncal + 1) * 9 / 10.0) AS BIGINT)) AS k
  FROM nn
), qhat AS (
  SELECT kk.ncal, c.ar AS q_hat
  FROM kk JOIN (
    SELECT ar, row_number() OVER (ORDER BY ar ASC, day ASC) AS qr
    FROM idx CROSS JOIN nn WHERE rn <= nn.ncal) c
    ON c.qr = kk.k
)
SELECT q.ncal AS n_cal, CAST(COUNT(*) AS BIGINT) AS n_eval,
       ROUND(MIN(q.q_hat), 6) AS q_hat,
       ROUND(CAST(SUM(CASE WHEN i.ar <= q.q_hat THEN 1 ELSE 0 END)
                  AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
FROM idx i CROSS JOIN qhat q
WHERE i.rn > q.ncal
GROUP BY q.ncal
"""


R8B_QUERIES["orders_conformal_interval"] = (
    q_orders_conformal_interval, _conformal_sql(), False)


# --- events_type_overlap_jaccard ----------------------------------------------

def q_events_type_overlap_jaccard(spark, sf_dir):
    """Audience overlap between event types: exact Jaccard of the user
    sets for every type pair — |users(a) AND users(b)| over the union,
    from one distinct projection and a pair join.  Integer-exact; the
    cross-sell / cannibalization read on event audiences.

    Scale shape: the distinct (type, user) projection is the only
    data-sized shuffle; at corpus scale the exact sets would swap for
    the KMV/HLL sketches already in the inventory (same output
    contract)."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = (tu.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("long").alias("nu")))
    a = tu.select(F.col("event_type").alias("ta"), "user_id")
    b = tu.select(F.col("event_type").alias("tb"), "user_id")
    inter = (a.join(b, "user_id").filter(F.col("ta") < F.col("tb"))
             .groupBy("ta", "tb")
             .agg(F.count(F.lit(1)).cast("long").alias("ni")))
    return (inter
            .join(F.broadcast(sizes.select(F.col("event_type").alias("ta"),
                                           F.col("nu").alias("na"))), "ta")
            .join(F.broadcast(sizes.select(F.col("event_type").alias("tb"),
                                           F.col("nu").alias("nb"))), "tb")
            .select(F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
                    F.col("na").alias("n_users_a"),
                    F.col("nb").alias("n_users_b"),
                    F.col("ni").alias("n_both"),
                    F.round(F.col("ni").cast("double")
                            / (F.col("na") + F.col("nb") - F.col("ni"))
                            .cast("double"), 6).alias("jaccard"))
            .orderBy("type_a", "type_b"))


_QOVERLAP_SQL = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu FROM tu GROUP BY 1
), inter AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS ni
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b,
       sa.nu AS n_users_a, sb.nu AS n_users_b, ni AS n_both,
       ROUND(CAST(ni AS DOUBLE) / CAST(sa.nu + sb.nu - ni AS DOUBLE), 6)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = ta
JOIN sizes sb ON sb.event_type = tb
ORDER BY type_a, type_b
"""

R8B_QUERIES["events_type_overlap_jaccard"] = (
    q_events_type_overlap_jaccard, _QOVERLAP_SQL, False)


# --- brand_eoq_reorder --------------------------------------------------------

def q_brand_eoq_reorder(spark, sf_dir):
    """Economic order quantity per brand: EOQ = sqrt(2*D*S / H) with
    demand D = total quantity shipped (exact integer), fixed order cost
    S = 100, holding cost H = 20% of the brand's mean retail price
    (exact-cents mean) — plus the implied order count D/EOQ.  The
    inventory-policy finish on top of the ABC-XYZ matrix.

    Scale shape: one join + brand aggregation; the formula runs on the
    25-row brand table."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand",
                                                  "p_retailprice")
    j = li.join(pt, li.l_partkey == pt.p_partkey)
    agg = (j.groupBy("p_brand")
           .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
                .alias("d"),
                F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
                .cast("long").alias("price_cents"),
                F.count(F.lit(1)).cast("long").alias("n")))
    h = 0.2 * (F.col("price_cents").cast("double")
               / F.col("n").cast("double") / 100.0)
    eoq = F.sqrt(2.0 * F.col("d").cast("double") * 100.0 / h)
    return (agg.select(F.col("p_brand").alias("brand"),
                       F.col("d").alias("annual_demand"),
                       F.round(h, 6).alias("holding_cost"),
                       F.round(eoq, 6).alias("eoq"),
                       F.round(F.col("d").cast("double") / eoq, 6)
                       .alias("orders_per_period"))
            .orderBy("brand"))


_QEOQ_SQL = """
WITH agg AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d,
         CAST(SUM(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS price_cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT brand, d AS annual_demand,
       ROUND(0.2 * (CAST(price_cents AS DOUBLE) / CAST(n AS DOUBLE)
                    / 100.0), 6) AS holding_cost,
       ROUND(sqrt(2.0 * CAST(d AS DOUBLE) * 100.0
                  / (0.2 * (CAST(price_cents AS DOUBLE)
                            / CAST(n AS DOUBLE) / 100.0))), 6) AS eoq,
       ROUND(CAST(d AS DOUBLE)
             / sqrt(2.0 * CAST(d AS DOUBLE) * 100.0
                    / (0.2 * (CAST(price_cents AS DOUBLE)
                              / CAST(n AS DOUBLE) / 100.0))), 6)
         AS orders_per_period
FROM agg
ORDER BY brand
"""

R8B_QUERIES["brand_eoq_reorder"] = (q_brand_eoq_reorder, _QEOQ_SQL, False)


# --- doc_tokenizer_fertility ----------------------------------------------------

def q_doc_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility by language: BPE-ish subword estimate over
    whitespace words (both exact integer counts per document) — the
    cost multiplier a multilingual token budget applies per language.
    fertility = subword_tokens / words.

    Scale shape: two codegen token counters per row, one lang-keyed
    aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        _text.token_count(F.col("text")).cast("long").alias("w"),
        _text.token_count_bpe_ish(F.col("text")).cast("long").alias("bpe"))
    return (per.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("w").cast("long").alias("n_words"),
                 F.sum("bpe").cast("long").alias("n_subwords"))
            .select("lang", "n_docs", "n_words", "n_subwords",
                    F.round(F.col("n_subwords").cast("double")
                            / F.col("n_words").cast("double"), 6)
                    .alias("fertility"))
            .orderBy("lang"))


_QFERT_SQL = f"""
WITH per AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
         CAST(len(string_split_regex(trim(text), '\\s+'))
              + (length(text)
                 - length(regexp_replace(text, '[\\.,!\\?;:]', '', 'g')))
              + list_sum(list_transform(
                  {_TOKS_SQL},
                  t -> greatest(0, CAST(floor((len(t) - 1) / 6.0)
                                        AS BIGINT)))) AS BIGINT) AS bpe
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS n_words,
       CAST(SUM(bpe) AS BIGINT) AS n_subwords,
       ROUND(CAST(SUM(bpe) AS BIGINT) / CAST(SUM(w) AS DOUBLE), 6)
         AS fertility
FROM per
GROUP BY lang
ORDER BY lang
"""

R8B_QUERIES["doc_tokenizer_fertility"] = (
    q_doc_tokenizer_fertility, _QFERT_SQL, False)


# --- orders_pinball_loss ------------------------------------------------------

def q_orders_pinball_loss(spark, sf_dir):
    """Quantile (pinball) loss of the seasonal-naive revenue forecast at
    q in {0.1, 0.5, 0.9} — the metric that grades an interval/quantile
    forecast the way MAPE grades a point forecast.  Inputs are the
    ROUND-6 daily revenues, so every loss term is a deterministic
    function of identical doubles.

    Scale shape: day-level joins, a 3-row quantile grid broadcast in."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd")
                            .alias("day"))
             .agg(F.round(F.sum("o_totalprice"), 6).alias("rev")))
    l7 = daily.select(F.col("day").alias("d7"), F.col("rev").alias("r7"))
    l14 = daily.select(F.col("day").alias("d14"), F.col("rev").alias("r14"))
    l21 = daily.select(F.col("day").alias("d21"), F.col("rev").alias("r21"))
    dd = F.to_date("day")
    j = (daily
         .join(l7, F.date_format(F.date_sub(dd, 7), "yyyy-MM-dd")
               == F.col("d7"))
         .join(l14, F.date_format(F.date_sub(dd, 14), "yyyy-MM-dd")
               == F.col("d14"))
         .join(l21, F.date_format(F.date_sub(dd, 21), "yyyy-MM-dd")
               == F.col("d21")))
    fc = (F.col("r7") + F.col("r14") + F.col("r21")) / F.lit(3.0)
    diff = F.col("rev") - fc
    qs = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9)),
                     (F.col("id") + 1).cast("int")).alias("q"))
    g = (j.select(diff.alias("diff"))
         .crossJoin(F.broadcast(qs))
         .withColumn("loss", F.greatest(F.col("q") * F.col("diff"),
                                        (F.col("q") - 1.0) * F.col("diff"))))
    return (g.groupBy("q")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.round(F.avg("loss") / 1e3, 6).alias("mean_pinball_k"))
            .orderBy("q"))


_QPINBALL_SQL = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1
), j AS (
  SELECT d.rev - (l7.rev + l14.rev + l21.rev) / 3.0 AS diff
  FROM daily d
  JOIN daily l7
    ON strftime(CAST(d.day AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d') = l7.day
  JOIN daily l14
    ON strftime(CAST(d.day AS DATE) - INTERVAL 14 DAY, '%Y-%m-%d')
       = l14.day
  JOIN daily l21
    ON strftime(CAST(d.day AS DATE) - INTERVAL 21 DAY, '%Y-%m-%d')
       = l21.day
), g AS (
  SELECT q.q, greatest(q.q * j.diff, (q.q - 1.0) * j.diff) AS loss
  FROM j CROSS JOIN (SELECT CAST(unnest([0.1, 0.5, 0.9]) AS DOUBLE) AS q) q
)
SELECT q, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(loss) / 1e3, 6) AS mean_pinball_k
FROM g
GROUP BY q
ORDER BY q
"""

R8B_QUERIES["orders_pinball_loss"] = (
    q_orders_pinball_loss, _QPINBALL_SQL, False)


# =============================================================================
# Wave 25 — price indices, parametric survival, empirical Bayes,
# uplift modeling, count-model fitting
# =============================================================================

# --- lineitem_price_index -----------------------------------------------------

def q_lineitem_price_index(spark, sf_dir):
    """Laspeyres, Paasche, and Fisher price indices for 1997 vs the 1996
    base year, per part (mean unit price = extendedprice/quantity in
    exact cents x integer quantities): L = sum(p1*q0)/sum(p0*q0),
    P = sum(p1*q1)/sum(p0*q1), F = sqrt(L*P) — the composite-inflation
    read on the parts basket, all from exact BIGINT cross-products.

    Scale shape: ONE year-conditional part aggregation (single corpus
    pass, r13), one scalar finish."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr"))
    # ONE conditional-aggregation pass instead of two year-filtered
    # aggregations joined back: the old shape executed the
    # lineitem⋈orders join once per year branch (r13 scan-budget audit:
    # 15000 -> 7500 input records at sf0.001) and paid an extra join
    # shuffle.  sum(when(yr=Y, x)) is null when a part has no rows in
    # year Y, so `both non-null` reproduces the old y0⋈y1 INNER join
    # membership exactly.
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .filter(F.col("yr").isin(1996, 1997)))
    _ext = F.round(F.col("l_extendedprice") * 100).cast("long")
    _qty = F.col("l_quantity").cast("long")
    both = (j.groupBy("l_partkey")
            .agg(F.sum(F.when(F.col("yr") == 1996, _ext)).cast("long")
                 .alias("ext_0"),
                 F.sum(F.when(F.col("yr") == 1996, _qty)).cast("long")
                 .alias("q_0"),
                 F.sum(F.when(F.col("yr") == 1997, _ext)).cast("long")
                 .alias("ext_1"),
                 F.sum(F.when(F.col("yr") == 1997, _qty)).cast("long")
                 .alias("q_1"))
            .filter(F.col("ext_0").isNotNull()
                    & F.col("ext_1").isNotNull()))
    # mean unit price in cents x the other year's quantity: integer-exact
    # numerators p*q = (ext/q) * q' — keep as exact rational ext*q'/q
    lnum = F.sum((F.col("ext_1") * F.col("q_0")).cast("double")
                 / F.col("q_1").cast("double"))
    lden = F.sum(F.col("ext_0").cast("double"))
    pnum = F.sum(F.col("ext_1").cast("double"))
    pden = F.sum((F.col("ext_0") * F.col("q_1")).cast("double")
                 / F.col("q_0").cast("double"))
    agg = both.agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
                   lnum.alias("ln"), lden.alias("ld"),
                   pnum.alias("pn"), pden.alias("pd"))
    lasp = F.col("ln") / F.col("ld")
    paas = F.col("pn") / F.col("pd")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"))


_QPIDX_SQL = """
WITH j AS (
  SELECT l.l_partkey, year(o.o_orderdate) AS yr,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS ext,
         CAST(l.l_quantity AS BIGINT) AS q
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), y0 AS (
  SELECT l_partkey, CAST(SUM(ext) AS BIGINT) AS ext_0,
         CAST(SUM(q) AS BIGINT) AS q_0
  FROM j WHERE yr = 1996 GROUP BY l_partkey
), y1 AS (
  SELECT l_partkey, CAST(SUM(ext) AS BIGINT) AS ext_1,
         CAST(SUM(q) AS BIGINT) AS q_1
  FROM j WHERE yr = 1997 GROUP BY l_partkey
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(CAST(ext_1 * q_0 AS DOUBLE) / CAST(q_1 AS DOUBLE)) AS ln,
         SUM(CAST(ext_0 AS DOUBLE)) AS ld,
         SUM(CAST(ext_1 AS DOUBLE)) AS pn,
         SUM(CAST(ext_0 * q_1 AS DOUBLE) / CAST(q_0 AS DOUBLE)) AS pd
  FROM y0 JOIN y1 USING (l_partkey)
)
SELECT n_parts,
       ROUND(ln / ld, 6) AS laspeyres,
       ROUND(pn / pd, 6) AS paasche,
       ROUND(sqrt((ln / ld) * (pn / pd)), 6) AS fisher
FROM agg
"""

R8B_QUERIES["lineitem_price_index"] = (
    q_lineitem_price_index, _QPIDX_SQL, False)


# --- ship_weibull_fit ---------------------------------------------------------

def q_ship_weibull_fit(spark, sf_dir):
    """Weibull fit of the order->first-ship latency by median-rank
    regression: per distinct latency day t, the cumulative failure
    fraction uses the Benard median-rank approximation
    F_i = (cum_i - 0.3)/(n + 0.4) (exact rationals from integer
    prefix-sums), then OLS of y = ln(-ln(1-F)) on x = ln(t) gives the
    shape (slope) and scale exp(-intercept/shape) — the parametric
    companion to the Kaplan-Meier curve.

    Scale shape: one duration-keyed aggregation, one prefix-sum window
    over the <= 61-row day table, a 5-sum OLS finish."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    first = (li.groupBy("l_orderkey")
             .agg(F.min(F.to_date("l_shipdate")).alias("ship")))
    dur = (orders.join(first, orders.o_orderkey == first.l_orderkey)
           .select(F.datediff(F.col("ship"), F.to_date("o_orderdate"))
                   .cast("long").alias("t"))
           .filter(F.col("t") >= 1))
    per = dur.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("d"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    tot = per.agg(F.sum("d").cast("long").alias("n"))
    cum = (per.withColumn("cum", F.sum("d").over(w).cast("long"))
           .crossJoin(F.broadcast(tot))
           .filter(F.col("cum") < F.col("n")))  # drop F=1 (ln(0) pole)
    fmr = (F.col("cum").cast("double") - 0.3) \
        / (F.col("n").cast("double") + 0.4)
    x = F.log(F.col("t").cast("double"))
    y = F.log(-F.log(1.0 - fmr))
    ols = cum.agg(F.count(F.lit(1)).cast("long").alias("k"),
                  F.sum(x).alias("sx"), F.sum(y).alias("sy"),
                  F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"))
    kD = F.col("k").cast("double")
    slope = (kD * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (kD * F.col("sxx") - F.col("sx") * F.col("sx"))
    intercept = (F.col("sy") - slope * F.col("sx")) / kD
    return ols.select(
        F.col("k").alias("n_points"),
        F.round(slope, 6).alias("shape"),
        F.round(F.exp(-intercept / slope), 6).alias("scale_days"))


_QWEIB_SQL = """
WITH first AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ship
  FROM lineitem GROUP BY l_orderkey
), dur AS (
  SELECT CAST(datediff('day', CAST(o.o_orderdate AS DATE), f.ship)
              AS BIGINT) AS t
  FROM orders o JOIN first f ON f.l_orderkey = o.o_orderkey
  WHERE datediff('day', CAST(o.o_orderdate AS DATE), f.ship) >= 1
), per AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS d FROM dur GROUP BY t
), tot AS (SELECT CAST(SUM(d) AS BIGINT) AS n FROM per),
cum AS (
  SELECT t,
         CAST(SUM(d) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         tot.n
  FROM per CROSS JOIN tot
), pts AS (
  SELECT ln(CAST(t AS DOUBLE)) AS x,
         ln(-ln(1.0 - (CAST(cum AS DOUBLE) - 0.3)
                      / (CAST(n AS DOUBLE) + 0.4))) AS y
  FROM cum WHERE cum < n
), ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT k AS n_points,
       ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS shape,
       ROUND(exp(-((sy - ((CAST(k AS DOUBLE) * sxy - sx * sy)
                          / (CAST(k AS DOUBLE) * sxx - sx * sx)) * sx)
                   / CAST(k AS DOUBLE))
                 / ((CAST(k AS DOUBLE) * sxy - sx * sy)
                    / (CAST(k AS DOUBLE) * sxx - sx * sx))), 6)
         AS scale_days
FROM ols
"""

R8B_QUERIES["ship_weibull_fit"] = (q_ship_weibull_fit, _QWEIB_SQL, False)


# --- nation_eb_shrinkage ------------------------------------------------------

def q_nation_eb_shrinkage(spark, sf_dir):
    """Empirical-Bayes (James-Stein-style) shrinkage of per-nation mean
    account balance toward the grand mean: within-group variance from
    pooled exact sums, between-group variance by method of moments
    (clamped at 0), shrinkage weight w_g = tau2/(tau2 + s2/n_g) — the
    small-area estimator that stabilizes thin groups.  Balances in
    exact cents; every moment is a deterministic ratio.

    Scale shape: one group aggregation + one 25-row finish."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    g = (cust.groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(cents).cast("long").alias("s"),
              F.sum(cents * cents).cast("long").alias("q")))
    # s*s and ss*ss MUST multiply in DOUBLE: group cent-sums reach ~2.7e9
    # at sf0.1, so the LONG product overflows 2^63 (ANSI crash; found by
    # the round-10 sf0.1 sweep — sf0.01 never exercises the magnitude).
    # Bit-identical to the oracle's exact-HUGEINT-product-then-cast
    # because both factors are < 2^53 (double multiply of exactly-
    # representable factors is the correctly-rounded true product).
    tot = g.agg(F.sum("n").cast("long").alias("nn"),
                F.sum("s").cast("long").alias("ss"),
                F.sum("q").cast("long").alias("qq"),
                F.count(F.lit(1)).cast("long").alias("k"),
                F.sum(F.col("s").cast("double") * F.col("s").cast("double")
                      / F.col("n").cast("double")).alias("sb"))
    j = g.crossJoin(F.broadcast(tot))
    nD, nnD = F.col("n").cast("double"), F.col("nn").cast("double")
    gm = F.col("ss").cast("double") / nnD / 100.0
    mg = F.col("s").cast("double") / nD / 100.0
    # pooled within-group variance (cents^2 -> dollars^2 via /1e4)
    s2 = (F.col("qq").cast("double") - F.col("sb")) \
        / (F.col("nn") - F.col("k")).cast("double") / 1e4
    # between-group MS and method-of-moments tau2, clamped at 0
    msb = (F.col("sb") - F.col("ss").cast("double")
           * F.col("ss").cast("double")
           / nnD) / (F.col("k") - 1).cast("double") / 1e4
    n0 = nnD / F.col("k").cast("double")  # balanced-design approximation
    tau2 = F.greatest((msb - s2) / n0, F.lit(0.0))
    wgt = tau2 / (tau2 + s2 / nD)
    return (j.select(F.col("c_nationkey").cast("long").alias("nationkey"),
                     F.col("n"),
                     F.round(mg, 6).alias("raw_mean"),
                     F.round(wgt, 6).alias("shrink_weight"),
                     F.round(wgt * mg + (1.0 - wgt) * gm, 6)
                     .alias("eb_mean"))
            .orderBy("nationkey"))


_QEB_SQL = """
WITH g AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                  * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS q
  FROM customer GROUP BY c_nationkey
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
         CAST(SUM(q) AS BIGINT) AS qq, CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS sb
  FROM g
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, n,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
         AS raw_mean,
       ROUND(greatest(((sb - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
                       / CAST(k - 1 AS DOUBLE) / 1e4
                       - (CAST(qq AS DOUBLE) - sb)
                         / CAST(nn - k AS DOUBLE) / 1e4)
                      / (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)), 0.0)
             / (greatest(((sb - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                           / CAST(nn AS DOUBLE))
                          / CAST(k - 1 AS DOUBLE) / 1e4
                          - (CAST(qq AS DOUBLE) - sb)
                            / CAST(nn - k AS DOUBLE) / 1e4)
                         / (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)), 0.0)
                + (CAST(qq AS DOUBLE) - sb) / CAST(nn - k AS DOUBLE)
                  / 1e4 / CAST(n AS DOUBLE)), 6) AS shrink_weight,
       ROUND(greatest(((sb - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
                       / CAST(k - 1 AS DOUBLE) / 1e4
                       - (CAST(qq AS DOUBLE) - sb)
                         / CAST(nn - k AS DOUBLE) / 1e4)
                      / (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)), 0.0)
             / (greatest(((sb - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                           / CAST(nn AS DOUBLE))
                          / CAST(k - 1 AS DOUBLE) / 1e4
                          - (CAST(qq AS DOUBLE) - sb)
                            / CAST(nn - k AS DOUBLE) / 1e4)
                         / (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)), 0.0)
                + (CAST(qq AS DOUBLE) - sb) / CAST(nn - k AS DOUBLE)
                  / 1e4 / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
             + (1.0 - greatest(((sb - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                                 / CAST(nn AS DOUBLE))
                                / CAST(k - 1 AS DOUBLE) / 1e4
                                - (CAST(qq AS DOUBLE) - sb)
                                  / CAST(nn - k AS DOUBLE) / 1e4)
                               / (CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)),
                               0.0)
                    / (greatest(((sb - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)
                                  / CAST(nn AS DOUBLE))
                                 / CAST(k - 1 AS DOUBLE) / 1e4
                                 - (CAST(qq AS DOUBLE) - sb)
                                   / CAST(nn - k AS DOUBLE) / 1e4)
                                / (CAST(nn AS DOUBLE)
                                   / CAST(k AS DOUBLE)), 0.0)
                       + (CAST(qq AS DOUBLE) - sb)
                         / CAST(nn - k AS DOUBLE) / 1e4
                         / CAST(n AS DOUBLE)))
               * (CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) / 100.0), 6)
         AS eb_mean
FROM g CROSS JOIN tot
ORDER BY nationkey
"""

R8B_QUERIES["nation_eb_shrinkage"] = (
    q_nation_eb_shrinkage, _QEB_SQL, False)


# --- events_uplift_by_segment ---------------------------------------------------

def q_events_uplift_by_segment(spark, sf_dir):
    """Two-model uplift read on event behavior: treatment = user clicked
    at least once, outcome = user purchased at least once, segments =
    engagement quartiles by event count (rank-arithmetic quartiles, not
    NTILE).  uplift(segment) = P(buy | clicked) - P(buy | not clicked):
    the targeting table a campaign-sizing pass reads.  All integer
    ratios.

    Scale shape: one user-level aggregation, one rank window over the
    user-sized table, one 4-row finish."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("int").alias("clicked"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("int").alias("bought")))
    n = users.count()
    w = Window.orderBy(F.col("n_ev").desc(), F.col("user_id").asc())
    seg = (users.withColumn("rk", F.row_number().over(w))
           .withColumn("segment", F.floor((F.col("rk") - 1) * 4
                                          / F.lit(n)).cast("long")))
    agg = (seg.groupBy("segment")
           .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum(F.col("clicked")).cast("long").alias("n_clicked"),
                F.sum(F.col("clicked") * F.col("bought")).cast("long")
                .alias("n_click_buy"),
                F.sum((1 - F.col("clicked")) * F.col("bought"))
                .cast("long").alias("n_noclick_buy")))
    p_t = F.when(F.col("n_clicked") > 0,
                 F.col("n_click_buy").cast("double")
                 / F.col("n_clicked").cast("double"))
    p_c = F.when(F.col("n_users") > F.col("n_clicked"),
                 F.col("n_noclick_buy").cast("double")
                 / (F.col("n_users") - F.col("n_clicked")).cast("double"))
    return (agg.select("segment", "n_users", "n_clicked",
                       F.round(p_t, 6).alias("p_buy_clicked"),
                       F.round(p_c, 6).alias("p_buy_not_clicked"),
                       F.round(p_t - p_c, 6).alias("uplift"))
            .orderBy("segment"))


_QUPLIFT_SQL = """
WITH users AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS bought
  FROM events GROUP BY user_id
), seg AS (
  SELECT clicked, bought,
         CAST(FLOOR((row_number() OVER (ORDER BY n_ev DESC, user_id ASC)
                     - 1) * 4 / (SELECT COUNT(*) FROM users)) AS BIGINT)
           AS segment
  FROM users
), agg AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(clicked) AS BIGINT) AS n_clicked,
         CAST(SUM(clicked * bought) AS BIGINT) AS n_click_buy,
         CAST(SUM((1 - clicked) * bought) AS BIGINT) AS n_noclick_buy
  FROM seg GROUP BY segment
)
SELECT segment, n_users, n_clicked,
       ROUND(CASE WHEN n_clicked > 0
                  THEN CAST(n_click_buy AS DOUBLE)
                       / CAST(n_clicked AS DOUBLE) END, 6)
         AS p_buy_clicked,
       ROUND(CASE WHEN n_users > n_clicked
                  THEN CAST(n_noclick_buy AS DOUBLE)
                       / CAST(n_users - n_clicked AS DOUBLE) END, 6)
         AS p_buy_not_clicked,
       ROUND(CASE WHEN n_clicked > 0 AND n_users > n_clicked
                  THEN CAST(n_click_buy AS DOUBLE)
                       / CAST(n_clicked AS DOUBLE)
                       - CAST(n_noclick_buy AS DOUBLE)
                         / CAST(n_users - n_clicked AS DOUBLE)
             END, 6) AS uplift
FROM agg
ORDER BY segment
"""

R8B_QUERIES["events_uplift_by_segment"] = (
    q_events_uplift_by_segment, _QUPLIFT_SQL, False)


# --- customer_nb_overdispersion -------------------------------------------------

def q_customer_nb_overdispersion(spark, sf_dir):
    """Negative-binomial method-of-moments fit of the per-customer order
    count (including zero-order customers — the left join matters):
    mean m, variance v from exact integer sums, dispersion
    r = m^2/(v - m) and p = m/v, plus the variance-to-mean ratio that
    justifies NB over Poisson.  The count-model calibration a demand
    simulator consumes.

    Scale shape: one left-join aggregation, one scalar finish."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    oc = (orders.groupBy("o_custkey")
          .agg(F.count(F.lit(1)).cast("long").alias("y")))
    pts = (cust.join(oc, cust.c_custkey == oc.o_custkey, "left")
           .select(F.coalesce(F.col("y"), F.lit(0)).cast("long")
                   .alias("y")))
    agg = pts.agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("y").cast("long").alias("s1"),
                  F.sum(F.col("y") * F.col("y")).cast("long").alias("s2"))
    nD = F.col("n").cast("double")
    m = F.col("s1").cast("double") / nD
    v = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))\
        .cast("double") / (F.col("n") * (F.col("n") - 1)).cast("double")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(m, 6).alias("mean_orders"),
        F.round(v, 6).alias("var_orders"),
        F.round(v / m, 6).alias("vmr"),
        F.round(m * m / (v - m), 6).alias("nb_r"),
        F.round(m / v, 6).alias("nb_p"))


_QNBFIT_SQL = """
WITH pts AS (
  SELECT COALESCE(oc.y, 0) AS y
  FROM customer c
  LEFT JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS y
             FROM orders GROUP BY o_custkey) oc
    ON oc.o_custkey = c.c_custkey
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s1,
         CAST(SUM(y * y) AS BIGINT) AS s2
  FROM pts
)
SELECT n AS n_customers,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_orders,
       ROUND(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE), 6) AS var_orders,
       ROUND((CAST(n * s2 - s1 * s1 AS DOUBLE)
              / CAST(n * (n - 1) AS DOUBLE))
             / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS vmr,
       ROUND((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n * s2 - s1 * s1 AS DOUBLE)
                / CAST(n * (n - 1) AS DOUBLE)
                - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS nb_r,
       ROUND((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n * s2 - s1 * s1 AS DOUBLE)
                / CAST(n * (n - 1) AS DOUBLE)), 6) AS nb_p
FROM agg
"""

R8B_QUERIES["customer_nb_overdispersion"] = (
    q_customer_nb_overdispersion, _QNBFIT_SQL, False)


# =============================================================================
# Wave 26 — Shapley attribution, scaled forecast error, supplier scorecard,
# DAU/WAU stickiness, newsvendor stocking
# =============================================================================

# --- events_shapley_attribution -------------------------------------------------

def q_events_shapley_attribution(spark, sf_dir):
    """Exact Shapley-value attribution over the three exposure channels
    (view, click, signup) with purchase as conversion: coalition value
    v(S) = conversion rate of users whose exposure set is exactly S
    (empty coalitions contribute 0), and the 3-player Shapley weights
    1/3, 1/6, 1/3 by coalition size — the principled upgrade over
    last-touch attribution.  All v(S) are integer ratios; the Shapley
    sum is 8 terms.

    Scale shape: one user aggregation, one 8-row coalition table pivoted
    to scalars, a constant-size finish."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.max(F.when(F.col("event_type") == "view", 1)
                        .otherwise(0)).alias("hv"),
                  F.max(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).alias("hc"),
                  F.max(F.when(F.col("event_type") == "signup", 1)
                        .otherwise(0)).alias("hs"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("b")))
    co = (users.groupBy("hv", "hc", "hs")
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum("b").cast("long").alias("nb")))

    def v(hv, hc, hs):
        m = (F.col("hv") == hv) & (F.col("hc") == hc) & (F.col("hs") == hs)
        return F.coalesce(
            F.max(F.when(m, F.col("nb").cast("double")
                         / F.col("n").cast("double"))), F.lit(0.0))

    piv = co.agg(*[v(a, b_, c).alias(f"v{a}{b_}{c}")
                   for a in (0, 1) for b_ in (0, 1) for c in (0, 1)])

    def phi(ch):
        # ch: 0=view, 1=click, 2=signup; subsets S of the other two
        def key(bits):
            return "v" + "".join(str(b) for b in bits)
        others = [i for i in range(3) if i != ch]
        terms = []
        for s0 in (0, 1):
            for s1 in (0, 1):
                bits_without = [0, 0, 0]
                bits_without[others[0]] = s0
                bits_without[others[1]] = s1
                bits_with = list(bits_without)
                bits_with[ch] = 1
                size = s0 + s1
                wgt = {0: 1.0 / 3.0, 1: 1.0 / 6.0, 2: 1.0 / 3.0}[size]
                terms.append(wgt * (F.col(key(bits_with))
                                    - F.col(key(bits_without))))
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    rows = []
    for i, name in enumerate(["view", "click", "signup"]):
        rows.append(piv.select(F.lit(name).alias("channel"),
                               (F.round(phi(i), 6) + F.lit(0.0))
                               .alias("shapley")))
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return out.orderBy("channel")


def _shapley_sql() -> str:
    vs = {}
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                vs[(a, b, c)] = (
                    f"COALESCE(MAX(CASE WHEN hv = {a} AND hc = {b} "
                    f"AND hs = {c} THEN CAST(nb AS DOUBLE) "
                    f"/ CAST(n AS DOUBLE) END), 0.0)")

    def phi(ch):
        others = [i for i in range(3) if i != ch]
        terms = []
        for s0 in (0, 1):
            for s1 in (0, 1):
                wo = [0, 0, 0]
                wo[others[0]] = s0
                wo[others[1]] = s1
                wi = list(wo)
                wi[ch] = 1
                wgt = {0: "1.0/3.0", 1: "1.0/6.0", 2: "1.0/3.0"}[s0 + s1]
                terms.append(f"{wgt} * (({vs[tuple(wi)]}) "
                             f"- ({vs[tuple(wo)]}))")
        return " + ".join(terms)

    chans = ["view", "click", "signup"]
    sels = [f"SELECT '{name}' AS channel, "
            f"ROUND({phi(i)}, 6) + 0.0 AS shapley FROM co"
            for i, name in enumerate(chans)]
    return """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
), co AS MATERIALIZED (
  SELECT hv, hc, hs, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(b) AS BIGINT) AS nb
  FROM users GROUP BY hv, hc, hs
)
""" + "\nUNION ALL\n".join(sels) + "\nORDER BY channel"


R8B_QUERIES["events_shapley_attribution"] = (
    q_events_shapley_attribution, _shapley_sql(), False)


# --- orders_backtest_mase -----------------------------------------------------

def q_orders_backtest_mase(spark, sf_dir):
    """Mean absolute scaled error of the seasonal-naive 3-lag forecast:
    MAE of the forecast divided by the MAE of the plain 7-day naive on
    the same days — MASE < 1 means the forecast beats the naive it is
    built from.  Inputs are ROUND-6 daily revenues (the forecast-tier
    convention), errors in thousands.

    Scale shape: the same day-level joins as the forecast query, one
    scalar finish."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd")
                            .alias("day"))
             .agg(F.round(F.sum("o_totalprice"), 6).alias("rev")))
    l7 = daily.select(F.col("day").alias("d7"), F.col("rev").alias("r7"))
    l14 = daily.select(F.col("day").alias("d14"), F.col("rev").alias("r14"))
    l21 = daily.select(F.col("day").alias("d21"), F.col("rev").alias("r21"))
    dd = F.to_date("day")
    j = (daily
         .join(l7, F.date_format(F.date_sub(dd, 7), "yyyy-MM-dd")
               == F.col("d7"))
         .join(l14, F.date_format(F.date_sub(dd, 14), "yyyy-MM-dd")
               == F.col("d14"))
         .join(l21, F.date_format(F.date_sub(dd, 21), "yyyy-MM-dd")
               == F.col("d21")))
    fc = (F.col("r7") + F.col("r14") + F.col("r21")) / F.lit(3.0)
    agg = j.agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum(F.abs(F.col("rev") - fc)).alias("sae_fc"),
                F.sum(F.abs(F.col("rev") - F.col("r7"))).alias("sae_nv"))
    return agg.select(
        "n_days",
        F.round(F.col("sae_fc") / F.col("n_days").cast("double") / 1e3, 6)
        .alias("mae_forecast_k"),
        F.round(F.col("sae_nv") / F.col("n_days").cast("double") / 1e3, 6)
        .alias("mae_naive_k"),
        F.round(F.col("sae_fc") / F.col("sae_nv"), 6).alias("mase"))


_QMASE_SQL = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1
), j AS (
  SELECT d.rev, l7.rev AS r7,
         (l7.rev + l14.rev + l21.rev) / 3.0 AS fc
  FROM daily d
  JOIN daily l7
    ON strftime(CAST(d.day AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d') = l7.day
  JOIN daily l14
    ON strftime(CAST(d.day AS DATE) - INTERVAL 14 DAY, '%Y-%m-%d')
       = l14.day
  JOIN daily l21
    ON strftime(CAST(d.day AS DATE) - INTERVAL 21 DAY, '%Y-%m-%d')
       = l21.day
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(abs(rev - fc)) AS sae_fc,
         SUM(abs(rev - r7)) AS sae_nv
  FROM j
)
SELECT n_days,
       ROUND(sae_fc / CAST(n_days AS DOUBLE) / 1e3, 6) AS mae_forecast_k,
       ROUND(sae_nv / CAST(n_days AS DOUBLE) / 1e3, 6) AS mae_naive_k,
       ROUND(sae_fc / sae_nv, 6) AS mase
FROM agg
"""

R8B_QUERIES["orders_backtest_mase"] = (
    q_orders_backtest_mase, _QMASE_SQL, False)


# --- supplier_scorecard -------------------------------------------------------

def q_supplier_scorecard(spark, sf_dir):
    """Composite supplier scorecard: per-supplier volume (total
    quantity), breadth (distinct parts) and value (total extended price
    in exact cents) are z-scored against the supplier population
    (moments from exact integer sums) and averaged into one composite —
    the vendor-ranking table a procurement review reads.  Top-10.

    Scale shape: one supplier aggregation, one 4-number moment pass per
    metric broadcast back, one top-k window."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (li.groupBy("l_suppkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
                .alias("vol"),
                F.countDistinct("l_partkey").cast("long").alias("brd"),
                F.sum(F.round(F.col("l_extendedprice") * 100)
                      .cast("long")).cast("long").alias("val")))
    mom = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("vol").cast("long").alias("s_vol"),
        F.sum(F.col("vol") * F.col("vol")).cast("long").alias("q_vol"),
        F.sum("brd").cast("long").alias("s_brd"),
        F.sum(F.col("brd") * F.col("brd")).cast("long").alias("q_brd"),
        F.sum(F.col("val") / 1e6).alias("s_val"),
        F.sum((F.col("val") / 1e6) * (F.col("val") / 1e6)).alias("q_val"))
    j = per.crossJoin(F.broadcast(mom))
    kD = F.col("k").cast("double")

    def z(x, s, q):
        m = s / kD
        sd = F.sqrt((q - s * s / kD) / (kD - 1.0))
        return (x - m) / sd

    zv = z(F.col("vol").cast("double"), F.col("s_vol").cast("double"),
           F.col("q_vol").cast("double"))
    zb = z(F.col("brd").cast("double"), F.col("s_brd").cast("double"),
           F.col("q_brd").cast("double"))
    zl = z(F.col("val") / 1e6, F.col("s_val"), F.col("q_val"))
    comp = (zv + zb + zl) / 3.0
    w = Window.orderBy(F.round(comp, 6).desc(), F.col("l_suppkey").asc())
    return (j.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 10)
            .select("rank", F.col("l_suppkey").alias("suppkey"),
                    F.col("vol").alias("volume"),
                    F.col("brd").alias("breadth"),
                    F.round(F.col("val") / 1e6, 6).alias("value_10k"),
                    F.round(comp, 6).alias("composite"))
            .orderBy("rank"))


_QSCORE_SQL = """
WITH per AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS brd,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS val
  FROM lineitem GROUP BY l_suppkey
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(vol) AS BIGINT) AS s_vol,
         CAST(SUM(vol * vol) AS BIGINT) AS q_vol,
         CAST(SUM(brd) AS BIGINT) AS s_brd,
         CAST(SUM(brd * brd) AS BIGINT) AS q_brd,
         SUM(val / 1e6) AS s_val,
         SUM((val / 1e6) * (val / 1e6)) AS q_val
  FROM per
), j AS (
  SELECT l_suppkey, vol, brd, val,
         ((CAST(vol AS DOUBLE) - CAST(s_vol AS DOUBLE)
           / CAST(k AS DOUBLE))
          / sqrt((CAST(q_vol AS DOUBLE) - CAST(s_vol AS DOUBLE)
                  * CAST(s_vol AS DOUBLE) / CAST(k AS DOUBLE))
                 / (CAST(k AS DOUBLE) - 1.0))
          + (CAST(brd AS DOUBLE) - CAST(s_brd AS DOUBLE)
             / CAST(k AS DOUBLE))
            / sqrt((CAST(q_brd AS DOUBLE) - CAST(s_brd AS DOUBLE)
                    * CAST(s_brd AS DOUBLE) / CAST(k AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1.0))
          + (val / 1e6 - s_val / CAST(k AS DOUBLE))
            / sqrt((q_val - s_val * s_val / CAST(k AS DOUBLE))
                   / (CAST(k AS DOUBLE) - 1.0))) / 3.0 AS comp
  FROM per CROSS JOIN mom
)
SELECT CAST(rank AS INT) AS rank, l_suppkey AS suppkey, vol AS volume,
       brd AS breadth, ROUND(val / 1e6, 6) AS value_10k,
       ROUND(comp, 6) AS composite
FROM (SELECT *, row_number() OVER (ORDER BY ROUND(comp, 6) DESC,
                                   l_suppkey ASC) AS rank
      FROM j)
WHERE rank <= 10
ORDER BY rank
"""

R8B_QUERIES["supplier_scorecard"] = (q_supplier_scorecard, _QSCORE_SQL, False)


# --- events_dau_wau_stickiness --------------------------------------------------

def q_events_dau_wau_stickiness(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day — the canonical
    product-engagement ratio (DAU/WAU ~ how many weekly actives show up
    on a given day).  WAU counts DISTINCT users over the trailing
    window via a day-grid range join on the distinct (user, day)
    projection; only days with a full 7-day history report.  Integer-
    exact.

    Scale shape: the distinct projection is the data-sized step; the
    trailing-distinct join runs on (days x 7) x users-per-day — the
    standard engagement-rollup shape (a sketch swaps in at extreme
    user counts)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = (ud.groupBy("day")
           .agg(F.count(F.lit(1)).cast("long").alias("dau")))
    days = dau.select("day")
    first = days.agg(F.min("day").alias("d0"))
    grid = (days.crossJoin(F.broadcast(first))
            .filter(F.datediff(F.col("day"), F.col("d0")) >= 6)
            .select(F.col("day").alias("anchor")))
    wau = (grid.join(ud,
                     (ud.day <= F.col("anchor"))
                     & (ud.day >= F.date_sub(F.col("anchor"), 6)))
           .groupBy("anchor")
           .agg(F.countDistinct("user_id").cast("long").alias("wau")))
    return (wau.join(dau, wau.anchor == dau.day)
            .select(F.col("anchor").cast("string").alias("day"),
                    "dau", "wau",
                    F.round(F.col("dau").cast("double")
                            / F.col("wau").cast("double"), 6)
                    .alias("stickiness"))
            .orderBy("day"))


_QDAU_SQL = """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
), grid AS (
  SELECT day AS anchor FROM dau
  WHERE day >= (SELECT MIN(day) FROM dau) + INTERVAL 6 DAY
), wau AS (
  SELECT g.anchor, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
  FROM grid g JOIN ud
    ON ud.day <= g.anchor AND ud.day >= g.anchor - INTERVAL 6 DAY
  GROUP BY g.anchor
)
SELECT CAST(w.anchor AS VARCHAR) AS day, d.dau, w.wau,
       ROUND(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6)
         AS stickiness
FROM wau w JOIN dau d ON d.day = w.anchor
ORDER BY day
"""

R8B_QUERIES["events_dau_wau_stickiness"] = (
    q_events_dau_wau_stickiness, _QDAU_SQL, False)


# --- brand_newsvendor_stock ---------------------------------------------------

def q_brand_newsvendor_stock(spark, sf_dir):
    """Newsvendor stocking per brand: with underage cost 4 and overage
    cost 1 the critical fractile is 0.8, so the optimal per-order stock
    is the smallest quantity q with F(q) >= 0.8 over the brand's
    per-line demand distribution — a pure rank selection on the integer
    quantity histogram (threshold ceil(4n/5), no quantile
    interpolation).  Completes the inventory tier next to EOQ and
    ABC-XYZ.

    Scale shape: one (brand, quantity) aggregation, one prefix-sum
    window over the brand x 50-quantity histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    q = (li.join(pt, li.l_partkey == pt.p_partkey)
         .groupBy("p_brand",
                  F.col("l_quantity").cast("long").alias("qty"))
         .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = (Window.partitionBy("p_brand").orderBy("qty")
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = (q.groupBy("p_brand")
           .agg(F.sum("c").cast("long").alias("n")))
    cum = (q.withColumn("cum", F.sum("c").over(w).cast("long"))
           .join(F.broadcast(tot), "p_brand")
           .withColumn("thr", F.ceil(F.col("n") * 4 / F.lit(5.0))
                       .cast("long")))
    pick = (cum.filter(F.col("cum") >= F.col("thr"))
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("p_brand").orderBy("qty")))
            .filter(F.col("rk") == 1))
    return (pick.select(F.col("p_brand").alias("brand"),
                        F.col("n").alias("n_lines"),
                        F.col("qty").alias("q_star"),
                        F.round(F.col("cum").cast("double")
                                / F.col("n").cast("double"), 6)
                        .alias("service_level"))
            .orderBy("brand"))


_QNEWSV_SQL = """
WITH q AS (
  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), tot AS (
  SELECT p_brand, CAST(SUM(c) AS BIGINT) AS n FROM q GROUP BY p_brand
), cum AS (
  SELECT q.p_brand, q.qty,
         CAST(SUM(q.c) OVER (PARTITION BY q.p_brand ORDER BY q.qty
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum,
         tot.n,
         CAST(CEIL(tot.n * 4 / 5.0) AS BIGINT) AS thr
  FROM q JOIN tot USING (p_brand)
)
SELECT p_brand AS brand, n AS n_lines, qty AS q_star,
       ROUND(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS service_level
FROM (SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY qty)
          AS rk
      FROM cum WHERE cum >= thr)
WHERE rk = 1
ORDER BY brand
"""

R8B_QUERIES["brand_newsvendor_stock"] = (
    q_brand_newsvendor_stock, _QNEWSV_SQL, False)


# --- embedding_label_silhouette -------------------------------------------------

def q_embedding_label_silhouette(spark, sf_dir):
    """Centroid-based (medoid-style) silhouette of the embedding label
    clustering: a_i = cosine distance to the own-label centroid, b_i =
    the minimum distance to any other centroid, s_i = (b-a)/max(a,b);
    per-label mean silhouette — the cluster-quality score that says
    whether the labels are separable in embedding space at all.
    Centroid components ROUNDed at 9 (the cross-engine aggregation
    convention); the b_i argmin runs over the 10-row centroid table.

    Scale shape: centroids via one (label, dim) aggregation; scoring
    broadcasts the centroid table — two corpus scans total, never an
    all-pairs silhouette."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda v: v.cast("double")).alias("vec"))
    comps = base.select("label", F.posexplode("vec").alias("dim", "val"))
    cent = (comps.groupBy("label", "dim")
            .agg(F.round(F.avg("val"), 9).alias("cv")))
    carr = (cent.groupBy(F.col("label").alias("c_label"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda s: s["cv"]).alias("cvec")))
    scored = (base.crossJoin(F.broadcast(carr))
              .withColumn("dist", 1.0 - _cos(F.col("vec"), F.col("cvec"))))
    own = (scored.filter(F.col("label") == F.col("c_label"))
           .select("vec_id", "label", F.col("dist").alias("a")))
    other = (scored.filter(F.col("label") != F.col("c_label"))
             .groupBy("vec_id").agg(F.min("dist").alias("b")))
    s = (own.join(other, "vec_id")
         .withColumn("s", (F.col("b") - F.col("a"))
                     / F.greatest(F.col("a"), F.col("b"))))
    return (s.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.avg("a"), 6).alias("mean_intra"),
                 F.round(F.avg("b"), 6).alias("mean_nearest_other"),
                 F.round(F.avg("s"), 6).alias("silhouette"))
            .select(F.col("label").cast("long").alias("label"), "n",
                    "mean_intra", "mean_nearest_other", "silhouette")
            .orderBy("label"))


_QSIL_SQL = """
WITH base AS MATERIALIZED (
  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
), comps AS (
  SELECT label, unnest(range(1, len(vec) + 1)) AS dim, unnest(vec) AS val
  FROM base
), cent AS (
  SELECT label, dim, ROUND(AVG(val), 9) AS cv
  FROM comps GROUP BY label, dim
), carr AS MATERIALIZED (
  SELECT label AS c_label, list(cv ORDER BY dim) AS cvec
  FROM cent GROUP BY label
), scored AS MATERIALIZED (
  SELECT b.vec_id, b.label, c.c_label,
         1.0 - list_cosine_similarity(b.vec, c.cvec) AS dist
  FROM base b CROSS JOIN carr c
), own AS (
  SELECT vec_id, label, dist AS a FROM scored WHERE label = c_label
), other AS (
  SELECT vec_id, MIN(dist) AS b FROM scored WHERE label <> c_label
  GROUP BY vec_id
)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(a), 6) AS mean_intra,
       ROUND(AVG(b), 6) AS mean_nearest_other,
       ROUND(AVG((b - a) / greatest(a, b)), 6) AS silhouette
FROM own JOIN other USING (vec_id)
GROUP BY label
ORDER BY label
"""

R8B_QUERIES["embedding_label_silhouette"] = (
    q_embedding_label_silhouette, _QSIL_SQL, False)


# =============================================================================
# Wave 27 — causal inference (IPW, ITS), probabilistic calibration,
# extreme-value fitting, ranking-metric evaluation
# =============================================================================

# --- events_ipw_ate -----------------------------------------------------------

def q_events_ipw_ate(spark, sf_dir):
    """Inverse-propensity-weighted average treatment effect of clicking
    on purchasing: propensity e(x) = P(click | engagement segment)
    (exact integer ratios over rank-arithmetic quartiles), ATE_ipw =
    mean(t*y/e) - mean((1-t)*y/(1-e)) — the causal estimator that
    corrects the naive uplift for engagement confounding.  Every term
    is a ratio of exact counts.

    Scale shape: one user aggregation, one rank window, two segment-
    keyed finishes."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).alias("t"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")))
    n = users.count()
    w = Window.orderBy(F.col("n_ev").desc(), F.col("user_id").asc())
    seg = (users.withColumn("rk", F.row_number().over(w))
           .withColumn("segment", F.floor((F.col("rk") - 1) * 4
                                          / F.lit(n)).cast("long")))
    prop = (seg.groupBy("segment")
            .agg(F.count(F.lit(1)).cast("long").alias("ns"),
                 F.sum("t").cast("long").alias("nt"),
                 F.sum(F.col("t") * F.col("y")).cast("long").alias("nty"),
                 F.sum((1 - F.col("t")) * F.col("y")).cast("long")
                 .alias("ncy")))
    # sum over users of t*y/e = nty * ns/nt; of (1-t)*y/(1-e) = ncy*ns/(ns-nt)
    # zero-overlap segments (everyone/no one clicked) contribute 0 —
    # the standard positivity-violation convention, mirrored in the oracle
    contrib = prop.select(
        "ns", "nt",
        F.when(F.col("nt") > 0,
               F.col("nty").cast("double") * F.col("ns").cast("double")
               / F.col("nt").cast("double")).otherwise(0.0).alias("s_t"),
        F.when(F.col("ns") > F.col("nt"),
               F.col("ncy").cast("double") * F.col("ns").cast("double")
               / (F.col("ns") - F.col("nt")).cast("double"))
        .otherwise(0.0).alias("s_c"))
    agg = contrib.agg(F.sum("ns").cast("long").alias("n"),
                      F.sum("s_t").alias("st"), F.sum("s_c").alias("sc"))
    return agg.select(
        F.col("n").alias("n_users"),
        F.round(F.col("st") / F.col("n").cast("double"), 6)
        .alias("mean_outcome_treated_ipw"),
        F.round(F.col("sc") / F.col("n").cast("double"), 6)
        .alias("mean_outcome_control_ipw"),
        F.round((F.col("st") - F.col("sc")) / F.col("n").cast("double"), 6)
        .alias("ate_ipw"))


_QIPW_SQL = """
WITH users AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), seg AS (
  SELECT t, y,
         CAST(FLOOR((row_number() OVER (ORDER BY n_ev DESC, user_id ASC)
                     - 1) * 4 / (SELECT COUNT(*) FROM users)) AS BIGINT)
           AS segment
  FROM users
), prop AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS ns,
         CAST(SUM(t) AS BIGINT) AS nt,
         CAST(SUM(t * y) AS BIGINT) AS nty,
         CAST(SUM((1 - t) * y) AS BIGINT) AS ncy
  FROM seg GROUP BY segment
), agg AS (
  SELECT CAST(SUM(ns) AS BIGINT) AS n,
         SUM(CASE WHEN nt > 0
                  THEN CAST(nty AS DOUBLE) * CAST(ns AS DOUBLE)
                       / CAST(nt AS DOUBLE) ELSE 0.0 END) AS st,
         SUM(CASE WHEN ns > nt
                  THEN CAST(ncy AS DOUBLE) * CAST(ns AS DOUBLE)
                       / CAST(ns - nt AS DOUBLE) ELSE 0.0 END) AS sc
  FROM prop
)
SELECT n AS n_users,
       ROUND(st / CAST(n AS DOUBLE), 6) AS mean_outcome_treated_ipw,
       ROUND(sc / CAST(n AS DOUBLE), 6) AS mean_outcome_control_ipw,
       ROUND((st - sc) / CAST(n AS DOUBLE), 6) AS ate_ipw
FROM agg
"""

R8B_QUERIES["events_ipw_ate"] = (q_events_ipw_ate, _QIPW_SQL, False)


# --- events_purchase_brier ------------------------------------------------------

def q_events_purchase_brier(spark, sf_dir):
    """Brier score of the segment-rate purchase model: predict
    p_hat(segment) = purchase rate of the user's engagement segment,
    Brier = mean over users of (p_hat - y)^2 — expanded exactly as
    (ns*p^2 - 2*p*nb + nb)/N per segment, so the score is a
    deterministic rational.  The calibration read on the simplest
    possible model (and the baseline any fancier model must beat).

    Scale shape: one user aggregation, one 4-row finish."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")))
    n = users.count()
    w = Window.orderBy(F.col("n_ev").desc(), F.col("user_id").asc())
    seg = (users.withColumn("rk", F.row_number().over(w))
           .withColumn("segment", F.floor((F.col("rk") - 1) * 4
                                          / F.lit(n)).cast("long")))
    per = (seg.groupBy("segment")
           .agg(F.count(F.lit(1)).cast("long").alias("ns"),
                F.sum("y").cast("long").alias("nb")))
    p = F.col("nb").cast("double") / F.col("ns").cast("double")
    contrib = per.select(
        "ns", (F.col("ns").cast("double") * p * p
               - 2.0 * p * F.col("nb").cast("double")
               + F.col("nb").cast("double")).alias("bsum"))
    agg = contrib.agg(F.sum("ns").cast("long").alias("n"),
                      F.sum("bsum").alias("b"))
    return agg.select(
        F.col("n").alias("n_users"),
        F.round(F.col("b") / F.col("n").cast("double"), 6)
        .alias("brier"))


_QBRIER_SQL = """
WITH users AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), seg AS (
  SELECT y,
         CAST(FLOOR((row_number() OVER (ORDER BY n_ev DESC, user_id ASC)
                     - 1) * 4 / (SELECT COUNT(*) FROM users)) AS BIGINT)
           AS segment
  FROM users
), per AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS ns,
         CAST(SUM(y) AS BIGINT) AS nb
  FROM seg GROUP BY segment
), agg AS (
  SELECT CAST(SUM(ns) AS BIGINT) AS n,
         SUM(CAST(ns AS DOUBLE)
               * (CAST(nb AS DOUBLE) / CAST(ns AS DOUBLE))
               * (CAST(nb AS DOUBLE) / CAST(ns AS DOUBLE))
             - 2.0 * (CAST(nb AS DOUBLE) / CAST(ns AS DOUBLE))
               * CAST(nb AS DOUBLE)
             + CAST(nb AS DOUBLE)) AS b
  FROM per
)
SELECT n AS n_users, ROUND(b / CAST(n AS DOUBLE), 6) AS brier
FROM agg
"""

R8B_QUERIES["events_purchase_brier"] = (
    q_events_purchase_brier, _QBRIER_SQL, False)


# --- events_gumbel_daily_max ----------------------------------------------------

def q_events_gumbel_daily_max(spark, sf_dir):
    """Gumbel (EV-I) method-of-moments fit of the daily MAXIMUM event
    value: scale beta = s*sqrt(6)/pi, location mu = mean - gamma*beta
    (Euler-Mascheroni 0.5772156649015329), plus the implied 30-day
    return level mu - beta*ln(-ln(1 - 1/30)) — extreme-value theory for
    capacity planning.  Daily maxima are exact (MAX of doubles); the
    moments sum ~30 small terms.

    Scale shape: one day aggregation, one scalar finish."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.round(F.max("value"), 6).alias("mx")))
    agg = days.agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.sum("mx").alias("s1"),
                   F.sum(F.col("mx") * F.col("mx")).alias("s2"))
    nD = F.col("n").cast("double")
    m = F.col("s1") / nD
    sd = F.sqrt((nD * F.col("s2") - F.col("s1") * F.col("s1"))
                / (nD * (nD - 1.0)))
    beta = sd * 0.7796968012336093  # sqrt(6)/pi
    mu = m - 0.5772156649015329 * beta
    rl30 = mu - beta * -3.3842944934992527  # ln(-ln(29/30)), shared literal
    return agg.select(
        F.col("n").alias("n_days"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(rl30, 6).alias("return_level_30d"))


_QGUMBEL_SQL = """
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, ROUND(MAX(value), 6) AS mx
  FROM events GROUP BY 1
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(mx) AS s1,
         SUM(mx * mx) AS s2
  FROM days
)
SELECT n AS n_days,
       ROUND(s1 / CAST(n AS DOUBLE)
             - 0.5772156649015329
               * (sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  * 0.7796968012336093), 6) AS gumbel_mu,
       ROUND(sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             * 0.7796968012336093, 6) AS gumbel_beta,
       ROUND(s1 / CAST(n AS DOUBLE)
             - 0.5772156649015329
               * (sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  * 0.7796968012336093)
             - (sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                * 0.7796968012336093)
               * (-3.3842944934992527), 6) AS return_level_30d
FROM agg
"""

R8B_QUERIES["events_gumbel_daily_max"] = (
    q_events_gumbel_daily_max, _QGUMBEL_SQL, False)


# --- orders_interrupted_ts ------------------------------------------------------

def q_orders_interrupted_ts(spark, sf_dir):
    """Interrupted time-series read on daily revenue: split the day
    series at its midpoint (t0 = floor(n/2), a deterministic
    "intervention"), fit independent OLS lines pre and post (closed-form
    from exact-rational sums over ROUND-6 daily revenues), and report
    the slope change and the level jump at t0 (post-intercept prediction
    minus the pre-line extrapolation) — the segmented-regression causal
    read.

    Scale shape: one day aggregation, two 5-sum OLS finishes."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg((F.round(F.sum("o_totalprice"), 6) / 1e3).alias("y")))
    w = Window.orderBy("day")
    idx = daily.withColumn("t", F.row_number().over(w).cast("long") - 1)
    n = idx.count()
    t0 = n // 2
    seg = idx.withColumn("post", (F.col("t") >= t0).cast("int"))
    ols = (seg.groupBy("post")
           .agg(F.count(F.lit(1)).cast("long").alias("k"),
                F.sum(F.col("t").cast("double")).alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("t").cast("double")
                      * F.col("t").cast("double")).alias("sxx"),
                F.sum(F.col("t").cast("double") * F.col("y")).alias("sxy")))
    kD = F.col("k").cast("double")
    slope = (kD * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (kD * F.col("sxx") - F.col("sx") * F.col("sx"))
    icept = (F.col("sy") - slope * F.col("sx")) / kD
    lines = ols.select("post", slope.alias("b1"), icept.alias("b0"))
    pre = lines.filter(F.col("post") == 0).select(
        F.col("b0").alias("b0_pre"), F.col("b1").alias("b1_pre"))
    post = lines.filter(F.col("post") == 1).select(
        F.col("b0").alias("b0_post"), F.col("b1").alias("b1_post"))
    t0d = float(t0)
    return (pre.crossJoin(post)
            .select(F.lit(n).cast("long").alias("n_days"),
                    F.lit(t0).cast("long").alias("t0"),
                    F.round("b1_pre", 6).alias("slope_pre_k"),
                    F.round("b1_post", 6).alias("slope_post_k"),
                    F.round(F.col("b1_post") - F.col("b1_pre"), 6)
                    .alias("slope_change_k"),
                    F.round((F.col("b0_post") + F.col("b1_post") * t0d)
                            - (F.col("b0_pre") + F.col("b1_pre") * t0d), 6)
                    .alias("level_change_k")))


def _its_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         ROUND(SUM(o_totalprice), 6) / 1e3 AS y
  FROM orders GROUP BY 1
), idx AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1 AS t, y
  FROM daily
), nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) // 2 AS BIGINT) AS t0
  FROM idx
), ols AS (
  SELECT CASE WHEN t >= nn.t0 THEN 1 ELSE 0 END AS post,
         CAST(COUNT(*) AS BIGINT) AS k,
         SUM(CAST(t AS DOUBLE)) AS sx, SUM(y) AS sy,
         SUM(CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS sxx,
         SUM(CAST(t AS DOUBLE) * y) AS sxy
  FROM idx CROSS JOIN nn
  GROUP BY 1
), lines AS (
  SELECT post,
         (CAST(k AS DOUBLE) * sxy - sx * sy)
           / (CAST(k AS DOUBLE) * sxx - sx * sx) AS b1,
         (sy - ((CAST(k AS DOUBLE) * sxy - sx * sy)
                / (CAST(k AS DOUBLE) * sxx - sx * sx)) * sx)
           / CAST(k AS DOUBLE) AS b0
  FROM ols
)
SELECT nn.n AS n_days, nn.t0,
       ROUND(pre.b1, 6) AS slope_pre_k,
       ROUND(post.b1, 6) AS slope_post_k,
       ROUND(post.b1 - pre.b1, 6) AS slope_change_k,
       ROUND((post.b0 + post.b1 * CAST(nn.t0 AS DOUBLE))
             - (pre.b0 + pre.b1 * CAST(nn.t0 AS DOUBLE)), 6)
         AS level_change_k
FROM (SELECT * FROM lines WHERE post = 0) pre
CROSS JOIN (SELECT * FROM lines WHERE post = 1) post
CROSS JOIN nn
"""


R8B_QUERIES["orders_interrupted_ts"] = (
    q_orders_interrupted_ts, _its_sql(), False)


# --- alsobought_ndcg_eval -------------------------------------------------------

def q_alsobought_ndcg_eval(spark, sf_dir):
    """Temporal NDCG@5 evaluation of the also-bought recommender: top-5
    co-purchase recommendations per part are built on 1996 baskets only
    (count DESC, partkey ASC ties) and scored against held-out 1997
    baskets — for every (1997 basket, seed part) pair, DCG of the
    recommendations that appear in the same basket over the ideal DCG
    for that basket's hit count.  Pairs with zero relevant items are
    skipped (NDCG undefined).  Discount weights 1/log2(r+1) are shared
    literals.

    Scale shape: the co-purchase build is one basket self-join keyed on
    the order; evaluation joins the 5-row-per-part recommendation table
    into the held-out baskets — everything keyed, no cross join."""
    import math

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr"))
    # the year-stamped basket rows feed the train split (self-joined —
    # one execution via ReusedExchange) AND the test split (a second
    # execution of the join).  Deliberately left redundant — r13
    # materialization A/B: cache() +88% at sf0.1 (see
    # q_lineitem_robust_stats for the full numbers).
    lo = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .select("l_orderkey", "l_partkey", "yr").distinct())
    train = lo.filter(F.col("yr") == 1996)
    test = lo.filter(F.col("yr") == 1997)
    a = train.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("pa"))
    b = train.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("pb"))
    co = (a.join(b, "ok").filter(F.col("pa") != F.col("pb"))
          .groupBy("pa", "pb").agg(F.count(F.lit(1)).cast("long")
                                   .alias("c")))
    wr = Window.partitionBy("pa").orderBy(F.col("c").desc(),
                                          F.col("pb").asc())
    recs = (co.withColumn("r", F.row_number().over(wr).cast("int"))
            .filter(F.col("r") <= 5).select("pa", "pb", "r"))
    disc = {r: 1.0 / math.log2(r + 1) for r in range(1, 6)}
    idcg = {h: sum(disc[r] for r in range(1, h + 1)) for h in range(1, 6)}
    seeds = test.select(F.col("l_orderkey").alias("ok"),
                        F.col("l_partkey").alias("pa"))
    members = test.select(F.col("l_orderkey").alias("ok"),
                          F.col("l_partkey").alias("pb"))
    hits = (seeds.join(recs, "pa")
            .join(members, ["ok", "pb"], "left_semi"))
    disc_col = F.element_at(
        F.array(*[F.lit(disc[r]) for r in range(1, 6)]), F.col("r"))
    per_pair = (hits.groupBy("ok", "pa")
                .agg(F.sum(disc_col).alias("dcg"),
                     F.count(F.lit(1)).cast("int").alias("h")))
    idcg_col = F.element_at(
        F.array(*[F.lit(idcg[h]) for h in range(1, 6)]),
        F.least(F.col("h"), F.lit(5)))
    scored = per_pair.select((F.col("dcg") / idcg_col).alias("ndcg"))
    return (scored.agg(F.count(F.lit(1)).cast("long")
                       .alias("n_eval_pairs"),
                       F.round(F.avg("ndcg"), 6).alias("mean_ndcg")))


def _ndcg_sql() -> str:
    import math
    disc = {r: 1.0 / math.log2(r + 1) for r in range(1, 6)}
    idcg = {h: sum(disc[r] for r in range(1, h + 1)) for h in range(1, 6)}
    disc_case = " ".join(f"WHEN r = {r} THEN {disc[r]!r}"
                         for r in range(1, 6))
    idcg_case = " ".join(f"WHEN least(h, 5) = {h} THEN {idcg[h]!r}"
                         for h in range(1, 6))
    return f"""
WITH lo AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, l.l_partkey, year(o.o_orderdate) AS yr
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), train AS (SELECT * FROM lo WHERE yr = 1996),
test AS MATERIALIZED (SELECT * FROM lo WHERE yr = 1997),
co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM train a JOIN train b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
), recs AS MATERIALIZED (
  SELECT pa, pb, CAST(r AS INT) AS r
  FROM (SELECT pa, pb,
               row_number() OVER (PARTITION BY pa
                   ORDER BY c DESC, pb ASC) AS r
        FROM co)
  WHERE r <= 5
), hits AS (
  SELECT s.l_orderkey AS ok, s.l_partkey AS pa, rc.r
  FROM test s JOIN recs rc ON rc.pa = s.l_partkey
  WHERE EXISTS (SELECT 1 FROM test m
                WHERE m.l_orderkey = s.l_orderkey
                  AND m.l_partkey = rc.pb)
), per_pair AS (
  SELECT ok, pa,
         SUM(CASE {disc_case} END) AS dcg,
         CAST(COUNT(*) AS INT) AS h
  FROM hits GROUP BY ok, pa
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_pairs,
       ROUND(AVG(dcg / (CASE {idcg_case} END)), 6) AS mean_ndcg
FROM per_pair
"""


R8B_QUERIES["alsobought_ndcg_eval"] = (
    q_alsobought_ndcg_eval, _ndcg_sql(), False)


# =============================================================================
# Wave 28 — sketch bias audit, matched-pair causal estimate, rich-club
# topology, diversity drift, seasonality strength
# =============================================================================

# --- simhash_bit_balance --------------------------------------------------------

from .sql_shared import simhash_sql as _simhash_core_sql
from ..pipeline import text as _text_mod


def q_simhash_bit_balance(spark, sf_dir):
    """Bit-balance audit of the 60-bit corpus simhash: per bit, the
    ones-rate across all documents and its deviation from 0.5 — a
    biased bit weakens hamming-distance discrimination, so this is the
    health check an LSH deployment runs on its own sketch.  Integer
    counts only.

    Scale shape: one simhash pass (whole-stage codegen), a 60-row bit
    grid broadcast in, one (bit)-keyed aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(_text_mod.simhash(F.col("text"), bits=60)
                     .alias("simhash"))
    bits = spark.range(0, 60).select(F.col("id").cast("int").alias("bit"))
    g = (sh.crossJoin(F.broadcast(bits))
         .select("bit",
                 F.expr("CAST(shiftrightunsigned(simhash, bit) & 1 "
                        "AS BIGINT)").alias("one")))
    agg = (g.groupBy("bit")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("one").cast("long").alias("n_ones")))
    rate = F.col("n_ones").cast("double") / F.col("n").cast("double")
    return (agg.select("bit", "n_ones",
                       F.round(rate, 6).alias("ones_rate"),
                       F.round(F.abs(rate - 0.5), 6).alias("bias"))
            .orderBy("bit"))


_QBITBAL_SQL = f"""
WITH sh AS MATERIALIZED ({_simhash_core_sql(60, where="")}),
g AS (
  SELECT b.bit,
         CAST((simhash >> b.bit) & 1 AS BIGINT) AS one
  FROM sh CROSS JOIN (SELECT CAST(unnest(range(0, 60)) AS INT) AS bit) b
)
SELECT bit, CAST(SUM(one) AS BIGINT) AS n_ones,
       ROUND(CAST(SUM(one) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS ones_rate,
       ROUND(abs(CAST(SUM(one) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
                 - 0.5), 6) AS bias
FROM g
GROUP BY bit
ORDER BY bit
"""

R8B_QUERIES["simhash_bit_balance"] = (
    q_simhash_bit_balance, _QBITBAL_SQL, False)


# --- events_caliper_match_att ---------------------------------------------------

def q_events_caliper_match_att(spark, sf_dir):
    """Nearest-neighbor caliper matching (with replacement) for the
    average treatment effect on the treated: each clicking user matches
    the non-clicking user closest in engagement count (|diff| <= 5
    caliper, ties by smaller control id), ATT = mean(y_treated -
    y_matched_control) — causal method #3 next to IPW and the uplift
    table.  Deterministic: the match is an argmin with a total
    tie-break.

    Scale shape: treated x control candidates are banded by the caliper
    (a range join on the engagement count, never a full cross join);
    one window picks each treated user's match."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).alias("t"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")))
    treated = (users.filter(F.col("t") == 1)
               .select(F.col("user_id").alias("tid"),
                       F.col("n_ev").alias("tx"),
                       F.col("y").alias("ty")))
    control = (users.filter(F.col("t") == 0)
               .select(F.col("user_id").alias("cid"),
                       F.col("n_ev").alias("cx"),
                       F.col("y").alias("cy")))
    cand = treated.join(
        control, F.abs(F.col("tx") - F.col("cx")) <= 5)
    w = Window.partitionBy("tid").orderBy(
        F.abs(F.col("tx") - F.col("cx")).asc(), F.col("cid").asc())
    matched = (cand.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1))
    agg = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("ty").cast("long").alias("s_t"),
        F.sum("cy").cast("long").alias("s_c"))
    return agg.select(
        "n_matched",
        F.round(F.col("s_t").cast("double")
                / F.col("n_matched").cast("double"), 6).alias("y_treated"),
        F.round(F.col("s_c").cast("double")
                / F.col("n_matched").cast("double"), 6).alias("y_control"),
        F.round((F.col("s_t") - F.col("s_c")).cast("double")
                / F.col("n_matched").cast("double"), 6).alias("att"))


_QCALIPER_SQL = """
WITH users AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), treated AS (
  SELECT user_id AS tid, n_ev AS tx, y AS ty FROM users WHERE t = 1
), control AS (
  SELECT user_id AS cid, n_ev AS cx, y AS cy FROM users WHERE t = 0
), matched AS (
  SELECT tid, ty, cy
  FROM (SELECT t.tid, t.ty, c.cy,
               row_number() OVER (PARTITION BY t.tid
                   ORDER BY abs(t.tx - c.cx) ASC, c.cid ASC) AS rk
        FROM treated t JOIN control c ON abs(t.tx - c.cx) <= 5)
  WHERE rk = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
       ROUND(CAST(SUM(ty) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS y_treated,
       ROUND(CAST(SUM(cy) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
         AS y_control,
       ROUND(CAST(SUM(ty) - SUM(cy) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS att
FROM matched
"""

R8B_QUERIES["events_caliper_match_att"] = (
    q_events_caliper_match_att, _QCALIPER_SQL, False)


# --- part_rich_club -------------------------------------------------------------

def q_part_rich_club(spark, sf_dir):
    """Rich-club coefficient of the part co-purchase graph (same
    support>=2 edges as the k-core query): among the top-k-degree
    vertices (k in {25, 50, 100}, degree DESC / partkey ASC cut), the
    realized edge density phi(k) = 2*E_club / (k*(k-1)) — do the hub
    parts preferentially co-occur with each other?  Integer-exact.

    Scale shape: one degree table, a broadcast top-k membership
    semi-join per k over the edge list."""
    po = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a = po.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("u"))
    b = po.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("v"))
    edges = (a.join(b, "ok").filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("supp"))
             .filter(F.col("supp") >= 2).select("u", "v"))
    deg = (edges.select(F.col("u").alias("p"))
           .unionAll(edges.select(F.col("v").alias("p")))
           .groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d")))
    wr = Window.orderBy(F.col("d").desc(), F.col("p").asc())
    ranked = deg.withColumn("rk", F.row_number().over(wr))
    ks = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(25), F.lit(50), F.lit(100)),
                     (F.col("id") + 1).cast("int")).cast("long").alias("k"))
    club = (ranked.crossJoin(F.broadcast(ks))
            .filter(F.col("rk") <= F.col("k"))
            .select("k", "p"))
    e_club = (edges
              .join(club.select(F.col("k"), F.col("p").alias("u")),
                    "u")
              .join(club.select(F.col("k").alias("k2"),
                                F.col("p").alias("v")), "v")
              .filter(F.col("k") == F.col("k2"))
              .groupBy("k")
              .agg(F.count(F.lit(1)).cast("long").alias("e_club")))
    return (ks.join(e_club, "k", "left")
            .withColumn("e_club", F.coalesce(F.col("e_club"), F.lit(0)))
            .select(F.col("k"), "e_club",
                    F.round(2.0 * F.col("e_club").cast("double")
                            / (F.col("k") * (F.col("k") - 1))
                            .cast("double"), 6).alias("phi"))
            .orderBy("k"))


_QRICHCLUB_SQL = """
WITH po AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT u, v
  FROM (SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(COUNT(*) AS BIGINT) AS supp
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
  WHERE supp >= 2
), deg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges)
  GROUP BY p
), ranked AS (
  SELECT p, row_number() OVER (ORDER BY d DESC, p ASC) AS rk FROM deg
), ks AS (SELECT CAST(unnest([25, 50, 100]) AS BIGINT) AS k),
club AS MATERIALIZED (
  SELECT ks.k, r.p FROM ranked r CROSS JOIN ks WHERE r.rk <= ks.k
), e_club AS (
  SELECT cu.k, CAST(COUNT(*) AS BIGINT) AS e_club
  FROM edges e
  JOIN club cu ON cu.p = e.u
  JOIN club cv ON cv.p = e.v AND cv.k = cu.k
  GROUP BY cu.k
)
SELECT ks.k, COALESCE(e_club.e_club, 0) AS e_club,
       ROUND(2.0 * COALESCE(e_club.e_club, 0)
             / CAST(ks.k * (ks.k - 1) AS DOUBLE), 6) AS phi
FROM ks LEFT JOIN e_club ON e_club.k = ks.k
ORDER BY ks.k
"""

R8B_QUERIES["part_rich_club"] = (q_part_rich_club, _QRICHCLUB_SQL, False)


# --- events_entropy_trend -------------------------------------------------------

def q_events_entropy_trend(spark, sf_dir):
    """Diversity drift: Shannon entropy of the daily event-type mix,
    plus the OLS slope of entropy over the day index — a shrinking
    entropy means the event stream is collapsing onto fewer types (a
    telemetry regression every pipeline owner wants flagged).  Entropy
    terms are exact-count ratios; the trend is a 5-sum OLS.

    Scale shape: one (day, type) aggregation, one day-level entropy
    fold, one scalar OLS finish; the per-day rows ride along."""
    ev = load_table(spark, sf_dir, "events")
    dt = (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    dtot = dt.groupBy("day").agg(F.sum("c").cast("long").alias("n"))
    ent = (dt.join(dtot, "day")
           .withColumn("p", F.col("c").cast("double")
                       / F.col("n").cast("double"))
           .groupBy("day")
           .agg(F.round(-F.sum(F.col("p") * F.log2("p")), 6)
                .alias("entropy")))
    w = Window.orderBy("day")
    idx = ent.withColumn("t", F.row_number().over(w).cast("long") - 1)
    ols = idx.agg(F.count(F.lit(1)).cast("long").alias("k"),
                  F.sum(F.col("t").cast("double")).alias("sx"),
                  F.sum("entropy").alias("sy"),
                  F.sum(F.col("t").cast("double")
                        * F.col("t").cast("double")).alias("sxx"),
                  F.sum(F.col("t").cast("double") * F.col("entropy"))
                  .alias("sxy"))
    kD = F.col("k").cast("double")
    slope = (kD * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (kD * F.col("sxx") - F.col("sx") * F.col("sx"))
    return ols.select(
        F.col("k").alias("n_days"),
        F.round(F.col("sy") / kD, 6).alias("mean_entropy"),
        F.round(slope * 1e3, 6).alias("entropy_slope_milli"))


_QENTTREND_SQL = """
WITH dt AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), dtot AS (
  SELECT day, CAST(SUM(c) AS BIGINT) AS n FROM dt GROUP BY day
), ent AS (
  SELECT dt.day,
         ROUND(-SUM((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                    * log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6)
           AS entropy
  FROM dt JOIN dtot USING (day)
  GROUP BY dt.day
), idx AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1 AS t,
         entropy
  FROM ent
), ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(CAST(t AS DOUBLE)) AS sx,
         SUM(entropy) AS sy,
         SUM(CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS sxx,
         SUM(CAST(t AS DOUBLE) * entropy) AS sxy
  FROM idx
)
SELECT k AS n_days,
       ROUND(sy / CAST(k AS DOUBLE), 6) AS mean_entropy,
       ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (CAST(k AS DOUBLE) * sxx - sx * sx) * 1e3, 6)
         AS entropy_slope_milli
FROM ols
"""

R8B_QUERIES["events_entropy_trend"] = (
    q_events_entropy_trend, _QENTTREND_SQL, False)


# --- events_seasonality_strength --------------------------------------------------

def q_events_seasonality_strength(spark, sf_dir):
    """Seasonality and trend strength (the STL summary statistics):
    over the centered-7-day-MA decomposition, detrended = y - trend,
    remainder = detrended - weekday mean(detrended); strength_seasonal =
    max(0, 1 - var(remainder)/var(detrended)) and strength_trend =
    max(0, 1 - var(remainder)/var(y - seasonal)) — the two numbers that
    say whether a series deserves a seasonal model at all.

    Determinism: trend is an exact integer ratio (sum-of-7 / 7);
    detrended values are ROUNDed at 6 before the weekday means and
    variances, so every variance is a function of identical doubles.

    Scale shape: one day aggregation, one 7-row window, two bounded
    finishes."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = (days
          .withColumn("w_n", F.count(F.lit(1)).over(w7))
          .withColumn("w_s", F.sum("y").over(w7).cast("long"))
          .filter(F.col("w_n") == 7)
          .withColumn("det", F.round(
              F.col("y").cast("double")
              - F.col("w_s").cast("double") / 7.0, 6))
          .withColumn("wd", F.dayofweek("day").cast("long")))
    sm = (tr.groupBy("wd")
          .agg(F.round(F.avg("det"), 6).alias("seas")))
    j = (tr.join(F.broadcast(sm), "wd")
         .withColumn("rem", F.round(F.col("det") - F.col("seas"), 6))
         .withColumn("deseas", F.round(F.col("y").cast("double")
                                       - F.col("seas"), 6)))
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("det").alias("s_det"), F.sum(F.col("det") * F.col("det"))
        .alias("q_det"),
        F.sum("rem").alias("s_rem"), F.sum(F.col("rem") * F.col("rem"))
        .alias("q_rem"),
        F.sum("deseas").alias("s_des"),
        F.sum(F.col("deseas") * F.col("deseas")).alias("q_des"))
    nD = F.col("n").cast("double")

    def var(s, q):
        return (q - s * s / nD) / (nD - 1.0)

    ss = F.greatest(F.lit(0.0),
                    1.0 - var(F.col("s_rem"), F.col("q_rem"))
                    / var(F.col("s_det"), F.col("q_det")))
    st = F.greatest(F.lit(0.0),
                    1.0 - var(F.col("s_rem"), F.col("q_rem"))
                    / var(F.col("s_des"), F.col("q_des")))
    return agg.select(
        F.col("n").alias("n_days"),
        F.round(ss, 6).alias("strength_seasonal"),
        F.round(st, 6).alias("strength_trend"))


_QSEASTR_SQL = """
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), tr AS (
  SELECT day, y,
         ROUND(CAST(y AS DOUBLE) -
               CAST(SUM(y) OVER (ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
               / 7.0, 6) AS det,
         CAST(dayofweek(day) + 1 AS BIGINT) AS wd,
         COUNT(*) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w_n
  FROM days
), trf AS (
  SELECT day, y, det, wd FROM tr WHERE w_n = 7
), sm AS (
  SELECT wd, ROUND(AVG(det), 6) AS seas FROM trf GROUP BY wd
), j AS (
  SELECT trf.det,
         ROUND(trf.det - sm.seas, 6) AS rem,
         ROUND(CAST(trf.y AS DOUBLE) - sm.seas, 6) AS deseas
  FROM trf JOIN sm USING (wd)
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(det) AS s_det, SUM(det * det) AS q_det,
         SUM(rem) AS s_rem, SUM(rem * rem) AS q_rem,
         SUM(deseas) AS s_des, SUM(deseas * deseas) AS q_des
  FROM j
)
SELECT n AS n_days,
       ROUND(greatest(0.0,
             1.0 - ((q_rem - s_rem * s_rem / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))
                   / ((q_det - s_det * s_det / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))), 6)
         AS strength_seasonal,
       ROUND(greatest(0.0,
             1.0 - ((q_rem - s_rem * s_rem / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))
                   / ((q_des - s_des * s_des / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0))), 6)
         AS strength_trend
FROM agg
"""

R8B_QUERIES["events_seasonality_strength"] = (
    q_events_seasonality_strength, _QSEASTR_SQL, False)


# =============================================================================
# Wave 29 — regression discontinuity, weighted link prediction,
# lexical richness
# =============================================================================

# --- lineitem_discount_rdd ------------------------------------------------------

def q_lineitem_discount_rdd(spark, sf_dir):
    """Sharp regression-discontinuity estimate: running variable =
    quantity, cutoff 25, outcome = discount; local linear OLS on each
    side within bandwidth 10 (quantities 15..24 vs 25..34), jump =
    right-intercept - left-prediction at the cutoff.  Completes the
    causal tier (DiD, uplift, IPW, matching, ITS, RDD).  Discounts are
    2-decimal-quantized, so the OLS sums run on exact 1e-2-lattice
    doubles.

    Degenerate-input edge (r13 ADVICE): on a corpus where either side of
    the cutoff is EMPTY within the bandwidth, the pre-r13
    crossJoin-of-filtered-branches shape returned 0 rows while this
    single-pass aggregate returns 1 row of nulls.  On TPC-H both sides
    always exist (oracle-verified identical); corpora that must
    reproduce the old 0-row shape should filter ``kl > 0 AND kr > 0``.

    Scale shape: one bandwidth-filtered aggregation per side (map-side
    combinable), one closed-form finish."""
    li = load_table(spark, sf_dir, "lineitem")
    band = (li.select(F.col("l_quantity").cast("long").alias("x"),
                      F.col("l_discount").alias("y"))
            .filter((F.col("x") >= 15) & (F.col("x") <= 34))
            .withColumn("side", (F.col("x") >= 25).cast("int"))
            .withColumn("xc", (F.col("x") - 25).cast("double")))
    # ONE conditional global aggregation (r13): the old shape grouped by
    # side and cross-joined two filtered 1-row branches back, re-running
    # the bandwidth scan per branch (2 scans; scan-budget discovery
    # audit).  Per-side OLS sums come out of a single pass; the
    # closed-form finish is unchanged arithmetic on the same exact sums.
    def _side(cond, tag):
        return [F.sum(F.when(cond, 1).otherwise(0)).cast("long")
                .alias(f"k{tag}"),
                F.sum(F.when(cond, F.col("xc"))).alias(f"sx{tag}"),
                F.sum(F.when(cond, F.col("y"))).alias(f"sy{tag}"),
                F.sum(F.when(cond, F.col("xc") * F.col("xc")))
                .alias(f"sxx{tag}"),
                F.sum(F.when(cond, F.col("xc") * F.col("y")))
                .alias(f"sxy{tag}")]

    ols = band.agg(*(_side(F.col("side") == 0, "l")
                     + _side(F.col("side") == 1, "r")))

    def _b0(tag):
        kD = F.col(f"k{tag}").cast("double")
        slope = ((kD * F.col(f"sxy{tag}")
                  - F.col(f"sx{tag}") * F.col(f"sy{tag}"))
                 / (kD * F.col(f"sxx{tag}")
                    - F.col(f"sx{tag}") * F.col(f"sx{tag}")))
        return (F.col(f"sy{tag}") - slope * F.col(f"sx{tag}")) / kD

    return ols.select(
        F.col("kl").alias("n_left"), F.col("kr").alias("n_right"),
        F.round(_b0("l"), 6).alias("left_at_cutoff"),
        F.round(_b0("r"), 6).alias("right_at_cutoff"),
        F.round(_b0("r") - _b0("l"), 6).alias("rdd_jump"))


_QRDD_SQL = """
WITH band AS (
  SELECT CAST(l_quantity AS BIGINT) AS x, l_discount AS y,
         CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS side,
         CAST(CAST(l_quantity AS BIGINT) - 25 AS DOUBLE) AS xc
  FROM lineitem
  WHERE l_quantity BETWEEN 15 AND 34
), ols AS (
  SELECT side, CAST(COUNT(*) AS BIGINT) AS k, SUM(xc) AS sx,
         SUM(y) AS sy, SUM(xc * xc) AS sxx, SUM(xc * y) AS sxy
  FROM band GROUP BY side
), lines AS (
  SELECT side, k,
         (CAST(k AS DOUBLE) * sxy - sx * sy)
           / (CAST(k AS DOUBLE) * sxx - sx * sx) AS b1,
         (sy - ((CAST(k AS DOUBLE) * sxy - sx * sy)
                / (CAST(k AS DOUBLE) * sxx - sx * sx)) * sx)
           / CAST(k AS DOUBLE) AS b0
  FROM ols
)
SELECT l.k AS n_left, r.k AS n_right,
       ROUND(l.b0, 6) AS left_at_cutoff,
       ROUND(r.b0, 6) AS right_at_cutoff,
       ROUND(r.b0 - l.b0, 6) AS rdd_jump
FROM (SELECT * FROM lines WHERE side = 0) l
CROSS JOIN (SELECT * FROM lines WHERE side = 1) r
"""

R8B_QUERIES["lineitem_discount_rdd"] = (
    q_lineitem_discount_rdd, _QRDD_SQL, False)


# --- part_adamic_adar -----------------------------------------------------------

def q_part_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction on the part co-purchase graph (same
    support>=2 edges as the k-core/common-neighbor queries): candidate
    2-hop non-edges scored by sum over shared neighbors w of
    1/ln(deg(w)) — the degree-weighted upgrade of the common-neighbor
    Jaccard that down-weights promiscuous hubs.  Top-20.

    Scale shape: a wedge join through the middle vertex with the
    middle's degree broadcast in; existing edges removed by anti-join."""
    po = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a = po.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("u"))
    b = po.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("v"))
    edges = (a.join(b, "ok").filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("supp"))
             .filter(F.col("supp") >= 2).select("u", "v"))
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))) \
        .distinct()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    w1 = sym.select(F.col("u").alias("x"), F.col("v").alias("w"))
    w2 = sym.select(F.col("u").alias("w"), F.col("v").alias("y"))
    wedges = (w1.join(w2, "w").filter(F.col("x") < F.col("y"))
              .join(F.broadcast(deg.select(F.col("u").alias("w"),
                                           F.col("deg"))), "w")
              .filter(F.col("deg") > 1))
    scored = (wedges.groupBy("x", "y")
              .agg(F.count(F.lit(1)).cast("long").alias("cn"),
                   F.sum(1.0 / F.log(F.col("deg").cast("double")))
                   .alias("aa")))
    non_edges = scored.join(
        edges.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"], "left_anti")
    wr = Window.orderBy(F.round(F.col("aa"), 6).desc(),
                        F.col("x").asc(), F.col("y").asc())
    return (non_edges.withColumn("rank", F.row_number().over(wr)
                                 .cast("int"))
            .filter(F.col("rank") <= 20)
            .select("rank", F.col("x").alias("part_a"),
                    F.col("y").alias("part_b"), "cn",
                    F.round("aa", 6).alias("adamic_adar"))
            .orderBy("rank"))


_QAA_SQL = """
WITH po AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  SELECT u, v
  FROM (SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(COUNT(*) AS BIGINT) AS supp
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
  WHERE supp >= 2
), sym AS MATERIALIZED (
  SELECT u, v FROM edges UNION SELECT v, u FROM edges
), deg AS (
  SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
), wedges AS (
  SELECT w1.u AS x, w2.v AS y, d.deg
  FROM sym w1
  JOIN sym w2 ON w2.u = w1.v
  JOIN deg d ON d.w = w1.v
  WHERE w1.u < w2.v AND d.deg > 1
), scored AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cn,
         SUM(1.0 / ln(CAST(deg AS DOUBLE))) AS aa
  FROM wedges GROUP BY x, y
), non_edges AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.u = s.x AND e.v = s.y)
)
SELECT CAST(rank AS INT) AS rank, x AS part_a, y AS part_b, cn,
       ROUND(aa, 6) AS adamic_adar
FROM (SELECT *, row_number() OVER (ORDER BY ROUND(aa, 6) DESC,
                                   x ASC, y ASC) AS rank
      FROM non_edges)
WHERE rank <= 20
ORDER BY rank
"""

R8B_QUERIES["part_adamic_adar"] = (q_part_adamic_adar, _QAA_SQL, False)


# --- doc_lexical_richness -------------------------------------------------------

def q_doc_lexical_richness(spark, sf_dir):
    """Lexical richness per source: type-token ratio, hapax-legomena
    share of the vocabulary, and Herdan's C = ln(V)/ln(N) (the
    log-log TTR that is stable across corpus sizes) — the vocabulary-
    health metrics of corpus linguistics.  All from exact counts.

    Scale shape: one (source, term) aggregation, one source finish."""
    docs = load_table(spark, sf_dir, "documents")
    st = (docs.select("source",
                      F.explode(_text.tokens(F.col("text"))).alias("term"))
          .filter(F.col("term") != "")
          .groupBy("source", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    agg = (st.groupBy("source")
           .agg(F.sum("c").cast("long").alias("n_tokens"),
                F.count(F.lit(1)).cast("long").alias("n_types"),
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                .cast("long").alias("n_hapax")))
    return (agg.select(
        "source", "n_tokens", "n_types", "n_hapax",
        F.round(F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double"), 6).alias("ttr"),
        F.round(F.col("n_hapax").cast("double")
                / F.col("n_types").cast("double"), 6).alias("hapax_share"),
        F.round(F.log(F.col("n_types").cast("double"))
                / F.log(F.col("n_tokens").cast("double")), 6)
        .alias("herdan_c"))
        .orderBy("source"))


_QLEX_SQL = f"""
WITH st AS (
  SELECT source, t.term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
  GROUP BY source, t.term
), agg AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax
  FROM st GROUP BY source
)
SELECT source, n_tokens, n_types, n_hapax,
       ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS ttr,
       ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
         AS hapax_share,
       ROUND(ln(CAST(n_types AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)),
             6) AS herdan_c
FROM agg
ORDER BY source
"""

R8B_QUERIES["doc_lexical_richness"] = (
    q_doc_lexical_richness, _QLEX_SQL, False)


# =============================================================================
# Wave 30 — survey sampling, covariance matrices, supply-chain dynamics,
# wavelet energy, intermittent-demand forecasting
# =============================================================================

# --- customer_neyman_allocation ---------------------------------------------------

def q_customer_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified-sampling allocation: for a budget of
    1000 sampled customers stratified by nation, allocate n_h
    proportional to N_h * S_h (stratum size x stddev of account
    balance, exact-cents moments) — the design a survey/eval pipeline
    computes before drawing.  Reported against proportional allocation
    for contrast; allocations are rounded at 2.

    Scale shape: one stratum aggregation + one broadcast total."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    g = (cust.groupBy("c_nationkey")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(cents).cast("long").alias("s"),
              F.sum(cents * cents).cast("long").alias("q")))
    nD = F.col("n").cast("double")
    sd = F.sqrt((nD * F.col("q").cast("double")
                 - F.col("s").cast("double") * F.col("s").cast("double"))
                / (nD * (nD - 1.0))) / 100.0
    wgt = g.select("c_nationkey", "n", (nD * sd).alias("ns"), sd.alias("sd"))
    tot = wgt.agg(F.sum("ns").alias("tot_ns"),
                  F.sum("n").cast("long").alias("tot_n"))
    j = wgt.crossJoin(F.broadcast(tot))
    return (j.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("n").alias("stratum_size"),
        F.round("sd", 6).alias("stratum_sd"),
        F.round(1000.0 * F.col("ns") / F.col("tot_ns"), 2)
        .alias("neyman_n"),
        F.round(1000.0 * F.col("n").cast("double")
                / F.col("tot_n").cast("double"), 2).alias("proportional_n"))
        .orderBy("nationkey"))


_QNEYMAN_SQL = """
WITH g AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                  * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS q
  FROM customer GROUP BY c_nationkey
), wgt AS (
  SELECT c_nationkey, n,
         sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0
           AS sd,
         CAST(n AS DOUBLE)
           * sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
           / 100.0 AS ns
  FROM g
), tot AS (
  SELECT SUM(ns) AS tot_ns, CAST(SUM(n) AS BIGINT) AS tot_n FROM wgt
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, n AS stratum_size,
       ROUND(sd, 6) AS stratum_sd,
       ROUND(1000.0 * ns / tot_ns, 2) AS neyman_n,
       ROUND(1000.0 * CAST(n AS DOUBLE) / CAST(tot_n AS DOUBLE), 2)
         AS proportional_n
FROM wgt CROSS JOIN tot
ORDER BY nationkey
"""

R8B_QUERIES["customer_neyman_allocation"] = (
    q_customer_neyman_allocation, _QNEYMAN_SQL, False)


# --- orders_corr_matrix ---------------------------------------------------------

def q_orders_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix in long form over three per-order
    features — total price (whole dollars, exact integers — cents would
    push the squared sums past BIGINT), line count, and order->first-
    ship latency days — every pairwise r from one pass of exact integer
    cross-moments.  The EDA matrix before any modeling step.

    Scale shape: one join + order aggregation, one 10-sum moment pass,
    a 3-row finish."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per = (li.groupBy("l_orderkey")
           .agg(F.count(F.lit(1)).cast("long").alias("nl"),
                F.min(F.to_date("l_shipdate")).alias("ship")))
    base = (orders.join(per, orders.o_orderkey == per.l_orderkey)
            .select(F.round(F.col("o_totalprice")).cast("long")
                    .alias("a"),
                    F.col("nl").alias("b"),
                    F.datediff(F.col("ship"), F.to_date("o_orderdate"))
                    .cast("long").alias("c")))
    m = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(F.col(x)).cast("long").alias(f"s{x}") for x in "abc"],
        *[F.sum(F.col(x) * F.col(x)).cast("long").alias(f"q{x}")
          for x in "abc"],
        F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
        F.sum(F.col("a") * F.col("c")).cast("long").alias("sac"),
        F.sum(F.col("b") * F.col("c")).cast("long").alias("sbc"))
    nD = F.col("n").cast("double")

    def corr(sxy, sx, sy, qx, qy):
        num = nD * F.col(sxy).cast("double") \
            - F.col(sx).cast("double") * F.col(sy).cast("double")
        dx = F.sqrt(nD * F.col(qx).cast("double")
                    - F.col(sx).cast("double") * F.col(sx).cast("double"))
        dy = F.sqrt(nD * F.col(qy).cast("double")
                    - F.col(sy).cast("double") * F.col(sy).cast("double"))
        return num / (dx * dy)

    pairs = [("price", "n_lines", corr("sab", "sa", "sb", "qa", "qb")),
             ("price", "latency", corr("sac", "sa", "sc", "qa", "qc")),
             ("n_lines", "latency", corr("sbc", "sb", "sc", "qb", "qc"))]
    # one explode over the single moment row, not a 3-way union embedding
    # three copies of the moment-aggregation subtree (round 9)
    rows = (m.select(F.explode(F.array(*[
        F.struct(F.lit(xa).alias("var_a"), F.lit(xb).alias("var_b"),
                 F.round(r, 6).alias("pearson_r"))
        for xa, xb, r in pairs])).alias("_s"))
        .select("_s.*"))
    return rows.orderBy("var_a", "var_b")


_QCORRM_SQL = """
WITH per AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl,
         MIN(CAST(l_shipdate AS DATE)) AS ship
  FROM lineitem GROUP BY l_orderkey
), base AS (
  SELECT CAST(ROUND(o.o_totalprice) AS BIGINT) AS a,
         p.nl AS b,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE), p.ship)
              AS BIGINT) AS c
  FROM orders o JOIN per p ON p.l_orderkey = o.o_orderkey
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(a * a) AS BIGINT) AS qa,
         CAST(SUM(b * b) AS BIGINT) AS qb,
         CAST(SUM(c * c) AS BIGINT) AS qc,
         CAST(SUM(a * b) AS BIGINT) AS sab,
         CAST(SUM(a * c) AS BIGINT) AS sac,
         CAST(SUM(b * c) AS BIGINT) AS sbc
  FROM base
)
SELECT 'price' AS var_a, 'n_lines' AS var_b,
       ROUND((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(qa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(qb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
         AS pearson_r
FROM m
UNION ALL
SELECT 'price', 'latency',
       ROUND((CAST(n AS DOUBLE) * CAST(sac AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sc AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(qa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(qc AS DOUBLE)
                       - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 6)
FROM m
UNION ALL
SELECT 'n_lines', 'latency',
       ROUND((CAST(n AS DOUBLE) * CAST(sbc AS DOUBLE)
              - CAST(sb AS DOUBLE) * CAST(sc AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(qb AS DOUBLE)
                     - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(qc AS DOUBLE)
                       - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 6)
FROM m
ORDER BY var_a, var_b
"""

R8B_QUERIES["orders_corr_matrix"] = (
    q_orders_corr_matrix, _QCORRM_SQL, False)


# --- lineitem_bullwhip_ratio ----------------------------------------------------

def q_lineitem_bullwhip_ratio(spark, sf_dir):
    """Bullwhip-effect ratio: variance of weekly ORDER quantity (demand
    signal placed upstream, keyed by order week) over variance of
    weekly SHIPPED quantity (fulfillment) — ratio > 1 means demand
    variability amplifies up the chain.  Both series are exact integer
    weekly sums over the shared week domain.

    Scale shape: two week-keyed aggregations over the same join, one
    scalar finish."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.weekofyear(F.to_date("o_orderdate")).alias("ow"),
        F.year(F.to_date("o_orderdate")).alias("oy"))
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    ordered = (j.groupBy(F.col("oy").alias("y"), F.col("ow").alias("w"))
               .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
                    .alias("qo")))
    shipped = (li.groupBy(
        F.year(F.to_date("l_shipdate")).alias("y"),
        F.weekofyear(F.to_date("l_shipdate")).alias("w"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
             .alias("qs")))
    both = ordered.join(shipped, ["y", "w"])

    def var(c):
        n = F.count(F.lit(1)).cast("double")
        s = F.sum(F.col(c)).cast("double")
        q = F.sum(F.col(c) * F.col(c)).cast("double")
        return (n * q - s * s) / (n * (n - 1.0))

    agg = both.agg(F.count(F.lit(1)).cast("long").alias("n_weeks"),
                   var("qo").alias("var_ordered"),
                   var("qs").alias("var_shipped"))
    return agg.select(
        "n_weeks",
        F.round(F.col("var_ordered") / 1e6, 6).alias("var_ordered_m"),
        F.round(F.col("var_shipped") / 1e6, 6).alias("var_shipped_m"),
        F.round(F.col("var_ordered") / F.col("var_shipped"), 6)
        .alias("bullwhip_ratio"))


_QBULLWHIP_SQL = """
WITH ordered AS (
  SELECT year(CAST(o.o_orderdate AS DATE)) AS y,
         weekofyear(CAST(o.o_orderdate AS DATE)) AS w,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qo
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), shipped AS (
  SELECT year(CAST(l_shipdate AS DATE)) AS y,
         weekofyear(CAST(l_shipdate AS DATE)) AS w,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qs
  FROM lineitem GROUP BY 1, 2
), both_w AS (
  SELECT qo, qs FROM ordered JOIN shipped USING (y, w)
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
         (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(qo * qo) AS DOUBLE)
          - CAST(SUM(qo) AS DOUBLE) * CAST(SUM(qo) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE)
              * (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS var_ordered,
         (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(qs * qs) AS DOUBLE)
          - CAST(SUM(qs) AS DOUBLE) * CAST(SUM(qs) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE)
              * (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS var_shipped
  FROM both_w
)
SELECT n_weeks,
       ROUND(var_ordered / 1e6, 6) AS var_ordered_m,
       ROUND(var_shipped / 1e6, 6) AS var_shipped_m,
       ROUND(var_ordered / var_shipped, 6) AS bullwhip_ratio
FROM agg
"""

R8B_QUERIES["lineitem_bullwhip_ratio"] = (
    q_lineitem_bullwhip_ratio, _QBULLWHIP_SQL, False)


# --- events_haar_energy ---------------------------------------------------------

def q_events_haar_energy(spark, sf_dir):
    """Haar wavelet energy by level over the first 16 days of the daily
    event-count series: 4 cascade levels of pairwise sums/differences.
    Details at level L are integers / 2^L, so the level energy is
    reported as the EXACT BIGINT numerator sum(diff_num^2) with divisor
    4^L — zero float anywhere (the lattice-safe alternative to rounding
    dyadic rationals).  The multi-resolution spike detector next to the
    DFT periodogram.

    Scale shape: one day aggregation, then 4 chained 16->8->4->2->1
    pair-group aggregations."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    w = Window.orderBy("day")
    cur = (days.withColumn("t", F.row_number().over(w).cast("long") - 1)
           .filter(F.col("t") < 16)
           .select("t", F.col("y").alias("num")))  # numerator at lvl 0
    out = None
    for lvl in range(1, 5):
        grp = (cur.groupBy((F.col("t") / 2).cast("long").alias("g"))
               .agg(F.sum(F.when(F.col("t") % 2 == 0, F.col("num"))
                          .otherwise(-F.col("num"))).cast("long")
                    .alias("dnum"),
                    F.sum("num").cast("long").alias("anum")))
        # detail numerators carry the previous level's scaling: the true
        # detail is dnum / 2^lvl, so energy = sum(dnum^2) / 4^lvl
        e = (grp.agg(F.sum(F.col("dnum") * F.col("dnum")).cast("long")
                     .alias("energy_num"),
                     F.count(F.lit(1)).cast("long").alias("n_details"))
             .select(F.lit(lvl).cast("long").alias("level"), "n_details",
                     "energy_num",
                     F.lit(4 ** lvl).cast("long").alias("divisor")))
        out = e if out is None else out.unionByName(e)
        cur = grp.select(F.col("g").alias("t"),
                         F.col("anum").alias("num"))
    return out.orderBy("level")


def _haar_sql() -> str:
    sql = """
WITH days AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) - 1 AS t,
         y AS num
  FROM (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1)
  QUALIFY t < 16
)"""
    prev = "days"
    sels = []
    for lvl in range(1, 5):
        sql += f""", l{lvl} AS MATERIALIZED (
  SELECT CAST(t // 2 AS BIGINT) AS t,
         CAST(SUM(CASE WHEN t % 2 = 0 THEN num ELSE -num END) AS BIGINT)
           AS dnum,
         CAST(SUM(num) AS BIGINT) AS num
  FROM {prev} GROUP BY 1
)"""
        sels.append(
            f"SELECT CAST({lvl} AS BIGINT) AS level, "
            f"CAST(COUNT(*) AS BIGINT) AS n_details, "
            f"CAST(SUM(dnum * dnum) AS BIGINT) AS energy_num, "
            f"CAST({4 ** lvl} AS BIGINT) AS divisor FROM l{lvl}")
        prev = f"l{lvl}"
    return sql + "\n" + "\nUNION ALL\n".join(sels) + "\nORDER BY level"


R8B_QUERIES["events_haar_energy"] = (q_events_haar_energy, _haar_sql(), False)


# --- brand_croston_forecast -----------------------------------------------------

def q_brand_croston_forecast(spark, sf_dir):
    """Croston's method for intermittent demand, per brand: demand-event
    sizes and inter-demand intervals are smoothed separately (alpha =
    0.2, init = first observation), forecast = size_hat / interval_hat
    per day.  Demand events are the days a brand ships at all —
    intervals come from the day-index gaps, so the recursion is a fixed
    per-brand left fold (lockstep recursive CTE in the oracle).

    Scale shape: one (brand, day) aggregation, one per-brand
    ``F.aggregate`` fold over the day-domain-bounded event list."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bd = (li.join(pt, li.l_partkey == pt.p_partkey)
          .groupBy("p_brand", F.to_date("l_shipdate").alias("day"))
          .agg(F.sum(F.col("l_quantity").cast("long")).cast("long")
               .alias("q")))
    wd = Window.partitionBy("p_brand").orderBy("day")
    evd = (bd.withColumn("t", F.row_number().over(wd).cast("long"))
           .withColumn("gap", F.coalesce(
               F.datediff(F.col("day"), F.lag("day").over(wd))
               .cast("long"), F.lit(1))))  # first event: interval 1
    series = (evd.groupBy("p_brand")
              .agg(F.array_sort(F.collect_list(
                  F.struct("t", "q", "gap"))).alias("sv")))
    acc0 = F.struct(F.lit(0).cast("int").alias("n"),
                    F.lit(0.0).alias("z"), F.lit(0.0).alias("p"))
    fold = F.aggregate(
        F.col("sv"), acc0,
        lambda acc, e: F.struct(
            (acc["n"] + 1).alias("n"),
            F.when(acc["n"] == 0, e["q"].cast("double"))
            .otherwise(0.2 * e["q"].cast("double") + 0.8 * acc["z"])
            .alias("z"),
            F.when(acc["n"] == 0, e["gap"].cast("double"))
            .otherwise(0.2 * e["gap"].cast("double") + 0.8 * acc["p"])
            .alias("p")))
    final = series.select("p_brand", fold.alias("f"))
    return (final.select(
        F.col("p_brand").alias("brand"),
        F.col("f.n").cast("long").alias("n_demand_events"),
        F.round(F.col("f.z"), 6).alias("size_hat"),
        F.round(F.col("f.p"), 6).alias("interval_hat"),
        F.round(F.col("f.z") / F.col("f.p"), 6).alias("croston_rate"))
        .orderBy("brand"))


_QCROSTON_SQL = """
WITH RECURSIVE bd AS (
  SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), evd AS MATERIALIZED (
  SELECT p_brand, q,
         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY day)
           AS BIGINT) AS t,
         CAST(COALESCE(datediff('day',
                 lag(day) OVER (PARTITION BY p_brand ORDER BY day), day),
                 1) AS BIGINT) AS gap
  FROM bd
), cro AS (
  SELECT p_brand, t, CAST(q AS DOUBLE) AS z, CAST(gap AS DOUBLE) AS p
  FROM evd WHERE t = 1
  UNION ALL
  SELECT e.p_brand, e.t,
         0.2 * CAST(e.q AS DOUBLE) + 0.8 * c.z,
         0.2 * CAST(e.gap AS DOUBLE) + 0.8 * c.p
  FROM cro c JOIN evd e ON e.p_brand = c.p_brand AND e.t = c.t + 1
), fin AS (
  SELECT p_brand, t, z, p,
         row_number() OVER (PARTITION BY p_brand ORDER BY t DESC) AS rk
  FROM cro
)
SELECT p_brand AS brand, t AS n_demand_events,
       ROUND(z, 6) AS size_hat,
       ROUND(p, 6) AS interval_hat,
       ROUND(z / p, 6) AS croston_rate
FROM fin
WHERE rk = 1
ORDER BY brand
"""

R8B_QUERIES["brand_croston_forecast"] = (
    q_brand_croston_forecast, _QCROSTON_SQL, False)


# --- source_burrows_delta -------------------------------------------------------

def q_source_burrows_delta(spark, sf_dir):
    """Burrows' Delta stylometry between sources: relative frequencies
    of the top-30 corpus terms per source, z-scored across the source
    population (each term's mean/sd over sources), Delta(a,b) = mean
    |z_a - z_b| over the 30 marker terms — the authorship-attribution
    distance; the 10 closest source pairs are the lookalike report.

    Determinism: relative frequencies are exact ratios; z-scores are
    ROUNDed at 9 before the pairwise pass so the source-population
    moments (a 20-term sum) cannot wobble into the ranking.

    Scale shape: one token aggregation, a 30-row marker vocabulary
    broadcast, a (sources x 30) z-table self-joined on the term — never
    a document-level pairwise pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("source",
                        F.explode(_text.tokens(F.col("text"))).alias("term"))
            .filter(F.col("term") != ""))
    corpus = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long")
                                      .alias("qc"))
    vocab = (corpus.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("qc").desc(), F.col("term").asc())))
        .filter(F.col("rk") <= 30).select("term"))
    stot = toks.groupBy("source").agg(F.count(F.lit(1)).cast("long")
                                      .alias("ns"))
    sc = (toks.join(F.broadcast(vocab), "term")
          .groupBy("source", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    grid = (stot.crossJoin(F.broadcast(vocab))
            .join(sc, ["source", "term"], "left")
            .withColumn("f", F.coalesce(F.col("c"), F.lit(0))
                        .cast("double") / F.col("ns").cast("double")))
    mom = (grid.groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("k"),
                F.sum("f").alias("s"), F.sum(F.col("f") * F.col("f"))
                .alias("q")))
    kD = F.col("k").cast("double")
    sd = F.sqrt((kD * F.col("q") - F.col("s") * F.col("s"))
                / (kD * (kD - 1.0)))
    z = (grid.join(F.broadcast(mom), "term")
         .withColumn("z", F.round(
             (F.col("f") - F.col("s") / kD) / sd, 9))
         .select("source", "term", "z"))
    pairs = (z.alias("a")
             .join(z.select(F.col("source").alias("sb"),
                            F.col("term").alias("term"),
                            F.col("z").alias("zb")), "term")
             .filter(F.col("a.source") < F.col("sb"))
             .groupBy(F.col("a.source").alias("source_a"),
                      F.col("sb").alias("source_b"))
             .agg(F.round(F.avg(F.abs(F.col("a.z") - F.col("zb"))), 6)
                  .alias("delta")))
    w = Window.orderBy(F.col("delta").asc(), F.col("source_a").asc(),
                       F.col("source_b").asc())
    return (pairs.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 10)
            .select("rank", "source_a", "source_b", "delta")
            .orderBy("rank"))


_QBURROWS_SQL = f"""
WITH toks AS (
  SELECT source, t.term
  FROM (SELECT source, {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
), corpus AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS qc FROM toks GROUP BY term
), vocab AS (
  SELECT term
  FROM (SELECT term, row_number() OVER (ORDER BY qc DESC, term ASC)
            AS rk FROM corpus)
  WHERE rk <= 30
), stot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM toks GROUP BY source
), sc AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks SEMI JOIN vocab USING (term)
  GROUP BY source, term
), grid AS MATERIALIZED (
  SELECT stot.source, vocab.term,
         CAST(COALESCE(sc.c, 0) AS DOUBLE) / CAST(stot.ns AS DOUBLE) AS f
  FROM stot CROSS JOIN vocab
  LEFT JOIN sc ON sc.source = stot.source AND sc.term = vocab.term
), mom AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS k, SUM(f) AS s,
         SUM(f * f) AS q
  FROM grid GROUP BY term
), z AS MATERIALIZED (
  SELECT g.source, g.term,
         ROUND((g.f - m.s / CAST(m.k AS DOUBLE))
               / sqrt((CAST(m.k AS DOUBLE) * m.q - m.s * m.s)
                      / (CAST(m.k AS DOUBLE)
                         * (CAST(m.k AS DOUBLE) - 1.0))), 9) AS z
  FROM grid g JOIN mom m USING (term)
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         ROUND(AVG(abs(a.z - b.z)), 6) AS delta
  FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT CAST(rank AS INT) AS rank, source_a, source_b, delta
FROM (SELECT *, row_number() OVER (ORDER BY delta ASC, source_a ASC,
                                   source_b ASC) AS rank
      FROM pairs)
WHERE rank <= 10
ORDER BY rank
"""

R8B_QUERIES["source_burrows_delta"] = (
    q_source_burrows_delta, _QBURROWS_SQL, False)


# =============================================================================
# Wave 31 — state-space filtering, revenue bridging, histogram
# thresholding, queueing-law audit
# =============================================================================

# --- events_kalman_level --------------------------------------------------------

def q_events_kalman_level(spark, sf_dir):
    """1-D Kalman filter (local-level model, Q=25, R=400, P0=1000) over
    the daily event counts: gain k = P/(P+R), level += k*(y-level),
    P = (1-k)*P + Q — the state-space filtering class next to the
    exponential-smoothing tier, with the steady-state gain reported.
    Fixed left fold, bit-identical in both engines.

    Scale shape: one day aggregation, one ``F.aggregate`` fold."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("y")))
    series = days.agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("sv"))
    acc0 = F.struct(F.lit(0).cast("int").alias("n"),
                    F.lit(0.0).alias("l"), F.lit(1000.0).alias("p"),
                    F.lit(0.0).alias("k"))
    gain = lambda acc: acc["p"] / (acc["p"] + 400.0)
    fold = F.aggregate(
        F.col("sv"), acc0,
        lambda acc, e: F.struct(
            (acc["n"] + 1).alias("n"),
            F.when(acc["n"] == 0, e["y"])
            .otherwise(acc["l"] + gain(acc) * (e["y"] - acc["l"]))
            .alias("l"),
            ((1.0 - gain(acc)) * acc["p"] + 25.0).alias("p"),
            gain(acc).alias("k")))
    f = series.select(fold.alias("f"))
    return f.select(
        F.col("f.n").cast("long").alias("n_days"),
        F.round(F.col("f.l"), 6).alias("filtered_level"),
        F.round(F.col("f.p"), 6).alias("error_var"),
        F.round(F.col("f.k"), 6).alias("last_gain"))


_QKALMAN_SQL = """
WITH RECURSIVE days AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
         CAST(y AS DOUBLE) AS y
  FROM (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y
        FROM events GROUP BY 1)
), kf AS (
  SELECT i, y AS l,
         (1.0 - 1000.0 / (1000.0 + 400.0)) * 1000.0 + 25.0 AS p,
         1000.0 / (1000.0 + 400.0) AS k
  FROM days WHERE i = 1
  UNION ALL
  SELECT d.i,
         h.l + (h.p / (h.p + 400.0)) * (d.y - h.l),
         (1.0 - h.p / (h.p + 400.0)) * h.p + 25.0,
         h.p / (h.p + 400.0)
  FROM kf h JOIN days d ON d.i = h.i + 1
)
SELECT i AS n_days,
       ROUND(l, 6) AS filtered_level,
       ROUND(p, 6) AS error_var,
       ROUND(k, 6) AS last_gain
FROM kf WHERE i = (SELECT MAX(i) FROM days)
"""

R8B_QUERIES["events_kalman_level"] = (
    q_events_kalman_level, _QKALMAN_SQL, False)


# --- brand_price_volume_mix -----------------------------------------------------

def q_brand_price_volume_mix(spark, sf_dir):
    """Price-volume-mix revenue bridge, 1997 vs 1996 per brand: for
    parts sold in both years, price effect = (p1-p0)*q1 and volume
    effect = (q1-q0)*p0 with p = mean unit price (exact cents ratio);
    new/discontinued parts' revenue is the mix effect.  The three
    effects plus both totals reconcile exactly to the revenue delta —
    the finance waterfall every period review reads.

    Scale shape: ONE year-conditional part aggregation (single corpus
    pass, r13 — null year-sums reproduce the old full-outer-join
    membership), one brand rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr"))
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE conditional-aggregation pass instead of two year-filtered
    # aggregations FULL-OUTER-joined back (the old shape executed the
    # three-table join once per year branch — r13 scan-budget audit:
    # 15200 -> 7700 input records at sf0.001 — and paid the outer-join
    # shuffle).  sum(when(yr=Y, x)) is null exactly where the old full
    # join produced nulls (a part absent from year Y), so the
    # both/new/discontinued split below is value-identical.
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(pt, li.l_partkey == pt.p_partkey)
         .filter(F.col("yr").isin(1996, 1997)))
    _ext = F.round(F.col("l_extendedprice") * 100).cast("long")
    _qty = F.col("l_quantity").cast("long")
    full = (j.groupBy("p_partkey", "p_brand")
            .agg(F.sum(F.when(F.col("yr") == 1996, _ext)).cast("long")
                 .alias("ext0"),
                 F.sum(F.when(F.col("yr") == 1996, _qty)).cast("long")
                 .alias("q0"),
                 F.sum(F.when(F.col("yr") == 1997, _ext)).cast("long")
                 .alias("ext1"),
                 F.sum(F.when(F.col("yr") == 1997, _qty)).cast("long")
                 .alias("q1")))
    p0 = F.col("ext0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("ext1").cast("double") / F.col("q1").cast("double")
    both = F.col("ext0").isNotNull() & F.col("ext1").isNotNull()
    eff = full.select(
        "p_brand",
        F.when(both, (p1 - p0) * F.col("q1").cast("double"))
        .otherwise(0.0).alias("price_eff"),
        F.when(both, (F.col("q1") - F.col("q0")).cast("double") * p0)
        .otherwise(0.0).alias("vol_eff"),
        F.when(~both, F.coalesce(F.col("ext1").cast("double"), F.lit(0.0))
               - F.coalesce(F.col("ext0").cast("double"), F.lit(0.0)))
        .otherwise(0.0).alias("mix_eff"),
        F.coalesce(F.col("ext0"), F.lit(0)).alias("r0"),
        F.coalesce(F.col("ext1"), F.lit(0)).alias("r1"))
    return (eff.groupBy(F.col("p_brand").alias("brand"))
            .agg(F.round(F.sum("price_eff") / 100.0 / 1e3, 6)
                 .alias("price_effect_k"),
                 F.round(F.sum("vol_eff") / 100.0 / 1e3, 6)
                 .alias("volume_effect_k"),
                 F.round(F.sum("mix_eff") / 100.0 / 1e3, 6)
                 .alias("mix_effect_k"),
                 F.round((F.sum("r1") - F.sum("r0")).cast("double")
                         / 100.0 / 1e3, 6).alias("revenue_delta_k"))
            .orderBy("brand"))


_QPVM_SQL = """
WITH j AS (
  SELECT l.l_partkey, p.p_brand, year(o.o_orderdate) AS yr,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS ext,
         CAST(l.l_quantity AS BIGINT) AS q
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
), y0 AS (
  SELECT l_partkey, p_brand, CAST(SUM(ext) AS BIGINT) AS ext0,
         CAST(SUM(q) AS BIGINT) AS q0
  FROM j WHERE yr = 1996 GROUP BY 1, 2
), y1 AS (
  SELECT l_partkey, p_brand, CAST(SUM(ext) AS BIGINT) AS ext1,
         CAST(SUM(q) AS BIGINT) AS q1
  FROM j WHERE yr = 1997 GROUP BY 1, 2
), full_j AS (
  SELECT COALESCE(y0.p_brand, y1.p_brand) AS p_brand,
         y0.ext0, y0.q0, y1.ext1, y1.q1
  FROM y0 FULL JOIN y1 USING (l_partkey, p_brand)
), eff AS (
  SELECT p_brand,
         CASE WHEN ext0 IS NOT NULL AND ext1 IS NOT NULL
              THEN (CAST(ext1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                    - CAST(ext0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                   * CAST(q1 AS DOUBLE)
              ELSE 0.0 END AS price_eff,
         CASE WHEN ext0 IS NOT NULL AND ext1 IS NOT NULL
              THEN CAST(q1 - q0 AS DOUBLE)
                   * (CAST(ext0 AS DOUBLE) / CAST(q0 AS DOUBLE))
              ELSE 0.0 END AS vol_eff,
         CASE WHEN ext0 IS NULL OR ext1 IS NULL
              THEN COALESCE(CAST(ext1 AS DOUBLE), 0.0)
                   - COALESCE(CAST(ext0 AS DOUBLE), 0.0)
              ELSE 0.0 END AS mix_eff,
         COALESCE(ext0, 0) AS r0, COALESCE(ext1, 0) AS r1
  FROM full_j
)
SELECT p_brand AS brand,
       ROUND(SUM(price_eff) / 100.0 / 1e3, 6) AS price_effect_k,
       ROUND(SUM(vol_eff) / 100.0 / 1e3, 6) AS volume_effect_k,
       ROUND(SUM(mix_eff) / 100.0 / 1e3, 6) AS mix_effect_k,
       ROUND(CAST(SUM(r1) - SUM(r0) AS DOUBLE) / 100.0 / 1e3, 6)
         AS revenue_delta_k
FROM eff
GROUP BY p_brand
ORDER BY brand
"""

R8B_QUERIES["brand_price_volume_mix"] = (
    q_brand_price_volume_mix, _QPVM_SQL, False)


# --- events_otsu_threshold ------------------------------------------------------

def q_events_otsu_threshold(spark, sf_dir):
    """Otsu's threshold over the event-value distribution (256 equal
    bins on [0, max]): the cut maximizing between-class variance
    w0*w1*(mu0-mu1)^2, computed from integer bin counts and prefix sums
    — the automatic binarization classic, repurposed to split a value
    column into low/high regimes.  Ties break toward the smaller bin.

    Scale shape: one binned aggregation (data-sized), a 256-row prefix
    window and argmax."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("mx"))
    binned = (ev.crossJoin(F.broadcast(mx))
              .select(F.least(F.floor(F.col("value") / F.col("mx") * 256)
                              .cast("long"), F.lit(255)).alias("b"),
                      (F.col("value") / F.col("mx")).alias("x")))
    hist = (binned.groupBy("b")
            .agg(F.count(F.lit(1)).cast("long").alias("c"),
                 F.sum("x").alias("s")))
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = (hist.withColumn("cc", F.sum("c").over(w).cast("long"))
           .withColumn("cs", F.sum("s").over(w)))
    tot = cum.agg(F.max("cc").alias("n"), F.sum("c").cast("long")
                  .alias("n2"),
                  F.max("cs").alias("stot"))
    g = (cum.crossJoin(F.broadcast(tot))
         .filter((F.col("cc") > 0) & (F.col("cc") < F.col("n"))))
    w0 = F.col("cc").cast("double")
    w1 = (F.col("n") - F.col("cc")).cast("double")
    mu0 = F.col("cs") / w0
    mu1 = (F.col("stot") - F.col("cs")) / w1
    score = F.round(w0 * w1 * (mu0 - mu1) * (mu0 - mu1), 6)
    pick = (g.withColumn("score", score)
            .withColumn("rk", F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("b").asc())))
            .filter(F.col("rk") == 1))
    return (pick.crossJoin(F.broadcast(mx))
            .select(F.col("b").alias("otsu_bin"),
                    F.round((F.col("b") + 1).cast("double") / 256.0
                            * F.col("mx"), 6).alias("threshold_value"),
                    F.col("cc").alias("n_low"),
                    (F.col("n") - F.col("cc")).alias("n_high"),
                    F.round(F.col("score") / 1e6, 6).alias("score_m")))


_QOTSU_SQL = """
WITH mx AS (SELECT MAX(value) AS mx FROM events),
binned AS (
  SELECT least(CAST(FLOOR(value / mx.mx * 256) AS BIGINT), 255) AS b,
         value / mx.mx AS x
  FROM events CROSS JOIN mx
), hist AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c, SUM(x) AS s
  FROM binned GROUP BY b
), cum AS (
  SELECT b,
         CAST(SUM(c) OVER (ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cc,
         SUM(s) OVER (ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM hist
), tot AS (
  SELECT MAX(cc) AS n, MAX(cs) AS stot FROM cum
), g AS (
  SELECT b, cc, cs, n, stot,
         ROUND(CAST(cc AS DOUBLE) * CAST(n - cc AS DOUBLE)
               * (cs / CAST(cc AS DOUBLE)
                  - (stot - cs) / CAST(n - cc AS DOUBLE))
               * (cs / CAST(cc AS DOUBLE)
                  - (stot - cs) / CAST(n - cc AS DOUBLE)), 6) AS score
  FROM cum CROSS JOIN tot
  WHERE cc > 0 AND cc < n
)
SELECT b AS otsu_bin,
       ROUND(CAST(b + 1 AS DOUBLE) / 256.0
             * (SELECT mx FROM mx), 6) AS threshold_value,
       cc AS n_low, n - cc AS n_high,
       ROUND(score / 1e6, 6) AS score_m
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, b ASC) AS rk
      FROM g)
WHERE rk = 1
"""

R8B_QUERIES["events_otsu_threshold"] = (
    q_events_otsu_threshold, _QOTSU_SQL, False)


# --- orders_littles_law ---------------------------------------------------------

def q_orders_littles_law(spark, sf_dir):
    """Little's law audit L = lambda * W on the order queue: mean open
    orders L from the exact day-by-day backlog integral (sum of each
    order's latency days / observation days), arrival rate lambda =
    orders per day, mean latency W in days — the identity holds exactly
    in these units, so the reported ratio is a pipeline self-check
    (deviation means the latency join dropped rows).

    Scale shape: one join + order-level latency, three exact-integer
    aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first = (li.groupBy("l_orderkey")
             .agg(F.min(F.to_date("l_shipdate")).alias("ship")))
    lat = (orders.join(first, orders.o_orderkey == first.l_orderkey)
           .select(F.to_date("o_orderdate").alias("od"),
                   F.datediff(F.col("ship"), F.to_date("o_orderdate"))
                   .cast("long").alias("w")))
    # the observation span folds into the SAME aggregate (min/max over
    # the identical rows) — the old separate span branch re-executed the
    # orders⋈lineitem join for two scalars, then cross-joined them back
    # (r13 scan-budget discovery audit: 2 corpus scans -> 1)
    agg = lat.agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("w").cast("long").alias("sw"),
                  (F.datediff(F.max("od"), F.min("od")) + 1)
                  .cast("long").alias("days"))
    lam = F.col("n").cast("double") / F.col("days").cast("double")
    wbar = F.col("sw").cast("double") / F.col("n").cast("double")
    L = F.col("sw").cast("double") / F.col("days").cast("double")
    return agg.select(
        F.col("n").alias("n_orders"), F.col("days").alias("n_days"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(wbar, 6).alias("mean_latency_days"),
        F.round(L, 6).alias("mean_open_orders"),
        F.round(L / (lam * wbar), 6).alias("littles_ratio"))


_QLITTLE_SQL = """
WITH first AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ship
  FROM lineitem GROUP BY l_orderkey
), lat AS (
  SELECT CAST(o.o_orderdate AS DATE) AS od,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE), f.ship)
              AS BIGINT) AS w
  FROM orders o JOIN first f ON f.l_orderkey = o.o_orderkey
), span AS (
  SELECT MIN(od) AS d0, MAX(od) AS d1 FROM lat
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS sw,
         CAST(MAX(datediff('day', d0, d1) + 1) AS BIGINT) AS days
  FROM lat CROSS JOIN span
)
SELECT n AS n_orders, days AS n_days,
       ROUND(CAST(n AS DOUBLE) / CAST(days AS DOUBLE), 6)
         AS lambda_per_day,
       ROUND(CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS mean_latency_days,
       ROUND(CAST(sw AS DOUBLE) / CAST(days AS DOUBLE), 6)
         AS mean_open_orders,
       ROUND((CAST(sw AS DOUBLE) / CAST(days AS DOUBLE))
             / ((CAST(n AS DOUBLE) / CAST(days AS DOUBLE))
                * (CAST(sw AS DOUBLE) / CAST(n AS DOUBLE))), 6)
         AS littles_ratio
FROM agg
"""

R8B_QUERIES["orders_littles_law"] = (
    q_orders_littles_law, _QLITTLE_SQL, False)


# =============================================================================
# Wave 32 — tail excess modeling, vocabulary growth law, directional
# statistics, stochastic dominance
# =============================================================================

# --- events_pot_gpd_fit ---------------------------------------------------------

def q_events_pot_gpd_fit(spark, sf_dir):
    """Peaks-over-threshold Generalized Pareto fit of event values: the
    threshold is the exact rank-selected 95th percentile value (no
    interpolation), and the GPD shape/scale come from the method of
    moments on the excesses — xi = (1 - m^2/v)/2, sigma = m*(m^2/v+1)/2.
    The EVT pair to the Gumbel block-maxima fit: tails, not maxima.

    Scale shape: one rank window for the threshold, one excess
    aggregation."""
    ev = load_table(spark, sf_dir, "events").select("value", "event_id")
    n = ev.count()
    k = max(1, (n * 95) // 100)
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    thr = (ev.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == k)
           .select(F.col("value").alias("u")))
    exc = (ev.crossJoin(F.broadcast(thr))
           .filter(F.col("value") > F.col("u"))
           .select((F.col("value") - F.col("u")).alias("x"), "u"))
    agg = exc.agg(F.count(F.lit(1)).cast("long").alias("ne"),
                  F.min("u").alias("u"),
                  F.sum("x").alias("s1"),
                  F.sum(F.col("x") * F.col("x")).alias("s2"))
    nD = F.col("ne").cast("double")
    m = F.col("s1") / nD
    v = (nD * F.col("s2") - F.col("s1") * F.col("s1")) / (nD * (nD - 1.0))
    xi = 0.5 * (1.0 - m * m / v)
    sigma = 0.5 * m * (m * m / v + 1.0)
    return agg.select(
        F.col("ne").alias("n_excesses"),
        F.round(F.col("u"), 6).alias("threshold"),
        F.round(xi, 6).alias("gpd_xi"),
        F.round(sigma, 6).alias("gpd_sigma"))


_QGPD_SQL = """
WITH nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
), thr AS (
  SELECT value AS u
  FROM (SELECT value, event_id,
               row_number() OVER (ORDER BY value ASC, event_id ASC)
                 AS rk
        FROM events) r CROSS JOIN nn
  WHERE rk = greatest(1, (nn.n * 95) // 100)
), exc AS (
  SELECT e.value - thr.u AS x, thr.u
  FROM events e CROSS JOIN thr
  WHERE e.value > thr.u
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ne, MIN(u) AS u, SUM(x) AS s1,
         SUM(x * x) AS s2
  FROM exc
)
SELECT ne AS n_excesses,
       ROUND(u, 6) AS threshold,
       ROUND(0.5 * (1.0 - (s1 / CAST(ne AS DOUBLE))
                          * (s1 / CAST(ne AS DOUBLE))
                          / ((CAST(ne AS DOUBLE) * s2 - s1 * s1)
                             / (CAST(ne AS DOUBLE)
                                * (CAST(ne AS DOUBLE) - 1.0)))), 6)
         AS gpd_xi,
       ROUND(0.5 * (s1 / CAST(ne AS DOUBLE))
             * ((s1 / CAST(ne AS DOUBLE)) * (s1 / CAST(ne AS DOUBLE))
                / ((CAST(ne AS DOUBLE) * s2 - s1 * s1)
                   / (CAST(ne AS DOUBLE) * (CAST(ne AS DOUBLE) - 1.0)))
                + 1.0), 6) AS gpd_sigma
FROM agg
"""

R8B_QUERIES["events_pot_gpd_fit"] = (q_events_pot_gpd_fit, _QGPD_SQL, False)


# --- doc_heaps_law --------------------------------------------------------------

def q_doc_heaps_law(spark, sf_dir):
    """Heaps'-law fit of vocabulary growth V = K * N^beta: each term's
    first occurrence is pinned to the smallest doc_id containing it;
    checkpoints at every 100th document record (cumulative tokens N,
    cumulative vocabulary V) — both exact integer prefix sums — and
    log-log OLS over the checkpoints gives beta (slope) and K
    (exp(intercept)).  The third corpus-growth law next to Zipf and
    Herdan's C.

    Scale shape: one (term -> min doc) aggregation, two prefix windows
    over the doc-count-sized table, one 5-sum OLS."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id",
                        F.explode(_text.tokens(F.col("text"))).alias("term"))
            .filter(F.col("term") != ""))
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long")
                                         .alias("nt"))
    firsts = (toks.groupBy("term")
              .agg(F.min("doc_id").alias("doc_id"))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("nv")))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    wd = Window.orderBy("doc_id")
    cum = (per_doc.join(firsts, "doc_id", "left")
           .withColumn("nv", F.coalesce(F.col("nv"), F.lit(0)))
           .withColumn("cn", F.sum("nt").over(w).cast("long"))
           .withColumn("cv", F.sum("nv").over(w).cast("long"))
           .withColumn("rn", F.row_number().over(wd)))
    pts = (cum.filter(F.col("rn") % 100 == 0)
           .select(F.log(F.col("cn").cast("double")).alias("x"),
                   F.log(F.col("cv").cast("double")).alias("y")))
    ols = pts.agg(F.count(F.lit(1)).cast("long").alias("k"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(F.col("x") * F.col("x")).alias("sxx"),
                  F.sum(F.col("x") * F.col("y")).alias("sxy"))
    kD = F.col("k").cast("double")
    beta = (kD * F.col("sxy") - F.col("sx") * F.col("sy")) \
        / (kD * F.col("sxx") - F.col("sx") * F.col("sx"))
    icept = (F.col("sy") - beta * F.col("sx")) / kD
    return ols.select(
        F.col("k").alias("n_checkpoints"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(F.exp(icept), 6).alias("heaps_k"))


_QHEAPS_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
       LATERAL (SELECT unnest(tk) AS term) t
  WHERE t.term <> ''
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM toks GROUP BY doc_id
), firsts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nv
  FROM (SELECT term, MIN(doc_id) AS doc_id FROM toks GROUP BY term)
  GROUP BY doc_id
), cum AS (
  SELECT p.doc_id,
         CAST(SUM(p.nt) OVER (ORDER BY p.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cn,
         CAST(SUM(COALESCE(f.nv, 0)) OVER (ORDER BY p.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cv,
         row_number() OVER (ORDER BY p.doc_id) AS rn
  FROM per_doc p LEFT JOIN firsts f USING (doc_id)
), pts AS (
  SELECT ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y
  FROM cum WHERE rn % 100 = 0
), ols AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT k AS n_checkpoints,
       ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) + 0.0 AS heaps_beta,
       ROUND(exp((sy - ((CAST(k AS DOUBLE) * sxy - sx * sy)
                        / (CAST(k AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(k AS DOUBLE)), 6) + 0.0 AS heaps_k
FROM ols
"""

R8B_QUERIES["doc_heaps_law"] = (q_doc_heaps_law, _QHEAPS_SQL, False)


# --- events_circular_hour_stats -------------------------------------------------

def q_events_circular_hour_stats(spark, sf_dir):
    """Directional statistics of the event hour-of-day, per event type:
    circular mean hour (atan2 of the sine/cosine resultants) and the
    mean resultant length R (0 = uniform around the clock, 1 = a single
    spike) — the correct average for wrap-around quantities where the
    arithmetic mean of 23h and 1h is NOT noon.

    Scale shape: one aggregation of two trig sums per type."""
    ev = load_table(spark, sf_dir, "events")
    theta = (F.hour("ts").cast("double") * (6.283185307179586 / 24.0))
    agg = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.cos(theta)).alias("c"),
                F.sum(F.sin(theta)).alias("s")))
    nD = F.col("n").cast("double")
    r = F.sqrt(F.col("c") * F.col("c") + F.col("s") * F.col("s")) / nD
    mean_h = (F.atan2(F.col("s"), F.col("c"))
              * (24.0 / 6.283185307179586) + 24.0) % 24.0
    return (agg.select("event_type", "n",
                       F.round(mean_h, 6).alias("circular_mean_hour"),
                       F.round(r, 6).alias("resultant_length"))
            .orderBy("event_type"))


_QCIRC_SQL = """
WITH agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(cos(CAST(hour(ts) AS DOUBLE)
                 * (6.283185307179586 / 24.0))) AS c,
         SUM(sin(CAST(hour(ts) AS DOUBLE)
                 * (6.283185307179586 / 24.0))) AS s
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       ROUND((atan2(s, c) * (24.0 / 6.283185307179586) + 24.0) % 24.0, 6)
         AS circular_mean_hour,
       ROUND(sqrt(c * c + s * s) / CAST(n AS DOUBLE), 6)
         AS resultant_length
FROM agg
ORDER BY event_type
"""

R8B_QUERIES["events_circular_hour_stats"] = (
    q_events_circular_hour_stats, _QCIRC_SQL, False)


# --- orders_stochastic_dominance ------------------------------------------------

def q_orders_stochastic_dominance(spark, sf_dir):
    """First-order stochastic dominance check between the URGENT and LOW
    priority o_totalprice distributions: from the distinct-value
    integer CDFs, the maximum signed gaps n2*cum1 - n1*cum2 in both
    directions (exact BIGINT cross-products) decide whether one CDF
    sits entirely below the other (dominates), or the CDFs cross.
    The decision-theoretic companion to the KS test and the EMD.

    Scale shape: one distinct-value aggregation, one prefix window, one
    scalar finish."""
    orders = load_table(spark, sf_dir, "orders")
    sel = orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    per = (sel.groupBy(F.col("o_totalprice").alias("v"))
           .agg(F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                      .otherwise(0)).cast("long").alias("c1"),
                F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1)
                      .otherwise(0)).cast("long").alias("c2")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = (per.withColumn("cum1", F.sum("c1").over(w).cast("long"))
           .withColumn("cum2", F.sum("c2").over(w).cast("long")))
    tot = cum.agg(F.max("cum1").alias("n1"), F.max("cum2").alias("n2"))
    g = (cum.crossJoin(F.broadcast(tot))
         .withColumn("d", F.col("n2") * F.col("cum1")
                     - F.col("n1") * F.col("cum2")))
    agg = g.agg(F.max("d").cast("long").alias("max_d"),
                F.min("d").cast("long").alias("min_d"),
                F.max("n1").alias("n1"), F.max("n2").alias("n2"))
    verdict = (F.when((F.col("max_d") <= 0), F.lit("urgent_dominates"))
               .when((F.col("min_d") >= 0), F.lit("low_dominates"))
               .otherwise(F.lit("cdfs_cross")))
    return agg.select(
        "n1", "n2",
        F.round(F.col("max_d").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"), 6)
        .alias("max_gap"),
        F.round(F.col("min_d").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"), 6)
        .alias("min_gap"),
        verdict.alias("fosd_verdict"))


_QFOSD_SQL = """
WITH per AS (
  SELECT o_totalprice AS v,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
                  END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0
                  END) AS BIGINT) AS c2
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_totalprice
), cum AS (
  SELECT CAST(SUM(c1) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum2
  FROM per
), tot AS (
  SELECT MAX(cum1) AS n1, MAX(cum2) AS n2 FROM cum
), agg AS (
  SELECT CAST(MAX(n2 * cum1 - n1 * cum2) AS BIGINT) AS max_d,
         CAST(MIN(n2 * cum1 - n1 * cum2) AS BIGINT) AS min_d,
         MAX(n1) AS n1, MAX(n2) AS n2
  FROM cum CROSS JOIN tot
)
SELECT n1, n2,
       ROUND(CAST(max_d AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6)
         AS max_gap,
       ROUND(CAST(min_d AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6)
         AS min_gap,
       CASE WHEN max_d <= 0 THEN 'urgent_dominates'
            WHEN min_d >= 0 THEN 'low_dominates'
            ELSE 'cdfs_cross' END AS fosd_verdict
FROM agg
"""

R8B_QUERIES["orders_stochastic_dominance"] = (
    q_orders_stochastic_dominance, _QFOSD_SQL, False)


# =============================================================================
# Wave 33 — effect sizes, model gains chart
# =============================================================================

# --- lineitem_effect_size -------------------------------------------------------

def q_lineitem_effect_size(spark, sf_dir):
    """Standardized effect sizes for returned-vs-kept line prices:
    Cohen's d on the pooled standard deviation and the small-sample
    Hedges' g correction g = d * (1 - 3/(4*(n1+n2)-9)) — what a
    meta-analysis reports where the Welch test only reports
    significance.  Prices scaled /1e5 per the ANOVA convention; every
    moment is a ratio of exact sums.

    Degenerate-input edge (r13 ADVICE): on a corpus where either group is
    EMPTY, the pre-r13 crossJoin-of-filtered-branches shape returned 0
    rows while this single-pass aggregate returns 1 row of nulls.  On the
    TPC-H tables both groups always exist (oracle-verified identical);
    corpora that must reproduce the old 0-row shape should add a
    ``WHERE n1 > 0 AND n2 > 0`` finish.

    Scale shape: one two-group aggregation, one scalar finish."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice") / F.lit(100000.0)
    # ONE conditional global aggregation (r13): the old shape grouped by
    # the return flag and cross-joined two filtered 1-row branches back,
    # which re-executed the corpus aggregation once per branch (2 scans;
    # scan-budget discovery audit).  sum(when(...)) over the two disjoint
    # groups computes the identical moments in a single pass with no
    # join at all.
    r1 = F.col("l_returnflag") == "R"
    j = li.agg(
        F.sum(F.when(r1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(r1, y)).alias("s1"),
        F.sum(F.when(r1, y * y)).alias("q1"),
        F.sum(F.when(~r1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(~r1, y)).alias("s2"),
        F.sum(F.when(~r1, y * y)).alias("q2"))
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1, m2 = F.col("s1") / n1, F.col("s2") / n2
    ss1 = F.col("q1") - F.col("s1") * F.col("s1") / n1
    ss2 = F.col("q2") - F.col("s2") * F.col("s2") / n2
    sp = F.sqrt((ss1 + ss2) / (n1 + n2 - 2.0))
    d = (m1 - m2) / sp
    corr = 1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)
    return j.select(
        F.col("n1").alias("n_returned"), F.col("n2").alias("n_kept"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr, 6).alias("hedges_g"))


_QEFFECT_SQL = """
WITH g AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(l_extendedprice / 100000.0) AS s,
         SUM((l_extendedprice / 100000.0)
             * (l_extendedprice / 100000.0)) AS q
  FROM lineitem GROUP BY 1
), j AS (
  SELECT o.n AS n1, o.s AS s1, o.q AS q1,
         z.n AS n2, z.s AS s2, z.q AS q2
  FROM (SELECT * FROM g WHERE r = 1) o
  CROSS JOIN (SELECT * FROM g WHERE r = 0) z
)
SELECT n1 AS n_returned, n2 AS n_kept,
       ROUND((s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
             / sqrt(((q1 - s1 * s1 / CAST(n1 AS DOUBLE))
                     + (q2 - s2 * s2 / CAST(n2 AS DOUBLE)))
                    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)),
             6) AS cohens_d,
       ROUND(((s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
              / sqrt(((q1 - s1 * s1 / CAST(n1 AS DOUBLE))
                      + (q2 - s2 * s2 / CAST(n2 AS DOUBLE)))
                     / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)))
             * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE)
                                    + CAST(n2 AS DOUBLE)) - 9.0)), 6)
         AS hedges_g
FROM j
"""

R8B_QUERIES["lineitem_effect_size"] = (
    q_lineitem_effect_size, _QEFFECT_SQL, False)


# --- events_gains_chart ---------------------------------------------------------

def q_events_gains_chart(spark, sf_dir):
    """Cumulative gains chart of the engagement-segment purchase model:
    users ranked by predicted purchase rate (their decile's rate, tie
    user_id), then per population decile the cumulative share of all
    purchasers captured and the lift over random — THE model-triage
    chart.  All integer ratios (rank-arithmetic deciles, never NTILE).

    Scale shape: one user aggregation, two rank windows, one 10-row
    finish."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")))
    n = users.count()
    wseg = Window.orderBy(F.col("n_ev").desc(), F.col("user_id").asc())
    seg = (users.withColumn("rk", F.row_number().over(wseg))
           .withColumn("segment", F.floor((F.col("rk") - 1) * 10
                                          / F.lit(n)).cast("long")))
    rates = (seg.groupBy("segment")
             .agg(F.count(F.lit(1)).cast("long").alias("ns"),
                  F.sum("y").cast("long").alias("nb")))
    scored = (seg.join(F.broadcast(rates), "segment")
              .withColumn("p", F.col("nb").cast("double")
                          / F.col("ns").cast("double")))
    wrank = Window.orderBy(F.col("p").desc(), F.col("user_id").asc())
    ranked = (scored.withColumn("r", F.row_number().over(wrank))
              .withColumn("dec", F.floor((F.col("r") - 1) * 10
                                         / F.lit(n)).cast("long")))
    tot = ranked.agg(F.sum("y").cast("long").alias("tb"))
    per = (ranked.groupBy("dec")
           .agg(F.count(F.lit(1)).cast("long").alias("nd"),
                F.sum("y").cast("long").alias("bd")))
    w = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    cum = (per.withColumn("cb", F.sum("bd").over(w).cast("long"))
           .withColumn("cn", F.sum("nd").over(w).cast("long"))
           .crossJoin(F.broadcast(tot)))
    gain = F.col("cb").cast("double") / F.col("tb").cast("double")
    pop = F.col("cn").cast("double") / F.lit(float(n))
    return (cum.select(F.col("dec").alias("decile"),
                       F.col("cn").alias("cum_users"),
                       F.col("cb").alias("cum_buyers"),
                       F.round(gain, 6).alias("cum_gain"),
                       F.round(gain / pop, 6).alias("lift"))
            .orderBy("decile"))


_QGAINS_SQL = """
WITH users AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM users),
seg AS (
  SELECT user_id, y,
         CAST(FLOOR((row_number() OVER (ORDER BY n_ev DESC, user_id ASC)
                     - 1) * 10 / nn.n) AS BIGINT) AS segment
  FROM users CROSS JOIN nn
), rates AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS ns,
         CAST(SUM(y) AS BIGINT) AS nb
  FROM seg GROUP BY segment
), ranked AS (
  SELECT s.user_id, s.y,
         CAST(FLOOR((row_number() OVER (
                 ORDER BY CAST(r.nb AS DOUBLE) / CAST(r.ns AS DOUBLE)
                          DESC, s.user_id ASC) - 1) * 10 / nn.n)
           AS BIGINT) AS dec
  FROM seg s JOIN rates r USING (segment) CROSS JOIN nn
), per AS (
  SELECT dec, CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(y) AS BIGINT) AS bd
  FROM ranked GROUP BY dec
), cum AS (
  SELECT dec, nd, bd,
         CAST(SUM(bd) OVER (ORDER BY dec
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cb,
         CAST(SUM(nd) OVER (ORDER BY dec
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cn
  FROM per
), tot AS (SELECT CAST(SUM(y) AS BIGINT) AS tb FROM users)
SELECT dec AS decile, cn AS cum_users, cb AS cum_buyers,
       ROUND(CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS cum_gain,
       ROUND((CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
             / (CAST(cn AS DOUBLE) / CAST((SELECT n FROM nn) AS DOUBLE)),
             6) AS lift
FROM cum CROSS JOIN tot
ORDER BY decile
"""

R8B_QUERIES["events_gains_chart"] = (
    q_events_gains_chart, _QGAINS_SQL, False)


# =============================================================================
# Wave 34 — sketch precision/recall, fiscal calendars, video shot detection
# =============================================================================

# --- minhash_threshold_pr_curve -------------------------------------------------

def q_minhash_threshold_pr_curve(spark, sf_dir):
    """Precision/recall curve of MinHash-LSH dedup against exact shingle
    Jaccard at banding-aligned thresholds {4/8, 5/8, 6/8}: predicted =
    LSH candidate pairs with >= k agreeing seeds, actual = corpus-wide
    pairs with 8*|A∩B| >= k*|A∪B| (pure INTEGER comparisons on both
    sides — est values are exact eighths and the exact test cross-
    multiplies, so no float threshold can tie).  The operating-point
    table that turns the calibration curve into a deploy decision.

    Scale shape: one LSH candidate pass + one posting self-join (the
    ngram_jaccard_pairs shape); the PR finish is three counted joins."""
    from ..pipeline import dedup as D
    from ..pipeline.dedup import _overlap_pairs
    from .sql_shared import LSH_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    est = (D.minhash_estimate_pairs(docs, "doc_id", "text", num_hashes=8,
                                    bands=4, max_bucket=LSH_MAX_BUCKET)
           .select("id_a", "id_b",
                   F.round(F.col("jaccard_est") * 8).cast("long")
                   .alias("agree")))
    ov = _overlap_pairs(docs, "doc_id", "text", 3, False, 5, None)
    exact = ov.select("id_a", "id_b",
                      F.col("n_common").cast("long").alias("nc"),
                      (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
                      .cast("long").alias("un"))
    ks = spark.range(0, 3).select(
        (F.col("id") + 4).cast("long").alias("k"))
    pred = (est.crossJoin(F.broadcast(ks))
            .filter(F.col("agree") >= F.col("k"))
            .groupBy("k").agg(F.count(F.lit(1)).cast("long")
                              .alias("n_pred")))
    act_pairs = (exact.crossJoin(F.broadcast(ks))
                 .filter(8 * F.col("nc") >= F.col("k") * F.col("un")))
    act = act_pairs.groupBy("k").agg(F.count(F.lit(1)).cast("long")
                                     .alias("n_actual"))
    hit = (act_pairs.join(est, ["id_a", "id_b"])
           .filter(F.col("agree") >= F.col("k"))
           .groupBy("k").agg(F.count(F.lit(1)).cast("long")
                             .alias("n_hit")))
    j = (ks.join(pred, "k", "left").join(act, "k", "left")
         .join(hit, "k", "left")
         .select("k",
                 F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
                 F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
                 F.coalesce("n_hit", F.lit(0)).alias("n_hit")))
    prec = F.when(F.col("n_pred") > 0, F.col("n_hit").cast("double")
                  / F.col("n_pred").cast("double"))
    rec = F.when(F.col("n_actual") > 0, F.col("n_hit").cast("double")
                 / F.col("n_actual").cast("double"))
    return (j.select(
        F.round(F.col("k").cast("double") / 8.0, 6).alias("threshold"),
        "n_pred", "n_actual", "n_hit",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"))
        .orderBy("threshold"))


def _mh_pr_sql() -> str:
    from .sql_shared import lsh_pairs_cte, mh_sig_cte

    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(8))
    return mh_sig_cte("") + lsh_pairs_cte() + f"""
, est AS MATERIALIZED (
  SELECT p.id_a, p.id_b, CAST({agree} AS BIGINT) AS agree
  FROM pairs p
  JOIN sigw a ON a.doc_id = p.id_a
  JOIN sigw b ON b.doc_id = p.id_b
), shing AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 2), ' ') AS shingle
  FROM toks,
       LATERAL (SELECT unnest(range(1, greatest(len(tk) - 2, 1) + 1))
                  AS i) t
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shing GROUP BY doc_id
), exact AS MATERIALIZED (
  SELECT c.id_a, c.id_b, c.nc, sa.sz + sb.sz - c.nc AS un
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS nc
        FROM shing a JOIN shing b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
), ks AS (SELECT CAST(unnest([4, 5, 6]) AS BIGINT) AS k),
pred AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pred
  FROM est CROSS JOIN ks WHERE agree >= k GROUP BY k
), act AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_actual
  FROM exact CROSS JOIN ks WHERE 8 * nc >= k * un GROUP BY k
), hit AS (
  SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM exact e CROSS JOIN ks
  JOIN est ON est.id_a = e.id_a AND est.id_b = e.id_b
  WHERE 8 * e.nc >= ks.k * e.un AND est.agree >= ks.k
  GROUP BY ks.k
)
SELECT ROUND(CAST(ks.k AS DOUBLE) / 8.0, 6) AS threshold,
       COALESCE(pred.n_pred, 0) AS n_pred,
       COALESCE(act.n_actual, 0) AS n_actual,
       COALESCE(hit.n_hit, 0) AS n_hit,
       ROUND(CASE WHEN COALESCE(pred.n_pred, 0) > 0
                  THEN CAST(COALESCE(hit.n_hit, 0) AS DOUBLE)
                       / CAST(pred.n_pred AS DOUBLE) END, 6) AS precision,
       ROUND(CASE WHEN COALESCE(act.n_actual, 0) > 0
                  THEN CAST(COALESCE(hit.n_hit, 0) AS DOUBLE)
                       / CAST(act.n_actual AS DOUBLE) END, 6) AS recall
FROM ks
LEFT JOIN pred ON pred.k = ks.k
LEFT JOIN act ON act.k = ks.k
LEFT JOIN hit ON hit.k = ks.k
ORDER BY threshold
"""


R8B_QUERIES["minhash_threshold_pr_curve"] = (
    q_minhash_threshold_pr_curve, _mh_pr_sql(), False)


# --- orders_fiscal_445_rollup ---------------------------------------------------

def q_orders_fiscal_445_rollup(spark, sf_dir):
    """Revenue rolled up to a 4-4-5 fiscal calendar (FY starts
    1996-02-01; each quarter = 4+4+5 weeks = 91 days): fiscal period =
    integer arithmetic on the day offset, so the mapping is exact and
    identical in both engines — the retail/enterprise reporting calendar
    the plain month rollup can't express.  FY1997 only (a complete
    364-day fiscal year inside the data).

    Scale shape: one scan with pure arithmetic, one 12-row rollup."""
    orders = load_table(spark, sf_dir, "orders")
    off = F.datediff(F.to_date("o_orderdate"),
                     F.lit("1996-02-01").cast("date"))
    within = F.col("off") % 364
    q = F.floor(within / 91)
    dq = within % 91
    p_in_q = (F.when(dq < 28, 0).when(dq < 56, 1).otherwise(2))
    sel = (orders.withColumn("off", off)
           .filter((F.col("off") >= 364) & (F.col("off") < 728))
           .withColumn("fq", q.cast("long") + 1)
           .withColumn("fp", (q * 3 + p_in_q).cast("long") + 1))
    return (sel.groupBy("fq", "fp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
                 (F.round(F.sum(F.round(F.col("o_totalprice") * 100)
                                .cast("long")) / 100.0 / 1e3, 6)
                  + F.lit(0.0)).alias("revenue_k"))
            .orderBy("fp"))


_Q445_SQL = """
WITH sel AS (
  SELECT datediff('day', DATE '1996-02-01', CAST(o_orderdate AS DATE))
           AS off,
         o_totalprice
  FROM orders
), f AS (
  SELECT off % 364 AS within, o_totalprice
  FROM sel WHERE off >= 364 AND off < 728
), m AS (
  SELECT CAST((within // 91) AS BIGINT) + 1 AS fq,
         CAST((within // 91) * 3
              + (CASE WHEN within % 91 < 28 THEN 0
                      WHEN within % 91 < 56 THEN 1 ELSE 2 END)
              AS BIGINT) + 1 AS fp,
         o_totalprice
  FROM f
)
SELECT fq, fp, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 / 1e3, 6) + 0.0 AS revenue_k
FROM m
GROUP BY fq, fp
ORDER BY fp
"""

R8B_QUERIES["orders_fiscal_445_rollup"] = (
    q_orders_fiscal_445_rollup, _Q445_SQL, False)


# --- multimodal_shot_boundaries -------------------------------------------------

def q_multimodal_shot_boundaries(spark, sf_dir):
    """Shot-boundary detection plumbing over the framed synthetic video
    (audio_chunk_energy frames standing in for per-frame features): a
    boundary is a frame whose energy jumps more than 600 from the
    previous frame — the |diff| > threshold cut detector, value-checked
    per boundary (a real frame-difference metric swaps in behind the
    same frame contract).  Fifth multimodal stage.

    Scale shape: the Python stage is Arrow-batched mapInPandas; the
    detector is one per-doc lag window."""
    from ..pipeline import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    payloads = docs.select(
        "doc_id",
        F.unhex(F.concat(F.md5("text"), F.md5("text"))).alias("payload"))
    frames = mm.audio_chunk_energy(payloads, "doc_id", "payload",
                                   frame_bytes=8)
    w = Window.partitionBy("id").orderBy("frame_idx")
    d = (frames.withColumn("prev", F.lag("energy").over(w))
         .filter(F.col("prev").isNotNull())
         .withColumn("jump", F.abs(F.col("energy") - F.col("prev"))
                     .cast("long"))
         .filter(F.col("jump") > 600))
    return (d.select(F.col("id").alias("doc_id"),
                     F.col("frame_idx").cast("int").alias("boundary_frame"),
                     "jump")
            .orderBy("doc_id", "boundary_frame"))


def _shot_sql() -> str:
    frames = []
    for kf in range(4):
        terms = " + ".join(
            f"('0x' || substr(h, {(kf * 8 + i) * 2 + 1}, 2))::BIGINT"
            for i in range(8))
        frames.append(
            f"SELECT doc_id, CAST({kf} AS INT) AS frame_idx, "
            f"CAST({terms} AS BIGINT) AS energy FROM h")
    u = " UNION ALL ".join(frames)
    return f"""
WITH h AS (
  SELECT doc_id, md5(text) || md5(text) AS h FROM documents
  WHERE doc_id < 100
), frames AS ({u}),
d AS (
  SELECT doc_id, frame_idx, energy,
         lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx)
           AS prev
  FROM frames
)
SELECT doc_id, CAST(frame_idx AS INT) AS boundary_frame,
       CAST(abs(energy - prev) AS BIGINT) AS jump
FROM d
WHERE prev IS NOT NULL AND abs(energy - prev) > 600
ORDER BY doc_id, boundary_frame
"""


R8B_QUERIES["multimodal_shot_boundaries"] = (
    q_multimodal_shot_boundaries, _shot_sql(), False)


# =============================================================================
# Wave 35 — lead-lag cross-correlation, parameter sensitivity,
# ranking stability
# =============================================================================

# --- events_cross_correlation ---------------------------------------------------

def q_events_cross_correlation(spark, sf_dir):
    """Lead-lag cross-correlation between the daily 'view' and
    'purchase' count series at lags 0..3 days (does viewing predict
    purchasing?): r(lag) = Pearson correlation of (view[t], purchase
    [t+lag]) over the overlapping days, all moments from exact integer
    sums per lag.  The lead-lag read autocorrelation can't give.

    Scale shape: one (day, type) aggregation, a 4-row lag grid joined
    on the day-domain-bounded series."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("event_type").isin("view", "purchase"))
             .groupBy(F.to_date("ts").alias("day"), "event_type")
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
    v = (daily.filter(F.col("event_type") == "view")
         .select(F.col("day").alias("dv"), F.col("c").alias("x")))
    p = (daily.filter(F.col("event_type") == "purchase")
         .select(F.col("day").alias("dp"), F.col("c").alias("y")))
    lags = spark.range(0, 4).select(F.col("id").cast("int").alias("lag"))
    j = (v.crossJoin(F.broadcast(lags))
         .join(p, F.expr("date_add(dv, lag) = dp")))
    agg = (j.groupBy("lag")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("qx"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("qy"),
                F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy")))
    nD = F.col("n").cast("double")
    num = nD * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = (F.sqrt(nD * F.col("qx").cast("double")
                  - F.col("sx").cast("double") * F.col("sx").cast("double"))
           * F.sqrt(nD * F.col("qy").cast("double")
                    - F.col("sy").cast("double")
                    * F.col("sy").cast("double")))
    return (agg.select("lag", F.col("n").alias("n_days"),
                       F.round(num / den, 6).alias("cross_corr"))
            .orderBy("lag"))


_QXCORR_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
), v AS (SELECT day AS dv, c AS x FROM daily WHERE event_type = 'view'),
p AS (SELECT day AS dp, c AS y FROM daily
      WHERE event_type = 'purchase'),
lags AS (SELECT CAST(unnest([0, 1, 2, 3]) AS INT) AS lag),
j AS (
  SELECT lags.lag, v.x, p.y
  FROM v CROSS JOIN lags
  JOIN p ON p.dp = v.dv + lags.lag * INTERVAL 1 DAY
), agg AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS qx,
         CAST(SUM(y * y) AS BIGINT) AS qy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM j GROUP BY lag
)
SELECT lag, n AS n_days,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS cross_corr
FROM agg
ORDER BY lag
"""

R8B_QUERIES["events_cross_correlation"] = (
    q_events_cross_correlation, _QXCORR_SQL, False)


# --- events_session_gap_sensitivity ----------------------------------------------

def q_events_session_gap_sensitivity(spark, sf_dir):
    """Sessionization parameter-sensitivity curve: per candidate
    inactivity gap {10, 30, 60} minutes, the session count, mean events
    per session, and single-event-session share — the tuning table read
    before fixing the session definition everything downstream inherits.
    A session starts where the per-user gap exceeds the threshold; all
    counts integer-exact.

    Scale shape: ONE per-user lag window computes the gap; each
    threshold is then a pure aggregation over the same annotated scan —
    the parameter sweep costs one extra broadcast, not three windows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w))
        .alias("gap_us"))
    thr = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(10), F.lit(30), F.lit(60)),
                     (F.col("id") + 1).cast("int")).cast("long")
        .alias("gap_min"))
    g = (gaps.crossJoin(F.broadcast(thr))
         .withColumn("is_start",
                     F.when(F.col("gap_us").isNull()
                            | (F.col("gap_us")
                               > F.col("gap_min") * 60000000), 1)
                     .otherwise(0)))
    agg = (g.groupBy("gap_min")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("is_start").cast("long").alias("n_sessions")))
    return (agg.select("gap_min", "n_sessions",
                       F.round(F.col("n_events").cast("double")
                               / F.col("n_sessions").cast("double"), 6)
                       .alias("mean_events_per_session"))
            .orderBy("gap_min"))


_QGAPSENS_SQL = """
WITH gaps AS (
  SELECT user_id,
         us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS gap_us
  FROM (SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events)
), thr AS (SELECT CAST(unnest([10, 30, 60]) AS BIGINT) AS gap_min),
g AS (
  SELECT thr.gap_min,
         CASE WHEN gap_us IS NULL
                OR gap_us > thr.gap_min * 60000000 THEN 1 ELSE 0 END
           AS is_start
  FROM gaps CROSS JOIN thr
)
SELECT gap_min, CAST(SUM(is_start) AS BIGINT) AS n_sessions,
       ROUND(CAST(COUNT(*) AS BIGINT)
             / CAST(SUM(is_start) AS DOUBLE), 6)
         AS mean_events_per_session
FROM g
GROUP BY gap_min
ORDER BY gap_min
"""

R8B_QUERIES["events_session_gap_sensitivity"] = (
    q_events_session_gap_sensitivity, _QGAPSENS_SQL, False)


# --- customer_topk_jackknife ----------------------------------------------------

def q_customer_topk_jackknife(spark, sf_dir):
    """Jackknife stability of the top-10 customer ranking: recompute the
    top-10 by revenue with each 1997 month left out in turn and report,
    per left-out month, the overlap with the full-year top-10 — a
    ranking that churns under single-month deletion is noise, not
    signal.  Revenue in exact cents; every ranking is integer-ordered.

    Scale shape: one (customer, month) aggregation; each jackknife
    replicate ranks the customer-level table with one month's
    contribution subtracted — 12 window passes over customer-count-sized
    data, never a rescan of orders."""
    orders = load_table(spark, sf_dir, "orders")
    cm = (orders.filter(F.year("o_orderdate") == 1997)
          .groupBy("o_custkey", F.month("o_orderdate").alias("m"))
          .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
               .cast("long").alias("cents")))
    tot = (cm.groupBy("o_custkey")
           .agg(F.sum("cents").cast("long").alias("full_cents")))
    wfull = Window.orderBy(F.col("full_cents").desc(),
                           F.col("o_custkey").asc())
    full_top = (tot.withColumn("rk", F.row_number().over(wfull))
                .filter(F.col("rk") <= 10)
                .select(F.col("o_custkey").alias("ck")))
    months = spark.range(1, 13).select(F.col("id").cast("int").alias("m"))
    jk = (tot.crossJoin(F.broadcast(months))
          .join(cm.select(F.col("o_custkey"), F.col("m"),
                          F.col("cents").alias("out_cents")),
                ["o_custkey", "m"], "left")
          .withColumn("jk_cents", F.col("full_cents")
                      - F.coalesce(F.col("out_cents"), F.lit(0))))
    wjk = Window.partitionBy("m").orderBy(F.col("jk_cents").desc(),
                                          F.col("o_custkey").asc())
    jk_top = (jk.withColumn("rk", F.row_number().over(wjk))
              .filter(F.col("rk") <= 10))
    overlap = (jk_top.join(F.broadcast(full_top),
                           jk_top.o_custkey == full_top.ck, "left_semi")
               .groupBy("m")
               .agg(F.count(F.lit(1)).cast("long").alias("n_overlap")))
    return (months.join(overlap, "m", "left")
            .select(F.col("m").alias("left_out_month"),
                    F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
                    F.round(F.coalesce("n_overlap", F.lit(0))
                            .cast("double") / 10.0, 6).alias("stability"))
            .orderBy("left_out_month"))


_QJACKKNIFE_SQL = """
WITH cm AS (
  SELECT o_custkey, month(o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE year(o_orderdate) = 1997
  GROUP BY 1, 2
), tot AS (
  SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS full_cents
  FROM cm GROUP BY o_custkey
), full_top AS (
  SELECT o_custkey AS ck
  FROM (SELECT o_custkey,
               row_number() OVER (ORDER BY full_cents DESC,
                                  o_custkey ASC) AS rk
        FROM tot)
  WHERE rk <= 10
), months AS (SELECT CAST(unnest(range(1, 13)) AS INT) AS m),
jk AS (
  SELECT t.o_custkey, months.m,
         t.full_cents - COALESCE(cm.cents, 0) AS jk_cents
  FROM tot t CROSS JOIN months
  LEFT JOIN cm ON cm.o_custkey = t.o_custkey AND cm.m = months.m
), jk_top AS (
  SELECT m, o_custkey
  FROM (SELECT m, o_custkey,
               row_number() OVER (PARTITION BY m
                   ORDER BY jk_cents DESC, o_custkey ASC) AS rk
        FROM jk)
  WHERE rk <= 10
), overlap AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM jk_top
  WHERE o_custkey IN (SELECT ck FROM full_top)
  GROUP BY m
)
SELECT months.m AS left_out_month,
       COALESCE(overlap.n_overlap, 0) AS n_overlap,
       ROUND(COALESCE(overlap.n_overlap, 0) / 10.0, 6) AS stability
FROM months LEFT JOIN overlap ON overlap.m = months.m
ORDER BY left_out_month
"""

R8B_QUERIES["customer_topk_jackknife"] = (
    q_customer_topk_jackknife, _QJACKKNIFE_SQL, False)


# =============================================================================
# Wave 36 — nonparametric trend, greedy covering
# =============================================================================

# --- orders_mann_kendall --------------------------------------------------------

def q_orders_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test on the 1997 daily revenue series:
    S = sum of sign(rev_j - rev_i) over day pairs i < j (exact BIGINT on
    cents revenues), tie-corrected variance, continuity-corrected Z —
    the nonparametric companion to the Theil-Sen slope (same pair set,
    significance instead of magnitude).

    Scale shape: the pair comparison is a self-join of the
    day-domain-bounded table (~365 rows -> 66k pairs), then scalar
    finishes — never a pair join of raw orders."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.filter(F.year("o_orderdate") == 1997)
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                  .cast("long").alias("r")))
    a = daily.select(F.col("day").alias("d1"), F.col("r").alias("r1"))
    b = daily.select(F.col("day").alias("d2"), F.col("r").alias("r2"))
    pairs = a.join(b, F.col("d1") < F.col("d2"))
    s = pairs.agg(
        F.sum(F.when(F.col("r2") > F.col("r1"), 1)
              .when(F.col("r2") < F.col("r1"), -1).otherwise(0))
        .cast("long").alias("s"))
    ties = (daily.groupBy("r").agg(F.count(F.lit(1)).cast("long")
                                   .alias("t"))
            .agg(F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).cast("long").alias("tt"),
                 F.sum("t").cast("long").alias("n")))
    j = s.crossJoin(F.broadcast(ties))
    nD = F.col("n").cast("double")
    var = (nD * (nD - 1.0) * (2.0 * nD + 5.0)
           - F.col("tt").cast("double")) / 18.0
    sD = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (sD - 1.0) / F.sqrt(var)) \
        .when(F.col("s") < 0, (sD + 1.0) / F.sqrt(var)).otherwise(0.0)
    return j.select(F.col("n").alias("n_days"), F.col("s").alias("mk_s"),
                    F.round(F.sqrt(var), 6).alias("sd_s"),
                    F.round(z, 4).alias("z_stat"))


_QMK_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS r
  FROM orders WHERE year(o_orderdate) = 1997
  GROUP BY 1
), s AS (
  SELECT CAST(SUM(CASE WHEN b.r > a.r THEN 1
                       WHEN b.r < a.r THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b ON a.day < b.day
), ties AS (
  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt,
         CAST(SUM(t) AS BIGINT) AS n
  FROM (SELECT r, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY r)
)
SELECT n AS n_days, s AS mk_s,
       ROUND(sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                   * (2.0 * CAST(n AS DOUBLE) + 5.0)
                   - CAST(tt AS DOUBLE)) / 18.0), 6) AS sd_s,
       ROUND(CASE WHEN s > 0
                  THEN (CAST(s AS DOUBLE) - 1.0)
                       / sqrt((CAST(n AS DOUBLE)
                               * (CAST(n AS DOUBLE) - 1.0)
                               * (2.0 * CAST(n AS DOUBLE) + 5.0)
                               - CAST(tt AS DOUBLE)) / 18.0)
                  WHEN s < 0
                  THEN (CAST(s AS DOUBLE) + 1.0)
                       / sqrt((CAST(n AS DOUBLE)
                               * (CAST(n AS DOUBLE) - 1.0)
                               * (2.0 * CAST(n AS DOUBLE) + 5.0)
                               - CAST(tt AS DOUBLE)) / 18.0)
                  ELSE 0.0 END, 4) AS z_stat
FROM s CROSS JOIN ties
"""

R8B_QUERIES["orders_mann_kendall"] = (
    q_orders_mann_kendall, _QMK_SQL, False)


# --- supplier_set_cover ---------------------------------------------------------

def q_supplier_set_cover(spark, sf_dir):
    """Greedy set cover: pick 8 suppliers that together cover the most
    parts (each step takes the supplier adding the most uncovered parts,
    ties to the smaller suppkey) — the sourcing-consolidation /
    coverage-maximization primitive.  Greedy-argmax steps collect ONE
    row each (the IRLS bounded-collect precedent); the coverage counts
    are exact integers.

    Scale shape: each step is one anti-join + supplier aggregation over
    the distinct (supplier, part) edge list; the chosen set stays on
    the driver (8 ids)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(F.col("l_suppkey").alias("s"),
                      F.col("l_partkey").alias("p")).distinct()
    edges = edges.persist()
    total_parts = edges.select("p").distinct().count()
    chosen, covered_expr, rows = [], None, []
    cum = 0
    for step in range(1, 9):
        remaining = edges
        if chosen:
            covered = (edges.filter(F.col("s").isin(chosen))
                       .select("p").distinct())
            remaining = edges.join(covered, "p", "left_anti")
        best = (remaining.groupBy("s")
                .agg(F.count(F.lit(1)).cast("long").alias("gain"))
                .orderBy(F.col("gain").desc(), F.col("s").asc())
                .limit(1).collect())
        if not best:
            break
        sid, gain = best[0]["s"], best[0]["gain"]
        chosen.append(sid)
        cum += gain
        rows.append((step, sid, gain, cum))
    # coverage rounded ENGINE-side (F.round = HALF_UP for positives, matching
    # DuckDB ROUND); Python round() is banker's and diverges on exact 1e-6
    # half-ties (the documented 1/1600-lattice failure mode).
    out = (spark.createDataFrame(
        rows, "step INT, suppkey BIGINT, newly_covered BIGINT, "
              "cum_covered BIGINT")
        .withColumn("coverage",
                    F.round(F.col("cum_covered")
                            / F.lit(float(total_parts)), 6)))
    edges.unpersist()
    return out.orderBy("step")


def _setcover_sql(steps: int = 8) -> str:
    sql = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
), tot AS (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) AS n FROM edges)"""
    prev_cov = None
    sels = []
    for i in range(1, steps + 1):
        rem = ("edges" if prev_cov is None else
               f"(SELECT e.* FROM edges e WHERE e.p NOT IN "
               f"(SELECT p FROM {prev_cov}))")
        sql += f""", pick{i} AS MATERIALIZED (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS gain
  FROM {rem} r
  GROUP BY s
  ORDER BY gain DESC, s ASC
  LIMIT 1
), cov{i} AS MATERIALIZED (
  SELECT DISTINCT e.p FROM edges e
  WHERE e.s IN (SELECT s FROM pick{i})
     {"OR e.p IN (SELECT p FROM " + prev_cov + ")" if prev_cov else ""}
)"""
        sels.append(
            f"SELECT CAST({i} AS INT) AS step, "
            f"CAST((SELECT s FROM pick{i}) AS BIGINT) AS suppkey, "
            f"(SELECT gain FROM pick{i}) AS newly_covered, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM cov{i}) "
            f"AS cum_covered, "
            f"ROUND((SELECT CAST(COUNT(*) AS BIGINT) FROM cov{i}) "
            f"/ CAST((SELECT n FROM tot) AS DOUBLE), 6) AS coverage")
        prev_cov = f"cov{i}"
    # once the cover saturates, later picks are empty -> NULL suppkey;
    # Spark's loop breaks there, so the oracle drops those rows too
    return (sql + "\nSELECT * FROM (\n"
            + "\nUNION ALL\n".join(sels)
            + "\n) WHERE suppkey IS NOT NULL ORDER BY step")


R8B_QUERIES["supplier_set_cover"] = (
    q_supplier_set_cover, _setcover_sql(), False)


# =============================================================================
# Wave 37 — storage encoding and partition-skew engineering audits
# =============================================================================

# --- orders_rle_encoding_estimate -----------------------------------------------

def q_orders_rle_encoding_estimate(spark, sf_dir):
    """Run-length-encoding benefit estimate for o_orderpriority under
    two physical layouts: natural (orderkey) write order vs sorted by
    the column — runs = 1 + count(value != previous value), and the RLE
    ratio n/runs says what the sort buys the encoder.  The
    column-layout decision input next to the z-order and pruning
    audits; exact integers.

    Scale shape (round-9, ADVICE r8): a bare Window.orderBy would
    collapse every row onto one task, so each ordering instead range-
    partitions on its sort key, lags WITHIN each range partition
    (parallel windows), and stitches the per-partition run counts on
    the driver — runs_total = sum(runs_in_partition) - (adjacent
    partition boundaries whose last/first values match).  The collect
    is O(#partitions) rows; correctness is invariant to where the range
    boundaries (or AQE coalescing) land because stitching cancels any
    run split across a boundary.  The range-partition count is env-tunable
    (``SPARK_GRAFT_RLE_RANGE_PARTS``, default 32) so the multi-parallelism
    rehearsal can vary it — including counts far above the key diversity,
    which force EMPTY range partitions through the stitch logic (round-10,
    ADVICE r9 item #1)."""
    import os as _os

    n_parts = int(_os.environ.get("SPARK_GRAFT_RLE_RANGE_PARTS", "32"))
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderpriority")

    def runs(order_names, tag):
        order_cols = [F.col(c) for c in order_names]
        bucketed = (base.repartitionByRange(n_parts, *order_cols)
                    .withColumn("pid", F.spark_partition_id()))
        w = Window.partitionBy("pid").orderBy(*order_cols)
        key = F.struct(*[F.col(c) for c in order_names])
        stats = (bucketed
                 .withColumn("prev", F.lag("o_orderpriority").over(w))
                 .groupBy("pid")
                 .agg(F.count(F.lit(1)).cast("long").alias("n"),
                      (F.sum(F.when(F.col("prev").isNull()
                                    | (F.col("prev")
                                       != F.col("o_orderpriority")), 1)
                             .otherwise(0)).cast("long")).alias("runs"),
                      F.min_by("o_orderpriority", key).alias("first_val"),
                      F.max_by("o_orderpriority", key).alias("last_val"),
                      F.min(key).alias("first_key"))
                 .collect())
        stats.sort(key=lambda r: tuple(r["first_key"]))
        n = sum(r["n"] for r in stats)
        total = sum(r["runs"] for r in stats)
        for a, b in zip(stats, stats[1:]):
            if a["last_val"] == b["first_val"]:
                total -= 1
        return (tag, n, total)

    rows = [runs(["o_orderkey"], "natural"),
            runs(["o_orderpriority", "o_orderkey"], "sorted_by_column")]
    return (spark.createDataFrame(rows, "layout STRING, n BIGINT, runs BIGINT")
            .select("layout", "n", "runs",
                    F.round(F.col("n").cast("double")
                            / F.col("runs").cast("double"), 6)
                    .alias("rle_ratio"))
            .orderBy("layout"))


_QRLE_SQL = """
WITH nat AS (
  SELECT 'natural' AS layout, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN prev IS NULL OR prev <> o_orderpriority
                       THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM (SELECT o_orderpriority,
               lag(o_orderpriority) OVER (ORDER BY o_orderkey) AS prev
        FROM orders)
), srt AS (
  SELECT 'sorted_by_column', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN prev IS NULL OR prev <> o_orderpriority
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM (SELECT o_orderpriority,
               lag(o_orderpriority) OVER (ORDER BY o_orderpriority,
                                          o_orderkey) AS prev
        FROM orders)
)
SELECT layout, n, runs,
       ROUND(CAST(n AS DOUBLE) / CAST(runs AS DOUBLE), 6) AS rle_ratio
FROM (SELECT * FROM nat UNION ALL SELECT * FROM srt)
ORDER BY layout
"""

R8B_QUERIES["orders_rle_encoding_estimate"] = (
    q_orders_rle_encoding_estimate, _QRLE_SQL, False)


# --- doc_partition_skew_audit ---------------------------------------------------

def q_doc_partition_skew_audit(spark, sf_dir):
    """Partition-skew audit for two routing strategies over the corpus:
    key routing (partition = source — what a naive partitionBy gives)
    vs hash routing (pmod(portable_hash64(doc_id), 32)) — per strategy
    the partition count, max/mean rows, and the skew factor max/mean
    that decides whether the shuffle needs salting.  Exactly the
    100 TB-readiness question every groupBy answers first; exact
    integers.

    Scale shape: two keyed aggregations + two tiny finishes."""
    docs = load_table(spark, sf_dir, "documents")

    def audit(col, tag):
        per = docs.groupBy(col.alias("pk")).agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        return (per.agg(F.count(F.lit(1)).cast("long").alias("n_parts"),
                        F.sum("c").cast("long").alias("n_rows"),
                        F.max("c").cast("long").alias("max_rows"))
                .select(F.lit(tag).alias("strategy"), "n_parts", "n_rows",
                        "max_rows",
                        F.round(F.col("max_rows").cast("double")
                                * F.col("n_parts").cast("double")
                                / F.col("n_rows").cast("double"), 6)
                        .alias("skew_factor")))

    key = audit(F.col("source"), "key_by_source")
    hsh = audit(F.pmod(_hash64(F.col("doc_id").cast("string"), "part"),
                       F.lit(32)), "hash_32")
    return key.unionByName(hsh).orderBy("strategy")


_QSKEWAUDIT_SQL = """
WITH key_r AS (
  SELECT 'key_by_source' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(MAX(c) AS BIGINT) AS max_rows
  FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source)
), hash_r AS (
  SELECT 'hash_32', CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
         CAST(MAX(c) AS BIGINT)
  FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#part'),
                               1, 15))::BIGINT % 32 AS pk,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1)
)
SELECT strategy, n_parts, n_rows, max_rows,
       ROUND(CAST(max_rows AS DOUBLE) * CAST(n_parts AS DOUBLE)
             / CAST(n_rows AS DOUBLE), 6) AS skew_factor
FROM (SELECT * FROM key_r UNION ALL SELECT * FROM hash_r)
ORDER BY strategy
"""

R8B_QUERIES["doc_partition_skew_audit"] = (
    q_doc_partition_skew_audit, _QSKEWAUDIT_SQL, False)


# =============================================================================
# Wave 38 — EWMA control chart
# =============================================================================

# --- events_ewma_control_chart --------------------------------------------------

def q_events_ewma_control_chart(spark, sf_dir):
    """EWMA control chart over the daily event counts (lambda = 0.2,
    L = 1.5 — tight enough that the synthetic series flags rows, so the
    oracle checks real values): z_t = 0.2*y_t + 0.8*z_{t-1} seeded at
    the series mean, with exact time-varying limits
    mu +/- L*sigma*sqrt(lam/(2-lam) *
    (1-(1-lam)^(2t))) — the small-shift detector the Shewhart
    individuals chart misses.  mu/sigma come from exact integer sums;
    the recursion is a fixed fold; out-of-control days are reported.

    Scale shape: one day aggregation, one fold carrying (t, z) plus the
    flagged rows, one bounded output."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("y")))
    stats = days.agg(F.count(F.lit(1)).cast("long").alias("n"),
                     F.sum("y").cast("long").alias("s1"),
                     F.sum(F.col("y") * F.col("y")).cast("long")
                     .alias("s2"))
    nD = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nD
    sd = F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                .cast("double") / (F.col("n") * (F.col("n") - 1))
                .cast("double"))
    lim = stats.select(mu.alias("mu"), sd.alias("sd"))
    w = Window.orderBy("day")
    idx = (days.crossJoin(F.broadcast(lim))
           .withColumn("t", F.row_number().over(w).cast("long")))
    # z_t in closed form: z_t = mu*(1-lam)^t + lam * sum_{j=1..t}
    # (1-lam)^(t-j) y_j  — computed as a prefix sum of y_j*(1-lam)^(-j)
    # would overflow; instead fold via aggregate over the sorted series
    series = idx.groupBy("mu", "sd").agg(
        F.array_sort(F.collect_list(F.struct("day", "y", "t"))).alias("sv"))
    # carry (z) and collect flags as an array of (day, z, lo, hi, side)
    acc0 = F.struct(F.col("mu").alias("z"),
                    F.array().cast(
                        "array<struct<day:date,z:double,lo:double,"
                        "hi:double,side:string>>").alias("flags"))
    lam = 0.2

    def step(acc, e):
        z = lam * e["y"].cast("double") + (1.0 - lam) * acc["z"]
        band = (F.col("sd")
                * F.sqrt(lam / (2.0 - lam)
                         * (1.0 - F.pow(F.lit(1.0 - lam),
                                        2.0 * e["t"].cast("double")))))
        lo, hi = (F.col("mu") - 1.5 * band, F.col("mu") + 1.5 * band)
        flag = F.when((z < lo) | (z > hi),
                      F.array(F.struct(
                          e["day"].alias("day"), z.alias("z"),
                          lo.alias("lo"), hi.alias("hi"),
                          F.when(z > hi, F.lit("high"))
                          .otherwise(F.lit("low")).alias("side"))))\
            .otherwise(F.array().cast(
                "array<struct<day:date,z:double,lo:double,"
                "hi:double,side:string>>"))
        return F.struct(z.alias("z"),
                        F.concat(acc["flags"], flag).alias("flags"))

    folded = series.select(
        F.aggregate(F.col("sv"), acc0, step).alias("f"))
    out = (folded.select(F.explode(F.col("f.flags")).alias("fl"))
           .select(F.col("fl.day").cast("string").alias("day"),
                   F.round(F.col("fl.z"), 6).alias("ewma"),
                   F.round(F.col("fl.lo"), 6).alias("lcl"),
                   F.round(F.col("fl.hi"), 6).alias("ucl"),
                   F.col("fl.side").alias("side")))
    return out.orderBy("day")


_QEWMACC_SQL = """
WITH RECURSIVE days AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s1,
         CAST(SUM(y * y) AS BIGINT) AS s2
  FROM days
), lim AS (
  SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
              / CAST(n * (n - 1) AS DOUBLE)) AS sd
  FROM stats
), idx AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, day,
         CAST(y AS DOUBLE) AS y
  FROM days
), ew AS (
  SELECT idx.t, idx.day,
         0.2 * idx.y + 0.8 * lim.mu AS z
  FROM idx CROSS JOIN lim WHERE idx.t = 1
  UNION ALL
  SELECT i.t, i.day, 0.2 * i.y + 0.8 * e.z
  FROM ew e JOIN idx i ON i.t = e.t + 1
), flagged AS (
  SELECT e.day, e.z,
         lim.mu - 1.5 * lim.sd
           * sqrt(0.2 / 1.8 * (1.0 - power(0.8, 2.0 * e.t))) AS lo,
         lim.mu + 1.5 * lim.sd
           * sqrt(0.2 / 1.8 * (1.0 - power(0.8, 2.0 * e.t))) AS hi,
         lim.mu
  FROM ew e CROSS JOIN lim
)
SELECT CAST(day AS VARCHAR) AS day,
       ROUND(z, 6) AS ewma,
       ROUND(lo, 6) AS lcl,
       ROUND(hi, 6) AS ucl,
       CASE WHEN z > mu THEN 'high' ELSE 'low' END AS side
FROM flagged
WHERE z < lo OR z > hi
ORDER BY day
"""

R8B_QUERIES["events_ewma_control_chart"] = (
    q_events_ewma_control_chart, _QEWMACC_SQL, False)
