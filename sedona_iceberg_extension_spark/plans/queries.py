"""Declared query inventory — the engine's correctness contract.

One entry per operator family from SURVEY.md §2 (spatial Tier A–D parity +
Tier E pipeline operators), each with:

- a Spark implementation through the engine's own API (expression-level
  spatial functions, spatial_join, aggregates, pipeline ops) — the plans are
  native Catalyst wherever the operand structure allows;
- an exactly-mirrored ANSI-SQL oracle for DuckDB (plain SQL only: no spatial
  extension exists in this environment, so geometry queries derive their
  points/boxes from numeric columns per FIXTURES.md F4 and the oracle states
  the same arithmetic explicitly).

Conventions (FIXTURES.md): every query ends in a total ORDER BY; float
aggregates are ROUNDed identically on both sides; aggregate/computed columns
share the same alias on both sides; BIGINT sums are cast in DuckDB (HUGEINT
otherwise).
"""

from __future__ import annotations

from collections import namedtuple
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lineage import truncate_lineage
from pyspark.sql.window import Window

from ..functions import api as ST
from ..functions import udfs
from ..functions.aggregates import centroid_finish_xy
from ..operators import spatial_join
from ..pipeline import dedup, similarity, text
from ..pipeline.text import PII_EMAIL_RE as _PII_EMAIL, PII_PHONE_RE as _PII_PHONE
from ..sources import load_table

QueryDef = namedtuple("QueryDef", ["fn", "oracle", "headline"])

# point synthesis used by every spatial query (FIXTURES.md F4): integer-valued
# coordinates from numeric columns — identical arithmetic on both engines
_CX = "CAST(c_custkey % 360 - 180 AS DOUBLE)"
_CY = "CAST((c_custkey * 7) % 180 - 90 AS DOUBLE)"


def _cust_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    x = (F.col("c_custkey") % 360 - 180).cast("double")
    y = ((F.col("c_custkey") * 7) % 180 - 90).cast("double")
    return ST.with_point_geometry(cust, x, y)


def _supp_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    x = (F.col("s_suppkey") % 360 - 180).cast("double")
    y = ((F.col("s_suppkey") * 11) % 180 - 90).cast("double")
    return ST.with_point_geometry(sup, x, y)


_SX = "CAST(s_suppkey % 360 - 180 AS DOUBLE)"
_SY = "CAST((s_suppkey * 11) % 180 - 90 AS DOUBLE)"


# ===========================================================================
# relational tier (Tier D parity — delegated to native Spark)
# ===========================================================================

def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
             F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
             F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
             F.round(F.avg("l_discount"), 6).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name")
    )


_Q5_SQL = """
SELECT r_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                  & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                  & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q_top_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(F.col("c_custkey"), F.col("c_name"), F.col("total_spend"), F.col("n_orders"))
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_QTOPC_SQL = """
SELECT c_custkey, c_name, total_spend, n_orders
FROM (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey) t
JOIN customer ON o_custkey = c_custkey
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 20
"""


def q_order_priority(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.avg("o_totalprice"), 6).alias("avg_price"))
        .orderBy("o_orderpriority", "o_orderstatus")
    )


_QPRIO_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


def q_part_type_stats(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.avg("p_retailprice"), 6).alias("avg_retail"))
        .orderBy("p_brand")
    )


_QPART_SQL = """
SELECT p_brand, COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(AVG(p_retailprice), 6) AS avg_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


def q_window_running_spend(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
            F.row_number().over(w).alias("order_seq"))
        .orderBy("o_custkey", "order_seq")
    )


_QWIN_SQL = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS running_spend,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders WHERE o_custkey < 50
ORDER BY o_custkey, order_seq
"""


def q_events_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


_QEVH_SQL = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY strftime(ts, '%Y-%m-%d %H'), event_type
ORDER BY hour, event_type
"""


def q_events_props_json(spark, sf_dir):
    """Semi-structured extraction: parse the events table's JSON ``props``
    column natively (``get_json_object`` — codegen, no Python) and
    aggregate over the extracted field — the schema-on-read pattern every
    event-log pipeline needs.  At 100 TB the parse is a narrow map; the
    one shuffle is the bucket aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("k_bucket")
    )


_QJSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events, ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY 1
ORDER BY k_bucket
"""


def q_doc_pii_scrub(spark, sf_dir):
    """PII redaction audit (pipeline.text.scrub_pii).  The synthetic corpus
    carries no natural PII (the check would be vacuous), so the query
    plants deterministic emails/phones derived from doc_id — identical
    string construction in the oracle — then scrubs and counts.  Output:
    per-document redaction counts + the scrubbed text's hash-checked
    length."""
    from ..pipeline import text as T

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com or "),
            F.lit("call 555-01"), (F.col("doc_id") % 100).cast("string"),
        ).alias("text"))
    out = T.scrub_pii(planted, "doc_id", "text")
    return (
        out.select("doc_id", F.length("text_clean").alias("clean_len"),
                   "n_emails", "n_phones")
        .orderBy("doc_id")
    )


_QPII_SQL = rf"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or ' || 'call 555-01'
              || CAST(doc_id % 100 AS VARCHAR) AS text
  FROM documents WHERE doc_id < 300
), scrubbed AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g') AS text_clean,
         CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT) AS n_emails,
         CAST(len(regexp_extract_all(
           regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}')) AS INT) AS n_phones
  FROM planted
)
SELECT doc_id, CAST(length(text_clean) AS INT) AS clean_len, n_emails, n_phones
FROM scrubbed ORDER BY doc_id
"""


def q_doc_length_quantiles(spark, sf_dir):
    """Per-language length distribution (exact interpolated quartiles of
    n_chars) — the corpus-profiling stats a mix-curation pass reads.
    ``percentile`` is Spark's EXACT linear-interpolation aggregate;
    DuckDB's ``quantile_cont`` implements the same definition, so the
    oracle value-checks the distribution, not just row counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.expr("percentile(CAST(n_chars AS DOUBLE), 0.25)"), 6).alias("p25"),
             F.round(F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)"), 6).alias("p50"),
             F.round(F.expr("percentile(CAST(n_chars AS DOUBLE), 0.75)"), 6).alias("p75"),
             F.max("n_chars").alias("max_chars"))
        .orderBy("lang")
    )


_QQUANT_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(CAST(quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS DOUBLE), 6) AS p25,
       ROUND(CAST(quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS DOUBLE), 6) AS p50,
       ROUND(CAST(quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS DOUBLE), 6) AS p75,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization as gaps-and-islands (identical shape in the
    oracle; the streaming module's session_window variant is covered by
    streaming tests — this is the batch-SQL-expressible form)."""
    from ..functions.timeops import epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    # per-value truncated epoch seconds (oracle: epoch(ts)), NTZ-safe
    ev = ev.withColumn("_es", epoch_seconds(ev, "ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("_es").over(w).isNull()
        | ((F.col("_es") - F.lag("_es").over(w)) > 1800),
        F.lit(1)).otherwise(F.lit(0))
    sess = ev.withColumn("_new", new_s).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("session_value"))
        .orderBy("user_id", "session_id")
    )


_QSESS_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         CAST(SUM(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS session_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# ===========================================================================
# spatial tier (Tier A–C parity)
# ===========================================================================

def q_spatial_range_contains(spark, sf_dir):
    """Reference flagship query shape (App.scala:55-56): range filter via
    ST_Contains(box literal, point) — compiles fully native."""
    pts = _cust_points(spark, sf_dir)
    box = ST.st_box(-60.0, -45.0, 75.0, 60.0)
    pt = ST.st_point(F.col("geo_env.xmin"), F.col("geo_env.ymin"))
    return (
        pts.filter(ST.st_contains(box, pt))
        .select("c_custkey",
                F.col("geo_env.xmin").alias("x"), F.col("geo_env.ymin").alias("y"))
        .orderBy("c_custkey")
    )


_QRANGE_SQL = f"""
SELECT c_custkey, {_CX} AS x, {_CY} AS y
FROM customer
WHERE {_CX} > -60.0 AND {_CX} < 75.0 AND {_CY} > -45.0 AND {_CY} < 60.0
ORDER BY c_custkey
"""


def q_spatial_range_intersects(spark, sf_dir):
    pts = _cust_points(spark, sf_dir)
    box = ST.st_box(-60.0, -45.0, 75.0, 60.0)
    pt = ST.st_point(F.col("geo_env.xmin"), F.col("geo_env.ymin"))
    return (
        pts.filter(ST.st_intersects(pt, box))
        .select("c_custkey").orderBy("c_custkey")
    )


_QRANGEI_SQL = f"""
SELECT c_custkey FROM customer
WHERE {_CX} >= -60.0 AND {_CX} <= 75.0 AND {_CY} >= -45.0 AND {_CY} <= 60.0
ORDER BY c_custkey
"""


def q_spatial_astext(spark, sf_dir):
    """ST_Point → ST_AsText round trip through the engine's WKB serde
    (reference testBasic WKT round-trip, TestSedonaIcebergExtension.scala:55-59)."""
    pts = _cust_points(spark, sf_dir).filter(F.col("c_custkey") < 100)
    return (
        pts.select("c_custkey",
                   udfs.st_astext(F.col("geo")).alias("wkt"))
        .orderBy("c_custkey")
    )


_QASTEXT_SQL = """
SELECT c_custkey,
       'POINT (' || CAST(c_custkey % 360 - 180 AS BIGINT)
                 || ' ' || CAST((c_custkey * 7) % 180 - 90 AS BIGINT) || ')' AS wkt
FROM customer WHERE c_custkey < 100
ORDER BY c_custkey
"""


def q_spatial_distance(spark, sf_dir):
    """Native point-point ST_Distance (no UDF in plan)."""
    pts = _cust_points(spark, sf_dir)
    origin = ST.st_point(F.lit(0.0), F.lit(0.0))
    pt = ST.st_point(F.col("geo_env.xmin"), F.col("geo_env.ymin"))
    return (
        pts.select("c_custkey",
                   F.round(ST.st_distance(pt, origin), 6).alias("dist_origin"))
        .filter(F.col("dist_origin") < 60.0)
        .orderBy("c_custkey")
    )


_QDIST_SQL = f"""
SELECT c_custkey, ROUND(SQRT({_CX} * {_CX} + {_CY} * {_CY}), 6) AS dist_origin
FROM customer
WHERE ROUND(SQRT({_CX} * {_CX} + {_CY} * {_CY}), 6) < 60.0
ORDER BY c_custkey
"""


def q_spatial_measures(spark, sf_dir):
    """ST_Area / ST_Length / centroid accessors over boxes derived from part
    columns — native box algebra."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    w = (F.col("p_size") % 10 + 1).cast("double")
    h = (F.col("p_partkey") % 7 + 1).cast("double")
    box = ST.st_box(F.lit(0.0), F.lit(0.0), w, h)
    return (
        part.select(
            "p_partkey",
            ST.st_area(box).alias("area"),
            ST.st_length(box).alias("perimeter"),
            ST.st_x(ST.st_centroid(box)).alias("cx"),
            ST.st_y(ST.st_centroid(box)).alias("cy"))
        .orderBy("p_partkey")
    )


_QMEAS_SQL = """
SELECT p_partkey,
       CAST(p_size % 10 + 1 AS DOUBLE) * CAST(p_partkey % 7 + 1 AS DOUBLE) AS area,
       2.0 * (CAST(p_size % 10 + 1 AS DOUBLE) + CAST(p_partkey % 7 + 1 AS DOUBLE)) AS perimeter,
       CAST(p_size % 10 + 1 AS DOUBLE) / 2 AS cx,
       CAST(p_partkey % 7 + 1 AS DOUBLE) / 2 AS cy
FROM part WHERE p_partkey < 500
ORDER BY p_partkey
"""


def q_spatial_transform(spark, sf_dir):
    """ST_Transform parity check (reference's GeoTools CRS surface,
    /root/reference/README.md:34-38): customer points projected to Web
    Mercator via the public spherical-Mercator equations, computed NATIVELY
    (pure codegen arithmetic — the general st_transform UDF keeps its own
    round-trip tests in test_functions_ext.py).  ``+ 0.0`` after rounding on
    BOTH engines normalizes IEEE ``-0.0`` at the equator row, where
    ``ln(tan(pi/4))`` lands an ulp below zero and would flip the value hash
    while comparing numerically equal."""
    import math

    cust = load_table(spark, sf_dir, "customer")
    x = (F.col("c_custkey") % 360 - 180).cast("double")
    y = ((F.col("c_custkey") * 7) % 180 - 90).cast("double")
    # radians spelled as * pi / 180 so both engines run the identical
    # IEEE multiply/divide sequence (F.radians uses Math.toRadians' x/180*pi)
    rad_x = x * F.lit(math.pi) / F.lit(180.0)
    rad_y = y * F.lit(math.pi) / F.lit(180.0)
    merc_x = F.round(F.lit(6378137.0) * rad_x, 3) + F.lit(0.0)
    merc_y = F.round(
        F.lit(6378137.0) * F.log(F.tan(F.lit(math.pi / 4) + rad_y / F.lit(2.0))),
        3) + F.lit(0.0)
    return (
        cust.filter((y > F.lit(-85.0)) & (y < F.lit(85.0))
                    & (F.col("c_custkey") < 300))
        .select("c_custkey",
                merc_x.alias("merc_x"),
                merc_y.alias("merc_y"))
        .orderBy("c_custkey")
    )


_QTRANSFORM_SQL = f"""
SELECT c_custkey,
       ROUND(6378137.0 * ({_CX} * pi() / 180.0), 3) + 0.0 AS merc_x,
       ROUND(6378137.0 * ln(tan(pi() / 4 + ({_CY} * pi() / 180.0) / 2)), 3) + 0.0 AS merc_y
FROM customer
WHERE {_CY} > -85.0 AND {_CY} < 85.0 AND c_custkey < 300
ORDER BY c_custkey
"""


def _laea_consts():
    """EPSG:3035 (ETRS89-extended / LAEA Europe) projection constants,
    folded once in Python so BOTH engines consume the identical doubles
    (Snyder pp. 187-190; GRS80 ellipsoid)."""
    import math
    f = 1.0 / 298.257222101
    a = 6378137.0
    e2 = 2 * f - f * f
    e = math.sqrt(e2)

    def qq(phi):
        s = math.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))

    p0 = math.radians(52.0)
    qp = qq(math.pi / 2)
    sb0 = qq(p0) / qp
    cb0 = math.sqrt(1 - sb0 * sb0)
    rq = a * math.sqrt(qp / 2)
    m0 = math.cos(p0) / math.sqrt(1 - e2 * math.sin(p0) ** 2)
    d = a * m0 / (rq * cb0)
    return dict(a=a, e=e, e2=e2, qp=qp, sb0=sb0, cb0=cb0, rq=rq, d=d,
                pi=math.pi)


def q_spatial_transform_laea(spark, sf_dir):
    """Equal-area CRS parity for the reference's GeoTools transform surface
    (/root/reference/README.md:34-38): customer points projected to
    EPSG:3035 (LAEA Europe) with PURE NATIVE arithmetic — the identical
    Snyder formula, constant-folded identically, runs on both engines, so
    the oracle checks values (sin β taken as q/qp algebraically, avoiding
    an asin/sin round trip).  ``+ 0.0`` normalizes ``-0.0`` at the central
    meridian where sin λ rounds to a signed zero."""
    k = _laea_consts()
    cust = load_table(spark, sf_dir, "customer")
    x = (F.col("c_custkey") % 360 - 180).cast("double")
    y = ((F.col("c_custkey") * 7) % 180 - 90).cast("double")
    s = F.sin(y * F.lit(k["pi"]) / F.lit(180.0))
    q = F.lit(1 - k["e2"]) * (
        s / (F.lit(1.0) - F.lit(k["e2"]) * s * s)
        - F.lit(1 / (2 * k["e"]))
        * F.log((F.lit(1.0) - F.lit(k["e"]) * s)
                / (F.lit(1.0) + F.lit(k["e"]) * s)))
    sb = q / F.lit(k["qp"])
    cb = F.sqrt(F.lit(1.0) - sb * sb)
    lam = (x - F.lit(10.0)) * F.lit(k["pi"]) / F.lit(180.0)
    bb = F.lit(k["rq"]) * F.sqrt(
        F.lit(2.0) / (F.lit(1.0) + F.lit(k["sb0"]) * sb
                      + F.lit(k["cb0"]) * cb * F.cos(lam)))
    laea_x = F.round(F.lit(4321000.0)
                     + bb * F.lit(k["d"]) * cb * F.sin(lam), 3) + F.lit(0.0)
    laea_y = F.round(F.lit(3210000.0)
                     + (bb / F.lit(k["d"])) * (F.lit(k["sb0"]) * F.lit(-1.0) * cb * F.cos(lam)
                                               + F.lit(k["cb0"]) * sb), 3) + F.lit(0.0)
    return (
        cust.filter((x > F.lit(-180.0)) & (x < F.lit(-100.0))
                    & (y > F.lit(25.0)) & (y < F.lit(75.0)))
        .select("c_custkey",
                laea_x.alias("laea_x"), laea_y.alias("laea_y"))
        .orderBy("c_custkey")
    )


def _laea_sql() -> str:
    k = _laea_consts()
    s = f"sin({_CY} * {k['pi']!r} / 180.0)"
    q = (f"({1 - k['e2']!r} * ({s} / (1.0 - {k['e2']!r} * {s} * {s}) "
         f"- {1 / (2 * k['e'])!r} * ln((1.0 - {k['e']!r} * {s}) "
         f"/ (1.0 + {k['e']!r} * {s}))))")
    sb = f"({q} / {k['qp']!r})"
    cb = f"sqrt(1.0 - {sb} * {sb})"
    lam = f"(({_CX} - 10.0) * {k['pi']!r} / 180.0)"
    bb = (f"({k['rq']!r} * sqrt(2.0 / (1.0 + {k['sb0']!r} * {sb} "
          f"+ {k['cb0']!r} * {cb} * cos({lam}))))")
    lx = f"ROUND(4321000.0 + {bb} * {k['d']!r} * {cb} * sin({lam}), 3) + 0.0"
    ly = (f"ROUND(3210000.0 + ({bb} / {k['d']!r}) * ({k['sb0']!r} * -1.0 "
          f"* {cb} * cos({lam}) + {k['cb0']!r} * {sb}), 3) + 0.0")
    return f"""
SELECT c_custkey, {lx} AS laea_x, {ly} AS laea_y
FROM customer
WHERE {_CX} > -180.0 AND {_CX} < -100.0 AND {_CY} > 25.0 AND {_CY} < 75.0
ORDER BY c_custkey
"""


def _lcc_consts():
    """EPSG:26985 (NAD83 / Maryland, State Plane LCC 2SP) constants folded
    once in Python so both engines consume identical doubles (Snyder
    pp. 104-110; GRS80)."""
    import math
    f = 1.0 / 298.257222101
    a = 6378137.0
    e2 = 2 * f - f * f
    e = math.sqrt(e2)
    sp1, sp2 = math.radians(38.3), math.radians(39.45)
    lat0, lon0 = math.radians(37.0 + 40.0 / 60.0), -77.0

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def t(phi):
        s = math.sin(phi)
        return (math.tan(math.pi / 4 - phi / 2)
                / ((1 - e * s) / (1 + e * s)) ** (e / 2))

    n = (math.log(m(sp1)) - math.log(m(sp2))) / (math.log(t(sp1)) - math.log(t(sp2)))
    F_ = m(sp1) / (n * t(sp1) ** n)
    return {"pi": math.pi, "e": e, "n": n, "aF": a * F_,
            "rho0": a * F_ * t(lat0) ** n, "lon0": lon0,
            "fe": 400000.0, "fn": 0.0}


#: synthetic Maryland-domain lon/lat derived from c_custkey, identical on
#: both engines (integer mod, then exact /10)
_SPX = "CAST(-80 + (c_custkey % 80) AS DOUBLE) / 10.0 - 69.0"
_SPY = "CAST(36 + ((c_custkey * 7) % 80) AS DOUBLE) / 10.0 + 32.4"


def q_spatial_transform_stateplane(spark, sf_dir):
    """State-plane CRS parity (EPSG:26985, NAD83 / Maryland LCC 2SP) — the
    closed-form Snyder LCC forward runs NATIVELY on both engines with
    identical folded constants, extending the transform oracle family
    (Mercator, LAEA) to the conic state-plane grids the reference gets
    from GeoTools (/root/reference/README.md:34-38)."""
    k = _lcc_consts()
    cust = load_table(spark, sf_dir, "customer")
    x = (-80 + F.col("c_custkey") % 80).cast("double") / F.lit(10.0) - F.lit(69.0)
    y = (36 + (F.col("c_custkey") * 7) % 80).cast("double") / F.lit(10.0) + F.lit(32.4)
    phi = y * F.lit(k["pi"]) / F.lit(180.0)
    s = F.sin(phi)
    t = (F.tan(F.lit(k["pi"] / 4) - phi / F.lit(2.0))
         / F.pow((F.lit(1.0) - F.lit(k["e"]) * s)
                 / (F.lit(1.0) + F.lit(k["e"]) * s), F.lit(k["e"] / 2)))
    rho = F.lit(k["aF"]) * F.pow(t, F.lit(k["n"]))
    theta = F.lit(k["n"]) * (x - F.lit(k["lon0"])) * F.lit(k["pi"]) / F.lit(180.0)
    sp_x = F.round(F.lit(k["fe"]) + rho * F.sin(theta), 3) + F.lit(0.0)
    sp_y = F.round(F.lit(k["fn"]) + F.lit(k["rho0"]) - rho * F.cos(theta), 3) + F.lit(0.0)
    return (
        cust.filter(F.col("c_custkey") < 400)
        .select("c_custkey", sp_x.alias("sp_x"), sp_y.alias("sp_y"))
        .orderBy("c_custkey")
    )


def _stateplane_sql() -> str:
    k = _lcc_consts()
    phi = f"(({_SPY}) * {k['pi']!r} / 180.0)"
    s = f"sin({phi})"
    t = (f"(tan({k['pi'] / 4!r} - {phi} / 2.0) "
         f"/ pow((1.0 - {k['e']!r} * {s}) / (1.0 + {k['e']!r} * {s}), "
         f"{k['e'] / 2!r}))")
    rho = f"({k['aF']!r} * pow({t}, {k['n']!r}))"
    theta = f"({k['n']!r} * (({_SPX}) - {k['lon0']!r}) * {k['pi']!r} / 180.0)"
    sx = f"ROUND({k['fe']!r} + {rho} * sin({theta}), 3) + 0.0"
    sy = f"ROUND({k['fn']!r} + {k['rho0']!r} - {rho} * cos({theta}), 3) + 0.0"
    return f"""
SELECT c_custkey, {sx} AS sp_x, {sy} AS sp_y
FROM customer
WHERE c_custkey < 400
ORDER BY c_custkey
"""


def _somerc_consts():
    """EPSG:2056 (CH1903+ / LV95) constants folded once in Python —
    swisstopo's conformal-sphere algorithm (Bessel 1841)."""
    import math
    from ..functions.udfs_ext import _BESSEL_A, _BESSEL_F, _CH_LAT0, _CH_LON0
    f = _BESSEL_F
    e2 = 2 * f - f * f
    e = math.sqrt(e2)
    p0 = math.radians(_CH_LAT0)
    sp0 = math.sin(p0)
    alpha = math.sqrt(1 + e2 / (1 - e2) * math.cos(p0) ** 4)
    rr = _BESSEL_A * math.sqrt(1 - e2) / (1 - e2 * sp0 * sp0)
    b0 = math.asin(sp0 / alpha)
    s0 = (math.log(math.tan(math.pi / 4 + p0 / 2))
          - (e / 2) * math.log((1 + e * sp0) / (1 - e * sp0)))
    k = math.log(math.tan(math.pi / 4 + b0 / 2)) - alpha * s0
    return {"pi": math.pi, "e": e, "alpha": alpha, "rr": rr, "k": k,
            "sb0": math.sin(b0), "cb0": math.cos(b0),
            "lon0": _CH_LON0, "fe": 2600000.0, "fn": 1200000.0}


#: synthetic Swiss-domain lon/lat from c_custkey (identical both engines)
_CHX = "(6.0 + CAST(c_custkey % 40 AS DOUBLE) / 10.0)"
_CHY = "(45.8 + CAST((c_custkey * 7) % 20 AS DOUBLE) / 10.0)"


def q_spatial_transform_swiss(spark, sf_dir):
    """Swiss Oblique Mercator parity (EPSG:2056) — swisstopo's conformal-
    sphere algorithm runs NATIVELY on both engines with identical folded
    constants: isometric latitude, conformal-sphere latitude via
    2·atan(exp(·)), sphere rotation to the pseudo-equator, equatorial
    Mercator.  Extends the transform oracle family to an oblique
    projection (Mercator, LAEA, LCC already covered)."""
    k = _somerc_consts()
    cust = load_table(spark, sf_dir, "customer")
    x = F.lit(6.0) + (F.col("c_custkey") % 40).cast("double") / F.lit(10.0)
    y = F.lit(45.8) + ((F.col("c_custkey") * 7) % 20).cast("double") / F.lit(10.0)
    phi = y * F.lit(k["pi"]) / F.lit(180.0)
    s = F.sin(phi)
    s_iso = (F.log(F.tan(F.lit(k["pi"] / 4) + phi / F.lit(2.0)))
             - F.lit(k["e"] / 2)
             * F.log((F.lit(1.0) + F.lit(k["e"]) * s)
                     / (F.lit(1.0) - F.lit(k["e"]) * s)))
    b = F.lit(2.0) * (F.atan(F.exp(F.lit(k["alpha"]) * s_iso + F.lit(k["k"])))
                      - F.lit(k["pi"] / 4))
    l = F.lit(k["alpha"]) * (x - F.lit(k["lon0"])) * F.lit(k["pi"]) / F.lit(180.0)
    cb, sb = F.cos(b), F.sin(b)
    xp = F.lit(k["cb0"]) * cb * F.cos(l) + F.lit(k["sb0"]) * sb
    yp = cb * F.sin(l)
    zp = F.lit(-k["sb0"]) * cb * F.cos(l) + F.lit(k["cb0"]) * sb
    ch_e = F.round(F.lit(k["fe"]) + F.lit(k["rr"]) * F.atan2(yp, xp), 3) + F.lit(0.0)
    ch_n = F.round(F.lit(k["fn"]) + F.lit(k["rr"] / 2)
                   * F.log((F.lit(1.0) + zp) / (F.lit(1.0) - zp)), 3) + F.lit(0.0)
    return (
        cust.filter(F.col("c_custkey") < 400)
        .select("c_custkey", ch_e.alias("ch_e"), ch_n.alias("ch_n"))
        .orderBy("c_custkey")
    )


def _swiss_sql() -> str:
    k = _somerc_consts()
    phi = f"({_CHY} * {k['pi']!r} / 180.0)"
    s = f"sin({phi})"
    s_iso = (f"(ln(tan({k['pi'] / 4!r} + {phi} / 2.0)) - {k['e'] / 2!r} "
             f"* ln((1.0 + {k['e']!r} * {s}) / (1.0 - {k['e']!r} * {s})))")
    b = f"(2.0 * (atan(exp({k['alpha']!r} * {s_iso} + {k['k']!r})) - {k['pi'] / 4!r}))"
    l = f"({k['alpha']!r} * ({_CHX} - {k['lon0']!r}) * {k['pi']!r} / 180.0)"
    xp = f"({k['cb0']!r} * cos({b}) * cos({l}) + {k['sb0']!r} * sin({b}))"
    yp = f"(cos({b}) * sin({l}))"
    zp = f"({-k['sb0']!r} * cos({b}) * cos({l}) + {k['cb0']!r} * sin({b}))"
    ce = f"ROUND({k['fe']!r} + {k['rr']!r} * atan2({yp}, {xp}), 3) + 0.0"
    cn = (f"ROUND({k['fn']!r} + {k['rr'] / 2!r} "
          f"* ln((1.0 + {zp}) / (1.0 - {zp})), 3) + 0.0")
    return f"""
SELECT c_custkey, {ce} AS ch_e, {cn} AS ch_n
FROM customer
WHERE c_custkey < 400
ORDER BY c_custkey
"""


def q_spatial_join_contains(spark, sf_dir):
    """Distributed point-in-box spatial join (reference testSpatialJoin
    contract, TestSedonaIcebergExtension.scala:117-127) — grid strategy,
    Python-free plan via rect/point hints."""
    pts = _cust_points(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey", "n_name"),
        (F.col("n_nationkey") * 14 - 180).cast("double"), F.lit(-90.0),
        (F.col("n_nationkey") * 14 - 166).cast("double"), F.lit(90.0))
    joined = spatial_join(boxes, pts, predicate="contains", on=("geo", "geo"),
                          strategy="grid", left_is_rects=True, right_is_points=True)
    return (
        joined.groupBy("n_nationkey", "n_name")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("n_nationkey")
    )


_QSJC_SQL = f"""
SELECT n_nationkey, n_name, COUNT(*) AS n_points
FROM nation JOIN customer
  ON {_CX} > CAST(n_nationkey * 14 - 180 AS DOUBLE)
 AND {_CX} < CAST(n_nationkey * 14 - 166 AS DOUBLE)
 AND {_CY} > -90.0 AND {_CY} < 90.0
GROUP BY n_nationkey, n_name
ORDER BY n_nationkey
"""


def q_spatial_join_sql(spark, sf_dir):
    """The reference's headline capability: a *plain SQL* spatial join planned
    into the distributed grid join (TestSedonaIcebergExtension.scala:117-127:
    ``SELECT l.id id_l, r.id id_r FROM test_left l JOIN test_right r ON
    ST_Contains(r.geo, l.geo) ORDER BY id_l`` must not plan a nested-loop
    join).  The SQL below is that statement verbatim, modulo table/column
    names; ``spatial_sql`` detects the ON clause and routes it through
    ``operators.spatial_join`` (cell equi-join + exact refinement)."""
    from ..operators import spatial_sql

    pts = _cust_points(spark, sf_dir).select("c_custkey", "geo", "geo_env")
    nation = load_table(spark, sf_dir, "nation")
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey"),
        (F.col("n_nationkey") * 14 - 180).cast("double"), F.lit(-90.0),
        (F.col("n_nationkey") * 14 - 166).cast("double"), F.lit(90.0),
    ).select("n_nationkey", "geo", "geo_env")
    pts.createOrReplaceTempView("sql_join_left")
    boxes.createOrReplaceTempView("sql_join_right")
    return spatial_sql(spark, """
        SELECT l.c_custkey AS id_l, r.n_nationkey AS id_r
        FROM sql_join_left l JOIN sql_join_right r
        ON ST_Contains(r.geo, l.geo)
        ORDER BY id_l, id_r""")


def q_spatial_join_sql_comma(spark, sf_dir):
    """The reference App's own headline spelling — a COMMA join with the
    spatial predicate in WHERE plus a residual range conjunct
    (``SELECT * FROM t0 l, t1 r WHERE ST_Contains(r.geo, l.geo) AND
    ST_Contains(ST_PolygonFromEnvelope(...), l.geo)``, App.scala:62-64,
    72-73,77 incl. the CTAS).  The comma-join detector plans the join
    conjunct through the distributed grid join; the range conjunct stays as
    the residual WHERE over the pair view's alias structs."""
    from ..operators import spatial_sql

    pts = _cust_points(spark, sf_dir).select("c_custkey", "geo", "geo_env")
    nation = load_table(spark, sf_dir, "nation")
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey"),
        (F.col("n_nationkey") * 14 - 180).cast("double"), F.lit(-90.0),
        (F.col("n_nationkey") * 14 - 166).cast("double"), F.lit(90.0),
    ).select("n_nationkey", "geo", "geo_env")
    pts.createOrReplaceTempView("sql_comma_left")
    boxes.createOrReplaceTempView("sql_comma_right")
    return spatial_sql(spark, """
        SELECT l.c_custkey AS id_l, r.n_nationkey AS id_r
        FROM sql_comma_left l, sql_comma_right r
        WHERE ST_Contains(r.geo, l.geo)
          AND ST_Contains(ST_PolygonFromEnvelope(-120.5, -60.5, 40.5, 60.5), l.geo)
        ORDER BY id_l, id_r""")


_QSJCOMMA_SQL = f"""
SELECT c_custkey AS id_l, n_nationkey AS id_r
FROM customer, nation
WHERE {_CX} > CAST(n_nationkey * 14 - 180 AS DOUBLE)
  AND {_CX} < CAST(n_nationkey * 14 - 166 AS DOUBLE)
  AND {_CX} > -120.5 AND {_CX} < 40.5 AND {_CY} > -60.5 AND {_CY} < 60.5
ORDER BY id_l, id_r
"""


_QSJSQL_SQL = f"""
SELECT c_custkey AS id_l, n_nationkey AS id_r
FROM customer, nation
WHERE {_CX} > CAST(n_nationkey * 14 - 180 AS DOUBLE)
  AND {_CX} < CAST(n_nationkey * 14 - 166 AS DOUBLE)
  AND {_CY} > -90.0 AND {_CY} < 90.0
ORDER BY id_l, id_r
"""


def q_spatial_join_sql_dwithin(spark, sf_dir):
    """SQL-text distance join through the same front door: ``JOIN ON
    ST_DWithin(l.geo, r.geo, d)`` written as plain SQL is detected and
    planned as the grid cell equi-join (no nested loop, no per-pair UDF —
    point shape hints ride the column metadata)."""
    from ..operators import spatial_sql

    pts = _cust_points(spark, sf_dir).select("c_custkey", "geo", "geo_env")
    sup = _supp_points(spark, sf_dir).select("s_suppkey", "geo", "geo_env")
    pts.createOrReplaceTempView("sql_dw_left")
    sup.createOrReplaceTempView("sql_dw_right")
    return spatial_sql(spark, """
        SELECT l.c_custkey AS id_l, r.s_suppkey AS id_r
        FROM sql_dw_left l JOIN sql_dw_right r
        ON ST_DWithin(l.geo, r.geo, 4.0)
        ORDER BY id_l, id_r""")


_QSJDSQL_SQL = f"""
SELECT c_custkey AS id_l, s_suppkey AS id_r
FROM customer, supplier
WHERE ({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}) <= 16.0
ORDER BY id_l, id_r
"""


def q_spatial_join_sql_chain(spark, sf_dir):
    """TWO spatial joins in one plain-SQL statement, both planned through the
    distributed grid join: point-in-box containment chained with a distance
    join.  The rewriter plans left-to-right; the second join's ``p.geo``
    reference resolves through the first pair view's alias-struct column
    (shape-hint metadata re-stamped on extraction, so both joins keep the
    Python-free exact-envelope plan — no BroadcastNestedLoopJoin anywhere)."""
    from ..operators import spatial_sql

    pts = _cust_points(spark, sf_dir).select("c_custkey", "geo", "geo_env")
    nation = load_table(spark, sf_dir, "nation")
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey"),
        (F.col("n_nationkey") * 14 - 180).cast("double"), F.lit(-90.0),
        (F.col("n_nationkey") * 14 - 166).cast("double"), F.lit(90.0),
    ).select("n_nationkey", "geo", "geo_env")
    sup = _supp_points(spark, sf_dir).select("s_suppkey", "geo", "geo_env")
    pts.createOrReplaceTempView("sql_chain_pts")
    boxes.createOrReplaceTempView("sql_chain_boxes")
    sup.createOrReplaceTempView("sql_chain_sup")
    return spatial_sql(spark, """
        SELECT p.c_custkey AS id_c, b.n_nationkey AS id_n, s.s_suppkey AS id_s
        FROM sql_chain_pts p JOIN sql_chain_boxes b ON ST_Contains(b.geo, p.geo)
        JOIN sql_chain_sup s ON ST_DWithin(p.geo, s.geo, 4.0)
        ORDER BY id_c, id_n, id_s""")


_QSJCHAIN_SQL = f"""
SELECT c_custkey AS id_c, n_nationkey AS id_n, s_suppkey AS id_s
FROM customer, nation, supplier
WHERE {_CX} > CAST(n_nationkey * 14 - 180 AS DOUBLE)
  AND {_CX} < CAST(n_nationkey * 14 - 166 AS DOUBLE)
  AND {_CY} > -90.0 AND {_CY} < 90.0
  AND ({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}) <= 16.0
ORDER BY id_c, id_n, id_s
"""


def q_spatial_join_left(spark, sf_dir):
    """LEFT OUTER spatial join as plain SQL: customers east of the last
    nation strip (x > 170) match no box and must survive null-extended.
    The grid path computes inner matches via the cell equi-join, then
    anti-joins the row id to null-extend unmatched rows exactly once."""
    from ..operators import spatial_sql

    pts = _cust_points(spark, sf_dir).select("c_custkey", "geo", "geo_env")
    nation = load_table(spark, sf_dir, "nation")
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey"),
        (F.col("n_nationkey") * 14 - 180).cast("double"), F.lit(-90.0),
        (F.col("n_nationkey") * 14 - 166).cast("double"), F.lit(90.0),
    ).select("n_nationkey", "geo", "geo_env")
    pts.createOrReplaceTempView("sql_left_pts")
    boxes.createOrReplaceTempView("sql_left_boxes")
    out = spatial_sql(spark, """
        SELECT p.c_custkey AS id_c, b.n_nationkey AS id_n
        FROM sql_left_pts p LEFT JOIN sql_left_boxes b
        ON ST_Contains(b.geo, p.geo)""")
    return out.orderBy(F.col("id_c"), F.col("id_n").asc_nulls_last())


_QSJLEFT_SQL = f"""
SELECT c_custkey AS id_c, n_nationkey AS id_n
FROM customer LEFT JOIN nation
  ON {_CX} > CAST(n_nationkey * 14 - 180 AS DOUBLE)
 AND {_CX} < CAST(n_nationkey * 14 - 166 AS DOUBLE)
 AND {_CY} > -90.0 AND {_CY} < 90.0
ORDER BY id_c, id_n NULLS LAST
"""


def q_spatial_dbscan(spark, sf_dir):
    """Distributed DBSCAN (PostGIS ``ST_ClusterDBSCAN`` analogue) composed
    from the engine's own operators: grid dwithin self-join → core points →
    connected components over core-core edges → deterministic (min-cluster)
    border attachment → noise.  Points use co-prime moduli so all 1500 are
    distinct (the F4 synthesis collapses to 360 positions).  eps=5,
    min_pts=6 → a genuine core/border/noise mix.  Oracle: the same
    definition in SQL with a recursive closure for the cluster stage."""
    from ..pipeline.clustering import dbscan

    cust = load_table(spark, sf_dir, "customer")
    pts = ST.with_point_geometry(
        cust.select("c_custkey"),
        (F.col("c_custkey") % 173).cast("double"),
        ((F.col("c_custkey") * 7) % 127).cast("double"))
    out = dbscan(pts, "c_custkey", eps=5.0, min_pts=6)
    return out.orderBy("c_custkey")


_DBX = "CAST(c_custkey % 173 AS DOUBLE)"
_DBY = "CAST((c_custkey * 7) % 127 AS DOUBLE)"


def _minlabel_rounds_sql(edges: str, rounds: int = 24) -> str:
    """CTE chain computing per-node component minima over the symmetric
    edge relation ``edges`` WITHOUT a transitive-closure recursion: each
    unrolled round takes the neighbor minimum (one-hop propagation) and
    then pointer-jumps (label <- label OF the label node, halving label-
    chain depth), so the known-min horizon at round r covers distance
    >= 2^(r-1) — 24 rounds converge for any component narrower than
    2^23 hops, far beyond any test scale.  Replaces the naive
    ``reach(u, w)`` closure whose row count is quadratic in component
    size: at sf0.1 the dbscan core graph is one ~15k-node component, so
    the closure materialized ~10^8 (u, w) pairs and a full-set sweep
    spent over an hour in this one oracle; the label rounds are
    O(rounds * |E|).  Safety: labels only ever move to other node ids
    within the component, and a too-small round count would leave some
    label ABOVE the true minimum — a visible engine-vs-oracle mismatch,
    never a silent agreement.  Yields ``comp(id, component)`` for every
    node of ``edges``.  Every multiply-referenced CTE is MATERIALIZED:
    DuckDB (1.x) inlines plain CTEs per reference, and since each round
    references the previous one twice the inlined tree would grow
    2^rounds scans (observed as "Too many open files" on the source
    parquet before any row moved)."""
    parts = [f"l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS l"
             f" FROM {edges})"]
    prev = "l0"
    for r in range(1, rounds + 1):
        parts.append(f"""m{r} AS (
  SELECT e.u AS id, MIN(p.l) AS ml FROM {edges} e JOIN {prev} p ON p.id = e.v
  GROUP BY e.u
), h{r} AS MATERIALIZED (
  SELECT n.id, LEAST(n.l, COALESCE(m.ml, n.l)) AS l
  FROM {prev} n LEFT JOIN m{r} m ON m.id = n.id
), l{r} AS MATERIALIZED (
  SELECT a.id, b.l FROM h{r} a JOIN h{r} b ON b.id = a.l
)""")
        prev = f"l{r}"
    parts.append(f"comp AS (SELECT id, l AS component FROM {prev})")
    return ", ".join(parts)


_QDBSCAN_SQL = f"""
WITH pts AS MATERIALIZED (
  SELECT c_custkey AS id, {_DBX} AS x, {_DBY} AS y FROM customer
), nbrs AS MATERIALIZED (
  SELECT a.id AS ida, b.id AS idb FROM pts a JOIN pts b
    ON (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 25.0
), core AS MATERIALIZED (
  SELECT ida AS id FROM nbrs GROUP BY ida HAVING COUNT(*) >= 6
), ce AS MATERIALIZED (
  SELECT n.ida AS u, n.idb AS v FROM nbrs n
  JOIN core c1 ON n.ida = c1.id JOIN core c2 ON n.idb = c2.id
  WHERE n.ida != n.idb
), {_minlabel_rounds_sql("ce")}, core_comp AS (
  SELECT c.id, COALESCE(cm.component, c.id) AS cluster
  FROM core c LEFT JOIN comp cm ON cm.id = c.id
), border AS (
  SELECT n.ida AS id, MIN(cc.cluster) AS cluster
  FROM nbrs n JOIN core_comp cc ON n.idb = cc.id
  WHERE n.ida != n.idb AND n.ida NOT IN (SELECT id FROM core)
  GROUP BY n.ida
)
SELECT c_custkey, role, cluster FROM (
  SELECT id AS c_custkey, 'core' AS role, cluster FROM core_comp
  UNION ALL
  SELECT id, 'border', cluster FROM border
  UNION ALL
  SELECT c_custkey, 'noise', CAST(NULL AS BIGINT) FROM customer
  WHERE c_custkey NOT IN (SELECT id FROM core_comp)
    AND c_custkey NOT IN (SELECT id FROM border)
) t
ORDER BY c_custkey
"""


def q_spatial_join_broadcast(spark, sf_dir):
    """The planner's OTHER strategy: a tiny build side (25 nation boxes)
    broadcast against customer points — envelope conjuncts evaluated inside
    a BroadcastHashJoin-able equi-free join, no shuffle of the fact side.
    Same result contract as the grid join, different physical plan (the
    reference's BroadcastIndexJoin analogue)."""
    pts = _cust_points(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey"),
        (F.col("n_nationkey") * 14 - 180).cast("double"), F.lit(-90.0),
        (F.col("n_nationkey") * 14 - 166).cast("double"), F.lit(90.0),
    )
    joined = spatial_join(pts, boxes, predicate="within", on=("geo", "geo"),
                          strategy="broadcast",
                          left_is_points=True, right_is_rects=True)
    return (
        joined.select(F.col("c_custkey"), F.col("n_nationkey"))
        .orderBy("c_custkey", "n_nationkey")
    )


_QSJB_SQL = f"""
SELECT c_custkey, n_nationkey
FROM customer, nation
WHERE {_CX} > CAST(n_nationkey * 14 - 180 AS DOUBLE)
  AND {_CX} < CAST(n_nationkey * 14 - 166 AS DOUBLE)
  AND {_CY} > -90.0 AND {_CY} < 90.0
ORDER BY c_custkey, n_nationkey
"""


def q_spatial_join_dwithin(spark, sf_dir):
    """Distance join: customer↔supplier points within 2.5 units — grid
    strategy, fully native distance algebra."""
    pts = _cust_points(spark, sf_dir)
    sup = _supp_points(spark, sf_dir)
    joined = spatial_join(pts, sup, predicate="dwithin", on=("geo", "geo"), d=2.5,
                          strategy="grid", left_is_points=True, right_is_points=True)
    return (
        joined.select(F.col("c_custkey"), F.col("s_suppkey"))
        .orderBy("c_custkey", "s_suppkey")
    )


_QSJD_SQL = f"""
SELECT c_custkey, s_suppkey
FROM customer, supplier
WHERE ({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}) <= 6.25
ORDER BY c_custkey, s_suppkey
"""


def q_spatial_knn(spark, sf_dir):
    """5 nearest supplier points to the origin (windowed top-k)."""
    from ..operators import knn_join
    sup = _supp_points(spark, sf_dir).select(
        "s_suppkey",
        F.col("geo_env.xmin").alias("x"), F.col("geo_env.ymin").alias("y"))
    q = spark.createDataFrame([(0, 0.0, 0.0)], "id int, x double, y double")
    out = knn_join(q, sup, k=5, query_id="id", tie_break="s_suppkey")
    return (
        out.select("s_suppkey", F.round(F.col("distance"), 6).alias("distance"))
        .orderBy("distance", "s_suppkey")
    )


_QKNN_SQL = f"""
SELECT s_suppkey, distance FROM (
  SELECT s_suppkey, ROUND(SQRT({_SX} * {_SX} + {_SY} * {_SY}), 6) AS distance
  FROM supplier
  ORDER BY SQRT({_SX} * {_SX} + {_SY} * {_SY}) ASC, {_SX} ASC, {_SY} ASC,
           s_suppkey ASC
  LIMIT 5) t
ORDER BY distance, s_suppkey
"""


def q_spatial_knn_grid(spark, sf_dir):
    """Large-query-side KNN through the adaptive-radius grid path (forced
    via a 1-row broadcast threshold): 3 nearest suppliers per customer
    point — every round is a cell equi-join, no cross join in the plan.
    Oracle: windowed exact top-k."""
    from ..operators import knn_join

    q = _cust_points(spark, sf_dir).filter(F.col("c_custkey") < 100).select(
        F.col("c_custkey").alias("id"),
        F.col("geo_env.xmin").alias("x"), F.col("geo_env.ymin").alias("y"))
    sup = _supp_points(spark, sf_dir).select(
        "s_suppkey",
        F.col("geo_env.xmin").alias("x"), F.col("geo_env.ymin").alias("y"))
    out = knn_join(q, sup, k=3, query_id="id", broadcast_threshold_rows=1,
                   tie_break="s_suppkey")
    return (
        out.select(F.col("query_id").alias("c_custkey"), "s_suppkey",
                   F.col("_rank").alias("rk"),
                   F.round(F.col("distance"), 6).alias("distance"))
        .orderBy("c_custkey", "rk")
    )


_QKNNGRID_SQL = f"""
SELECT c_custkey, s_suppkey, rk, distance FROM (
  SELECT c_custkey, s_suppkey,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY c_custkey
           ORDER BY SQRT(({_CX} - {_SX}) * ({_CX} - {_SX})
                       + ({_CY} - {_SY}) * ({_CY} - {_SY})) ASC,
                    {_SX} ASC, {_SY} ASC, s_suppkey ASC) AS BIGINT) AS rk,
         ROUND(SQRT(({_CX} - {_SX}) * ({_CX} - {_SX})
                  + ({_CY} - {_SY}) * ({_CY} - {_SY})), 6) AS distance
  FROM customer, supplier
  WHERE c_custkey < 100
) t
WHERE rk <= 3
ORDER BY c_custkey, rk
"""


def q_spatial_centroid_agg(spark, sf_dir):
    """ST_CENTROID_AGGR per nation over customer points — the reference's
    CentroidBuffer monoid (UDAF/AggregateFunctions.scala:12-14) specialized
    for point inputs: all 9 buffer fields are native column aggregates, so
    the whole plan is Python-free (the general-geometry buffer path is
    centroid_agg_columns, exercised in tests)."""
    from ..functions.aggregates import centroid_agg_columns_points

    pts = _cust_points(spark, sf_dir)
    out = (
        pts.groupBy("c_nationkey")
        .agg(*centroid_agg_columns_points(F.col("geo_env.xmin"), F.col("geo_env.ymin")))
    )
    x, y = centroid_finish_xy()
    return (
        out.select(F.col("c_nationkey"),
                   F.round(x, 6).alias("centroid_x"),
                   F.round(y, 6).alias("centroid_y"))
        .orderBy("c_nationkey")
    )


_QCAGG_SQL = f"""
SELECT c_nationkey,
       ROUND(SUM({_CX}) / COUNT(*), 6) AS centroid_x,
       ROUND(SUM({_CY}) / COUNT(*), 6) AS centroid_y
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q_spatial_envelope_agg(spark, sf_dir):
    """ST_Envelope_Aggr per nation — fully native min/max aggregation."""
    pts = _cust_points(spark, sf_dir)
    return (
        pts.groupBy("c_nationkey")
        .agg(F.min(F.col("geo_env.xmin")).alias("xmin"),
             F.min(F.col("geo_env.ymin")).alias("ymin"),
             F.max(F.col("geo_env.xmax")).alias("xmax"),
             F.max(F.col("geo_env.ymax")).alias("ymax"))
        .orderBy("c_nationkey")
    )


_QEAGG_SQL = f"""
SELECT c_nationkey, MIN({_CX}) AS xmin, MIN({_CY}) AS ymin,
       MAX({_CX}) AS xmax, MAX({_CY}) AS ymax
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q_spatial_union_agg(spark, sf_dir):
    """ST_Union_Aggr of points per group, summarized as (distinct point
    count, envelope) — the faithful scalar image of a MULTIPOINT union
    (dedup included, golden contract TestSedonaIcebergExtension.scala:90-92)."""
    pts = _cust_points(spark, sf_dir)
    return (
        pts.select("c_nationkey",
                   F.col("geo_env.xmin").alias("x"), F.col("geo_env.ymin").alias("y"))
        .distinct()
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_union_points"),
             F.min("x").alias("xmin"), F.max("x").alias("xmax"))
        .orderBy("c_nationkey")
    )


_QUAGG_SQL = f"""
SELECT c_nationkey, COUNT(*) AS n_union_points, MIN(x) AS xmin, MAX(x) AS xmax
FROM (SELECT DISTINCT c_nationkey, {_CX} AS x, {_CY} AS y FROM customer) t
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q_spatial_intersection_agg(spark, sf_dir):
    """ST_Intersection_Aggr (SQL UDAF) of nested supplier boxes per nation —
    every box shares the (0,0)-(10,10) core, so the group intersection is
    the rectangle bounded by the group minima; the oracle computes that
    rectangle with plain MIN aggregates."""
    from ..session import register_all

    register_all(spark)
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_sup_ia")
    return spark.sql("""
        WITH boxes AS (
          SELECT s_nationkey,
                 ST_PolygonFromEnvelope(0D, 0D,
                     CAST(10 + s_suppkey % 5 AS DOUBLE),
                     CAST(10 + s_suppkey % 7 AS DOUBLE)) AS geo
          FROM _sup_ia
        ), agg AS (
          SELECT s_nationkey, ST_Intersection_Aggr(geo) AS g
          FROM boxes GROUP BY s_nationkey
        )
        SELECT s_nationkey, ST_XMax(g) AS xmax, ST_YMax(g) AS ymax,
               ST_Area(g) AS area
        FROM agg ORDER BY s_nationkey""")


_QIAGG_SQL = """
SELECT s_nationkey,
       MIN(CAST(10 + s_suppkey % 5 AS DOUBLE)) AS xmax,
       MIN(CAST(10 + s_suppkey % 7 AS DOUBLE)) AS ymax,
       MIN(CAST(10 + s_suppkey % 5 AS DOUBLE))
         * MIN(CAST(10 + s_suppkey % 7 AS DOUBLE)) AS area
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


# ===========================================================================
# Tier E — text analysis
# ===========================================================================

def q_doc_token_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id",
                    text.token_count(F.col("text")).alias("n_tokens"),
                    F.length("text").alias("n_chars_measured"))
        .orderBy("doc_id")
    )


_QTOK_SQL = """
SELECT doc_id,
       len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
       length(text) AS n_chars_measured
FROM documents
ORDER BY doc_id
"""


def q_doc_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id",
                    F.round(text.punct_ratio(F.col("text")), 9).alias("punct_ratio"),
                    F.round(text.stopword_ratio(F.col("text")), 9).alias("stopword_ratio"),
                    F.round(text.mean_token_len(F.col("text")), 9).alias("mean_token_len"))
        .orderBy("doc_id")
    )


_STOP_SQL = "['" + "','".join(text._STOPWORDS) + "']"
_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"

_QQUAL_SQL = f"""
SELECT doc_id,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[\\.,!\\?;:]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 9) AS punct_ratio,
       ROUND(CAST(len(list_filter({_TOKS_SQL}, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
             / greatest(len({_TOKS_SQL}), 1), 9) AS stopword_ratio,
       ROUND(CAST(list_sum(list_transform({_TOKS_SQL}, t -> length(t))) AS DOUBLE)
             / greatest(len({_TOKS_SQL}), 1), 9) AS mean_token_len
FROM documents
ORDER BY doc_id
"""


def q_doc_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.col("lang").alias("labeled_lang"),
                    text.lang_id(F.col("text")).alias("detected_lang"))
        .orderBy("doc_id")
    )


def _lang_sql():
    scores = {}
    for lang, lex in text.LANG_LEXICONS.items():
        arr = "['" + "','".join(lex) + "']"
        scores[lang] = f"len(list_filter({_TOKS_SQL}, t -> list_contains({arr}, t)))"
    mx = "greatest(" + ", ".join(scores.values()) + ")"
    case = f"CASE WHEN {mx} <= 0 THEN 'und'"
    for lang in sorted(scores):
        case += f" WHEN {scores[lang]} = {mx} THEN '{lang}'"
    case += " END"
    return f"""
SELECT doc_id, lang AS labeled_lang, {case} AS detected_lang
FROM documents
ORDER BY doc_id
"""


def q_doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
    )


_QFP_SQL = """
SELECT doc_id,
       ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') || '#fp'), 1, 15))::BIGINT AS fp
FROM documents
ORDER BY doc_id
"""


def q_doc_top_tokens(spark, sf_dir):
    """Corpus heavy hitters (pipeline.text.top_tokens): top 20 non-stopword
    tokens — explode + map-side partial hash-agg + global top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return text.top_tokens(docs, k=20)


_QTOPTOK_SQL = f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents)
WHERE token NOT IN {_STOP_SQL.replace("[", "(").replace("]", ")")}
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 20
"""


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample (pipeline.sample.stratified_sample):
    10 docs per language, chosen by smallest portable hash — reproducible
    across engines and re-runs, unlike seeded ``sampleBy``."""
    from ..pipeline import sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        sample.stratified_sample(docs, "lang", 10)
        .select("lang", F.col("sample_rank").cast("long").alias("sample_rank"),
                "doc_id")
        .orderBy("lang", "sample_rank")
    )


_QSTRAT_SQL = """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#samp'), 1, 15))::BIGINT AS hk
  FROM documents
), r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
  FROM h
)
SELECT lang, CAST(rk AS BIGINT) AS sample_rank, doc_id
FROM r WHERE rk <= 10
ORDER BY lang, sample_rank
"""


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (pipeline.text.chunk_documents) —
    64-token windows, stride 48.  Native sequence/explode/slice; the oracle
    rebuilds the same windows with generate_series + list slicing."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.chunk_documents(docs, size=64, stride=48)
        .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
        .orderBy("doc_id", "chunk_id")
    )


_QCHUNK_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
), c AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(FLOOR((len(toks) - 1) / 48.0) AS BIGINT) + 1)) AS i
  FROM t
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(LEAST(64, len(toks) - i * 48) AS BIGINT) AS n_tokens,
       array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


# ===========================================================================
# Tier E — dedup
# ===========================================================================

def q_exact_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.exact_dedup_groups(docs, "doc_id", "text")
        .select("content_hash", "keep_id", "n_copies")
        .orderBy("content_hash")
    )


_QDEDUP_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY content_hash
"""


def q_minhash_signatures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_n=3)
        .orderBy("doc_id", "seed")
    )


from .sql_shared import (mh_mix_sql as _mh_mix_sql,          # noqa: E402
                         mh_sig_cte as _mh_sig_cte,
                         lsh_pairs_cte as _lsh_pairs_cte,
                         LSH_MAX_BUCKET as _LSH_MAX_BUCKET)

_QMH_SQL = _mh_sig_cte("WHERE doc_id < 100") + """
SELECT doc_id, CAST(seed AS INT) AS seed, minhash
FROM sig
ORDER BY doc_id, seed
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4,
                                max_bucket=_LSH_MAX_BUCKET)
        .orderBy("id_a", "id_b")
    )


_QLSH_SQL = _mh_sig_cte("") + _lsh_pairs_cte() + """
SELECT id_a, id_b FROM pairs
ORDER BY id_a, id_b
"""


def q_minhash_jaccard_est(spark, sf_dir):
    """Estimated Jaccard (fraction of agreeing MinHash components) for every
    LSH candidate pair — the score the banding scheme is built on, and the
    cheap ranking a dedup pass uses before exact verification
    (pipeline.dedup.minhash_estimate_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    return (dedup.minhash_estimate_pairs(docs, "doc_id", "text",
                                         num_hashes=8, bands=4,
                                         max_bucket=_LSH_MAX_BUCKET)
            .withColumn("jaccard_est", F.round("jaccard_est", 6))
            .orderBy("id_a", "id_b"))


def _mh_est_sql() -> str:
    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(8))
    return _mh_sig_cte("") + _lsh_pairs_cte() + f"""
SELECT p.id_a, p.id_b,
       ROUND(CAST({agree} AS DOUBLE) / 8.0, 6) AS jaccard_est
FROM pairs p
JOIN sigw a ON a.doc_id = p.id_a
JOIN sigw b ON b.doc_id = p.id_b
ORDER BY p.id_a, p.id_b
"""


def q_doc_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (first 200 docs) — keyword
    extraction over the corpus, 100% native plan (text.tfidf_top_terms).
    IDF uses the FULL corpus document frequency; only the output is
    filtered, so the scores match a whole-corpus oracle."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(docs, "doc_id", "text", k=3)
    return (out.filter(F.col("doc_id") < 200)
            .withColumn("rank", F.col("rank").cast("int"))
            .orderBy("doc_id", "rank"))


_QTFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term != ''
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, ROUND(tfidf, 6) AS tfidf, rank
FROM (
  SELECT doc_id, term, tf, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS INT) AS rank
  FROM scored) t
WHERE rank <= 3 AND doc_id < 200
ORDER BY doc_id, rank
"""


def q_doc_char_entropy(spark, sf_dir):
    """Character-entropy quality score (pipeline.text.char_entropy) — the
    perplexity proxy; fully native explode + two-level partial agg."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.char_entropy(docs, "doc_id", "text")
    return (out.select("doc_id", F.round("entropy", 6).alias("entropy"))
            .orderBy("doc_id"))


_QENT_SQL = """
WITH freq AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
  FROM (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
        FROM documents, unnest(generate_series(1, length(text))) AS t(i))
  GROUP BY doc_id, ch
)
SELECT doc_id, ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
FROM freq GROUP BY doc_id ORDER BY doc_id
"""


def q_doc_top_token_share(spark, sf_dir):
    """Repetition/boilerplate detector (pipeline.text.top_token_share):
    share of the single most frequent token per document."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.top_token_share(docs, "doc_id", "text")
    return (out.select("doc_id", F.round("top_share", 6).alias("top_share"),
                       "n_tokens")
            .orderBy("doc_id"))


_QTOPSHARE_SQL = f"""
WITH cnt AS (
  SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS c
  FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents)
  WHERE token != ''
  GROUP BY doc_id, token
)
SELECT doc_id, ROUND(MAX(c) / SUM(c), 6) AS top_share,
       CAST(SUM(c) AS BIGINT) AS n_tokens
FROM cnt GROUP BY doc_id ORDER BY doc_id
"""


def q_source_mix_weights(spark, sf_dir):
    """Domain-mixing weights (pipeline.text.source_mix_weights):
    per-source doc/token tallies + tokens^0.7 temperature weights."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.source_mix_weights(docs, "source", "text", alpha=0.7)
    return (out.select("source", "n_docs", "n_tokens",
                       F.round("mix_weight", 6).alias("mix_weight"))
            .orderBy("source"))


_QMIX_SQL = f"""
WITH per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_TOKS_SQL})) AS DOUBLE) AS toks
  FROM documents GROUP BY source
)
SELECT source, n_docs, CAST(toks AS BIGINT) AS n_tokens,
       ROUND(POW(toks, 0.7) / SUM(POW(toks, 0.7)) OVER (), 6) AS mix_weight
FROM per ORDER BY source
"""


def q_hll_distinct_users(spark, sf_dir):
    """Deterministic HyperLogLog over events.user_id (pipeline.sketch):
    portable-hash registers make the whole sketch — ranks, harmonic mean,
    small-range correction — reproducible in SQL, so the APPROXIMATE
    estimate is exact-value-checked.  Output also carries the true
    distinct count for accuracy reading."""
    from ..pipeline import sketch

    ev = load_table(spark, sf_dir, "events")
    est = sketch.hll_estimate(ev, "user_id", p=10)
    exact = ev.agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    return est.crossJoin(exact).select(
        "n_registers", F.round("estimate", 6).alias("estimate"), "n_exact")


_ALPHA_M2 = 0.7213 / (1 + 1.079 / 1024) * 1024 * 1024

_QHLL_SQL = f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#hll'), 1, 15))::BIGINT AS h
  FROM events
), rr AS (
  SELECT h % 1024 AS register,
         MAX(CASE WHEN h // 1024 > 0
                  THEN 50 - CAST(floor(log2(h // 1024)) AS BIGINT)
                  ELSE 51 END) AS max_rank
  FROM h GROUP BY h % 1024
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_registers,
         SUM(POW(2.0, -max_rank)) AS s
  FROM rr
)
SELECT n_registers,
       ROUND(CASE WHEN {_ALPHA_M2!r} / ((1024.0 - n_registers) + s) <= 2560.0
                   AND (1024.0 - n_registers) > 0
             THEN 1024.0 * ln(1024.0 / (1024.0 - n_registers))
             ELSE {_ALPHA_M2!r} / ((1024.0 - n_registers) + s) END, 6) AS estimate,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_exact
FROM agg
"""


def q_corpus_contamination(spark, sf_dir):
    """Train/test decontamination (pipeline.dedup.contamination): docs are
    split by ``doc_id % 10`` (0-7 train, 8-9 test); each test doc reports
    how many of its distinct 5-gram shingles leak from the train corpus.
    Fully native — shingle equi-join, no pairwise comparison."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 < 8)
    test = docs.filter(F.col("doc_id") % 10 >= 8)
    out = dedup.contamination(train, test, "doc_id", "text", shingle_n=5)
    return (out.select(
        "doc_id", "n_shingles", "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6)
         .alias("contamination"))
        .orderBy("doc_id"))


_QCONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), tr AS (
  SELECT DISTINCT array_to_string(list_slice(tk, i, i + 4), ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 4, 1) + 1)) AS i) t
  WHERE doc_id % 10 < 8
), te AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 4), ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 4, 1) + 1)) AS i) t
  WHERE doc_id % 10 >= 8
)
SELECT te.doc_id AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS contamination
FROM te LEFT JOIN tr ON te.shingle = tr.shingle
GROUP BY te.doc_id ORDER BY doc_id
"""


def q_dedup_components(spark, sf_dir):
    """Near-duplicate *clusters*: connected components over the MinHash-LSH
    pair graph (pipeline.components) — iterative min-label propagation, one
    edge-join + min-agg per round, O(cluster diameter) rounds.  The oracle
    computes the same transitive closure with a recursive CTE, so the
    distributed iteration is value-checked end to end (an iterative
    fixpoint, still exactly SQL-expressible)."""
    from ..pipeline import components as cc
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4,
                                    max_bucket=_LSH_MAX_BUCKET)
    comp = cc.connected_components(pairs, "id_a", "id_b")
    return (
        comp.select(F.col("id").alias("doc_id"), "component")
        .orderBy("doc_id")
    )


_QCOMP_SQL = (_mh_sig_cte("").replace("WITH toks", "WITH RECURSIVE toks")
              + _lsh_pairs_cte()) + """
, edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, w) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.w FROM edges e JOIN reach r ON r.u = e.v
)
SELECT u AS doc_id, MIN(w) AS component
FROM reach GROUP BY u
ORDER BY doc_id
"""


def q_dedup_keep(spark, sf_dir):
    """The actionable end of the dedup pipeline: per near-dup cluster, the
    kept canonical document (min id) and how many get dropped — what a
    100 TB training-data pass actually writes out."""
    from ..pipeline import components as cc
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4,
                                    max_bucket=_LSH_MAX_BUCKET)
    comp = cc.connected_components(pairs, "id_a", "id_b")
    return (
        cc.keep_canonical(comp, "id", "component")
        .orderBy("component")
    )


_QKEEP_SQL = _QCOMP_SQL.replace("""
SELECT u AS doc_id, MIN(w) AS component
FROM reach GROUP BY u
ORDER BY doc_id
""", """
, comp AS (
  SELECT u AS doc_id, MIN(w) AS component FROM reach GROUP BY u
)
SELECT component, MIN(doc_id) AS keep_id, COUNT(*) - 1 AS n_dropped
FROM comp GROUP BY component
ORDER BY component
""")


def q_doc_dedup_pipeline(spark, sf_dir):
    """The full training-data dedup funnel as ONE declared query: exact
    dedup (md5 groupBy, keep min id) → MinHash-LSH pair generation over the
    survivors → connected components → drop non-canonical cluster members.
    Output: per language, how many documents entered, survived exact dedup,
    and survived near-dedup.  Every stage is the scale-shaped operator the
    engine ships (one shuffle each; no all-pairs anywhere); the oracle
    replays the identical funnel in SQL (recursive closure for the cluster
    stage)."""
    from ..pipeline import components as cc

    docs = load_table(spark, sf_dir, "documents")
    # survivors feed THREE consumers (the near-dup pair pipeline, the
    # final anti-join, the per-language count): materialize once (lazy)
    # instead of re-running the md5 dedup over the corpus per consumer —
    # measured at sf0.1 this query re-ran the documents scan 17× (round
    # 12; 5× after this + the connected-components edge checkpoint)
    stage1 = dedup.exact_dedup(docs, "doc_id", "text") \
        .transform(truncate_lineage)
    pairs = dedup.minhash_lsh_pairs(stage1, "doc_id", "text",
                                    num_hashes=8, bands=4,
                                    max_bucket=_LSH_MAX_BUCKET)
    comp = cc.connected_components(pairs, "id_a", "id_b")
    dropped = comp.filter(F.col("id") != F.col("component")) \
        .select(F.col("id").alias("doc_id"))
    final = stage1.join(dropped, "doc_id", "left_anti")

    n_in = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_exact = stage1.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after_exact"))
    n_final = final.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after_near"))
    return (
        n_in.join(n_exact, "lang", "left").join(n_final, "lang", "left")
        .select("lang", "n_docs",
                F.coalesce("n_after_exact", F.lit(0)).alias("n_after_exact"),
                F.coalesce("n_after_near", F.lit(0)).alias("n_after_near"))
        .orderBy("lang")
    )


_QPIPE_SQL = (
    "WITH RECURSIVE exact_keep AS (\n"
    "  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)\n"
    "), survivors AS (\n"
    "  SELECT d.* FROM documents d JOIN exact_keep k ON d.doc_id = k.doc_id\n"
    ")"
    + _mh_sig_cte("").replace("WITH toks", ", toks")
                     .replace("FROM documents", "FROM survivors")
    + _lsh_pairs_cte()
    + """
, edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, w) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.w FROM edges e JOIN reach r ON r.u = e.v
), comp AS (
  SELECT u AS doc_id, MIN(w) AS component FROM reach GROUP BY u
), dropped AS (
  SELECT doc_id FROM comp WHERE doc_id != component
), final AS (
  SELECT s.* FROM survivors s
  WHERE s.doc_id NOT IN (SELECT doc_id FROM dropped)
)
SELECT i.lang, i.n_docs,
       COALESCE(e.n, 0) AS n_after_exact,
       COALESCE(f.n, 0) AS n_after_near
FROM (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang) i
LEFT JOIN (SELECT lang, COUNT(*) AS n FROM survivors GROUP BY lang) e
  ON e.lang = i.lang
LEFT JOIN (SELECT lang, COUNT(*) AS n FROM final GROUP BY lang) f
  ON f.lang = i.lang
ORDER BY i.lang
""")


def q_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard pairs with the at-scale document-frequency cap:
    shingles shared by more than 256 documents are stop-shingles — they
    contribute quadratic posting-list buckets at corpus scale while connecting
    nothing that any useful threshold keeps.  The cap applies to candidate
    generation AND the common-count (a documented lower-bound score over
    non-stop shingles); the oracle mirrors it with the same doc-freq filter."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.jaccard_pairs(docs, "doc_id", "text", shingle_n=3, threshold=0.3,
                              max_doc_freq=256)
    return (
        out.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


_QJAC_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 2), ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i) t
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id
), rare AS (
  SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) <= 256
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON r.shingle = a.shingle
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common), 9) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.3
ORDER BY id_a, id_b
"""


def q_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.select("doc_id", text.simhash(F.col("text"), bits=60).alias("simhash"))
        .orderBy("doc_id")
    )


def _simhash_sql(bits: int = 60, where: str = "WHERE doc_id < 100") -> str:
    from .sql_shared import simhash_sql
    return simhash_sql(bits, where)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via pigeonhole banding (dedup.simhash_pairs).
    Oracle: direct all-pairs Hamming filter — banding is recall-lossless for
    d <= max_distance (pigeonhole), so the result sets must be identical.
    60-bit simhash / 4×15-bit bands: 2^15 values per band keeps the band
    equi-join selective at corpus scale (the round-1 16-bit/4-bit form had
    16 values per band — quadratic buckets on any real corpus).  Runs over
    the whole documents table — the banded join is what makes that cheap.
    ``max_bucket=4096`` exercises the scale cap without binding at the
    driver SFs; the exact all-pairs oracle would catch any capped-away
    pair, so the green row certifies the cap is loss-free on this data."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.simhash_pairs(docs, "doc_id", "text", bits=60, max_distance=3,
                              max_bucket=4096)
    return (
        out.select(F.col("id_a"), F.col("id_b"),
                   F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


def _simhash_pairs_sql(bits: int = 60, max_distance: int = 3) -> str:
    inner = _simhash_sql(bits, where="").replace("ORDER BY doc_id", "")
    return f"""
WITH s AS ({inner})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_distance}
ORDER BY id_a, id_b
"""


# ===========================================================================
# Tier E — embeddings / similarity
# ===========================================================================

def q_embedding_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.cosine_topk(queries, emb, k=10)
    return (
        out.select("query_id", "data_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


_QEMB_SQL = """
SELECT query_id, data_id, ROUND(cosine, 6) AS cosine, rank
FROM (
  SELECT q.vec_id AS query_id, d.vec_id AS data_id,
         list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cosine,
         CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
              d.vec_id ASC) AS INT) AS rank
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q, embeddings d) t
WHERE rank <= 10
ORDER BY query_id, rank
"""


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding near-dup via banded hyperplane LSH + exact cosine refine.

    The driver's embeddings table has no natural pair at cosine ≥ 0.85 (the
    check was 0-rows-green for four rounds — vacuous), so the declared query
    unions in deterministic perturbed near-dups: for vec_id < 40, a clone at
    id+1000000 with 0.01 added to the first component (pure double
    arithmetic, replayed bit-identically in the oracle).  Every (orig,
    clone) pair sits at cosine ≈ 0.9999+, so the oracle — exact all-pairs —
    now checks BOTH precision and recall of the LSH path on real rows.

    ``max_bucket=512`` exercises the scale cap without binding at the
    driver SFs (max observed bucket: 60 at sf0.01, 232 at sf0.1, + ≤1 clone
    per bucket); the all-pairs oracle would catch any capped-away pair, so
    the green row certifies the cap is loss-free on this data."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("embedding"))
    pert = base.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(F.array(F.element_at("embedding", 1) + F.lit(0.01)),
                 F.slice("embedding", 2, 63)).alias("embedding"))
    out = dedup.embedding_dup_pairs(base.unionAll(pert), "vec_id", "embedding",
                                    threshold=0.85, max_bucket=512)
    return (
        out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


_QEMBD_SQL = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
), pert AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_prepend(embedding[1] + 0.01, embedding[2:]) AS embedding
  FROM base WHERE vec_id < 40
), allv AS (
  SELECT * FROM base UNION ALL SELECT * FROM pert
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.85
ORDER BY id_a, id_b
"""


def q_embedding_label_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda v: v.cast("double") * v.cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    return (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.round(F.avg(norm), 6).alias("avg_norm"))
        .orderBy("label")
    )


_QEMBL_SQL = """
SELECT label, COUNT(*) AS n_vecs,
       ROUND(AVG(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 6) AS avg_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""


# ===========================================================================
# non-SQL-expressible entries (rows-only checks: LSH ANN, stateful stream,
# multimodal mapInPandas — SURVEY.md notes which and why)
# ===========================================================================

def q_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH ANN.  The planes are md5-derived (deterministic, no
    RNG state), so the bucketing — and therefore the whole approximate
    result — is exactly reproducible in SQL: the oracle re-derives every
    plane weight and the bucket sign-pattern term by term.  The dot
    products fold left from 0.0 in both engines over the same doubles, so
    the IEEE results are bitwise identical and the sign never diverges."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.lsh_topk(queries, emb, k=5, num_planes=4)
    return out.select("query_id", "data_id", F.round("cosine", 6).alias("cosine"), "rank") \
        .orderBy("query_id", "rank")


def _lsh_topk_sql(k: int = 5, num_planes: int = 4, dim: int = 64) -> str:
    from ..pipeline.similarity import _hyperplane
    cases = []
    for p in range(num_planes):
        w = _hyperplane(dim, p)
        terms = " + ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) * ({w[i]!r})"
                           for i in range(dim))
        cases.append(f"CASE WHEN ({terms}) > 0 THEN {2 ** p} ELSE 0 END")
    bucket = " + ".join(cases)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket FROM embeddings
)
SELECT query_id, data_id, ROUND(cosine, 6) AS cosine, rank
FROM (
  SELECT q.vec_id AS query_id, d.vec_id AS data_id,
         list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cosine,
         CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
              list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
              d.vec_id ASC) AS INT) AS rank
  FROM (SELECT * FROM b WHERE vec_id < 5) q JOIN b d ON d.bucket = q.bucket) t
WHERE rank <= {k}
ORDER BY query_id, rank
"""


def q_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN (similarity.ivf_topk) with a DETERMINISTIC
    codebook — the embeddings of the 8 smallest vec_ids — so the inverted
    files, the nprobe probe, and the exact rescoring are all reproducible in
    SQL and the oracle checks values, not just rows.  (The k-means-trained
    codebook stays covered by the recall tests; codebook choice only shifts
    recall, the probe machinery is the same.)  Distances fold left over the
    same doubles in both engines, so assignments and tie-breaks agree."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [[float(v) for v in r["embedding"]]
             for r in emb.select("vec_id", "embedding")
                         .orderBy("vec_id").limit(8).collect()]
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.ivf_topk(queries, emb, k=5, num_cells=8, nprobe=3,
                              centroids=cents)
    return out.select("query_id", "data_id", F.round("cosine", 6).alias("cosine"), "rank") \
        .orderBy("query_id", "rank")


_QIVF_SQL = """
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
         embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
), d2 AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range(1, 65),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
              * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))) AS d2
  FROM embeddings e CROSS JOIN cents c
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2) WHERE rn = 1
), qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2 WHERE vec_id < 5) WHERE rn <= 3
), cand AS (
  SELECT p.query_id, a.vec_id AS data_id
  FROM qprobe p JOIN assign a ON a.cell = p.cell
)
SELECT query_id, data_id, ROUND(cosine, 6) AS cosine, rank
FROM (
  SELECT c.query_id, c.data_id,
         list_cosine_similarity(de.embedding::DOUBLE[], qe.embedding::DOUBLE[]) AS cosine,
         CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY
              list_cosine_similarity(de.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC,
              c.data_id ASC) AS INT) AS rank
  FROM cand c
  JOIN embeddings de ON de.vec_id = c.data_id
  JOIN embeddings qe ON qe.vec_id = c.query_id) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing over deterministic synthetic payloads (binary md5
    of document text) — mapInPandas batch shape.  The deterministic fake
    feature (mean payload byte) is exactly mirrored by the oracle, so the
    whole Python boundary (Arrow batching, schema, null handling) is
    value-checked, not just row-counted."""
    from ..pipeline import multimodal as mm
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = docs.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    with_meta = mm.attach_media_metadata(payloads, "payload", "image", "image/png")
    out = mm.extract_features(with_meta, "doc_id", "payload")
    return out.select(F.col("id").alias("doc_id"), "n_bytes",
                      F.round("feature", 6).alias("feature")).orderBy("doc_id")


_QMMFEAT_SQL = """
SELECT doc_id, CAST(16 AS BIGINT) AS n_bytes,
       ROUND((
""" + " + ".join(
    f"('0x' || substr(md5(text), {2 * i + 1}, 2))::BIGINT" for i in range(16)
) + """
       ) / 16.0, 6) AS feature
FROM documents WHERE doc_id < 200
ORDER BY doc_id
"""


def q_multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plan (multimodal.frame_sample_plan): native
    sequence/explode over per-video duration metadata — one row per sampled
    frame timestamp.  Frame positions are pure metadata arithmetic, so the
    oracle reproduces them exactly."""
    from ..pipeline import multimodal as mm
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    payloads = docs.select("doc_id", F.unhex(F.md5("text")).alias("payload"),
                           (F.length("text") * 10).cast("long").alias("_dur"))
    with_meta = mm.attach_media_metadata(payloads, "payload", "video",
                                         "video/mp4", duration_ms_col="_dur")
    out = mm.frame_sample_plan(with_meta, "doc_id", "payload", every_ms=500)
    return (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.max("frame_ts_ms").alias("last_frame_ms"))
        .orderBy("doc_id")
    )


_QMMFRAME_SQL = """
SELECT doc_id,
       CAST(length(text) * 10 // 500 + 1 AS BIGINT) AS n_frames,
       CAST((length(text) * 10 // 500) * 500 AS BIGINT) AS last_frame_ms
FROM documents WHERE doc_id < 50
ORDER BY doc_id
"""


def q_streaming_user_totals(spark, sf_dir):
    """Stateful-streaming operator (applyInPandasWithState) driven with
    availableNow over the events table; rows-only check (streaming state
    machines are not ANSI-SQL-expressible)."""
    import tempfile

    from ..sources import stream_table
    from ..streaming import running_user_totals_stateful

    stream = stream_table(spark, sf_dir, "events")
    out = running_user_totals_stateful(stream)
    name = "q_stream_totals_sink"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(
        f"SELECT user_id, MAX(n_events) AS n_events, "
        f"ROUND(MAX(total_value), 6) AS total_value FROM {name} "
        f"GROUP BY user_id ORDER BY user_id")


# oracle for the streaming entry exists in batch form: final running totals
# == plain groupBy — so we CAN declare it (weaker rows-only not needed)
_QSTREAM_SQL = """
SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_streaming_sessionize(spark, sf_dir):
    """Built-in ``session_window`` sessionization executed as a REAL stream
    (availableNow over the events parquet, complete mode) — the oracle is the
    equivalent batch gaps-and-islands.  Spark merges an event into a session
    while ``ts - prev_ts < gap`` (window ends are exclusive), so the oracle's
    new-session rule is ``diff >= gap``."""
    import tempfile

    from ..sources import stream_table
    from ..streaming import sessionize

    stream = stream_table(spark, sf_dir, "events")
    out = sessionize(stream, gap="30 minutes")
    name = "q_stream_sessionize_sink"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(
        f"SELECT user_id, COUNT(*) AS n_sessions, "
        f"CAST(SUM(n_events) AS BIGINT) AS n_events, "
        f"ROUND(SUM(session_value), 6) AS total_value FROM {name} "
        f"GROUP BY user_id ORDER BY user_id")


def q_resample_ffill(spark, sf_dir):
    """Per-user 6-hour resampling of the events series with forward fill —
    the time-series regularization step before windowed feature extraction.
    Grid natively generated; fill is the single-shuffle as-of union+window.
    Oracle: DuckDB's built-in ASOF LEFT JOIN over the same generated grid."""
    from ..operators.asof import resample_ffill

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = resample_ffill(ev, on="user_id", ts_col="ts",
                         value_cols=["value"], every_s=21600)
    return (out.select("user_id", "t_s",
                       F.round("value_r", 6).alias("value"))
            .orderBy("user_id", "t_s"))


_QRESAMPLE_SQL = """
WITH bounds AS (
  SELECT user_id,
         (epoch_us(MIN(ts)) // 1000000 // 21600) * 21600 AS lo,
         epoch_us(MAX(ts)) // 1000000 AS hi
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, CAST(t AS BIGINT) AS t_s
  FROM bounds, LATERAL (SELECT unnest(range(lo, hi + 1, 21600)) AS t) g
)
SELECT g.user_id, g.t_s, ROUND(e.value, 6) AS value
FROM grid g ASOF LEFT JOIN events e
  ON g.user_id = e.user_id AND g.t_s * 1000000 >= epoch_us(e.ts)
ORDER BY g.user_id, g.t_s
"""


def q_event_transitions(spark, sf_dir):
    """First-order event-type transition matrix (Markov bigrams): per user,
    order events by (ts, event_id) — event_id breaks the timestamp ties the
    testdata contains — take ``lead(event_type)``, count (from, to) pairs
    globally.  One window + one groupBy; the funnel-analysis primitive."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


_QTRANS_SQL = """
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events) t
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
"""


def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of event values per event type — 10 bins over
    [0, 100), out-of-range clamped to the edge bins.  Pure native floor
    arithmetic; the profiling primitive for skew-aware partition sizing."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.least(F.lit(9), F.greatest(F.lit(0),
                   F.floor(F.col("value") / 10.0).cast("int")))
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )


_QHIST_SQL = """
SELECT event_type,
       CAST(LEAST(9, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS INT) AS bin,
       COUNT(*) AS n
FROM events
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


def q_snapshot_time_travel(spark, sf_dir):
    """The snapshot layer driven end-to-end as a query: CREATE a versioned
    table from nation, copy-on-write UPDATE one region's names, then read
    BOTH versions (time travel) and join them.  The update is deterministic,
    so the v1/v2 pair is exactly SQL-expressible — the oracle recomputes v2
    with a CASE over the original table."""
    import tempfile

    from ..operators.snapshots import SnapshotTable

    nation = load_table(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="snapq_") + "/nation"
    t = SnapshotTable.create(spark, path, nation.repartition(4))
    t.update_where(spark, {"n_name": "'UPDATED'"}, "n_regionkey = 1")
    v1 = t.read(spark, version=1).select("n_nationkey",
                                         F.col("n_name").alias("name_v1"))
    v2 = t.read(spark).select("n_nationkey",
                              F.col("n_name").alias("name_v2"))
    return v1.join(v2, "n_nationkey").orderBy("n_nationkey")


_QSNAP_SQL = """
SELECT n_nationkey, n_name AS name_v1,
       CASE WHEN n_regionkey = 1 THEN 'UPDATED' ELSE n_name END AS name_v2
FROM nation
ORDER BY n_nationkey
"""


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) run as a REAL
    stream over the events table: one availableNow batch, bounded state.
    With the whole table inside one batch the surviving set equals global
    DISTINCT on the key, so the batch oracle is exact: per user, the number
    of distinct event types."""
    import tempfile

    from ..sources import stream_table
    from ..streaming import dedup_within_watermark

    ev = stream_table(spark, sf_dir, "events") \
        .select("user_id", "event_type", "ts")
    out = dedup_within_watermark(ev, ["user_id", "event_type"],
                                 watermark="10 hours")
    name = "q_stream_dedup_sink"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(
        f"SELECT user_id, COUNT(*) AS n_types FROM {name} "
        f"GROUP BY user_id ORDER BY user_id")


_QSTREAM_DEDUP_SQL = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_streaming_enrich(spark, sf_dir):
    """Stream-static enrichment run as a REAL stream: the events stream
    left-joined per micro-batch against the broadcast customer dimension
    (stateless — append mode), then aggregated per market segment.  Events
    from users with no matching customer row keep a NULL segment; the batch
    oracle is the same left join."""
    import tempfile

    from ..sources import stream_table
    from ..streaming import stream_static_enrich

    ev = stream_table(spark, sf_dir, "events") \
        .select("user_id", "value")
    dim = load_table(spark, sf_dir, "customer") \
        .select(F.col("c_custkey").alias("user_id"),
                F.col("c_mktsegment").alias("segment"))
    out = stream_static_enrich(ev, dim, "user_id")
    name = "q_stream_enrich_sink"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(
        f"SELECT segment, COUNT(*) AS n_events, "
        f"ROUND(SUM(value), 6) AS total_value FROM {name} "
        f"GROUP BY segment ORDER BY segment NULLS FIRST")


_QSTREAM_ENRICH_SQL = """
SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
       ROUND(SUM(e.value), 6) AS total_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY segment NULLS FIRST
"""


def q_streaming_click_view_join(spark, sf_dir):
    """Stream-stream inner join run as a REAL stream: two readStream sources
    (clicks, views) joined per user within ±60 minutes, availableNow,
    append mode.  Both sides keep watermarked state; inner-join results emit
    eagerly, so the single-batch output equals the batch range join the
    oracle computes."""
    import tempfile

    from ..sources import stream_table
    from ..streaming import stream_stream_join

    ev = stream_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("event_id").alias("click_id")))
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", "ts", F.col("event_id").alias("view_id")))
    out = stream_stream_join(clicks, views, "user_id",
                             within="60 minutes", watermark="3 hours")
    name = "q_stream_ssj_sink"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(
        f"SELECT user_id, COUNT(*) AS n_pairs, "
        f"CAST(SUM(ABS(timestampdiff(MICROSECOND, right_ts, left_ts))) AS BIGINT)"
        f" AS total_lag_us FROM {name} "
        f"GROUP BY user_id ORDER BY user_id")


_QSTREAM_SSJ_SQL = """
SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ABS(epoch_us(c.ts) - epoch_us(v.ts))) AS BIGINT) AS total_lag_us
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id
 AND epoch_us(v.ts) >= epoch_us(c.ts) - 3600000000
 AND epoch_us(v.ts) <= epoch_us(c.ts) + 3600000000
GROUP BY c.user_id
ORDER BY c.user_id
"""


_QSTREAM_SESS_SQL = """
WITH marked AS (
  SELECT user_id, value, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         SUM(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
), per AS (
  SELECT user_id, sid, COUNT(*) AS n, SUM(value) AS v
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events, ROUND(SUM(v), 6) AS total_value
FROM per GROUP BY user_id ORDER BY user_id
"""


# ===========================================================================
# registry
# ===========================================================================

QUERIES: Dict[str, QueryDef] = {
    # relational
    "q1_pricing_summary": QueryDef(q1_pricing_summary, _Q1_SQL, True),
    "q3_top_orders": QueryDef(q3_top_orders, _Q3_SQL, True),
    "q5_region_revenue": QueryDef(q5_region_revenue, _Q5_SQL, True),
    "q6_forecast_revenue": QueryDef(q6_forecast_revenue, _Q6_SQL, True),
    "top_customers": QueryDef(q_top_customers, _QTOPC_SQL, False),
    "order_priority_count": QueryDef(q_order_priority, _QPRIO_SQL, False),
    "part_brand_stats": QueryDef(q_part_type_stats, _QPART_SQL, False),
    "window_running_spend": QueryDef(q_window_running_spend, _QWIN_SQL, False),
    "events_hourly_rollup": QueryDef(q_events_hourly, _QEVH_SQL, True),
    "events_props_json": QueryDef(q_events_props_json, _QJSON_SQL, False),
    "doc_pii_scrub": QueryDef(q_doc_pii_scrub, _QPII_SQL, False),
    "doc_length_quantiles": QueryDef(q_doc_length_quantiles, _QQUANT_SQL, False),
    "sessionize_events": QueryDef(q_sessionize, _QSESS_SQL, True),
    # spatial
    "spatial_range_contains": QueryDef(q_spatial_range_contains, _QRANGE_SQL, True),
    "spatial_range_intersects": QueryDef(q_spatial_range_intersects, _QRANGEI_SQL, False),
    "spatial_astext": QueryDef(q_spatial_astext, _QASTEXT_SQL, False),
    "spatial_transform": QueryDef(q_spatial_transform, _QTRANSFORM_SQL, False),
    "spatial_distance": QueryDef(q_spatial_distance, _QDIST_SQL, False),
    "spatial_measures": QueryDef(q_spatial_measures, _QMEAS_SQL, False),
    "spatial_transform_laea": QueryDef(q_spatial_transform_laea, _laea_sql(), False),
    "spatial_transform_stateplane": QueryDef(q_spatial_transform_stateplane,
                                             _stateplane_sql(), False),
    "spatial_transform_swiss": QueryDef(q_spatial_transform_swiss,
                                        _swiss_sql(), False),
    "spatial_join_contains": QueryDef(q_spatial_join_contains, _QSJC_SQL, True),
    "spatial_join_sql": QueryDef(q_spatial_join_sql, _QSJSQL_SQL, True),
    "spatial_join_sql_comma": QueryDef(q_spatial_join_sql_comma, _QSJCOMMA_SQL, False),
    "spatial_join_sql_dwithin": QueryDef(q_spatial_join_sql_dwithin, _QSJDSQL_SQL, False),
    "spatial_join_sql_chain": QueryDef(q_spatial_join_sql_chain, _QSJCHAIN_SQL, False),
    "spatial_join_left": QueryDef(q_spatial_join_left, _QSJLEFT_SQL, False),
    "spatial_dbscan": QueryDef(q_spatial_dbscan, _QDBSCAN_SQL, False),
    "spatial_join_broadcast": QueryDef(q_spatial_join_broadcast, _QSJB_SQL, False),
    "spatial_join_dwithin": QueryDef(q_spatial_join_dwithin, _QSJD_SQL, True),
    "spatial_knn": QueryDef(q_spatial_knn, _QKNN_SQL, False),
    "spatial_knn_grid": QueryDef(q_spatial_knn_grid, _QKNNGRID_SQL, False),
    "spatial_centroid_agg": QueryDef(q_spatial_centroid_agg, _QCAGG_SQL, True),
    "spatial_envelope_agg": QueryDef(q_spatial_envelope_agg, _QEAGG_SQL, False),
    "spatial_union_agg": QueryDef(q_spatial_union_agg, _QUAGG_SQL, False),
    "spatial_intersection_agg": QueryDef(q_spatial_intersection_agg, _QIAGG_SQL, False),
    # text
    "doc_token_stats": QueryDef(q_doc_token_stats, _QTOK_SQL, True),
    "doc_quality": QueryDef(q_doc_quality, _QQUAL_SQL, False),
    "doc_lang_id": QueryDef(q_doc_lang_id, _lang_sql(), False),
    "doc_fingerprint": QueryDef(q_doc_fingerprint, _QFP_SQL, False),
    "doc_chunks": QueryDef(q_doc_chunks, _QCHUNK_SQL, False),
    "doc_top_tokens": QueryDef(q_doc_top_tokens, _QTOPTOK_SQL, False),
    "doc_stratified_sample": QueryDef(q_doc_stratified_sample, _QSTRAT_SQL, False),
    "doc_char_entropy": QueryDef(q_doc_char_entropy, _QENT_SQL, False),
    "doc_top_token_share": QueryDef(q_doc_top_token_share, _QTOPSHARE_SQL, False),
    "source_mix_weights": QueryDef(q_source_mix_weights, _QMIX_SQL, False),
    "corpus_contamination": QueryDef(q_corpus_contamination, _QCONTAM_SQL, False),
    "hll_distinct_users": QueryDef(q_hll_distinct_users, _QHLL_SQL, False),
    "doc_tfidf_top_terms": QueryDef(q_doc_tfidf, _QTFIDF_SQL, False),
    # dedup
    "exact_dedup_groups": QueryDef(q_exact_dedup, _QDEDUP_SQL, True),
    "minhash_signatures": QueryDef(q_minhash_signatures, _QMH_SQL, False),
    "minhash_lsh_pairs": QueryDef(q_minhash_lsh_pairs, _QLSH_SQL, True),
    "dedup_components": QueryDef(q_dedup_components, _QCOMP_SQL, False),
    "dedup_keep": QueryDef(q_dedup_keep, _QKEEP_SQL, False),
    "doc_dedup_pipeline": QueryDef(q_doc_dedup_pipeline, _QPIPE_SQL, False),
    "ngram_jaccard_pairs": QueryDef(q_jaccard_pairs, _QJAC_SQL, True),
    "minhash_jaccard_est": QueryDef(q_minhash_jaccard_est, _mh_est_sql(), False),
    "simhash_values": QueryDef(q_simhash, _simhash_sql(60), False),
    "simhash_pairs": QueryDef(q_simhash_pairs, _simhash_pairs_sql(60, 3), False),
    # embeddings
    "embedding_cosine_topk": QueryDef(q_embedding_topk, _QEMB_SQL, True),
    "embedding_dup_pairs": QueryDef(q_embedding_dup_pairs, _QEMBD_SQL, False),
    "embedding_label_stats": QueryDef(q_embedding_label_stats, _QEMBL_SQL, False),
    # approximate / streaming / multimodal
    "lsh_ann_topk": QueryDef(q_lsh_topk, _lsh_topk_sql(), False),
    "ivf_ann_topk": QueryDef(q_ivf_topk, _QIVF_SQL, False),
    "multimodal_features": QueryDef(q_multimodal_features, _QMMFEAT_SQL, False),
    "multimodal_frame_sample": QueryDef(q_multimodal_frame_sample, _QMMFRAME_SQL, False),
    "streaming_user_totals": QueryDef(q_streaming_user_totals, _QSTREAM_SQL, False),
    "streaming_sessionize": QueryDef(q_streaming_sessionize, _QSTREAM_SESS_SQL, False),
    "streaming_dedup": QueryDef(q_streaming_dedup, _QSTREAM_DEDUP_SQL, False),
    "streaming_enrich": QueryDef(q_streaming_enrich, _QSTREAM_ENRICH_SQL, False),
    "snapshot_time_travel": QueryDef(q_snapshot_time_travel, _QSNAP_SQL, False),
    "resample_ffill": QueryDef(q_resample_ffill, _QRESAMPLE_SQL, False),
    "event_transitions": QueryDef(q_event_transitions, _QTRANS_SQL, False),
    "value_histogram": QueryDef(q_value_histogram, _QHIST_SQL, False),
    "streaming_click_view_join": QueryDef(q_streaming_click_view_join, _QSTREAM_SSJ_SQL, False),
}

# extended TPC-H-shaped relational tier (joins, windows, rollup, set ops,
# anti-joins, disjunctive pushdown) — plans/queries_tpch.py
from .queries_tpch import TPCH_QUERIES as _TPCH  # noqa: E402

for _name, (_fn, _sql, _headline) in _TPCH.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)

# training-corpus quality / analytics tier — plans/queries_quality.py
from .queries_quality import QUALITY_QUERIES as _QUAL  # noqa: E402

for _name, (_fn, _sql, _headline) in _QUAL.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)

# round-5 pipeline tier — plans/queries_r5.py
from .queries_r5 import R5_QUERIES as _R5  # noqa: E402

for _name, (_fn, _sql, _headline) in _R5.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)

# round-6 pipeline tier — plans/queries_r6.py
from .queries_r6 import R6_QUERIES as _R6  # noqa: E402

for _name, (_fn, _sql, _headline) in _R6.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)

# round-7 pipeline tier — plans/queries_r7.py
from .queries_r7 import R7_QUERIES as _R7  # noqa: E402

for _name, (_fn, _sql, _headline) in _R7.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)

# round-8 pipeline tier — plans/queries_r8.py
from .queries_r8 import R8_QUERIES as _R8  # noqa: E402

for _name, (_fn, _sql, _headline) in _R8.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)

# round-8 continuation tier (waves 16+) — plans/queries_r8b.py
from .queries_r8b import R8B_QUERIES as _R8B  # noqa: E402

for _name, (_fn, _sql, _headline) in _R8B.items():
    QUERIES[_name] = QueryDef(_fn, _sql, _headline)
