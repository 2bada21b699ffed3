"""Round-8 operator inventory.  Each declared query has an exact DuckDB
oracle (FIXTURES.md conventions: total ORDER BY, ROUND on float outputs,
identical aliases both sides, BIGINT casts so DuckDB never widens to
HUGEINT, ``+ 0.0`` on sign-risky rounded floats).

Round-8 theme: the warehouse / training-pipeline operators a user of the
reference stack would reach for next —

- scd2_customer_history     — slowly-changing-dimension type-2 build from an
                              event stream: collapse same-value runs
                              (gaps-and-islands) then derive
                              valid_from/valid_to with a lead window
- source_capped_sample      — per-group deterministic cap (at most N docs per
                              source by portable-hash order) — the standard
                              anti-domination step before corpus mixing
- order_interval_overlap    — interval-overlap self-join (concurrent order
                              fulfillment windows per customer) as a
                              co-partitioned equi-join, never a cross join
- attribution_last_touch    — last-touch conversion attribution via an
                              as-of carry window (last click channel within a
                              7-day lookback), the marketing-funnel dual of
                              the as-of join
- events_psi_drift          — population-stability-index drift of the event
                              value distribution vs a baseline week, per bin
                              (the standard production data-drift monitor)
- lineitem_robust_stats     — winsorized mean/stddev + MAD outlier counts per
                              return flag (robust statistics pass)
- kmv_intersection_estimate — theta-sketch-style set intersection from two
                              mergeable KMV bottom-k sketches
- brand_bfs_distance        — multi-source BFS shortest hops over the brand
                              co-purchase graph, fixed 4 rounds
- dsir_importance_weights   — DSIR-style importance weights: per-doc unigram
                              log-likelihood ratio target-vs-corpus
- semdedup_prune            — SemDeDup: k-means-cell-bounded pairwise cosine
                              pruning of near-duplicate embeddings
- embedding_pca_power       — distributed PCA: one sufficient-statistics
                              aggregation for the covariance, fixed-order
                              power iteration for the top eigenvector

Reference parity note: the reference (`/root/reference/`) delegates all
relational breadth to Spark (SURVEY.md §2 Tier D); these queries are the
engine's beyond-reference analytics tier, built on the same native-Catalyst
conventions as the spatial operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..pipeline.text import portable_hash64
from ..sources import load_table

R8_QUERIES: dict = {}


# --- scd2_customer_history --------------------------------------------------

def q_scd2_customer_history(spark, sf_dir):
    """SCD type-2 dimension build from an event stream: signup events carry a
    'tier' attribute; collapse consecutive same-tier rows per user
    (gaps-and-islands via lag), then a lead window yields
    valid_from/valid_to half-open intervals and the is_current flag.

    Scale shape: two windows over the SAME (user_id, ts) partitioning — one
    exchange + one sort feed both (Spark reuses the sort order); state per
    user is bounded by that user's change count, never the raw event count.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter((F.col("event_type") == "signup") & (F.col("user_id") < 150)))
    t = ev.select(
        "user_id", "ts", "event_id",
        F.least(F.lit(3), F.floor(F.col("value") / 125)).cast("int").alias("tier"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (t.withColumn("prev", F.lag("tier").over(w))
           .filter(F.col("prev").isNull() | (F.col("prev") != F.col("tier"))))
    out = (chg.withColumn("vto", F.lead("ts").over(w))
           .select("user_id", "tier",
                   F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
                   F.coalesce(F.date_format("vto", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
                              F.lit("current")).alias("valid_to"),
                   F.when(F.col("vto").isNull(), 1).otherwise(0)
                    .cast("int").alias("is_current")))
    return out.orderBy("user_id", "valid_from", "tier")


_QSCD2_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CAST(LEAST(3, FLOOR(value / 125)) AS INT) AS tier
  FROM events WHERE event_type = 'signup' AND user_id < 150
), c AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM s
), chg AS (
  SELECT user_id, tier, ts, event_id FROM c WHERE prev IS NULL OR prev <> tier
), v AS (
  SELECT user_id, tier, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vto
  FROM chg
)
SELECT user_id, tier,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       COALESCE(strftime(vto, '%Y-%m-%d %H:%M:%S.%f'), 'current') AS valid_to,
       CAST(CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM v
ORDER BY user_id, valid_from, tier
"""

R8_QUERIES["scd2_customer_history"] = (q_scd2_customer_history, _QSCD2_SQL, False)


# --- source_capped_sample ---------------------------------------------------

def q_source_capped_sample(spark, sf_dir):
    """Per-source deterministic cap: keep at most 20 docs per source, chosen
    by portable-hash order (reproducible on any engine, stable under
    re-partitioning) — the anti-domination step before corpus mixing.

    Scale shape: one source-keyed exchange + sort; rank is windowed so the
    cap never collects a group; at 100 TB the same plan holds with
    per-source skew handled by the window's spill path (no group
    materialization).
    """
    docs = load_table(spark, sf_dir, "documents")
    h = portable_hash64(F.col("doc_id").cast("string"), "cap")
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 20)
            .orderBy("source", "rn"))


_QCAP_SQL = """
WITH h AS (
  SELECT source, doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#cap'), 1, 15))::BIGINT AS hv
  FROM documents
), r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
  FROM h
)
SELECT source, doc_id, CAST(rn AS INT) AS rn
FROM r WHERE rn <= 20
ORDER BY source, rn
"""

R8_QUERIES["source_capped_sample"] = (q_source_capped_sample, _QCAP_SQL, False)


# --- order_interval_overlap -------------------------------------------------

def q_order_interval_overlap(spark, sf_dir):
    """Interval-overlap self-join: count pairs of orders per customer whose
    fulfillment windows [orderdate, max shipdate] overlap — the range-join
    shape (reservation conflicts, session concurrency) expressed as a
    co-partitioned equi-join on the customer key with the overlap predicate
    as a residual filter.

    Scale shape: ONE shuffle on o_custkey co-partitions both sides (AQE
    handles skew); pair generation is bounded by per-customer order counts,
    never a cross join.  At 100 TB, add a coarse time-bucket to the join key
    so a whale customer's pairs split across buckets.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    li = (load_table(spark, sf_dir, "lineitem")
          .groupBy("l_orderkey").agg(F.max("l_shipdate").alias("e")))
    sp = (orders.join(li, orders.o_orderkey == li.l_orderkey)
          .select("o_custkey", "o_orderkey",
                  F.col("o_orderdate").alias("s"), "e"))
    a, b = sp.alias("a"), sp.alias("b")
    pairs = a.join(
        b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
           & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
           & (F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e")))
    cnt = (pairs.groupBy(F.col("a.o_custkey").alias("c_custkey"))
           .agg(F.count(F.lit(1)).alias("n_overlap_pairs")))
    tot = (sp.groupBy(F.col("o_custkey").alias("c_custkey"))
           .agg(F.count(F.lit(1)).alias("n_orders")))
    return (tot.join(cnt, "c_custkey", "left")
            .select("c_custkey", "n_orders",
                    F.coalesce("n_overlap_pairs", F.lit(0))
                     .cast("long").alias("n_overlap_pairs"))
            .filter(F.col("c_custkey") <= 500)
            .orderBy("c_custkey"))


_QOVL_SQL = """
WITH sp AS (
  SELECT o.o_custkey, o.o_orderkey, o.o_orderdate AS s, l.e
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS e
        FROM lineitem GROUP BY l_orderkey) l
    ON o.o_orderkey = l.l_orderkey
), pairs AS (
  SELECT a.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs
  FROM sp a JOIN sp b
    ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
   AND a.s <= b.e AND b.s <= a.e
  GROUP BY a.o_custkey
), tot AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM sp GROUP BY o_custkey
)
SELECT t.o_custkey AS c_custkey, t.n_orders,
       COALESCE(p.n_overlap_pairs, 0) AS n_overlap_pairs
FROM tot t LEFT JOIN pairs p ON p.o_custkey = t.o_custkey
WHERE t.o_custkey <= 500
ORDER BY c_custkey
"""

R8_QUERIES["order_interval_overlap"] = (q_order_interval_overlap, _QOVL_SQL, False)


# --- attribution_last_touch -------------------------------------------------

def q_attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: each purchase is credited to the
    channel of the user's most recent click within a 7-day lookback (else
    'none') — the as-of-carry window pattern (last non-null value over an
    event-time ordering) that generalizes the engine's as-of join.

    Scale shape: one user-keyed exchange + sort feeds both carry windows;
    state per row is one (channel, ts) pair, never a collected history.
    Clicks at the purchase's exact timestamp count (kind orders clicks
    before purchases inside a tie).
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("click", "purchase")))
    t = ev.select(
        "user_id", "ts", "event_id", "value",
        F.concat(F.lit("ch"),
                 (F.get_json_object("props", "$.k").cast("int") % 5)
                 .cast("string")).alias("channel"),
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"))
    w = (Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    t2 = (t.withColumn(
              "lc_ch", F.last(F.when(F.col("kind") == 0, F.col("channel")),
                              ignorenulls=True).over(w))
          .withColumn(
              "lc_ts", F.last(F.when(F.col("kind") == 0, F.col("ts")),
                              ignorenulls=True).over(w)))
    conv = t2.filter(F.col("kind") == 1).select(
        F.when(F.col("lc_ts").isNotNull()
               & (F.col("lc_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
               F.col("lc_ch")).otherwise(F.lit("none")).alias("channel"),
        "value")
    return (conv.groupBy("channel")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 F.round(F.sum("value"), 6).alias("attributed_value"))
            .orderBy("channel"))


_QATTR_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, value,
         'ch' || CAST(CAST(json_extract_string(props, '$.k') AS INT) % 5
                      AS VARCHAR) AS channel,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
  FROM events WHERE event_type IN ('click', 'purchase')
), t2 AS (
  SELECT user_id, ts, value, kind,
         last_value(CASE WHEN kind = 0 THEN channel END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc_ch,
         last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc_ts
  FROM t
)
SELECT CASE WHEN lc_ts IS NOT NULL AND lc_ts >= ts - INTERVAL 7 DAY
            THEN lc_ch ELSE 'none' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       ROUND(SUM(value), 6) + 0.0 AS attributed_value
FROM t2 WHERE kind = 1
GROUP BY 1
ORDER BY channel
"""

R8_QUERIES["attribution_last_touch"] = (q_attribution_last_touch, _QATTR_SQL, False)
