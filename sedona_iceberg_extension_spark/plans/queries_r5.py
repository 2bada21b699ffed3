"""Round-5 operator inventory — substring-level dedup, embedding
classification/QA, corpus statistics, streaming gates, CDC storage dedup,
graph/cluster analytics.  Each declared query has an exact DuckDB oracle
(FIXTURES.md conventions: total ORDER BY, ROUND on float outputs,
identical aliases both sides, BIGINT casts).

- substring_dup_windows      — per-doc fraction of 5-token windows shared
                               with another doc (Lee et al. 2022 exact-
                               substring memorization signal)
- knn_label_classify         — 5-NN majority-vote label prediction
- embedding_label_outliers   — per-label centroid-distance outliers
- corpus_zipf_slope          — least-squares Zipf slope of the vocabulary
- streaming_ingest_gate      — stream-static content-hash ANTI join as a
                               real availableNow stream
- spatial_affine_ops         — ST_Translate/Rotate/Scale/Angle end-to-end
- cdc_dedup_by_source        — content-defined-chunking storage dedup
- customer_cohort_retention  — first-order-month cohort matrix
- part_basket_lift           — market-basket brand-pair lift
- events_ewma                — trailing EWMA window operator
- bloom_ingest_gate          — deterministic Bloom membership pre-filter
- streaming_window_top_event — complete-mode windowed top-k stream
- brand_graph_triangles      — distributed triangle counting
- near_dup_rate_by_source    — LSH near-dup rate per source feed
- spatial_kmeans             — distributed Lloyd k-means, no collects

Scale notes: substring windows are one uniform-key groupBy +
co-partitioned join (never pairwise); embedding queries broadcast the
small side and keep scoring in whole-stage codegen; basket/triangle pair
spaces generate order-locally or over the derived edge table, never a
fact self-join; the Bloom filter shuffles ≤ m_words rows; k-means keeps
centroids as broadcastable DataFrames end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..pipeline import dedup, similarity, text
from ..sources import load_table

from .sql_shared import (LSH_MAX_BUCKET as _LSH_MAX_BUCKET,
                         TOKS_SQL as _TOKS_SQL)


# --- substring_dup_windows -------------------------------------------------

def q_substring_dup_windows(spark, sf_dir):
    """Per-document shared-substring report (dedup.shared_window_fraction,
    5-token windows).  Only docs with at least one shared window are
    returned (the report a dedup pass acts on)."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.shared_window_fraction(docs, "doc_id", "text", window_n=5)
    return (out.filter(F.col("n_shared") > 0)
            .orderBy("doc_id"))


_QSUBDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), win AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 4), ' ') AS w
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 4, 1) + 1)) AS i) t
), docfreq AS (
  SELECT w, COUNT(*) AS nd FROM win GROUP BY w
), per AS (
  SELECT win.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(COUNT(*) FILTER (nd > 1) AS BIGINT) AS n_shared
  FROM win JOIN docfreq USING (w)
  GROUP BY win.doc_id
)
SELECT doc_id, n_windows, n_shared,
       ROUND(CAST(n_shared AS DOUBLE) / n_windows, 6) AS shared_frac
FROM per
WHERE n_shared > 0
ORDER BY doc_id
"""


# --- knn_label_classify ----------------------------------------------------

def q_knn_label_classify(spark, sf_dir):
    """5-NN majority-vote label prediction for the first 20 vectors against
    the rest (similarity.knn_classify)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (similarity.knn_classify(emb, "vec_id", "embedding", "label", k=5)
            .withColumn("pred_label", F.col("pred_label").cast("int"))
            .orderBy("query_id"))


_QKNNCLS_SQL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, d.vec_id AS data_id, d.label,
         list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cosine
  FROM (SELECT * FROM embeddings WHERE vec_id < 20) q,
       (SELECT * FROM embeddings WHERE vec_id >= 20) d
), top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, data_id ASC) AS rk
    FROM scored) t
  WHERE rk <= 5
), votes AS (
  SELECT query_id, label AS pred_label,
         CAST(COUNT(*) AS BIGINT) AS n_votes, MAX(cosine) AS best
  FROM top GROUP BY query_id, label
)
SELECT query_id, CAST(pred_label AS INT) AS pred_label, n_votes,
       ROUND(best, 6) AS top_cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY n_votes DESC, best DESC, pred_label ASC) AS r
  FROM votes) v
WHERE r = 1
ORDER BY query_id
"""


# --- embedding_label_outliers ----------------------------------------------

def q_embedding_label_outliers(spark, sf_dir):
    """Top-3 centroid-distance outliers per label
    (similarity.label_centroid_outliers, 64-dim embeddings)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.label_centroid_outliers(emb, "vec_id", "embedding",
                                             "label", dim=64, top_k=3)
    return (out.withColumn("label", F.col("label").cast("int"))
            .withColumn("rank", F.col("rank").cast("int"))
            .orderBy("label", "rank"))


_QOUTLIER_SQL = """
WITH comp AS (
  SELECT label, vec_id, u.v::DOUBLE AS v, u.pos
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS pos) u
), cent AS (
  SELECT label, pos, AVG(v) AS c FROM comp GROUP BY label, pos
), dist AS (
  SELECT comp.label, comp.vec_id,
         SQRT(SUM((comp.v - cent.c) * (comp.v - cent.c))) AS d
  FROM comp JOIN cent ON comp.label = cent.label AND comp.pos = cent.pos
  GROUP BY comp.label, comp.vec_id
)
SELECT CAST(label AS INT) AS label, vec_id, ROUND(d, 6) AS dist,
       CAST(rk AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY label
            ORDER BY d DESC, vec_id ASC) AS rk
  FROM dist) t
WHERE rk <= 3
ORDER BY label, rank
"""


# --- corpus_zipf_slope -----------------------------------------------------

def q_corpus_zipf_slope(spark, sf_dir):
    """Zipf least-squares fit over the top-1000 corpus terms
    (text.zipf_slope)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.zipf_slope(docs, "text", top_r=1000)


_QZIPF_SQL = f"""
WITH toks AS (
  SELECT {_TOKS_SQL} AS tk FROM documents
), freq AS (
  SELECT t.term, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks, LATERAL (SELECT unnest(tk) AS term) t
  GROUP BY t.term
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS rank
  FROM freq
  ORDER BY n DESC, term ASC
  LIMIT 1000
), pt AS (
  SELECT ln(rank::DOUBLE) AS x, ln(n::DOUBLE) AS y FROM ranked
), agg AS (
  SELECT COUNT(*)::DOUBLE AS m, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pt
)
SELECT CAST(m AS BIGINT) AS n_terms,
       ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 6)
         AS intercept
FROM agg
"""


# --- streaming_ingest_gate -------------------------------------------------

def q_streaming_ingest_gate(spark, sf_dir):
    """Exactly the ingest gate a streaming corpus pipeline runs: the
    incoming batch (odd doc_ids) streams in; a stream-static LEFT ANTI
    join on md5(text) drops every document whose content already exists in
    the static corpus (even doc_ids).  Run as a REAL availableNow stream
    into a memory sink; with the whole batch in one trigger the kept set
    equals the batch oracle.  The anti join is map-side against the static
    relation — no streaming state store, so at scale ingest throughput is
    bounded by the join, not by state growth."""
    import tempfile

    from ..sources import stream_table

    static = (load_table(spark, sf_dir, "documents")
              .filter(F.col("doc_id") % 2 == 0)
              .select(F.md5(F.col("text")).alias("_md5")).distinct())
    inc = (stream_table(spark, sf_dir, "documents")
           .filter(F.col("doc_id") % 2 == 1)
           .withColumn("_md5", F.md5(F.col("text"))))
    kept = inc.join(static, "_md5", "left_anti").select("doc_id")
    name = "q_stream_ingest_gate_sink"
    q = (kept.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(f"SELECT doc_id FROM {name} ORDER BY doc_id")


_QSTREAMGATE_SQL = """
SELECT i.doc_id
FROM documents i
WHERE i.doc_id % 2 = 1
  AND md5(i.text) NOT IN (
    SELECT md5(e.text) FROM documents e WHERE e.doc_id % 2 = 0)
ORDER BY i.doc_id
"""


# --- spatial_affine_ops ----------------------------------------------------

def q_spatial_affine_ops(spark, sf_dir):
    """Affine-transform + angle surface (ST_Translate / ST_Rotate /
    ST_Scale / ST_Angle) end-to-end through the registered SQL names, with
    a pure-arithmetic oracle.  Exercises the round-5 tier-2 functions the
    reference exposes through its Sedona dependency
    (/root/reference/README.md:30-38)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    pt = ("ST_Point(CAST(c_custkey % 360 - 180 AS DOUBLE), "
          "CAST((c_custkey * 7) % 180 - 90 AS DOUBLE))")
    return (cust.selectExpr(
        "c_custkey",
        f"ROUND(ST_X(ST_Translate({pt}, 10, 20)), 6) AS tx",
        f"ROUND(ST_Y(ST_Translate({pt}, 10, 20)), 6) AS ty",
        f"ROUND(ST_X(ST_Rotate({pt}, pi() / 2)), 6) AS rx",
        f"ROUND(ST_Y(ST_Rotate({pt}, pi() / 2)), 6) AS ry",
        f"ROUND(ST_X(ST_Scale({pt}, 2, 0.5)), 6) AS sx",
        f"ROUND(ST_Y(ST_Scale({pt}, 2, 0.5)), 6) AS sy",
        f"ROUND(ST_Angle({pt}, ST_Point(0, 0), ST_Point(1, 0)), 6) AS ang")
        .orderBy("c_custkey"))


_QAFFINE_SQL = """
WITH pts AS (
  SELECT c_custkey,
         CAST(c_custkey % 360 - 180 AS DOUBLE) AS x,
         CAST((c_custkey * 7) % 180 - 90 AS DOUBLE) AS y
  FROM customer WHERE c_custkey < 300
)
SELECT c_custkey,
       ROUND(x + 10, 6) + 0.0 AS tx, ROUND(y + 20, 6) + 0.0 AS ty,
       ROUND(x * cos(pi() / 2) - y * sin(pi() / 2), 6) + 0.0 AS rx,
       ROUND(x * sin(pi() / 2) + y * cos(pi() / 2), 6) + 0.0 AS ry,
       ROUND(x * 2, 6) + 0.0 AS sx, ROUND(y * 0.5, 6) + 0.0 AS sy,
       ROUND(fmod(fmod(atan2(x, y) - atan2(1.0, 0.0), 2 * pi()) + 2 * pi(),
                  2 * pi()), 6) + 0.0 AS ang
FROM pts
ORDER BY c_custkey
"""


# --- cdc_dedup_by_source ---------------------------------------------------

def q_cdc_dedup_by_source(spark, sf_dir):
    """Content-defined-chunking storage-dedup report per source
    (dedup.cdc_dedup_stats: LBFS-style rolling boundaries, 8-char grams,
    modulus 64 — boundaries survive insertions, unlike fixed blocks)."""
    docs = load_table(spark, sf_dir, "documents")
    return (dedup.cdc_dedup_stats(docs, "doc_id", "text", "source")
            .orderBy("source"))


_QCDC_SQL = """
WITH starts AS (
  SELECT doc_id, 1 AS i FROM documents
  UNION ALL
  SELECT doc_id, t.i
  FROM documents,
       LATERAL (SELECT unnest(range(2, greatest(len(text) - 7, 1) + 1)) AS i) t
  WHERE ('0x' || substr(md5(substr(text, t.i, 8) || '#cdc'), 1, 15))::BIGINT
        % 64 = 0
), chunks AS (
  SELECT s.doc_id,
         substr(d.text, s.i,
                coalesce(lead(s.i) OVER (PARTITION BY s.doc_id ORDER BY s.i),
                         len(d.text) + 1) - s.i) AS chunk
  FROM starts s JOIN documents d USING (doc_id)
), nonempty AS (
  SELECT c.doc_id, c.chunk FROM chunks c WHERE len(c.chunk) > 0
), per_chunk AS (
  SELECT d.source, md5(n.chunk) AS ck,
         CAST(COUNT(*) AS BIGINT) AS n, MAX(len(n.chunk)) AS l
  FROM nonempty n JOIN documents d USING (doc_id)
  GROUP BY d.source, md5(n.chunk)
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(n * l) AS BIGINT) AS total_chars,
       CAST(SUM(l) AS BIGINT) AS distinct_chars,
       ROUND(1.0 - SUM(l) / CAST(SUM(n * l) AS DOUBLE), 6) AS dedup_ratio
FROM per_chunk
GROUP BY source
ORDER BY source
"""


# --- customer_cohort_retention ---------------------------------------------

def q_customer_cohort_retention(spark, sf_dir):
    """Classic cohort-retention matrix: customers grouped by first-order
    month, counted by months-since-cohort — the table every growth
    dashboard starts from.  Two shuffles: the per-customer min (map-side
    combined) and the cohort-cell count; the join back to orders is on the
    customer key both sides already hash by."""
    orders = load_table(spark, sf_dir, "orders")
    om = orders.select("o_custkey",
                       F.date_trunc("month", "o_orderdate").alias("_m"))
    first = om.groupBy("o_custkey").agg(F.min("_m").alias("_cohort"))
    cells = (om.join(first, "o_custkey")
             .select("_cohort",
                     (F.months_between(F.col("_m"), F.col("_cohort"))
                      .cast("int")).alias("months_since"),
                     "o_custkey"))
    return (cells.groupBy(F.date_format("_cohort", "yyyy-MM").alias("cohort"),
                          "months_since")
            .agg(F.countDistinct("o_custkey").alias("n_customers"))
            .filter(F.col("months_since") <= 6)
            .orderBy("cohort", "months_since"))


_QCOHORT_SQL = """
WITH om AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS m FROM orders
), first AS (
  SELECT o_custkey, MIN(m) AS cohort FROM om GROUP BY o_custkey
), cells AS (
  SELECT f.cohort,
         CAST(datediff('month', f.cohort, om.m) AS INT) AS months_since,
         om.o_custkey
  FROM om JOIN first f USING (o_custkey)
)
SELECT strftime(cohort, '%Y-%m') AS cohort, months_since,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM cells
WHERE months_since <= 6
GROUP BY cohort, months_since
ORDER BY cohort, months_since
"""


# --- part_basket_lift -------------------------------------------------------

def q_part_basket_lift(spark, sf_dir):
    """Market-basket affinity over order line items: top-20 part-brand
    pairs by lift (P(a,b) / P(a)P(b)) among pairs co-ordered ≥ 5 times.
    The pair space is generated ORDER-locally (collect_set of the ≤7
    brands per order, explode the sorted combinations) — never a
    lineitem self-join; brand marginals and the one-row order total
    broadcast onto the pair counts (no driver-side scalar job)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # the basket projection feeds the order total, the per-order pair
    # explode, and the brand marginals (3 executions of the
    # join+distinct).  Deliberately left redundant — r13 materialization
    # A/B: cache() +25% at sf0.1 (see q_lineitem_robust_stats for the
    # full numbers).
    ob = (li.join(part, li.l_partkey == part.p_partkey)
          .select("l_orderkey", "p_brand").distinct())
    tot = ob.agg(F.countDistinct("l_orderkey")
                 .cast("double").alias("_n_orders"))
    per_order = ob.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("p_brand")).alias("_bs"))
    pairs = (per_order
             .select(F.explode("_bs").alias("a"), F.col("_bs"))
             .select("a", F.explode(F.filter("_bs", lambda x: x > F.col("a")))
                     .alias("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab")))
    marg = ob.groupBy("p_brand").agg(F.countDistinct("l_orderkey").alias("n"))
    out = (pairs
           .join(F.broadcast(marg.select(F.col("p_brand").alias("a"),
                                         F.col("n").alias("n_a"))), "a")
           .join(F.broadcast(marg.select(F.col("p_brand").alias("b"),
                                         F.col("n").alias("n_b"))), "b")
           .filter(F.col("n_ab") >= 5)
           .crossJoin(F.broadcast(tot))
           .select(F.col("a").alias("brand_a"), F.col("b").alias("brand_b"),
                   "n_ab",
                   F.round(F.col("n_ab") * F.col("_n_orders")
                           / (F.col("n_a") * F.col("n_b")).cast("double"), 6)
                   .alias("lift")))
    return out.orderBy(F.col("lift").desc(), "brand_a", "brand_b").limit(20)


_QBASKET_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), tot AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM ob
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
), marg AS (
  SELECT p_brand, COUNT(DISTINCT l_orderkey) AS n FROM ob GROUP BY p_brand
)
SELECT brand_a, brand_b, n_ab,
       ROUND(n_ab * (SELECT n_orders FROM tot)
             / CAST(ma.n * mb.n AS DOUBLE), 6) AS lift
FROM pairs
JOIN marg ma ON ma.p_brand = brand_a
JOIN marg mb ON mb.p_brand = brand_b
WHERE n_ab >= 5
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
"""


# --- events_ewma ------------------------------------------------------------

def q_events_ewma(spark, sf_dir):
    """Trailing exponentially-weighted moving average (α = 0.5, 16-row
    frame) of event values per user — the smoothing primitive of every
    monitoring/feature pipeline.  One window shuffle on the user key; the
    weighted sum is an index-ordered native transform/aggregate over the
    frame list (deterministic summation order, and 0.5^i is exactly
    representable, so the oracle matches bit-for-bit before the ROUND)."""
    from pyspark.sql.window import Window as W

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < 50))
    w = W.partitionBy("user_id").orderBy("ts", "event_id") \
         .rowsBetween(-15, W.currentRow)
    lst = F.reverse(F.collect_list("value").over(w))
    num = F.aggregate(
        F.transform(lst, lambda x, i: x * F.pow(F.lit(0.5), i)),
        F.lit(0.0), lambda acc, v: acc + v)
    den = 2.0 * (1.0 - F.pow(F.lit(0.5), F.size(lst)))
    return (ev.select("user_id", "event_id",
                      F.round(F.col("value"), 6).alias("value"),
                      F.round(num / den, 6).alias("ewma16"))
            .orderBy("user_id", "event_id"))


_QEWMA_SQL = """
WITH framed AS (
  SELECT user_id, event_id, value,
         list_reverse(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)) AS lr
  FROM events WHERE user_id < 50
)
SELECT user_id, event_id, ROUND(value, 6) AS value,
       ROUND(list_sum(list_transform(range(1, len(lr) + 1),
                                     i -> lr[i] * pow(0.5, i - 1)))
             / (2.0 * (1.0 - pow(0.5, len(lr)))), 6) AS ewma16
FROM framed
ORDER BY user_id, event_id
"""


# --- bloom_ingest_gate ------------------------------------------------------

def q_bloom_ingest_gate(spark, sf_dir):
    """Deterministic Bloom-filter membership pre-filter: build the filter
    over the even-doc_id half of the corpus, probe EVERY document.  Evens
    must all report ``maybe_present`` (Bloom's no-false-negative
    guarantee, checked in-band); odds exercise the false-positive surface,
    which is bit-for-bit deterministic here (portable md5 bit positions)
    so the oracle value-checks even the false positives.  The filter is
    intentionally small (32 words = 2016 bits, k = 2) so the FP side is
    non-vacuous at sf0.01."""
    from ..pipeline.sketch import bloom_filter_words, bloom_probe

    docs = load_table(spark, sf_dir, "documents")
    fw = bloom_filter_words(docs.filter(F.col("doc_id") % 2 == 0), "text",
                            m_words=32, k=2)
    out = bloom_probe(fw, docs, "doc_id", "text", m_words=32, k=2)
    return out.orderBy("doc_id")


def _bloom_sql(m_words: int = 32, k: int = 2) -> str:
    nbits = m_words * 63
    pos = " UNION ALL ".join(
        f"SELECT doc_id, ('0x' || substr(md5(text || '#bloom{j}'), 1, 15))"
        f"::BIGINT % {nbits} AS p FROM documents"
        for j in range(k))
    return f"""
WITH pos AS (
  {pos}
), words AS (
  SELECT p // 63 AS word_idx,
         bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
  FROM pos WHERE doc_id % 2 = 0
  GROUP BY p // 63
)
SELECT pos.doc_id,
       (SUM(CASE WHEN (coalesce(w.bits, 0)
                       & (1::BIGINT << CAST(pos.p % 63 AS INT)))
                      = (1::BIGINT << CAST(pos.p % 63 AS INT))
                 THEN 1 ELSE 0 END) = {k}) AS maybe_present
FROM pos LEFT JOIN words w ON w.word_idx = pos.p // 63
GROUP BY pos.doc_id
ORDER BY pos.doc_id
"""


# --- streaming_window_top_event --------------------------------------------

def q_streaming_window_top_event(spark, sf_dir):
    """Complete-mode streaming aggregation — the third output mode the
    engine's streaming tier exercises (append: joins/ingest; update:
    stateful totals; complete: rank-over-aggregate dashboards).  Tumbling
    1-hour windows × event_type counts run as a REAL availableNow stream;
    the top event type per window (count desc, name asc) is ranked over
    the complete-mode sink, which after the final trigger equals the batch
    aggregation the oracle computes."""
    import tempfile

    from ..sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    agg = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .count())
    name = "q_stream_wintop_sink"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(f"""
        SELECT date_format(w.start, 'yyyy-MM-dd HH:mm') AS window_start,
               event_type, CAST(count AS BIGINT) AS n
        FROM (SELECT *, row_number() OVER (PARTITION BY w
                     ORDER BY count DESC, event_type ASC) AS rk
              FROM {name}) t
        WHERE rk = 1
        ORDER BY window_start""")


_QSTREAM_WINTOP_SQL = """
WITH counts AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(w, '%Y-%m-%d %H:%M') AS window_start, event_type, n
FROM (SELECT *, row_number() OVER (PARTITION BY w
             ORDER BY n DESC, event_type ASC) AS rk
      FROM counts) t
WHERE rk = 1
ORDER BY window_start
"""


# --- brand_graph_triangles --------------------------------------------------

def q_brand_graph_triangles(spark, sf_dir):
    """Distributed triangle counting over the brand co-purchase graph
    (nodes = part brands, edges = brand pairs co-ordered ≥ 20 times) —
    the standard graph-clustering primitive, done the MapReduce way: each
    edge (a < b) joins against the adjacency of its lower endpoint, and a
    wedge (a-b, a-c) closes iff edge (b, c) exists.  Per-node triangle
    counts come out of one final aggregation.

    Scale shape: the edge table is the small derived graph (bounded by
    brands², not rows); the wedge join and closing join are equi-joins on
    edge keys with AQE handling skew — never an all-pairs product over
    nodes."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (li.join(part, li.l_partkey == part.p_partkey)
          .select("l_orderkey", "p_brand").distinct())
    per_order = ob.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("p_brand")).alias("_bs"))
    edges = (per_order
             .select(F.explode("_bs").alias("a"), F.col("_bs"))
             .select("a", F.explode(F.filter("_bs", lambda x: x > F.col("a")))
                     .alias("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= 20)
             .select("a", "b"))
    wedges = (edges.alias("e1")
              .join(edges.alias("e2"), F.col("e1.a") == F.col("e2.a"))
              .filter(F.col("e1.b") < F.col("e2.b"))
              .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                      F.col("e2.b").alias("z")))
    tris = wedges.join(edges,
                       (F.col("y") == edges.a) & (F.col("z") == edges.b))
    per_node = (tris.select(F.explode(F.array("x", "y", "z")).alias("brand"))
                .groupBy("brand").agg(F.count(F.lit(1)).alias("n_triangles")))
    return per_node.orderBy("brand")


_QTRI_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), edges AS (
  SELECT a.p_brand AS a, b.p_brand AS b
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
  HAVING COUNT(*) >= 20
), tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
), nodes AS (
  SELECT x AS brand FROM tris
  UNION ALL SELECT y FROM tris
  UNION ALL SELECT z FROM tris
)
SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY brand
ORDER BY brand
"""


# --- near_dup_rate_by_source ------------------------------------------------

def q_near_dup_rate_by_source(spark, sf_dir):
    """Per-source near-duplication rate: the fraction of each source's
    documents that sit in some MinHash-LSH candidate pair — the per-feed
    quality gauge a corpus ingest dashboard tracks (composes the LSH pair
    operator with the source dimension; one extra semi-join + count)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                    num_hashes=8, bands=4,
                                    max_bucket=_LSH_MAX_BUCKET)
    dup_ids = (pairs.select(F.col("id_a").alias("doc_id"))
               .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
               .distinct())
    flagged = docs.join(dup_ids, "doc_id", "left_semi") \
                  .groupBy("source").agg(F.count(F.lit(1)).alias("n_dup"))
    base = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (base.join(flagged, "source", "left")
            .select("source", "n_docs",
                    F.coalesce(F.col("n_dup"), F.lit(0)).cast("long")
                    .alias("n_near_dup"),
                    F.round(F.coalesce(F.col("n_dup"), F.lit(0))
                            / F.col("n_docs").cast("double"), 6)
                    .alias("near_dup_rate"))
            .orderBy("source"))


def _near_dup_rate_sql() -> str:
    from .sql_shared import lsh_pairs_cte, mh_sig_cte
    return mh_sig_cte("") + lsh_pairs_cte() + """
, dup_ids AS (
  SELECT DISTINCT doc_id FROM (
    SELECT id_a AS doc_id FROM pairs
    UNION ALL SELECT id_b FROM pairs) u
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (d.doc_id IN (SELECT doc_id FROM dup_ids))
            AS BIGINT) AS n_near_dup,
       ROUND(CAST(COUNT(*) FILTER (d.doc_id IN (SELECT doc_id FROM dup_ids))
                  AS DOUBLE) / COUNT(*), 6) AS near_dup_rate
FROM documents d
GROUP BY d.source
ORDER BY d.source
"""


# --- spatial_kmeans ---------------------------------------------------------

def q_spatial_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means over customer points (K = 4, 2 iterations,
    deterministic seed = the 4 smallest custkeys' points) — the spatial
    clustering companion to DBSCAN.  Fully distributed: each iteration is
    one broadcast of the 4-row centroid table + one window argmin + one
    mean aggregation — NO driver-side collect anywhere; centroids round to
    6 dp per iteration so both engines assign from identical values
    (coordinates are integers, so rounded-boundary ties are broken by the
    shared (distance, cell) ordering)."""
    from pyspark.sql.window import Window as W

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select("c_custkey",
                      (F.col("c_custkey") % 360 - 180).cast("double").alias("x"),
                      ((F.col("c_custkey") * 7) % 180 - 90).cast("double").alias("y"))
    cents = (pts.orderBy("c_custkey").limit(4)
             .select((F.row_number().over(W.orderBy("c_custkey")) - 1)
                     .alias("cell"),
                     F.col("x").alias("cx"), F.col("y").alias("cy")))

    def assign(c):
        j = pts.crossJoin(F.broadcast(c))
        d2 = ((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
              + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy")))
        w = W.partitionBy("c_custkey").orderBy(d2.asc(), F.col("cell").asc())
        return (j.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("c_custkey", "x", "y", "cell"))

    for _ in range(2):
        cents = (assign(cents).groupBy("cell")
                 .agg(F.round(F.avg("x"), 6).alias("cx"),
                      F.round(F.avg("y"), 6).alias("cy")))
    return (assign(cents).groupBy(F.col("cell").alias("cluster"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.round(F.avg("x"), 6).alias("cx"),
                 F.round(F.avg("y"), 6).alias("cy"))
            .orderBy("cluster"))


def _kmeans_sql() -> str:
    assign = """
  SELECT custkey, x, y, cell FROM (
    SELECT p.custkey, p.x, p.y, c.cell,
           row_number() OVER (PARTITION BY p.custkey
             ORDER BY (p.x - c.cx) * (p.x - c.cx)
                    + (p.y - c.cy) * (p.y - c.cy), c.cell) AS rn
    FROM pts p, {cents} c) t
  WHERE rn = 1"""
    step = """
  SELECT cell, ROUND(AVG(x), 6) AS cx, ROUND(AVG(y), 6) AS cy
  FROM {assigned} GROUP BY cell"""
    return f"""
WITH pts AS (
  SELECT c_custkey AS custkey,
         CAST(c_custkey % 360 - 180 AS DOUBLE) AS x,
         CAST((c_custkey * 7) % 180 - 90 AS DOUBLE) AS y
  FROM customer
), c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY custkey) - 1 AS INT) AS cell,
         x AS cx, y AS cy
  FROM (SELECT * FROM pts ORDER BY custkey LIMIT 4)
), a0 AS ({assign.format(cents="c0")}
), c1 AS ({step.format(assigned="a0")}
), a1 AS ({assign.format(cents="c1")}
), c2 AS ({step.format(assigned="a1")}
), a2 AS ({assign.format(cents="c2")}
)
SELECT cell AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(AVG(x), 6) AS cx, ROUND(AVG(y), 6) AS cy
FROM a2
GROUP BY cell
ORDER BY cluster
"""


# --- events_autocorrelation -------------------------------------------------

def q_events_autocorrelation(spark, sf_dir):
    """Lag-1/2/3 autocorrelation of the hourly event-count series per
    event type — the seasonality probe a metrics pipeline runs before
    choosing a forecast model.  One rollup shuffle builds the series; the
    lags are window ``lead`` columns over it (no self-join); the Pearson
    terms are exact BIGINT sums, so the correlation is bit-reproducible."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    series = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("event_type").orderBy("h")
    lagged = series.select(
        "event_type", "n",
        *[F.lead("n", k).over(w).alias(f"n{k}") for k in (1, 2, 3)])
    # all three lags in ONE aggregation over the single window pass
    # (conditional BIGINT sums == the per-lag filtered sums exactly), then
    # one explode — the per-lag union re-ran the rollup+window subtree
    # once per lag (round 9, the one-row-fan fix class)
    aggs = []
    for k in (1, 2, 3):
        valid = F.col(f"n{k}").isNotNull()
        aggs += [
            F.sum(F.when(valid, 1).otherwise(0)).cast("double").alias(f"m{k}"),
            F.sum(F.when(valid, F.col("n"))).cast("double").alias(f"sx{k}"),
            F.sum(F.when(valid, F.col(f"n{k}"))).cast("double").alias(f"sy{k}"),
            F.sum(F.when(valid, F.col("n") * F.col(f"n{k}")))
             .cast("double").alias(f"sxy{k}"),
            F.sum(F.when(valid, F.col("n") * F.col("n")))
             .cast("double").alias(f"sxx{k}"),
            F.sum(F.when(valid, F.col(f"n{k}") * F.col(f"n{k}")))
             .cast("double").alias(f"syy{k}"),
        ]
    agg = lagged.groupBy("event_type").agg(*aggs)

    def r_of(k):
        m, sx, sy = F.col(f"m{k}"), F.col(f"sx{k}"), F.col(f"sy{k}")
        sxy, sxx, syy = F.col(f"sxy{k}"), F.col(f"sxx{k}"), F.col(f"syy{k}")
        return (m * sxy - sx * sy) / F.sqrt((m * sxx - sx * sx)
                                            * (m * syy - sy * sy))

    out = (agg.select("event_type", F.explode(F.array(*[
        F.struct(F.lit(k).alias("lag"), F.col(f"m{k}").alias("m"),
                 F.round(r_of(k), 6).alias("autocorr"))
        for k in (1, 2, 3)])).alias("_s"))
        # a (type, lag) group with zero valid pairs does not exist in the
        # per-lag filtered aggregation (and the oracle) — drop it here too
        .filter(F.col("_s.m") > 0)
        .select("event_type", "_s.lag", "_s.autocorr"))
    return out.orderBy("event_type", "lag")


def _autocorr_sql() -> str:
    lags = []
    for k in (1, 2, 3):
        lags.append(f"""
  SELECT event_type, {k} AS lag,
         ROUND((m * sxy - sx * sy)
               / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 6)
           AS autocorr
  FROM (
    SELECT event_type, COUNT(*)::DOUBLE AS m, SUM(n)::DOUBLE AS sx,
           SUM(n{k})::DOUBLE AS sy, SUM(n * n{k})::DOUBLE AS sxy,
           SUM(n * n)::DOUBLE AS sxx, SUM(n{k} * n{k})::DOUBLE AS syy
    FROM lagged WHERE n{k} IS NOT NULL GROUP BY event_type) t""")
    return f"""
WITH series AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, n,
         lead(n, 1) OVER (PARTITION BY event_type ORDER BY h) AS n1,
         lead(n, 2) OVER (PARTITION BY event_type ORDER BY h) AS n2,
         lead(n, 3) OVER (PARTITION BY event_type ORDER BY h) AS n3
  FROM series
)
{" UNION ALL ".join(lags)}
ORDER BY event_type, lag
"""


# --- weighted_sample_docs ---------------------------------------------------

def q_weighted_sample_docs(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-Res): each doc draws u from the portable hash (so both
    engines draw the SAME u) and keeps key u^(1/w) with w = doc length;
    the global top-100 keys are the sample.  The length-biased sample a
    curation pipeline takes when longer documents deserve proportionally
    more slots — reproducible across engines, runs, and retries.

    Scale shape: one narrow projection + a global top-k (TakeOrdered — no
    full sort of the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (text.portable_hash64(F.col("text"), "wsample") + 1).cast("double") \
        / F.lit(float(1 << 60))
    w = F.length("text").cast("double")
    key = F.pow(u, 1.0 / w)
    return (docs.select("doc_id", F.round(key, 9).alias("sample_key"))
            .orderBy(F.col("sample_key").desc(), F.col("doc_id"))
            .limit(100))


_QWSAMPLE_SQL = """
SELECT doc_id,
       ROUND(pow((('0x' || substr(md5(text || '#wsample'), 1, 15))::BIGINT + 1)
                 / CAST(1152921504606846976 AS DOUBLE),
                 1.0 / len(text)), 9) AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id
LIMIT 100
"""


# --- lsh_edit_distance_verify -----------------------------------------------

def q_lsh_edit_distance_verify(spark, sf_dir):
    """Second exact verifier for LSH candidates: Levenshtein edit distance
    (native in BOTH engines) over every MinHash candidate pair, with a
    relative-distance score — the character-level complement to the
    token-level Jaccard verifier.  The candidate join fetches each side's
    text by id (two hash joins on the doc key); the quadratic-in-length
    edit-distance work happens only on the candidate set, never the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                    num_hashes=8, bands=4,
                                    max_bucket=_LSH_MAX_BUCKET)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    return (pairs.join(a, "id_a").join(b, "id_b")
            .select("id_a", "id_b",
                    F.levenshtein("_ta", "_tb").alias("edit_dist"),
                    F.round(F.levenshtein("_ta", "_tb").cast("double")
                            / F.greatest(F.length("_ta"), F.length("_tb")), 6)
                    .alias("rel_dist"))
            .orderBy("id_a", "id_b"))


def _edit_verify_sql() -> str:
    from .sql_shared import lsh_pairs_cte, mh_sig_cte
    return mh_sig_cte("") + lsh_pairs_cte() + """
SELECT p.id_a, p.id_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist,
       ROUND(CAST(levenshtein(a.text, b.text) AS DOUBLE)
             / greatest(len(a.text), len(b.text)), 6) AS rel_dist
FROM pairs p
JOIN documents a ON a.doc_id = p.id_a
JOIN documents b ON b.doc_id = p.id_b
ORDER BY p.id_a, p.id_b
"""


# --- grouping_sets_revenue --------------------------------------------------

def q_grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS — the general form of ROLLUP/CUBE (both
    already declared): revenue by (returnflag, linestatus), by returnflag
    alone, and the grand total, tagged with grouping_id.  Exact
    integer-cents sums; Spark expands the sets into ONE Expand + hash
    aggregate — a single scan, not three."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_r5_lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS revenue_cents
        FROM _r5_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY gid, l_returnflag, l_linestatus""")


_QGSETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


# --- unpivot_part_metrics ---------------------------------------------------

def q_unpivot_part_metrics(spark, sf_dir):
    """UNPIVOT (wide→tall) — the inverse of the declared pivot query:
    per-part numeric metrics stacked into (p_partkey, metric, value)
    rows.  Native ``stack`` generator, one narrow pass."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return (part.select(
        "p_partkey",
        F.expr("stack(2, 'size', CAST(p_size AS DOUBLE), "
               "'retailprice', CAST(p_retailprice AS DOUBLE)) "
               "AS (metric, value)"))
        .withColumn("value", F.round("value", 2))
        .orderBy("p_partkey", "metric"))


_QUNPIVOT_SQL = """
SELECT p_partkey, metric, ROUND(value, 2) AS value
FROM (
  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
  FROM part WHERE p_partkey <= 200
  UNION ALL
  SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE)
  FROM part WHERE p_partkey <= 200) u
ORDER BY p_partkey, metric
"""


# --- grouped HLL + HLL set algebra ------------------------------------------

_HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / 1024) * 1024 * 1024

_HLL_REG_SQL = """
  SELECT {extra} h % 1024 AS register,
         MAX(CASE WHEN h // 1024 > 0
                  THEN 50 - CAST(floor(log2(h // 1024)) AS BIGINT)
                  ELSE 51 END) AS max_rank
  FROM {src} GROUP BY {extra} h % 1024"""

_HLL_EST_SQL = ("CASE WHEN {am2!r} / ((1024.0 - nr) + s) <= 2560.0"
                " AND (1024.0 - nr) > 0"
                " THEN 1024.0 * ln(1024.0 / (1024.0 - nr))"
                " ELSE {am2!r} / ((1024.0 - nr) + s) END")


def q_hll_users_by_type(spark, sf_dir):
    """Per-event-type distinct-user HLL estimates — the grouped-sketch
    rollup a 100 TB pipeline materializes instead of rescanning
    (pipeline.sketch.hll_estimate_grouped).  The approximate estimate
    itself is value-checked; the exact count rides along for accuracy."""
    from ..pipeline import sketch

    ev = load_table(spark, sf_dir, "events")
    est = sketch.hll_estimate_grouped(ev, ["event_type"], "user_id", p=10)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (est.join(exact, "event_type")
            .select("event_type", "n_registers",
                    F.round("estimate", 6).alias("estimate"), "n_exact")
            .orderBy("event_type"))


_QHLLG_SQL = f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#hll'), 1, 15))
           ::BIGINT AS h
  FROM events
), rr AS ({_HLL_REG_SQL.format(src="h", extra="event_type,")}
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_registers,
         COUNT(*)::DOUBLE AS nr, SUM(POW(2.0, -max_rank)) AS s
  FROM rr GROUP BY event_type
)
SELECT a.event_type, a.n_registers,
       ROUND({_HLL_EST_SQL.format(am2=_HLL_ALPHA_M2)}, 6) AS estimate,
       e.n_exact
FROM agg a
JOIN (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type) e USING (event_type)
ORDER BY a.event_type
"""


def q_hll_click_view_overlap(spark, sf_dir):
    """HLL set algebra from SKETCHES, not rescans: clicker and viewer
    audiences, their union by register-wise max merge (exact over
    sketches), and the intersection by inclusion–exclusion
    (pipeline.sketch.hll_set_estimates) — the audience-overlap question
    answered from mergeable per-partition summaries."""
    from ..pipeline import sketch

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    return sketch.hll_set_estimates(clicks, views, "user_id", p=10)


_QHLLSET_SQL = f"""
WITH ha AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#hll'), 1, 15))
           ::BIGINT AS h
  FROM events WHERE event_type = 'click'
), hb AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#hll'), 1, 15))
           ::BIGINT AS h
  FROM events WHERE event_type = 'view'
), ra AS ({_HLL_REG_SQL.format(src="ha", extra="")}
), rb AS ({_HLL_REG_SQL.format(src="hb", extra="")}
), rm AS (
  SELECT register, MAX(max_rank) AS max_rank
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) u
  GROUP BY register
), ests AS (
  SELECT
    (SELECT {_HLL_EST_SQL.format(am2=_HLL_ALPHA_M2)} FROM
      (SELECT COUNT(*)::DOUBLE AS nr, SUM(POW(2.0, -max_rank)) AS s FROM ra) t
    ) AS est_a,
    (SELECT {_HLL_EST_SQL.format(am2=_HLL_ALPHA_M2)} FROM
      (SELECT COUNT(*)::DOUBLE AS nr, SUM(POW(2.0, -max_rank)) AS s FROM rb) t
    ) AS est_b,
    (SELECT {_HLL_EST_SQL.format(am2=_HLL_ALPHA_M2)} FROM
      (SELECT COUNT(*)::DOUBLE AS nr, SUM(POW(2.0, -max_rank)) AS s FROM rm) t
    ) AS est_union
)
SELECT ROUND(est_a, 6) AS est_a, ROUND(est_b, 6) AS est_b,
       ROUND(est_union, 6) AS est_union,
       ROUND(est_a + est_b - est_union, 6) AS est_intersection
FROM ests
"""


# --- doc_hash_sample --------------------------------------------------------

def q_doc_hash_sample(spark, sf_dir):
    """Deterministic 10% Bernoulli sample (pipeline.sample.hash_sample):
    shuffle-free, retry-stable, identical across engines — the sampling a
    100 TB pipeline uses where ``rand()`` would break retries and audits."""
    from ..pipeline.sample import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return (hash_sample(docs, "doc_id", pct=10, seed="samp")
            .select("doc_id", "source").orderBy("doc_id"))


_QHSAMPLE_SQL = """
SELECT doc_id, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#samp'), 1, 15))
        ::BIGINT % 100 < 10
ORDER BY doc_id
"""


# --- streaming_burst_detect -------------------------------------------------

def q_streaming_burst_detect(spark, sf_dir):
    """SLIDING-window streaming aggregation (10-minute windows, 5-minute
    slide): users with ≥ 2 events inside any window — the burst/abuse
    detector shape.  Run as a REAL availableNow stream (complete mode);
    each event lands in exactly two windows, and after the final trigger
    the sink equals the batch sliding aggregation the oracle rebuilds by
    unioning the two window alignments."""
    import tempfile

    from ..sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    agg = (ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"),
                      "user_id").count())
    name = "q_stream_burst_sink"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)
    return spark.sql(f"""
        SELECT date_format(w.start, 'yyyy-MM-dd HH:mm') AS window_start,
               user_id, CAST(count AS BIGINT) AS n_events
        FROM {name}
        WHERE count >= 2
        ORDER BY window_start, user_id""")


_QSTREAM_BURST_SQL = """
WITH wins AS (
  SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS ws, user_id FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 5 MINUTES, ts) - INTERVAL 5 MINUTES, user_id
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM wins
GROUP BY ws, user_id
HAVING COUNT(*) >= 2
ORDER BY window_start, user_id
"""


# --- snapshot_changelog -----------------------------------------------------

def q_snapshot_changelog(spark, sf_dir):
    """CDC changelog through the snapshot layer, end-to-end: build a table
    from nation (v1), append two derived rows, CoW-update one row, then
    read ``changes(v1)``.  ``exceptAll`` cancels the rewritten file's
    untouched rows, so the delta is exactly {old updated row} as delete +
    {new updated row, appended rows} as inserts — independent of file
    layout, hence oracle-able from the base tables alone."""
    import tempfile

    from ..operators.snapshots import SnapshotTable

    nation = load_table(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name")
    t = SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="chlog_") + "/t", nation)
    v1 = t.versions()[-1]
    t.append(spark, spark.createDataFrame(
        [(1001, "ATLANTIS"), (1002, "ELDORADO")],
        "n_nationkey int, n_name string"))
    t.update_where(spark, {"n_name": F.lit("RENAMED")},
                   F.col("n_nationkey") == 3)
    return (t.changes(spark, v1)
            .select("n_nationkey", "n_name", "_change_type")
            .orderBy("_change_type", "n_nationkey"))


_QCHLOG_SQL = """
SELECT n_nationkey, n_name, _change_type FROM (
  SELECT CAST(1001 AS INT) AS n_nationkey, 'ATLANTIS' AS n_name,
         'insert' AS _change_type
  UNION ALL SELECT 1002, 'ELDORADO', 'insert'
  UNION ALL SELECT 3, 'RENAMED', 'insert'
  UNION ALL SELECT n_nationkey, n_name, 'delete'
  FROM nation WHERE n_nationkey = 3) u
ORDER BY _change_type, n_nationkey
"""


# --- partition_pruned_scan --------------------------------------------------

def q_partition_pruned_scan(spark, sf_dir):
    """Partition evolution in the checked surface: events land in a
    snapshot table, the spec adds an identity field on event_type, a
    second batch writes WITH partition tuples, and the equality-pruned
    scan (only manifest-matched + pre-spec files read) must equal the
    plain filter.  Output: per-type counts from the pruned reads."""
    import tempfile

    from ..operators.snapshots import SnapshotTable

    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "event_type", "user_id")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    t = SnapshotTable.create(
        spark, tempfile.mkdtemp(prefix="pprune_") + "/t", first)
    t.add_partition_field("event_type")
    t.append(spark, second)
    out = None
    for et in ("click", "view", "purchase"):
        part = (t.read_partition(spark, {"event_type": et})
                .filter(F.col("event_type") == et)
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select(F.lit(et).alias("event_type"), "n_events"))
        out = part if out is None else out.unionAll(part)
    return out.orderBy("event_type")


_QPPRUNE_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
GROUP BY event_type
ORDER BY event_type
"""


# --- source_lang_diversity --------------------------------------------------

def q_source_lang_diversity(spark, sf_dir):
    """Shannon entropy of each source's language mix — the diversity
    gauge a multilingual-corpus dashboard tracks per feed.  Two map-side-
    combined shuffles ((source, lang) counts, then per-source entropy
    from exact BIGINT counts)."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = sl.groupBy("source").agg(F.sum("n").alias("nt"),
                                   F.count(F.lit(1)).alias("n_langs"))
    ent = (sl.join(tot, "source")
           .withColumn("_p", F.col("n") / F.col("nt").cast("double"))
           .groupBy("source")
           .agg(F.round(-F.sum(F.col("_p") * F.log2("_p")), 6)
                .alias("lang_entropy"),
                F.max("n_langs").cast("long").alias("n_langs"),
                F.max("nt").cast("long").alias("n_docs")))
    return ent.select("source", "n_docs", "n_langs", "lang_entropy") \
              .orderBy("source")


_QLANGDIV_SQL = """
WITH sl AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
), tot AS (
  SELECT source, SUM(n) AS nt, CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM sl GROUP BY source
)
SELECT sl.source, CAST(MAX(tot.nt) AS BIGINT) AS n_docs,
       MAX(tot.n_langs) AS n_langs,
       ROUND(-SUM((sl.n / CAST(tot.nt AS DOUBLE))
                  * log2(sl.n / CAST(tot.nt AS DOUBLE))), 6) AS lang_entropy
FROM sl JOIN tot USING (source)
GROUP BY sl.source
ORDER BY sl.source
"""


# --- customer_abc_pareto ----------------------------------------------------

def q_customer_abc_pareto(spark, sf_dir):
    """ABC/Pareto classification: customers ranked by revenue, classed A
    while the running share is under 50%, B under 80%, else C — with the
    per-class totals the 80/20 review reads.  Exact integer-cents money;
    the cumulative share is one window over the (already reduced)
    per-customer totals."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("long")
         .alias("cents"))
    tot = per.agg(F.sum("cents").alias("t"))
    w = W.orderBy(F.col("cents").desc(), F.col("o_custkey").asc())
    classed = (per.crossJoin(F.broadcast(tot))
               .withColumn("_cum", F.sum("cents").over(w))
               .withColumn("_share", F.col("_cum") / F.col("t").cast("double"))
               .withColumn("abc", F.when(F.col("_share") <= 0.5, "A")
                                   .when(F.col("_share") <= 0.8, "B")
                                   .otherwise("C")))
    return (classed.groupBy("abc")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("cents").cast("long").alias("revenue_cents"))
            .orderBy("abc"))


_QABC_SQL = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), classed AS (
  SELECT cents,
         CASE WHEN SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC)
                   / CAST((SELECT SUM(cents) FROM per) AS DOUBLE) <= 0.5
              THEN 'A'
              WHEN SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC)
                   / CAST((SELECT SUM(cents) FROM per) AS DOUBLE) <= 0.8
              THEN 'B' ELSE 'C' END AS abc
  FROM per
)
SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM classed
GROUP BY abc
ORDER BY abc
"""


# --- weekly_retention -------------------------------------------------------

def q_weekly_retention(spark, sf_dir):
    """Week-over-week user retention from the events stream: of the users
    active in week w, the fraction also active in week w+1 — the
    top-of-dashboard engagement metric.  Distinct (user, week) pairs
    self-join on the shifted week key (both sides pre-reduced, key-only)."""
    ev = load_table(spark, sf_dir, "events")
    uw = (ev.select("user_id",
                    F.date_trunc("week", "ts").alias("w")).distinct())
    nxt = uw.select("user_id", (F.col("w") - F.expr("INTERVAL 7 DAYS"))
                    .alias("w"))
    base = uw.groupBy("w").agg(F.countDistinct("user_id").alias("n_active"))
    ret = (uw.join(nxt, ["user_id", "w"], "left_semi")
           .groupBy("w").agg(F.countDistinct("user_id").alias("n_retained")))
    return (base.join(ret, "w", "left")
            .select(F.date_format("w", "yyyy-MM-dd").alias("week_start"),
                    "n_active",
                    F.coalesce(F.col("n_retained"), F.lit(0)).cast("long")
                    .alias("n_retained"),
                    F.round(F.coalesce(F.col("n_retained"), F.lit(0))
                            / F.col("n_active").cast("double"), 6)
                    .alias("retention"))
            .orderBy("week_start"))


_QRETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
), ret AS (
  SELECT a.w, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_retained
  FROM uw a JOIN uw b
    ON b.user_id = a.user_id AND b.w = a.w + INTERVAL 7 DAYS
  GROUP BY a.w
)
SELECT strftime(uw.w, '%Y-%m-%d') AS week_start,
       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_active,
       COALESCE(MAX(ret.n_retained), 0) AS n_retained,
       ROUND(COALESCE(MAX(ret.n_retained), 0)
             / CAST(COUNT(DISTINCT uw.user_id) AS DOUBLE), 6) AS retention
FROM uw LEFT JOIN ret ON ret.w = uw.w
GROUP BY uw.w
ORDER BY week_start
"""


# --- asof_forward_purchase --------------------------------------------------

def q_asof_forward_purchase(spark, sf_dir):
    """FORWARD as-of join (operators.asof_join direction='forward'): every
    click is matched to the user's next purchase at-or-after it — the
    click-to-conversion attribution query.  Same single union+window
    shuffle as the backward direction; DuckDB's ASOF JOIN with the
    reversed inequality is the oracle."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .filter(F.col("user_id") < 200)
              .select("user_id", "ts", F.col("event_id").alias("click_id")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    out = asof_join(clicks, purchases, "user_id", direction="forward")
    return (out.select("click_id", "user_id",
                       F.round("value_r", 6).alias("purchase_value"))
            .orderBy("click_id"))


_QASOF_FWD_SQL = """
SELECT c.event_id AS click_id, c.user_id,
       ROUND(p.value, 6) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id < 200) c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY click_id
"""


# --- simhash_clusters -------------------------------------------------------

def q_simhash_clusters(spark, sf_dir):
    """Near-duplicate clusters over the SIMHASH pair graph (Hamming ≤ 3,
    pigeonhole-banded equi-join) closed by distributed min-label
    propagation — the character-level complement of the MinHash cluster
    query, value-checked against a brute-force + recursive-closure
    oracle.  Output: one row per multi-doc cluster (canonical id, size)."""
    from ..pipeline import components as cc

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", bits=60,
                                max_distance=3)
    comp = cc.connected_components(pairs.select("id_a", "id_b"),
                                   "id_a", "id_b")
    return (comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") >= 2)
            .orderBy("component"))


def _simhash_clusters_sql() -> str:
    from .sql_shared import simhash_sql
    inner = simhash_sql(60, where="").replace("ORDER BY doc_id", "")
    return f"""
WITH RECURSIVE s AS ({inner}
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
), edges AS (
  SELECT id_a AS u, id_b AS v FROM p
  UNION
  SELECT id_b AS u, id_a AS v FROM p
), reach(u, w) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.w FROM edges e JOIN reach r ON r.u = e.v
), comp AS (
  SELECT u AS doc_id, MIN(w) AS component FROM reach GROUP BY u
)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM comp
GROUP BY component
HAVING COUNT(*) >= 2
ORDER BY component
"""


# --- order_backlog_sweepline ------------------------------------------------

def q_order_backlog_sweepline(spark, sf_dir):
    """Open-order backlog per month by SWEEP-LINE: each order contributes
    a +1 event at its order month and a −1 after its last ship month;
    the backlog is the running sum over month boundaries.  The classic
    interval-overlap counting shape — O(|orders|) events and ONE ordered
    window, never an order×month range join."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closed = li.groupBy("l_orderkey").agg(
        F.max(F.date_trunc("month", "l_shipdate")).alias("_end"))
    spans = (orders.join(closed,
                         orders.o_orderkey == closed.l_orderkey)
             .select(F.date_trunc("month", "o_orderdate").alias("_start"),
                     F.add_months(F.col("_end"), 1).alias("_stop")))
    # both sweep events come out of ONE pass: the old two-branch union
    # re-executed the orders⋈lineitem join once per branch (r13
    # scan-budget audit: 15000 -> 7500 input records at sf0.001);
    # inline() emits the +1/-1 rows per span with no second scan and no
    # materialization at all
    ev = spans.select(F.inline(F.array(
        F.struct(F.col("_start").alias("m"), F.lit(1).alias("d")),
        F.struct(F.col("_stop").alias("m"), F.lit(-1).alias("d")))))
    per_month = ev.groupBy("m").agg(F.sum("d").alias("delta"))
    w = W.orderBy("m")
    return (per_month
            .withColumn("backlog", F.sum("delta").over(w))
            .select(F.date_format("m", "yyyy-MM").alias("month"),
                    F.col("delta").cast("long").alias("delta"),
                    F.col("backlog").cast("long").alias("open_orders"))
            .orderBy("month"))


_QBACKLOG_SQL = """
WITH closed AS (
  SELECT l_orderkey, MAX(date_trunc('month', l_shipdate)) AS e
  FROM lineitem GROUP BY l_orderkey
), spans AS (
  SELECT date_trunc('month', o.o_orderdate) AS s,
         c.e + INTERVAL 1 MONTH AS p
  FROM orders o JOIN closed c ON o.o_orderkey = c.l_orderkey
), ev AS (
  SELECT s AS m, 1 AS d FROM spans
  UNION ALL SELECT p, -1 FROM spans
), per AS (
  SELECT m, CAST(SUM(d) AS BIGINT) AS delta FROM ev GROUP BY m
)
SELECT strftime(m, '%Y-%m') AS month, delta,
       CAST(SUM(delta) OVER (ORDER BY m) AS BIGINT) AS open_orders
FROM per
ORDER BY month
"""


# --- corpus_novelty_decay ---------------------------------------------------

def q_corpus_novelty_decay(spark, sf_dir):
    """Novelty decay: per 100-doc ingest batch (doc_id order), the share
    of its distinct bigrams never seen in ANY earlier document — the
    curve that tells a corpus pipeline when a source has run dry.  First
    sight is ONE min-aggregation over the bigram key (hashed — counts
    are hash-agnostic, same argument as `jaccard_pairs`); no
    batch-to-batch scan dependency."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = dedup.spread(docs).select(
        F.col("doc_id"), text.tokens(F.col("text")).alias("_toks"))
    idx = F.explode(F.sequence(
        F.lit(0), F.greatest(F.size("_toks") - 2, F.lit(0))))
    grams = (tokd.select("doc_id", idx.alias("_i"), "_toks")
             .select("doc_id",
                     F.xxhash64(F.get("_toks", F.col("_i")),
                                F.get("_toks", F.col("_i") + 1)).alias("_h"))
             .distinct())
    first = grams.groupBy("_h").agg(F.min("doc_id").alias("_first"))
    per_doc = (grams.join(first, "_h")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("_first") == F.col("doc_id"), 1)
                          .otherwise(0)).alias("novel")))
    return (per_doc.groupBy((F.floor(F.col("doc_id") / 100))
                            .cast("long").alias("batch"))
            .agg(F.sum("n").cast("long").alias("n_bigrams"),
                 F.sum("novel").cast("long").alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel")
                                / F.col("n_bigrams").cast("double"), 6))
            .orderBy("batch"))


_QNOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 1), ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 1) + 1)) AS i) t
), first AS (
  SELECT g, MIN(doc_id) AS f FROM grams GROUP BY g
), per AS (
  SELECT grams.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (first.f = grams.doc_id) AS BIGINT) AS novel
  FROM grams JOIN first USING (g)
  GROUP BY grams.doc_id
)
SELECT CAST(doc_id // 100 AS BIGINT) AS batch,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       ROUND(SUM(novel) / CAST(SUM(n) AS DOUBLE), 6) AS novelty
FROM per
GROUP BY doc_id // 100
ORDER BY batch
"""


R5_QUERIES = {
    "substring_dup_windows": (q_substring_dup_windows, _QSUBDUP_SQL, False),
    "knn_label_classify": (q_knn_label_classify, _QKNNCLS_SQL, False),
    "embedding_label_outliers": (q_embedding_label_outliers, _QOUTLIER_SQL, False),
    "corpus_zipf_slope": (q_corpus_zipf_slope, _QZIPF_SQL, False),
    "streaming_ingest_gate": (q_streaming_ingest_gate, _QSTREAMGATE_SQL, False),
    "spatial_affine_ops": (q_spatial_affine_ops, _QAFFINE_SQL, False),
    "cdc_dedup_by_source": (q_cdc_dedup_by_source, _QCDC_SQL, False),
    "customer_cohort_retention": (q_customer_cohort_retention, _QCOHORT_SQL, False),
    "part_basket_lift": (q_part_basket_lift, _QBASKET_SQL, False),
    "events_ewma": (q_events_ewma, _QEWMA_SQL, False),
    "bloom_ingest_gate": (q_bloom_ingest_gate, _bloom_sql(), False),
    "streaming_window_top_event": (q_streaming_window_top_event,
                                   _QSTREAM_WINTOP_SQL, False),
    "brand_graph_triangles": (q_brand_graph_triangles, _QTRI_SQL, False),
    "near_dup_rate_by_source": (q_near_dup_rate_by_source,
                                _near_dup_rate_sql(), False),
    "spatial_kmeans": (q_spatial_kmeans, _kmeans_sql(), False),
    "events_autocorrelation": (q_events_autocorrelation, _autocorr_sql(), False),
    "weighted_sample_docs": (q_weighted_sample_docs, _QWSAMPLE_SQL, False),
    "lsh_edit_distance_verify": (q_lsh_edit_distance_verify,
                                 _edit_verify_sql(), False),
    "grouping_sets_revenue": (q_grouping_sets_revenue, _QGSETS_SQL, False),
    "unpivot_part_metrics": (q_unpivot_part_metrics, _QUNPIVOT_SQL, False),
    "hll_users_by_type": (q_hll_users_by_type, _QHLLG_SQL, False),
    "hll_click_view_overlap": (q_hll_click_view_overlap, _QHLLSET_SQL, False),
    "doc_hash_sample": (q_doc_hash_sample, _QHSAMPLE_SQL, False),
    "streaming_burst_detect": (q_streaming_burst_detect,
                               _QSTREAM_BURST_SQL, False),
    "snapshot_changelog": (q_snapshot_changelog, _QCHLOG_SQL, False),
    "partition_pruned_scan": (q_partition_pruned_scan, _QPPRUNE_SQL, False),
    "source_lang_diversity": (q_source_lang_diversity, _QLANGDIV_SQL, False),
    "customer_abc_pareto": (q_customer_abc_pareto, _QABC_SQL, False),
    "weekly_retention": (q_weekly_retention, _QRETENTION_SQL, False),
    "asof_forward_purchase": (q_asof_forward_purchase, _QASOF_FWD_SQL, False),
    "simhash_clusters": (q_simhash_clusters, _simhash_clusters_sql(), False),
    "order_backlog_sweepline": (q_order_backlog_sweepline, _QBACKLOG_SQL, False),
    "corpus_novelty_decay": (q_corpus_novelty_decay, _QNOVELTY_SQL, False),
}
