"""Round-7 operator inventory.  Each declared query has an exact DuckDB
oracle (FIXTURES.md conventions: total ORDER BY, ROUND on float outputs,
identical aliases both sides, BIGINT casts, ``+ 0.0`` on sign-risky
rounded floats — the round-6 negative-zero lesson).

- spatial_transform_towgs84 — 7-parameter Helmert datum shift (+towgs84,
                              position-vector) applied end-to-end through
                              ST_Transform; the oracle re-derives the full
                              geodetic→ECEF→Helmert→Bowring arithmetic
- ivfpq_ann_recall          — the FAISS-style IVF+PQ composition: coarse
                              cells prune, PQ-ADC scores the probed
                              candidates, recall@5 vs the exact top-5
- doc_max_dup_ngram         — longest duplicated token n-gram per doc at
                              power-of-two resolution (within-doc
                              boilerplate beyond the bigram fraction)
- doc_template_mining       — frequent 5-token prefixes across docs
                              (shared boilerplate headers / templates)
- dp_noisy_topk_brands      — differential-privacy-style noisy count
                              release (inverse-CDF Laplace from the
                              portable hash, so the release is exactly
                              reproducible by the oracle)
- events_cusum_drift        — CUSUM change detection over the daily event
                              series via the prefix-sum/running-min
                              identity (no recursion needed)
- token_pmi_pairs           — collocation mining: PMI of adjacent word
                              pairs against unigram independence
- ngram_containment_pairs   — ASYMMETRIC shingle containment (quote /
                              excerpt detection that Jaccard misses)
- kmv_value_quantiles       — mergeable bottom-k (KMV) sketch: sample
                              quantiles + the (k-1)*H/h_k distinct
                              estimate from one deterministic sample
- brand_pagerank            — synchronous PageRank over the brand
                              co-purchase graph, 10 iterations; oracle
                              unrolls the iterations as chained CTEs
- ship_survival_km          — Kaplan-Meier survival of order->ship
                              latency with right censoring at 60 days,
                              cumulative product via exp(cumsum(ln))
- spatial_kde_heatmap       — Gaussian KDE with a bounded 3x3-cell
                              kernel: a 9-way explode + one cell-keyed
                              shuffle, never an all-pairs sum
- source_minhash_similarity — source-level MinHash via groupBy(source):
                              signatures merge by element-wise min, so
                              the estimator composes across grouping
                              levels in the same single shuffle
- rrf_ann_fusion            — reciprocal-rank fusion of the LSH / IVF /
                              PQ indexes; fused score folds the SORTED
                              rank list so both engines sum in the same
                              order
- spatial_tier2_metrics     — the round-7 tier-2 scalar batch
                              (BoundingDiagonal, ShiftLongitude,
                              BestSRID, discrete Hausdorff / Frechet)
                              value-checked per row by arithmetic
- streaming_cdc_upsert      — foreachBatch MERGE into the snapshot
                              layer with stale-update rejection
                              (last-writer-wins by event time — exact
                              under any batch split)
- embedding_logreg_irls     — distributed GLM training: logistic
                              regression by 4 Newton/IRLS steps, each
                              ONE sufficient-statistics aggregation;
                              oracle unrolls the steps as chained CTEs
- nb_lang_classifier        — multinomial Naive Bayes language ID
                              (add-1 smoothing), train/test split,
                              confusion matrix; scores ROUNDed before
                              the argmax so summation-order wobble
                              cannot flip a prediction between engines
- spatial_areal_interp      — areal interpolation onto a 10-degree
                              grid: axis-aligned overlap is closed-form,
                              bounded fan-out + one cell-keyed sum
- dq_profile_lineitem       — Deequ-style one-pass data-quality profile
                              (nulls, exact distincts, min/max/mean per
                              column), unpivoted to a per-column report
- multimodal_resize         — the resize stage of the multimodal
                              pipeline: Arrow-batched mapInPandas with a
                              deterministic fake codec, resized payload
                              checked byte-for-byte

Scale notes: the Helmert shift is per-row closed-form arithmetic inside
the existing Arrow-batched transform UDF (no new shuffle); IVFPQ's data
side is one narrow codegen pass to (cell, m codes) and candidates flow
through a broadcast equi-join on cell; dup-ngram/template/PMI queries
shuffle hash- or vocab-keyed aggregates with map-side combine, never
raw token streams twice; CUSUM's windows run on the |type × day|
pre-aggregate (tiny), not on raw events; containment reuses the
single-shuffle overlap core of ``jaccard_pairs`` with the same
stop-shingle doc-frequency cap; the KMV sketch builds as a
per-partition k-heap (TakeOrderedAndProject), never a full sort;
PageRank keeps ranks a |V|-row table with lineage truncated per round.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..pipeline import dedup, similarity, text
from ..pipeline.dedup import spread
from ..pipeline.text import portable_hash64
from ..sources import load_table

from .sql_shared import TOKS_SQL as _TOKS_SQL

R7_QUERIES = {}


# --- spatial_transform_towgs84 ----------------------------------------------

_OSGB_TOWGS84 = "446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894"
_SRC_CRS = f"+proj=longlat +ellps=airy +towgs84={_OSGB_TOWGS84}"


def q_spatial_transform_towgs84(spark, sf_dir):
    """OSGB36 geographic → WGS84 via the native 7-parameter Helmert path
    (functions/udfs_ext._helmert_fns): geodetic→ECEF on Airy 1830,
    position-vector translate/rotate/scale, Bowring one-shot back on
    WGS84 — the closed-form datum shift the reference gets from GeoTools
    (/root/reference/README.md:34-38), no proj database needed.  The
    oracle replays the identical arithmetic with the matrix entries
    interpolated as literals, so every coordinate is value-checked."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    pt = ("ST_Point(CAST(c_custkey % 110 AS DOUBLE) / 10.0 - 8.0, "
          "49.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0)")
    return (cust.selectExpr(
        "c_custkey",
        f"ROUND(ST_X(ST_Transform({pt}, '{_SRC_CRS}', 'EPSG:4326')), 6) AS wlon",
        f"ROUND(ST_Y(ST_Transform({pt}, '{_SRC_CRS}', 'EPSG:4326')), 6) AS wlat")
        .orderBy("c_custkey"))


def _towgs84_sql() -> str:
    from ..functions.udfs_ext import (_AIRY_A, _AIRY_F, _ARCSEC, _WGS84_A,
                                      _WGS84_F)
    p = [float(v) for v in _OSGB_TOWGS84.split(",")]
    dx, dy, dz = p[0], p[1], p[2]
    rx, ry, rz = p[3] * _ARCSEC, p[4] * _ARCSEC, p[5] * _ARCSEC
    m = 1.0 + p[6] * 1e-6
    r = ((m, -m * rz, m * ry), (m * rz, m, -m * rx), (-m * ry, m * rx, m))
    e2s = _AIRY_F * (2.0 - _AIRY_F)
    e2w = _WGS84_F * (2.0 - _WGS84_F)
    bw = _WGS84_A * (1.0 - _WGS84_F)
    ep2bw = (e2w / (1.0 - e2w)) * bw     # ep2 * b, same product order
    e2aw = e2w * _WGS84_A                # e2 * a
    return f"""
WITH pts AS (
  SELECT c_custkey,
         radians(49.0 + CAST(c_custkey % 90 AS DOUBLE) / 10.0) AS phi,
         radians(CAST(c_custkey % 110 AS DOUBLE) / 10.0 - 8.0) AS lam
  FROM customer WHERE c_custkey < 400
), nrm AS (
  SELECT c_custkey, phi, lam,
         {_AIRY_A!r} / sqrt(1.0 - {e2s!r} * sin(phi) * sin(phi)) AS n
  FROM pts
), xyz AS (
  SELECT c_custkey,
         n * cos(phi) * cos(lam) AS x,
         n * cos(phi) * sin(lam) AS y,
         n * (1.0 - {e2s!r}) * sin(phi) AS z
  FROM nrm
), hel AS (
  SELECT c_custkey,
         {dx!r} + {r[0][0]!r} * x + {r[0][1]!r} * y + {r[0][2]!r} * z AS xp,
         {dy!r} + {r[1][0]!r} * x + {r[1][1]!r} * y + {r[1][2]!r} * z AS yp,
         {dz!r} + {r[2][0]!r} * x + {r[2][1]!r} * y + {r[2][2]!r} * z AS zp
  FROM xyz
), bow AS (
  SELECT c_custkey, xp, yp, zp,
         sqrt(xp * xp + yp * yp) AS pp,
         atan2(zp * {_WGS84_A!r}, sqrt(xp * xp + yp * yp) * {bw!r}) AS th
  FROM hel
)
SELECT c_custkey,
       ROUND(degrees(atan2(yp, xp)), 6) + 0.0 AS wlon,
       ROUND(degrees(atan2(
           zp + {ep2bw!r} * sin(th) * sin(th) * sin(th),
           pp - {e2aw!r} * cos(th) * cos(th) * cos(th))), 6) + 0.0 AS wlat
FROM bow
ORDER BY c_custkey
"""


R7_QUERIES["spatial_transform_towgs84"] = (
    q_spatial_transform_towgs84, _towgs84_sql(), False)


# --- ivfpq_ann_recall -------------------------------------------------------

def q_ivfpq_ann_recall(spark, sf_dir):
    """Recall@5 of the full IVF+PQ index (similarity.ivfpq_adc_topk:
    8 coarse cells, nprobe 3, 4x16-dim PQ sub-spaces) against the exact
    cosine top-5 — the end-to-end evaluation of the architecture every
    billion-vector deployment runs (FAISS ``IVF8,PQ4``).  Both codebooks
    are DETERMINISTIC (the 8 smallest vec_ids' vectors / sub-vectors), so
    cell assignment, probing, ADC ranking, and the recall fractions are
    all reproduced exactly by the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (emb.select("vec_id", "embedding")
            .orderBy("vec_id").limit(8).collect())
    cents = [[float(v) for v in r["embedding"]] for r in rows]
    m, sub = 4, 16
    codebooks = [[[float(v) for v in r["embedding"][s * sub:(s + 1) * sub]]
                  for r in rows] for s in range(m)]
    queries = emb.filter(F.col("vec_id") < 5)
    approx = similarity.ivfpq_adc_topk(queries, emb, k=5, centroids=cents,
                                       codebooks=codebooks, nprobe=3)
    exact = similarity.cosine_topk(queries, emb, k=5)
    return similarity.recall_at_k(approx, exact, k=5).orderBy("query_id")


_QIVFPQ_SQL = """
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
         embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
), d2c AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range(1, 65),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
              * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))) AS d2
  FROM embeddings e CROSS JOIN cents c
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2c) WHERE rn = 1
), qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2c WHERE vec_id < 5) WHERE rn <= 3
), cb AS (
  SELECT s.sub,
         CAST(row_number() OVER (PARTITION BY s.sub ORDER BY e.vec_id) - 1
              AS INT) AS code,
         list_slice(e.embedding::DOUBLE[], s.sub * 16 + 1,
                    s.sub * 16 + 16) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) e
  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
), enc AS (
  SELECT vec_id AS data_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
           row_number() OVER (PARTITION BY e.vec_id, c.sub ORDER BY
             list_sum(list_transform(range(1, 17),
               i -> (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])
                  * (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])))
             ASC, c.code ASC) AS rn
    FROM embeddings e CROSS JOIN cb c) WHERE rn = 1
), qlut AS (
  SELECT e.vec_id AS query_id, c.sub, c.code,
         list_sum(list_transform(range(1, 17),
           i -> (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])
              * (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])))
           AS d2
  FROM embeddings e CROSS JOIN cb c WHERE e.vec_id < 5
), adc AS (
  SELECT q.query_id, x.data_id,
         list_sum(list(q.d2 ORDER BY q.sub)) AS adc_dist
  FROM enc x
  JOIN assign a ON a.vec_id = x.data_id
  JOIN qprobe p ON p.cell = a.cell
  JOIN qlut q ON q.query_id = p.query_id
            AND q.sub = x.sub AND q.code = x.code
  GROUP BY 1, 2
), approx AS (
  SELECT query_id, data_id FROM (
    SELECT query_id, data_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc_dist ASC, data_id ASC) AS rank
    FROM adc) WHERE rank <= 5
), exact AS (
  SELECT query_id, data_id FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS data_id,
           CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
                list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                d.vec_id ASC) AS INT) AS rank
    FROM (SELECT * FROM embeddings WHERE vec_id < 5) q, embeddings d) t
  WHERE rank <= 5
)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS k_exact,
       CAST(COUNT(*) FILTER (a.data_id IS NOT NULL) AS BIGINT) AS n_hit,
       ROUND(CAST(COUNT(*) FILTER (a.data_id IS NOT NULL) AS DOUBLE)
             / COUNT(*), 6) AS recall
FROM exact e LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.data_id = e.data_id
GROUP BY e.query_id
ORDER BY e.query_id
"""

R7_QUERIES["ivfpq_ann_recall"] = (q_ivfpq_ann_recall, _QIVFPQ_SQL, False)


# --- doc_max_dup_ngram ------------------------------------------------------

def q_doc_max_dup_ngram(spark, sf_dir):
    """Longest duplicated token n-gram per document at power-of-two
    resolution (k in 2..32): the within-doc boilerplate signal Gopher's
    repetition filters threshold on for n > 2.  ONE pass over the token
    stream emits all five gram ladders (position explode x 5 widths,
    codegen'd slice/concat/md5 — no per-element lambda), then one
    hash-keyed count shuffle with map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = spread(docs).select("doc_id", text.tokens(F.col("text")).alias("_tk"))
    pos = tokd.select(
        "doc_id", "_tk",
        F.explode(F.sequence(F.lit(1), F.size("_tk"))).alias("i"))
    kd = (pos.select(
            "doc_id", "_tk", "i",
            F.explode(F.array(*[F.lit(k) for k in (2, 4, 8, 16, 32)]))
             .alias("k"))
          .filter(F.col("i") + F.col("k") - 1 <= F.size("_tk")))
    grams = kd.select(
        "doc_id", "k",
        portable_hash64(
            F.concat_ws(" ", F.slice("_tk", F.col("i"), F.col("k"))),
            "dupg").alias("h"))
    dup = (grams.groupBy("doc_id", "k", "h")
           .agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") > 1)
           .groupBy("doc_id").agg(F.max("k").alias("mk")))
    return (docs.select("doc_id").join(dup, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("mk"), F.lit(0)).cast("int")
                     .alias("max_dup_k"))
            .orderBy("doc_id"))


_QDUPNG_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), g AS (
  SELECT doc_id, ks.k,
         ('0x' || substr(md5(array_to_string(
             list_slice(tk, t.i, t.i + ks.k - 1), ' ') || '#dupg'), 1, 15)
         )::BIGINT AS h
  FROM tok,
       (SELECT unnest([2, 4, 8, 16, 32]) AS k) ks,
       LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) t
  WHERE t.i + ks.k - 1 <= len(tk)
), d AS (
  SELECT doc_id, k FROM g GROUP BY doc_id, k, h HAVING COUNT(*) > 1
), m AS (
  SELECT doc_id, MAX(k) AS mk FROM d GROUP BY doc_id
)
SELECT doc.doc_id, CAST(COALESCE(m.mk, 0) AS INT) AS max_dup_k
FROM documents doc LEFT JOIN m ON m.doc_id = doc.doc_id
ORDER BY doc.doc_id
"""

R7_QUERIES["doc_max_dup_ngram"] = (q_doc_max_dup_ngram, _QDUPNG_SQL, False)


# --- doc_template_mining ----------------------------------------------------

def q_doc_template_mining(spark, sf_dir):
    """Boilerplate template mining: 5-token document prefixes shared by
    >= 3 documents, with how many sources they span — the signal a corpus
    cleaner uses to strip shared headers/banners before dedup (a template
    spanning many sources is site chrome, not content).  One prefix-keyed
    count shuffle with map-side combine; COUNT(DISTINCT source) is exact
    over the tiny source set."""
    docs = load_table(spark, sf_dir, "documents")
    pre = spread(docs).select(
        "source",
        F.concat_ws(" ", F.slice(text.tokens(F.col("text")), 1, 5))
         .alias("prefix"))
    return (pre.groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("source").alias("n_sources"))
            .filter(F.col("n_docs") >= 3)
            .orderBy(F.desc("n_docs"), "prefix")
            .limit(30))


_QTPL_SQL = f"""
WITH pre AS (
  SELECT source,
         array_to_string(list_slice({_TOKS_SQL}, 1, 5), ' ') AS prefix
  FROM documents
)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM pre
GROUP BY prefix
HAVING COUNT(*) >= 3
ORDER BY n_docs DESC, prefix
LIMIT 30
"""

R7_QUERIES["doc_template_mining"] = (q_doc_template_mining, _QTPL_SQL, False)


# --- dp_noisy_topk_brands ---------------------------------------------------

def q_dp_noisy_topk_brands(spark, sf_dir):
    """Differential-privacy-style noisy count release: per-brand part
    counts plus Laplace(b=2) noise drawn by inverse CDF from a
    DETERMINISTIC uniform (the portable hash of the brand), then the
    noisy top-10 — the private-release pipeline shape (noise added before
    ranking), exactly reproducible by the oracle because the 'draw' is
    the same 60-bit hash both engines compute.  One brand-keyed count
    shuffle; noise and ranking run on the |brands|-row aggregate."""
    parts = load_table(spark, sf_dir, "part")
    cnt = parts.groupBy("p_brand").agg(F.count(F.lit(1)).alias("true_n"))
    u = ((portable_hash64(F.col("p_brand"), "dp") % 99999)
         .cast("double") - F.lit(49999.0)) / F.lit(100000.0)
    noisy = (F.col("true_n").cast("double")
             + F.lit(-2.0) * F.signum(u)
             * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u)))
    w = Window.orderBy(F.desc("noisy_n"), F.asc("p_brand"))
    return (cnt.withColumn("noisy_n", noisy)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 10)
            .select("p_brand", "true_n",
                    F.round("noisy_n", 6).alias("noisy_n"), "rank")
            .orderBy("rank"))


_QDP_SQL = """
WITH cnt AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS true_n FROM part GROUP BY p_brand
), uu AS (
  SELECT p_brand, true_n,
         (CAST(('0x' || substr(md5(p_brand || '#dp'), 1, 15))::BIGINT % 99999
               AS DOUBLE) - 49999.0) / 100000.0 AS u
  FROM cnt
), noisy AS (
  SELECT p_brand, true_n,
         CAST(true_n AS DOUBLE)
         + (-2.0) * sign(u) * ln(1.0 - 2.0 * abs(u)) AS noisy_n
  FROM uu
)
SELECT p_brand, true_n, ROUND(noisy_n, 6) AS noisy_n,
       CAST(row_number() OVER (ORDER BY noisy_n DESC, p_brand ASC) AS INT)
         AS rank
FROM noisy
ORDER BY rank
LIMIT 10
"""

R7_QUERIES["dp_noisy_topk_brands"] = (q_dp_noisy_topk_brands, _QDP_SQL, False)


# --- events_cusum_drift -----------------------------------------------------

def q_events_cusum_drift(spark, sf_dir):
    """CUSUM drift statistic over each event type's daily count series —
    change-point detection without recursion via the identity
    s_i = p_i - min(0, min_{j<=i} p_j) where p is the prefix sum of
    (count - series mean).  The raw stream collapses in one
    (type, day)-keyed count shuffle; both windows then run over the tiny
    |types x days| aggregate (the round-5 lesson: never window the raw
    table when a pre-aggregate suffices)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    avg = daily.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("_a"))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    j = daily.join(avg, "event_type")
    j = j.withColumn("_p", F.sum(F.col("n") - F.col("_a")).over(w))
    j = j.withColumn("_minp", F.min("_p").over(w))
    return (j.select(
        "event_type", "day", "n",
        F.round(F.col("_p") - F.least(F.col("_minp"), F.lit(0.0)), 6)
         .alias("cusum"))
        .orderBy("event_type", "day"))


_QCUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), av AS (
  SELECT event_type, CAST(SUM(n) AS DOUBLE) / COUNT(*) AS a
  FROM daily GROUP BY 1
), c1 AS (
  SELECT d.event_type, d.day, d.n,
         SUM(d.n - v.a) OVER (PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM daily d JOIN av v USING (event_type)
), c2 AS (
  SELECT *, MIN(p) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp
  FROM c1
)
SELECT event_type, day, n,
       ROUND(p - least(minp, 0.0), 6) + 0.0 AS cusum
FROM c2
ORDER BY event_type, day
"""

R7_QUERIES["events_cusum_drift"] = (q_events_cusum_drift, _QCUSUM_SQL, False)


# --- token_pmi_pairs --------------------------------------------------------

def q_token_pmi_pairs(spark, sf_dir):
    """Collocation mining: pointwise mutual information of adjacent word
    pairs, ln(p(ab) / (p(a) p(b))), for the 20 most frequent bigrams with
    count >= 5 — the statistic that separates true collocations from
    frequent-word coincidence.  Two vocab-keyed count shuffles (unigrams,
    bigrams) with map-side combine; totals ride in as broadcast
    single-row crossJoins, never a driver collect; ranking is by the
    integer count (float PMI is annotation, not sort key)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = spread(docs).select(text.tokens(F.col("text")).alias("tk"))
    uni = (tk.select(F.explode("tk").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    nt = uni.agg(F.sum("cw").alias("nt"))
    pairs = (tk.filter(F.size("tk") >= 2)
             .select(F.col("tk"),
                     F.explode(F.sequence(F.lit(0), F.size("tk") - 2))
                      .alias("i"))
             .select(F.get("tk", F.col("i")).alias("w1"),
                     F.get("tk", F.col("i") + 1).alias("w2")))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    nb = big.agg(F.sum("n_pair").alias("nb"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    pmi = (F.log(
        (F.col("n_pair").cast("double") / F.col("nb").cast("double"))
        / ((F.col("c1").cast("double") / F.col("nt").cast("double"))
           * (F.col("c2").cast("double") / F.col("nt").cast("double")))))
    return (big.filter(F.col("n_pair") >= 5)
            .join(u1, "w1").join(u2, "w2")
            .crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(nt))
            .select("w1", "w2", "n_pair", F.round(pmi, 6).alias("pmi"))
            .orderBy(F.desc("n_pair"), "w1", "w2")
            .limit(20))


_QPMI_SQL = f"""
WITH tok AS (
  SELECT {_TOKS_SQL} AS tk FROM documents
), uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
  FROM (SELECT unnest(tk) AS w FROM tok) GROUP BY w
), tot AS (
  SELECT CAST(SUM(cw) AS BIGINT) AS nt FROM uni
), big AS (
  SELECT tk[i + 1] AS w1, tk[i + 2] AS w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM tok, LATERAL (SELECT unnest(range(0, greatest(len(tk) - 1, 0))) AS i) t
  GROUP BY 1, 2
), totb AS (
  SELECT CAST(SUM(n_pair) AS BIGINT) AS nb FROM big
)
SELECT b.w1, b.w2, b.n_pair,
       ROUND(ln((CAST(b.n_pair AS DOUBLE) / CAST(tb.nb AS DOUBLE))
                / ((CAST(u1.cw AS DOUBLE) / CAST(tt.nt AS DOUBLE))
                   * (CAST(u2.cw AS DOUBLE) / CAST(tt.nt AS DOUBLE)))), 6)
         AS pmi
FROM big b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN totb tb CROSS JOIN tot tt
WHERE b.n_pair >= 5
ORDER BY b.n_pair DESC, b.w1, b.w2
LIMIT 20
"""

R7_QUERIES["token_pmi_pairs"] = (q_token_pmi_pairs, _QPMI_SQL, False)


# --- ngram_containment_pairs ------------------------------------------------

def q_ngram_containment_pairs(spark, sf_dir):
    """Asymmetric shingle containment (dedup.containment_pairs): pairs
    where either |A∩B|/|A| or |A∩B|/|B| >= 0.5 — the quote/excerpt
    detector that symmetric Jaccard misses (a short doc embedded in a
    long one).  Same single-shuffle overlap core and 256-doc stop-shingle
    cap as ngram_jaccard_pairs."""
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.containment_pairs(docs, "doc_id", "text", shingle_n=3,
                                  threshold=0.5, max_doc_freq=256)
    return (out.select("id_a", "id_b",
                       F.round("cont_ab", 9).alias("cont_ab"),
                       F.round("cont_ba", 9).alias("cont_ba"))
            .orderBy("id_a", "id_b"))


_QCONT_SQL = f"""
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
       ROUND(CAST(n_common AS DOUBLE) / CAST(sa.sz AS DOUBLE), 9) AS cont_ab,
       ROUND(CAST(n_common AS DOUBLE) / CAST(sb.sz AS DOUBLE), 9) AS cont_ba
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE greatest(CAST(n_common AS DOUBLE) / CAST(sa.sz AS DOUBLE),
               CAST(n_common AS DOUBLE) / CAST(sb.sz AS DOUBLE)) >= 0.5
ORDER BY id_a, id_b
"""

R7_QUERIES["ngram_containment_pairs"] = (
    q_ngram_containment_pairs, _QCONT_SQL, False)


# --- kmv_value_quantiles ----------------------------------------------------

def q_kmv_value_quantiles(spark, sf_dir):
    """KMV bottom-k sketch report (sketch.kmv_bottom_k): sample-based p50
    and p90 of the events value column from a 256-row deterministic
    bottom-hash sample, plus the classic KMV distinct-count estimate of
    users ((k-1) * H / h_k) next to the exact count — the mergeable
    quantile+distinct summary that completes the sketch family (HLL,
    CMS, Bloom, KMV).  The sketch build is a per-partition k-heap
    (TakeOrderedAndProject), never a full sort; all finishing runs on
    256-row tables."""
    from ..pipeline import sketch as SK

    ev = load_table(spark, sf_dir, "events")
    samp = SK.kmv_bottom_k(ev, "event_id", k=256, seed="kmv",
                           keep_cols=("value",))
    w = Window.orderBy(F.col("value").asc(), F.col("h").asc())
    q = (samp.withColumn("rn", F.row_number().over(w))
         .agg(F.max(F.when(F.col("rn") == 128, F.col("value"))).alias("p50s"),
              F.max(F.when(F.col("rn") == 230, F.col("value"))).alias("p90s")))
    du = (ev.select(portable_hash64(F.col("user_id").cast("string"), "kmvd")
                    .alias("h"))
          .distinct().orderBy("h").limit(256))
    est = du.agg(
        F.count(F.lit(1)).alias("nk"), F.max("h").alias("hk")).select(
        F.when(F.col("nk") < 256, F.col("nk").cast("double"))
         .otherwise(F.lit(255.0) * F.lit(float(2 ** 60))
                    / F.col("hk").cast("double"))
         .alias("est_users"))
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    return (q.crossJoin(est).crossJoin(exact)
            .select(F.lit(256).cast("int").alias("k"),
                    F.round("p50s", 6).alias("p50_sample"),
                    F.round("p90s", 6).alias("p90_sample"),
                    F.round("est_users", 6).alias("est_distinct_users"),
                    F.col("exact_users").cast("long").alias("exact_distinct_users")))


_QKMV_SQL = """
WITH samp AS (
  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#kmv'), 1, 15))::BIGINT AS h,
         value
  FROM events ORDER BY h LIMIT 256
), ranked AS (
  SELECT value, row_number() OVER (ORDER BY value ASC, h ASC) AS rn FROM samp
), q AS (
  SELECT MAX(CASE WHEN rn = 128 THEN value END) AS p50s,
         MAX(CASE WHEN rn = 230 THEN value END) AS p90s
  FROM ranked
), du AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#kmvd'), 1, 15))::BIGINT AS h
  FROM events
), bu AS (
  SELECT h FROM du ORDER BY h LIMIT 256
), est AS (
  SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE 255.0 * 1152921504606846976.0 / CAST(MAX(h) AS DOUBLE)
         END AS est_users
  FROM bu
), ex AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users FROM events
)
SELECT CAST(256 AS INT) AS k,
       ROUND(q.p50s, 6) + 0.0 AS p50_sample,
       ROUND(q.p90s, 6) + 0.0 AS p90_sample,
       ROUND(est.est_users, 6) + 0.0 AS est_distinct_users,
       ex.exact_users AS exact_distinct_users
FROM q CROSS JOIN est CROSS JOIN ex
"""

R7_QUERIES["kmv_value_quantiles"] = (
    q_kmv_value_quantiles, _QKMV_SQL, False)


# --- brand_pagerank ---------------------------------------------------------

def q_brand_pagerank(spark, sf_dir):
    """PageRank over the brand co-purchase graph (components.pagerank):
    brands are connected when bought in the same order; 10 synchronous
    iterations, damping 0.85.  The iterative-algorithm shape next to
    label propagation — each round is one vertex-keyed join + one
    groupBy(sum), ranks stay a |V|-row table, lineage truncated per
    round.  The oracle unrolls the same 10 iterations as chained CTEs
    (no recursion needed for a fixed iteration count)."""
    from ..pipeline import components as C

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bo = (li.join(pt, li.l_partkey == pt.p_partkey)
          .select("l_orderkey", "p_brand").distinct())
    a = bo.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("ba"))
    b = bo.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("bb"))
    edges = (a.join(b, "ok").filter(F.col("ba") < F.col("bb"))
             .select(F.col("ba").alias("id_a"), F.col("bb").alias("id_b"))
             .distinct())
    pr = C.pagerank(edges, damping=0.85, iterations=10)
    return (pr.select(F.col("id").alias("p_brand"),
                      F.round("rank", 6).alias("rank"))
            .orderBy("p_brand"))


def _pagerank_sql(iters: int = 10) -> str:
    sql = """
WITH bo AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), e0 AS (
  SELECT DISTINCT a.p_brand AS u, b.p_brand AS v
  FROM bo a JOIN bo b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
), sym AS (
  SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0
), deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg
), r0 AS (
  SELECT u AS id, 1.0 / nn.n AS rank FROM deg CROSS JOIN nn
)"""
    for i in range(iters):
        sql += f""", r{i + 1} AS (
  SELECT d.u AS id,
         ((1.0 - 0.85) / nn.n) + 0.85 * COALESCE(s.s, 0.0) AS rank
  FROM deg d CROSS JOIN nn
  LEFT JOIN (
    SELECT e.v AS id, SUM(r.rank / dd.deg) AS s
    FROM sym e JOIN r{i} r ON r.id = e.u JOIN deg dd ON dd.u = e.u
    GROUP BY e.v) s ON s.id = d.u
)"""
    sql += (f"\nSELECT id AS p_brand, ROUND(rank, 6) + 0.0 AS rank "
            f"FROM r{iters} ORDER BY p_brand")
    return sql


R7_QUERIES["brand_pagerank"] = (q_brand_pagerank, _pagerank_sql(), False)


# --- ship_survival_km -------------------------------------------------------

def q_ship_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve of order->ship latency with right
    censoring at 60 days — the survival-analysis operator class (lifetime
    of an open order; 'still unshipped at the analysis horizon' is a
    censored observation, dropped from no risk set it belongs to).  The
    estimator S(t) = prod(1 - d_i/n_i) is computed without a cumulative
    product primitive via exp(cumsum(ln ...)).  The raw join collapses in
    one duration-keyed count shuffle; both windows then run over the
    <= 61-row day table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(od, li.l_orderkey == od.o_orderkey)
    dr = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    # the synthetic shipdate is independent of orderdate, so negative
    # "durations" exist — a survival model drops them as data-quality
    # rejects (a real pipeline would alert on them)
    tab = (j.select(dr.alias("dr")).filter(F.col("dr") >= 0)
           .select(F.least(F.col("dr"), F.lit(60)).alias("t"),
                   (F.col("dr") <= 60).cast("int").alias("e")))
    g = tab.groupBy("t").agg(F.count(F.lit(1)).alias("n_at"),
                             F.sum("e").alias("d"))
    # total-at-risk derives from the <=61-row day table itself (a full
    # window over n_at) — the old separate tab.agg() branch re-executed
    # the lineitem⋈orders join for one scalar (r13 scan-budget discovery
    # audit: 2 corpus scans -> 1); sum(n_at) == count(tab) exactly.
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
                                            Window.unboundedFollowing)
    r = g.withColumn("n_risk", F.sum("n_at").over(w_all)
                     - F.coalesce(F.sum("n_at").over(w_prev), F.lit(0)))
    s = r.withColumn("surv", F.exp(F.sum(
        F.log(F.lit(1.0) - F.col("d").cast("double")
              / F.col("n_risk").cast("double"))).over(w_cum)))
    return (s.select(F.col("t").cast("int").alias("t_days"),
                     "n_risk", F.col("d").alias("d_events"),
                     F.round("surv", 6).alias("surv"))
            .orderBy("t_days"))


_QKM_SQL = """
WITH j AS (
  SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS dr
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), tab AS (
  SELECT least(dr, 60) AS t, CASE WHEN dr <= 60 THEN 1 ELSE 0 END AS e
  FROM j WHERE dr >= 0
), g AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_at, CAST(SUM(e) AS BIGINT) AS d
  FROM tab GROUP BY t
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tab
), r AS (
  SELECT g.t, g.n_at, g.d,
         CAST(tot.n - COALESCE(SUM(g.n_at) OVER (ORDER BY g.t
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM g CROSS JOIN tot
), s AS (
  SELECT t, n_risk, d,
         exp(SUM(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)) AS surv
  FROM r
)
SELECT CAST(t AS INT) AS t_days, n_risk, d AS d_events,
       ROUND(surv, 6) + 0.0 AS surv
FROM s
ORDER BY t_days
"""

R7_QUERIES["ship_survival_km"] = (q_ship_survival_km, _QKM_SQL, False)


# --- spatial_kde_heatmap ----------------------------------------------------

def q_spatial_kde_heatmap(spark, sf_dir):
    """Gaussian KDE heatmap over the customer point grid with a BOUNDED
    kernel: each point contributes to its own 15-degree cell and the 8
    neighbors only (h = 10 deg, so the kernel mass beyond one cell is
    negligible) — the scale trick that turns KDE's all-pairs sum into a
    9-way explode + ONE cell-keyed shuffle, never a cross join.  Cell
    centers are exact integer-derived arithmetic, mirrored verbatim."""
    cust = load_table(spark, sf_dir, "customer")
    x = (F.col("c_custkey") % 360 - 180).cast("double")
    y = ((F.col("c_custkey") * 7) % 180 - 90).cast("double")
    pts = cust.select(
        x.alias("x"), y.alias("y"),
        F.floor(x / 15).cast("long").alias("cx"),
        F.floor(y / 15).cast("long").alias("cy"))
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    e = pts.select("x", "y", "cx", "cy", F.explode(offs).alias("o"))
    gx = F.col("cx") + F.col("o.dx")
    gy = F.col("cy") + F.col("o.dy")
    ctrx = (gx.cast("double") + 0.5) * 15.0
    ctry = (gy.cast("double") + 0.5) * 15.0
    w = F.exp(-(((F.col("x") - ctrx) * (F.col("x") - ctrx))
                + ((F.col("y") - ctry) * (F.col("y") - ctry))) / 200.0)
    return (e.select(gx.alias("gx"), gy.alias("gy"), w.alias("w"))
            .groupBy("gx", "gy")
            .agg(F.count(F.lit(1)).alias("n_contrib"),
                 F.round(F.sum("w"), 6).alias("density"))
            .select(F.col("gx").cast("int").alias("cell_x"),
                    F.col("gy").cast("int").alias("cell_y"),
                    "n_contrib", "density")
            .orderBy("cell_x", "cell_y"))


_QKDE_SQL = """
WITH pts AS (
  SELECT CAST(c_custkey % 360 - 180 AS DOUBLE) AS x,
         CAST((c_custkey * 7) % 180 - 90 AS DOUBLE) AS y
  FROM customer
), p2 AS (
  SELECT x, y,
         CAST(floor(x / 15) AS BIGINT) AS cx,
         CAST(floor(y / 15) AS BIGINT) AS cy
  FROM pts
), o AS (
  SELECT dxs.dx, dys.dy
  FROM (SELECT unnest([-1, 0, 1]) AS dx) dxs,
       (SELECT unnest([-1, 0, 1]) AS dy) dys
), c AS (
  SELECT p.cx + o.dx AS gx, p.cy + o.dy AS gy,
         exp(-(((p.x - (CAST(p.cx + o.dx AS DOUBLE) + 0.5) * 15.0)
                * (p.x - (CAST(p.cx + o.dx AS DOUBLE) + 0.5) * 15.0))
               + ((p.y - (CAST(p.cy + o.dy AS DOUBLE) + 0.5) * 15.0)
                  * (p.y - (CAST(p.cy + o.dy AS DOUBLE) + 0.5) * 15.0)))
             / 200.0) AS w
  FROM p2 p CROSS JOIN o
)
SELECT CAST(gx AS INT) AS cell_x, CAST(gy AS INT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_contrib,
       ROUND(SUM(w), 6) + 0.0 AS density
FROM c
GROUP BY gx, gy
ORDER BY cell_x, cell_y
"""

R7_QUERIES["spatial_kde_heatmap"] = (q_spatial_kde_heatmap, _QKDE_SQL, False)


# --- source_minhash_similarity ----------------------------------------------

def q_source_minhash_similarity(spark, sf_dir):
    """Pairwise vocabulary similarity BETWEEN SOURCES from source-level
    MinHash signatures — the sketch-mergeability payoff: passing
    ``source`` as the signature key makes ``groupBy(min)`` compute the
    MinHash of the UNION of each source's shingle sets in the same one
    narrow pass + one |sources|-row shuffle as doc-level signatures
    (signatures merge by element-wise min, so the estimator composes
    across any grouping level).  The 20x20 pair table is trivially
    broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    wide = dedup.minhash_signatures_wide(docs, "source", "text",
                                         num_hashes=8, shingle_n=3)
    a = wide.select(F.col("source").alias("src_a"),
                    *[F.col(f"mh_{i}").alias(f"a{i}") for i in range(8)])
    b = wide.select(F.col("source").alias("src_b"),
                    *[F.col(f"mh_{i}").alias(f"b{i}") for i in range(8)])
    agree = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(8))
    return (a.join(b, F.col("src_a") < F.col("src_b"))
            .select("src_a", "src_b",
                    F.round(agree.cast("double") / F.lit(8.0), 6)
                     .alias("jaccard_est"))
            .orderBy("src_a", "src_b"))


def _source_mh_sql() -> str:
    from .sql_shared import TOKS_SQL, mh_mix_sql
    mins = ", ".join(f"MIN({mh_mix_sql(i)}) AS m{i}" for i in range(8))
    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(8))
    return f"""
WITH toks AS (
  SELECT source, {TOKS_SQL} AS tk FROM documents
), shingles AS (
  SELECT DISTINCT source,
         array_to_string(list_slice(tk, i, i + 2), ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i) t
), hashed AS (
  SELECT source,
         ('0x' || substr(md5(shingle || '#mh'), 1, 15))::BIGINT AS h
  FROM shingles
), sig AS (
  SELECT source, {mins} FROM hashed GROUP BY source
)
SELECT a.source AS src_a, b.source AS src_b,
       ROUND(CAST({agree} AS DOUBLE) / 8.0, 6) AS jaccard_est
FROM sig a JOIN sig b ON a.source < b.source
ORDER BY src_a, src_b
"""


R7_QUERIES["source_minhash_similarity"] = (
    q_source_minhash_similarity, _source_mh_sql(), False)


# --- rrf_ann_fusion ---------------------------------------------------------

def q_rrf_ann_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of THREE ANN indexes (hyperplane-LSH, IVF,
    PQ-ADC): score(q, d) = sum over lists of 1/(60 + rank) — the standard
    ensemble-retrieval combiner (Cormack et al., SIGIR'09) a production
    search stack runs over heterogeneous indexes.  The fused score is
    computed by folding the SORTED rank list (array_sort + ordered fold)
    so both engines sum the same doubles in the same order — a groupBy
    SUM would be order-nondeterministic at the last ulp and could flip
    near-tied rankings.  Each index's candidate generation keeps its own
    scale shape; the fusion itself is one (query, candidate)-keyed
    aggregate over <= 15 rows per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (emb.select("vec_id", "embedding")
            .orderBy("vec_id").limit(8).collect())
    cents = [[float(v) for v in r["embedding"]] for r in rows]
    m, sub = 4, 16
    codebooks = [[[float(v) for v in r["embedding"][s * sub:(s + 1) * sub]]
                  for r in rows] for s in range(m)]
    queries = emb.filter(F.col("vec_id") < 5)
    lsh = similarity.lsh_topk(queries, emb, k=5, num_planes=4)
    ivf = similarity.ivf_topk(queries, emb, k=5, num_cells=8, nprobe=3,
                              centroids=cents)
    pq = similarity.pq_adc_topk(queries, emb, k=5, codebooks=codebooks)
    un = (lsh.select("query_id", "data_id", "rank")
          .unionByName(ivf.select("query_id", "data_id", "rank"))
          .unionByName(pq.select("query_id", "data_id", "rank")))
    g = (un.groupBy("query_id", "data_id")
         .agg(F.array_sort(F.collect_list("rank")).alias("rs")))
    rrf = F.aggregate(
        F.transform(F.col("rs"),
                    lambda r: F.lit(1.0) / (F.lit(60.0) + r.cast("double"))),
        F.lit(0.0), lambda a, b: a + b)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("data_id"))
    return (g.withColumn("n_lists", F.size("rs"))
            .withColumn("rrf", rrf)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 5)
            .select("query_id", "data_id", "n_lists",
                    F.round("rrf", 6).alias("rrf"), "rank")
            .orderBy("query_id", "rank"))


def _rrf_sql(num_planes: int = 4, dim: int = 64) -> str:
    from ..pipeline.similarity import _hyperplane
    cases = []
    for p in range(num_planes):
        wv = _hyperplane(dim, p)
        terms = " + ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) * ({wv[i]!r})"
                           for i in range(dim))
        cases.append(f"CASE WHEN ({terms}) > 0 THEN {2 ** p} ELSE 0 END")
    bucket = " + ".join(cases)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket FROM embeddings
), lshr AS (
  SELECT query_id, data_id, rank FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS data_id,
           CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
                list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                d.vec_id ASC) AS INT) AS rank
    FROM (SELECT * FROM b WHERE vec_id < 5) q JOIN b d ON d.bucket = q.bucket) t
  WHERE rank <= 5
), cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
         embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
), d2c AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range(1, 65),
           i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
              * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))) AS d2
  FROM embeddings e CROSS JOIN cents c
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2c) WHERE rn = 1
), qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2c WHERE vec_id < 5) WHERE rn <= 3
), ivfr AS (
  SELECT query_id, data_id, rank FROM (
    SELECT c.query_id, c.data_id,
           CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY
                list_cosine_similarity(de.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC,
                c.data_id ASC) AS INT) AS rank
    FROM (SELECT p.query_id, a.vec_id AS data_id
          FROM qprobe p JOIN assign a ON a.cell = p.cell) c
    JOIN embeddings de ON de.vec_id = c.data_id
    JOIN embeddings qe ON qe.vec_id = c.query_id) t
  WHERE rank <= 5
), cb AS (
  SELECT s.sub,
         CAST(row_number() OVER (PARTITION BY s.sub ORDER BY e.vec_id) - 1
              AS INT) AS code,
         list_slice(e.embedding::DOUBLE[], s.sub * 16 + 1,
                    s.sub * 16 + 16) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8) e
  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
), enc AS (
  SELECT vec_id AS data_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
           row_number() OVER (PARTITION BY e.vec_id, c.sub ORDER BY
             list_sum(list_transform(range(1, 17),
               i -> (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])
                  * (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])))
             ASC, c.code ASC) AS rn
    FROM embeddings e CROSS JOIN cb c) WHERE rn = 1
), qlut AS (
  SELECT e.vec_id AS query_id, c.sub, c.code,
         list_sum(list_transform(range(1, 17),
           i -> (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])
              * (CAST(e.embedding[c.sub * 16 + i] AS DOUBLE) - c.cvec[i])))
           AS d2
  FROM embeddings e CROSS JOIN cb c WHERE e.vec_id < 5
), adc AS (
  SELECT q.query_id, x.data_id,
         list_sum(list(q.d2 ORDER BY q.sub)) AS adc_dist
  FROM enc x JOIN qlut q ON q.sub = x.sub AND q.code = x.code
  GROUP BY 1, 2
), pqr AS (
  SELECT query_id, data_id, rank FROM (
    SELECT query_id, data_id,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY adc_dist ASC, data_id ASC) AS INT) AS rank
    FROM adc) WHERE rank <= 5
), un AS (
  SELECT * FROM lshr UNION ALL SELECT * FROM ivfr UNION ALL SELECT * FROM pqr
), g AS (
  SELECT query_id, data_id,
         list(rank ORDER BY rank) AS rs
  FROM un GROUP BY query_id, data_id
)
SELECT query_id, data_id, n_lists, ROUND(rrf, 6) + 0.0 AS rrf, rank
FROM (
  SELECT query_id, data_id,
         CAST(len(rs) AS INT) AS n_lists,
         list_sum(list_transform(rs, r -> 1.0 / (60.0 + CAST(r AS DOUBLE)))) AS rrf,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY
              list_sum(list_transform(rs, r -> 1.0 / (60.0 + CAST(r AS DOUBLE)))) DESC,
              data_id ASC) AS INT) AS rank
  FROM g) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


R7_QUERIES["rrf_ann_fusion"] = (q_rrf_ann_fusion, _rrf_sql(), False)


# --- spatial_tier2_metrics --------------------------------------------------

def q_spatial_tier2_metrics(spark, sf_dir):
    """Round-7 tier-2 function batch end-to-end through the SQL names:
    ST_BoundingDiagonal endpoint, ST_ShiftLongitude, ST_BestSRID (UTM
    zone arithmetic), and the discrete ST_HausdorffDistance /
    ST_FrechetDistance on per-row parallel segments (Hausdorff = the
    separation d; Frechet of the REVERSED twin = hypot(3, d) — the
    order-sensitivity check) — each mirrored as plain arithmetic."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    x = "CAST(c_custkey % 360 - 180 AS DOUBLE)"
    y = "CAST((c_custkey * 7) % 160 - 80 AS DOUBLE)"
    d = "CAST(c_custkey % 7 + 1 AS DOUBLE)"
    seg = f"ST_GeomFromText(CONCAT('LINESTRING(', {x}, ' ', {y}, ',', {x} + 3, ' ', {y}, ')'))"
    seg_up = (f"ST_GeomFromText(CONCAT('LINESTRING(', {x}, ' ', {y} + {d}, "
              f"',', {x} + 3, ' ', {y} + {d}, ')'))")
    seg_up_rev = (f"ST_GeomFromText(CONCAT('LINESTRING(', {x} + 3, ' ', "
                  f"{y} + {d}, ',', {x}, ' ', {y} + {d}, ')'))")
    box = f"ST_PolygonFromEnvelope({x}, {y}, {x} + 2, {y} + 2)"
    return (cust.selectExpr(
        "c_custkey",
        f"ROUND(ST_X(ST_EndPoint(ST_BoundingDiagonal({box}))), 6) AS bd_x",
        f"ROUND(ST_Y(ST_EndPoint(ST_BoundingDiagonal({box}))), 6) AS bd_y",
        f"ROUND(ST_X(ST_ShiftLongitude(ST_Point({x}, {y}))), 6) AS shifted_lon",
        f"ST_BestSRID(ST_Point({x}, {y})) AS best_srid",
        f"ROUND(ST_HausdorffDistance({seg}, {seg_up}), 6) AS hd",
        f"ROUND(ST_FrechetDistance({seg}, {seg_up_rev}), 6) AS fd")
        .orderBy("c_custkey"))


_QT2_SQL = """
WITH pts AS (
  SELECT c_custkey,
         CAST(c_custkey % 360 - 180 AS DOUBLE) AS x,
         CAST((c_custkey * 7) % 160 - 80 AS DOUBLE) AS y,
         CAST(c_custkey % 7 + 1 AS DOUBLE) AS d
  FROM customer WHERE c_custkey < 200
)
SELECT c_custkey,
       ROUND(x + 2, 6) + 0.0 AS bd_x,
       ROUND(y + 2, 6) + 0.0 AS bd_y,
       ROUND(CASE WHEN x < 0 THEN x + 360.0 ELSE x END, 6) + 0.0 AS shifted_lon,
       CAST(CASE WHEN y >= 0 THEN 32600 ELSE 32700 END
            + least(60, greatest(1, CAST(floor((x + 180.0) / 6.0) AS INT) + 1))
            AS INT) AS best_srid,
       ROUND(d, 6) + 0.0 AS hd,
       ROUND(sqrt(3.0 * 3.0 + d * d), 6) + 0.0 AS fd
FROM pts
ORDER BY c_custkey
"""

R7_QUERIES["spatial_tier2_metrics"] = (
    q_spatial_tier2_metrics, _QT2_SQL, False)


# --- streaming_cdc_upsert ---------------------------------------------------

def q_streaming_cdc_upsert(spark, sf_dir):
    """Streaming CDC upsert into the snapshot layer: an availableNow event
    stream MERGEs into a seeded table via foreachBatch — per micro-batch
    the changeset collapses to the latest row per key, STALE updates are
    dropped by comparing (ts, event_id) against the table's current row
    (last-writer-wins by EVENT time, so the result is identical under any
    batch split / arrival order — the out-of-order-safe CDC contract),
    then WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT commits one
    snapshot.  Users 0-24 are pre-seeded so both merge branches execute.
    Scale shape: merge touches only files containing matched keys
    (semi-join file pruning in SnapshotTable.merge_into); the per-batch
    window runs on the batch, not the table."""
    import tempfile

    from ..operators.snapshots import SnapshotTable
    from ..sources import stream_table
    from ..streaming import drain as _drain

    base = tempfile.mkdtemp(prefix="cdc_upsert_") + "/t"
    seed = spark.range(0, 25).select(
        F.col("id").alias("user_id"), F.lit(0.0).alias("value"),
        F.lit(0).cast("long").alias("last_event"),
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("last_ts"))
    tbl = SnapshotTable.create(spark, base, seed)

    ev = (stream_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < 60)
          .select("user_id", "value",
                  F.col("event_id").alias("last_event"),
                  F.col("ts").alias("last_ts")))

    def do_merge(df, _bid):
        sp = df.sparkSession
        w = Window.partitionBy("user_id").orderBy(
            F.desc("last_ts"), F.desc("last_event"))
        latest = (df.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
        cur = tbl.read(sp).select(
            F.col("user_id"), F.col("last_ts").alias("_cur_ts"),
            F.col("last_event").alias("_cur_ev"))
        fresh = (latest.join(cur, "user_id", "left")
                 .filter(F.col("_cur_ts").isNull()
                         | (F.col("last_ts") > F.col("_cur_ts"))
                         | ((F.col("last_ts") == F.col("_cur_ts"))
                            & (F.col("last_event") > F.col("_cur_ev"))))
                 .drop("_cur_ts", "_cur_ev"))
        tbl.merge_into(sp, fresh, "user_id")

    q = (ev.writeStream.foreachBatch(do_merge)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    _drain(q)
    return (tbl.read(spark)
            .select("user_id", F.round("value", 6).alias("value"),
                    "last_event")
            .orderBy("user_id"))


_QCDCUP_SQL = """
WITH ev AS (
  SELECT user_id, value, event_id, ts FROM events WHERE user_id < 60
), lat AS (
  SELECT user_id, value, event_id FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1
), seed AS (
  SELECT unnest(range(0, 25)) AS user_id
)
SELECT COALESCE(l.user_id, s.user_id) AS user_id,
       ROUND(COALESCE(l.value, 0.0), 6) + 0.0 AS value,
       CAST(COALESCE(l.event_id, 0) AS BIGINT) AS last_event
FROM seed s FULL OUTER JOIN lat l ON l.user_id = s.user_id
ORDER BY user_id
"""

R7_QUERIES["streaming_cdc_upsert"] = (
    q_streaming_cdc_upsert, _QCDCUP_SQL, False)


# --- embedding_logreg_irls --------------------------------------------------

def q_embedding_logreg_irls(spark, sf_dir):
    """Distributed GLM training: RIDGE-regularized logistic regression
    (is label 0?) on the first embedding dimension, fit by 4 Newton/IRLS
    steps —
    the canonical driver-holds-the-coefficients shape (each step is ONE
    map-side-combinable aggregation of the 5 sufficient statistics
    {sum w, sum w*x, sum w*x^2, sum (y-p), sum (y-p)*x}; the 2x2 Newton
    solve is closed-form scalar arithmetic).  The L2 penalty (lambda=1)
    is what makes the optimum FINITE under complete separation — the
    unpenalized MLE diverges on separable data and Newton blows up into
    engine-dependent garbage (caught by the sf0.001 differential soak:
    betas hit +-5e6 and the two engines' last-ulp summation differences
    amplified into the 4th significant digit).  At 100 TB each step
    stays a single aggregation job; feature rounded (ROUND 9) per the
    norm-mirroring convention; oracle unrolls the same 4 steps."""
    emb = load_table(spark, sf_dir, "embeddings")
    # feature = the first embedding dimension (the L2 norm is constant
    # 1.0 on unit-normalized vectors — collinear with the intercept)
    d = emb.select(
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
        F.round(F.get("embedding", 0).cast("double"), 9).alias("x"))
    d = d.persist()
    b0 = b1 = 0.0
    for _ in range(4):
        p = 1.0 / (1.0 + F.exp(-(F.lit(b0) + F.lit(b1) * F.col("x"))))
        w = p * (1.0 - p)
        r = d.agg(F.sum(w).alias("h11"),
                  F.sum(w * F.col("x")).alias("h12"),
                  F.sum(w * F.col("x") * F.col("x")).alias("h22"),
                  F.sum(F.col("y") - p).alias("g1"),
                  F.sum((F.col("y") - p) * F.col("x")).alias("g2")).first()
        det = (r["h11"] + 1.0) * (r["h22"] + 1.0) - r["h12"] * r["h12"]
        nb0 = b0 + ((r["h22"] + 1.0) * (r["g1"] - b0)
                    - r["h12"] * (r["g2"] - b1)) / det
        nb1 = b1 + ((r["h11"] + 1.0) * (r["g2"] - b1)
                    - r["h12"] * (r["g1"] - b0)) / det
        b0, b1 = nb0, nb1
    pf = 1.0 / (1.0 + F.exp(-(F.lit(b0) + F.lit(b1) * F.col("x"))))
    return d.agg(
        F.round(F.lit(b0), 6).alias("b0"),
        F.round(F.lit(b1), 6).alias("b1"),
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.round(F.avg(F.when((pf >= 0.5) == (F.col("y") == 1.0), 1.0)
                      .otherwise(0.0)), 6).alias("train_acc"))


_QIRLS_SQL = """
WITH d AS (
  SELECT CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y,
         ROUND(CAST(embedding[1] AS DOUBLE), 9) AS x
  FROM embeddings
), bt0 AS (
  SELECT 0.0 AS b0, 0.0 AS b1
)"""
for _i in range(4):
    _QIRLS_SQL += f""", s{_i + 1} AS (
  SELECT SUM(p * (1.0 - p)) AS h11,
         SUM(p * (1.0 - p) * x) AS h12,
         SUM(p * (1.0 - p) * x * x) AS h22,
         SUM(y - p) AS g1,
         SUM((y - p) * x) AS g2
  FROM (SELECT y, x,
               1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) AS p
        FROM d CROSS JOIN bt{_i} b)
), bt{_i + 1} AS (
  SELECT b.b0 + ((s.h22 + 1.0) * (s.g1 - b.b0) - s.h12 * (s.g2 - b.b1))
               / ((s.h11 + 1.0) * (s.h22 + 1.0) - s.h12 * s.h12) AS b0,
         b.b1 + ((s.h11 + 1.0) * (s.g2 - b.b1) - s.h12 * (s.g1 - b.b0))
               / ((s.h11 + 1.0) * (s.h22 + 1.0) - s.h12 * s.h12) AS b1
  FROM bt{_i} b CROSS JOIN s{_i + 1} s
)"""
_QIRLS_SQL += """
SELECT ROUND(b.b0, 6) + 0.0 AS b0,
       ROUND(b.b1, 6) + 0.0 AS b1,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       ROUND(AVG(CASE WHEN (1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) >= 0.5)
                       = (y = 1.0) THEN 1.0 ELSE 0.0 END), 6) + 0.0
         AS train_acc
FROM d CROSS JOIN bt4 b
GROUP BY b.b0, b.b1
"""

R7_QUERIES["embedding_logreg_irls"] = (
    q_embedding_logreg_irls, _QIRLS_SQL, False)


# --- nb_lang_classifier -----------------------------------------------------

def q_nb_lang_classifier(spark, sf_dir):
    """Trained generative classifier: multinomial Naive Bayes language ID
    with add-1 smoothing — TRAIN on even doc_ids, classify odd doc_ids,
    report the confusion matrix.  The model is two vocab-keyed count
    aggregations (token-class counts, class totals) joined into a
    |V| x |classes| log-prob table; scoring joins the test token stream
    against it and sums log-probs per (doc, class) — all map-side-
    combinable, no per-row model state.  Scores are ROUNDed to 9 before
    the argmax so the last-ulp summation-order wobble can never flip a
    prediction between engines; ties break by class name."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)

    tr_tok = spread(train).select(
        "lang", F.explode(text.tokens(F.col("text"))).alias("t"))
    cls = train.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    tot = cls.agg(F.sum("nd").alias("ntot"))
    prior = (cls.crossJoin(F.broadcast(tot))
             .select(F.col("lang").alias("c"),
                     F.log(F.col("nd").cast("double")
                           / F.col("ntot").cast("double")).alias("prior")))
    cnt = tr_tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("ct"))
    nt = tr_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("nt"))
    vocab = tr_tok.select("t").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    lp = (vocab.crossJoin(cls.select(F.col("lang").alias("c")))
          .join(cnt.select(F.col("lang").alias("c"), "t", "ct"),
                ["c", "t"], "left")
          .join(nt.select(F.col("lang").alias("c"), "nt"), "c")
          .crossJoin(F.broadcast(vsize))
          .select("c", "t", F.log(
              (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
              / (F.col("nt").cast("double") + F.col("v").cast("double")))
              .alias("lp")))

    te_tok = spread(test).select(
        "doc_id", F.col("lang").alias("true_lang"),
        F.explode(text.tokens(F.col("text"))).alias("t"))
    scored = (te_tok.join(lp, "t")
              .groupBy("doc_id", "true_lang", "c")
              .agg(F.sum("lp").alias("slp"))
              .join(prior, "c")
              .select("doc_id", "true_lang", "c",
                      F.round(F.col("prior") + F.col("slp"), 9)
                       .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("c"))
    pred = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    return (pred.groupBy("true_lang", F.col("c").alias("pred_lang"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("true_lang", "pred_lang"))


_QNB_SQL = f"""
WITH train AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
), test AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1
), tr_tok AS (
  SELECT lang, unnest({_TOKS_SQL}) AS t FROM train
), cls AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd FROM train GROUP BY lang
), tot AS (
  SELECT CAST(SUM(nd) AS BIGINT) AS ntot FROM cls
), prior AS (
  SELECT lang AS c, ln(CAST(nd AS DOUBLE) / CAST(ntot AS DOUBLE)) AS prior
  FROM cls CROSS JOIN tot
), cnt AS (
  SELECT lang AS c, t, CAST(COUNT(*) AS BIGINT) AS ct
  FROM tr_tok GROUP BY lang, t
), nt AS (
  SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS nt FROM tr_tok GROUP BY lang
), vocab AS (
  SELECT DISTINCT t FROM tr_tok
), vs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab
), lp AS (
  SELECT k.c, vo.t,
         ln(CAST(COALESCE(cn.ct, 0) + 1 AS DOUBLE)
            / (CAST(n.nt AS DOUBLE) + CAST(vs.v AS DOUBLE))) AS lp
  FROM vocab vo
  CROSS JOIN (SELECT lang AS c FROM cls) k
  LEFT JOIN cnt cn ON cn.c = k.c AND cn.t = vo.t
  JOIN nt n ON n.c = k.c
  CROSS JOIN vs
), te_tok AS (
  SELECT doc_id, lang AS true_lang, unnest({_TOKS_SQL}) AS t FROM test
), scored AS (
  SELECT s.doc_id, s.true_lang, s.c,
         ROUND(p.prior + s.slp, 9) AS score
  FROM (SELECT tt.doc_id, tt.true_lang, l.c, SUM(l.lp) AS slp
        FROM te_tok tt JOIN lp l ON l.t = tt.t
        GROUP BY tt.doc_id, tt.true_lang, l.c) s
  JOIN prior p ON p.c = s.c
), pred AS (
  SELECT doc_id, true_lang, c FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
      ORDER BY score DESC, c ASC) AS rn
    FROM scored) WHERE rn = 1
)
SELECT true_lang, c AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred
GROUP BY true_lang, c
ORDER BY true_lang, pred_lang
"""

R7_QUERIES["nb_lang_classifier"] = (q_nb_lang_classifier, _QNB_SQL, False)


# --- spatial_areal_interp ---------------------------------------------------

def q_spatial_areal_interp(spark, sf_dir):
    """Areal interpolation (dasymetric reweighting): each source box's
    value (order count) is distributed onto a 10-degree analysis grid in
    proportion to overlap area — the standard GIS method for re-basing a
    measure from one zonal system onto another.  Axis-aligned overlap is
    closed-form (clamped rectangle intersection), so every contribution
    is exact arithmetic on both engines.  Scale shape: each box explodes
    only to the grid cells its envelope spans (bounded fan-out like the
    KDE kernel), then ONE cell-keyed sum — never a polygon-polygon join."""
    cust = load_table(spark, sf_dir, "customer")
    x0 = (F.col("c_custkey") % 340 - 170).cast("double")
    y0 = ((F.col("c_custkey") * 7) % 160 - 80).cast("double")
    w = (F.col("c_custkey") % 13 + 2).cast("double")
    h = (F.col("c_custkey") % 9 + 2).cast("double")
    val = (F.col("c_custkey") % 50 + 1).cast("double")
    boxes = cust.select(x0.alias("x0"), y0.alias("y0"),
                        (x0 + w).alias("x1"), (y0 + h).alias("y1"),
                        val.alias("v"))
    gx = F.explode(F.sequence(
        F.floor(F.col("x0") / 10).cast("int"),
        F.floor((F.col("x1") - F.lit(1e-9)) / 10).cast("int"))).alias("gx")
    b2 = boxes.select("x0", "y0", "x1", "y1", "v", gx)
    gy = F.explode(F.sequence(
        F.floor(F.col("y0") / 10).cast("int"),
        F.floor((F.col("y1") - F.lit(1e-9)) / 10).cast("int"))).alias("gy")
    b3 = b2.select("x0", "y0", "x1", "y1", "v", "gx", gy)
    ox = (F.least(F.col("x1"), (F.col("gx") + 1).cast("double") * 10.0)
          - F.greatest(F.col("x0"), F.col("gx").cast("double") * 10.0))
    oy = (F.least(F.col("y1"), (F.col("gy") + 1).cast("double") * 10.0)
          - F.greatest(F.col("y0"), F.col("gy").cast("double") * 10.0))
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    contrib = F.col("v") * (ox * oy) / area
    return (b3.select("gx", "gy", contrib.alias("c"))
            .groupBy("gx", "gy")
            .agg(F.count(F.lit(1)).alias("n_boxes"),
                 F.round(F.sum("c"), 6).alias("value"))
            .orderBy("gx", "gy"))


_QAREAL_SQL = """
WITH boxes AS (
  SELECT CAST(c_custkey % 340 - 170 AS DOUBLE) AS x0,
         CAST((c_custkey * 7) % 160 - 80 AS DOUBLE) AS y0,
         CAST(c_custkey % 340 - 170 AS DOUBLE)
           + CAST(c_custkey % 13 + 2 AS DOUBLE) AS x1,
         CAST((c_custkey * 7) % 160 - 80 AS DOUBLE)
           + CAST(c_custkey % 9 + 2 AS DOUBLE) AS y1,
         CAST(c_custkey % 50 + 1 AS DOUBLE) AS v
  FROM customer
), cells AS (
  SELECT b.x0, b.y0, b.x1, b.y1, b.v, gxs.gx, gys.gy
  FROM boxes b,
       LATERAL (SELECT unnest(range(
         CAST(floor(b.x0 / 10) AS INT),
         CAST(floor((b.x1 - 0.000000001) / 10) AS INT) + 1)) AS gx) gxs,
       LATERAL (SELECT unnest(range(
         CAST(floor(b.y0 / 10) AS INT),
         CAST(floor((b.y1 - 0.000000001) / 10) AS INT) + 1)) AS gy) gys
), contrib AS (
  SELECT gx, gy,
         v * ((least(x1, CAST(gx + 1 AS DOUBLE) * 10.0)
               - greatest(x0, CAST(gx AS DOUBLE) * 10.0))
              * (least(y1, CAST(gy + 1 AS DOUBLE) * 10.0)
                 - greatest(y0, CAST(gy AS DOUBLE) * 10.0)))
           / ((x1 - x0) * (y1 - y0)) AS c
  FROM cells
)
SELECT CAST(gx AS INT) AS gx, CAST(gy AS INT) AS gy,
       CAST(COUNT(*) AS BIGINT) AS n_boxes,
       ROUND(SUM(c), 6) + 0.0 AS value
FROM contrib
GROUP BY gx, gy
ORDER BY gx, gy
"""

R7_QUERIES["spatial_areal_interp"] = (
    q_spatial_areal_interp, _QAREAL_SQL, False)


# --- dq_profile_lineitem ----------------------------------------------------

def q_dq_profile_lineitem(spark, sf_dir):
    """Data-quality profile (the Deequ/expectation-suite shape): per
    numeric column of lineitem — row count, null count, exact distinct
    count, min/max/mean — computed in ONE pass (a single aggregation with
    per-column conditional aggregates; count-distincts expand to Spark's
    standard expand-aggregate, still one scan), then unpivoted to the
    one-row-per-column report a DQ gate consumes.  At 100 TB this is the
    profile job every ingest pipeline schedules; nothing here shuffles
    more than the aggregation's partial buffers."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.round(F.min(c), 6).alias(f"{c}__mn"),
            F.round(F.max(c), 6).alias(f"{c}__mx"),
            F.round(F.avg(c), 6).alias(f"{c}__av"),
        ]
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx, {c}__av" for c in cols)
    return (one.selectExpr(
        "n", f"stack({len(cols)}, {stack}) AS "
             "(col_name, n_null, n_distinct, min_v, max_v, avg_v)")
        .select("col_name", F.col("n").cast("long").alias("n"),
                F.col("n_null").cast("long").alias("n_null"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                "min_v", "max_v", "avg_v")
        .orderBy("col_name"))


def _dq_sql() -> str:
    parts = []
    for c in ("l_discount", "l_extendedprice", "l_quantity", "l_tax"):
        parts.append(f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       ROUND(MIN({c}), 6) + 0.0 AS min_v,
       ROUND(MAX({c}), 6) + 0.0 AS max_v,
       ROUND(AVG({c}), 6) + 0.0 AS avg_v
FROM lineitem""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


R7_QUERIES["dq_profile_lineitem"] = (q_dq_profile_lineitem, _dq_sql(), False)


# --- multimodal_resize ------------------------------------------------------

def q_multimodal_resize(spark, sf_dir):
    """Multimodal resize plumbing (multimodal.resize_images): deterministic
    synthetic payloads (16 md5 bytes of the text) 'resampled' to an 8x8
    byte grid through the real Arrow-batched mapInPandas boundary.  The
    fake codec cycles source bytes, so the resized payload is checked
    BYTE-FOR-BYTE: its hex equals the source md5 hex repeated — the oracle
    states that identity directly."""
    from ..pipeline import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    payloads = docs.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    out = mm.resize_images(payloads, "doc_id", "payload", width=8, height=8)
    return (out.select(F.col("id").alias("doc_id"), "width", "height",
                       "n_bytes",
                       F.substring(F.hex("payload"), 1, 24).alias("hex_prefix"))
            .orderBy("doc_id"))


_QRESIZE_SQL = """
SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CAST(64 AS BIGINT) AS n_bytes,
       substr(upper(md5(text) || md5(text)), 1, 24) AS hex_prefix
FROM documents WHERE doc_id < 100
ORDER BY doc_id
"""

R7_QUERIES["multimodal_resize"] = (q_multimodal_resize, _QRESIZE_SQL, False)
