"""Training-corpus quality / analytics inventory — round-5 extensions.

Nine declared queries over the driver tables, each with an exact DuckDB
oracle (FIXTURES.md conventions: total ORDER BY, ROUND on float outputs,
identical aliases both sides, BIGINT casts, integer-cents money sums so no
float summation-order term ever reaches the hash):

- corpus_top_bigrams     — corpus n-gram census (n-gram LM / boilerplate)
- quality_filter_funnel  — per-gate survivor counts of a quality pipeline
- token_len_histogram    — sequence-length planning histogram
- dedup_rate_by_source   — exact-dup rate per source (md5 distinct)
- customer_rfm           — RFM quartile segmentation (ntile windows)
- orders_monthly_growth  — month-over-month revenue growth (lag window)
- events_anomaly_zscore  — hourly-count anomalies per event type
- spatial_grid_density   — grid-cell point density (the spatial join's
                           binning step as a first-class census)
- embedding_norm_quantiles — L2-norm distribution per label

Scale notes: every aggregation is a single shuffle on a uniform key with
map-side partial aggregation; the ntile/lag windows partition on keys whose
group counts are bounded (months, event types) or hash-uniform (customers);
z-score moments are computed from exact BIGINT sums (S1, S2) so the window
carries three longs per group, not the raw series.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..pipeline import text
from ..pipeline.dedup import spread
from ..sources import load_table

from .sql_shared import STOP_SQL as _STOP_SQL, TOKS_SQL as _TOKS_SQL


# --- corpus_top_bigrams ----------------------------------------------------

def q_corpus_top_bigrams(spark, sf_dir):
    """Top-50 corpus word bigrams (pipeline.text.corpus_ngrams): narrow
    explode into ONE count shuffle (map-side combine), global top-k with a
    deterministic tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    return text.corpus_ngrams(spread(docs), "text", n=2, k=50)


_QBIGRAM_SQL = f"""
WITH toks AS (
  SELECT {_TOKS_SQL} AS tk FROM documents
), grams AS (
  SELECT array_to_string(list_slice(tk, i, i + 1), ' ') AS ngram
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 0) + 1)) AS i) t
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM grams GROUP BY ngram
ORDER BY n_occurrences DESC, ngram
LIMIT 50
"""


# --- quality_filter_funnel -------------------------------------------------

def q_quality_filter_funnel(spark, sf_dir):
    """Survivor counts of a 4-gate quality pipeline (length, token count,
    repetition, stopword ratio) — the one-row report a corpus-curation run
    emits per batch.  Per-doc stats come from one token-count shuffle
    (pipeline.text.top_token_share); the funnel itself is a single
    conditional aggregation, so the whole report is two jobs regardless of
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    share = text.top_token_share(docs, "doc_id", "text")
    per = (docs.join(share, "doc_id")
           .select((F.length("text") >= 200).alias("g1"),
                   (F.col("n_tokens") >= 30).alias("g2"),
                   (F.col("top_share") <= 0.12).alias("g3"),
                   (text.stopword_ratio(F.col("text")) <= 0.25).alias("g4")))
    cnt = F.count(F.lit(1))
    return per.agg(
        cnt.alias("n_total"),
        F.count_if(F.col("g1")).alias("n_len"),
        F.count_if(F.col("g1") & F.col("g2")).alias("n_len_tok"),
        F.count_if(F.col("g1") & F.col("g2") & F.col("g3")).alias("n_len_tok_rep"),
        F.count_if(F.col("g1") & F.col("g2") & F.col("g3") & F.col("g4"))
        .alias("n_pass"))


_QFUNNEL_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents
), cpt AS (
  SELECT doc_id, t, COUNT(*) AS c FROM tok WHERE t != '' GROUP BY doc_id, t
), share AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_share,
         CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM cpt GROUP BY doc_id
), gates AS (
  SELECT length(d.text) >= 200 AS g1,
         s.n_tokens >= 30 AS g2,
         s.top_share <= 0.12 AS g3,
         CAST(len(list_filter({_TOKS_SQL}, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
             / greatest(len({_TOKS_SQL}), 1) <= 0.25 AS g4
  FROM documents d JOIN share s USING (doc_id)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (g1) AS BIGINT) AS n_len,
       CAST(COUNT(*) FILTER (g1 AND g2) AS BIGINT) AS n_len_tok,
       CAST(COUNT(*) FILTER (g1 AND g2 AND g3) AS BIGINT) AS n_len_tok_rep,
       CAST(COUNT(*) FILTER (g1 AND g2 AND g3 AND g4) AS BIGINT) AS n_pass
FROM gates
"""


# --- token_len_histogram ---------------------------------------------------

def q_token_len_histogram(spark, sf_dir):
    """Document token-count histogram in width-16 bins — the
    sequence-length planning census for a training run (how much text fits
    a context window / how much padding a batch costs).  One integer-keyed
    count shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select((F.expr("size(split(lower(trim(text)), '\\\\s+')) div 16")
                         * 16).alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("bin"))


_QTOKHIST_SQL = f"""
SELECT len({_TOKS_SQL}) // 16 * 16 AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY bin ORDER BY bin
"""


# --- dedup_rate_by_source --------------------------------------------------

def q_dedup_rate_by_source(spark, sf_dir):
    """Exact-duplicate rate per source — the per-domain contamination
    report a dedup pass emits.  COUNT(DISTINCT md5) keeps the shuffle at
    hash width regardless of document size."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(F.md5("text")).alias("n_distinct"),
                 F.round(F.lit(1.0) - F.countDistinct(F.md5("text"))
                         / F.count(F.lit(1)).cast("double"), 6)
                 .alias("dup_rate"))
            .orderBy("source"))


_QDUPRATE_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
           AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


# --- customer_rfm ----------------------------------------------------------

def q_customer_rfm(spark, sf_dir):
    """RFM (recency / frequency / monetary) quartile segmentation of the
    customer base — count per (r, f, m) cell.  Money is summed as exact
    integer cents; the three ntile windows are each totally ordered (metric
    then custkey) so the quartile assignment is deterministic.  The windows
    run over the |customers|-row aggregate, not the raw orders."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("cents"))
    r = F.ntile(4).over(Window.orderBy(F.desc("last_order"), F.asc("o_custkey")))
    fq = F.ntile(4).over(Window.orderBy(F.desc("n_orders"), F.asc("o_custkey")))
    m = F.ntile(4).over(Window.orderBy(F.desc("cents"), F.asc("o_custkey")))
    return (per.select(r.alias("r_quartile"), fq.alias("f_quartile"),
                       m.alias("m_quartile"))
            .groupBy("r_quartile", "f_quartile", "m_quartile")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("r_quartile", "f_quartile", "m_quartile"))


_QRFM_SQL = """
WITH per AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         COUNT(*) AS n_orders,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
), q AS (
  SELECT CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS INT) AS r_quartile,
         CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS INT) AS f_quartile,
         CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS INT) AS m_quartile
  FROM per
)
SELECT r_quartile, f_quartile, m_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- orders_monthly_growth -------------------------------------------------

def q_orders_monthly_growth(spark, sf_dir):
    """Month-over-month revenue growth — monthly integer-cents totals (one
    shuffle on month), then a lag window over the tiny month series."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    monthly = (orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
               .agg(F.sum(cents).alias("_cents")))
    prev = F.lag("_cents").over(Window.orderBy("month"))
    return (monthly.select(
        "month",
        F.round(F.col("_cents") / 100.0, 2).alias("revenue"),
        F.round((F.col("_cents") - prev) / prev.cast("double"), 6)
        .alias("mom_growth"))
        .filter(F.col("mom_growth").isNotNull())   # first month has no MoM
        .orderBy("month"))


_QMOM_SQL = """
WITH monthly AS (
  -- DuckDB's month-granularity date_trunc yields DATE; lift to TIMESTAMP
  -- to match Spark's timestamp output
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS _cents
  FROM orders GROUP BY month
)
SELECT month, revenue, mom_growth FROM (
  SELECT month, ROUND(_cents / 100.0, 2) AS revenue,
         ROUND((_cents - lag(_cents) OVER (ORDER BY month))
               / CAST(lag(_cents) OVER (ORDER BY month) AS DOUBLE), 6)
             AS mom_growth
  FROM monthly) t
WHERE mom_growth IS NOT NULL
ORDER BY month
"""


# --- events_anomaly_zscore -------------------------------------------------

def q_events_anomaly_zscore(spark, sf_dir):
    """Hourly-count anomalies per event type: |z| >= 2 hours against the
    type's own hourly distribution.  The moments are exact BIGINT sums
    (S1, S2) so the per-type window carries three longs and the z-score
    arithmetic is bit-identical in both engines (no streaming-variance
    algorithm dependence)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("event_type")
    c = F.col("n_events")
    s1 = F.sum(c).over(w)
    s2 = F.sum(c * c).over(w)
    n = F.count(c).over(w)
    mu = s1.cast("double") / n
    var = s2.cast("double") / n - mu * mu
    z = (c.cast("double") - mu) / F.sqrt(var)
    return (hourly.withColumn("z", F.round(z, 6))
            .filter(F.abs(F.col("z")) >= 2.0)
            .select("event_type", "hour", "n_events", "z")
            .orderBy("event_type", "hour"))


_QZSCORE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, hour
), m AS (
  SELECT event_type, hour, n_events,
         SUM(n_events) OVER (PARTITION BY event_type) AS s1,
         SUM(n_events * n_events) OVER (PARTITION BY event_type) AS s2,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
)
SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events,
       ROUND((n_events - CAST(s1 AS DOUBLE) / n)
             / sqrt(CAST(s2 AS DOUBLE) / n
                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 6)
           AS z
FROM m
WHERE abs((n_events - CAST(s1 AS DOUBLE) / n)
          / sqrt(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))) >= 2.0
ORDER BY event_type, hour
"""


# --- spatial_grid_density --------------------------------------------------

def q_spatial_grid_density(spark, sf_dir):
    """Point density per 15°×15° grid cell over the customer points — the
    binning step of the distributed spatial join surfaced as a census
    (cell sizes are what its replication-cap planner reasons about).
    Integer-derived coordinates, so the cell assignment is exact."""
    cust = load_table(spark, sf_dir, "customer")
    x = (F.col("c_custkey") % 360 - 180).cast("double")
    y = ((F.col("c_custkey") * 7) % 180 - 90).cast("double")
    return (cust.select(F.floor(x / 15).cast("int").alias("cell_x"),
                        F.floor(y / 15).cast("int").alias("cell_y"))
            .groupBy("cell_x", "cell_y")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .orderBy(F.desc("n_points"), "cell_x", "cell_y")
            .limit(25))


_QGRID_SQL = """
SELECT CAST(floor(CAST(c_custkey % 360 - 180 AS DOUBLE) / 15) AS INT) AS cell_x,
       CAST(floor(CAST((c_custkey * 7) % 180 - 90 AS DOUBLE) / 15) AS INT) AS cell_y,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM customer GROUP BY cell_x, cell_y
ORDER BY n_points DESC, cell_x, cell_y
LIMIT 25
"""


# --- embedding_norm_quantiles ----------------------------------------------

def q_embedding_norm_quantiles(spark, sf_dir):
    """L2-norm distribution per label — the embedding-health check before
    similarity search (unnormalized vectors poison cosine buckets).  The
    norm is a sequential left fold (same order as DuckDB's list_sum), and
    the per-row norm is rounded before the min/median/max so no final-ulp
    term reaches the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.round(F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"))), 9)
    per = emb.select("label", norm.alias("_norm"))
    return (per.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.min("_norm"), 6).alias("min_norm"),
                 F.round(F.expr("percentile(_norm, 0.5)"), 6).alias("median_norm"),
                 F.round(F.max("_norm"), 6).alias("max_norm"))
            .orderBy("label"))


_QNORMQ_SQL = """
WITH per AS (
  SELECT label,
         ROUND(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9) AS _norm
  FROM embeddings
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(MIN(_norm), 6) AS min_norm,
       ROUND(quantile_cont(_norm, 0.5), 6) AS median_norm,
       ROUND(MAX(_norm), 6) AS max_norm
FROM per GROUP BY label ORDER BY label
"""


# --- incremental_dedup_ingest ----------------------------------------------

def q_incremental_dedup_ingest(spark, sf_dir):
    """Daily-ingest dedup (pipeline.incremental.dedup_ingest): odd doc_ids
    play the incoming batch, even doc_ids the existing corpus; survivors
    are incoming docs passing both the exact md5 gate and the banded
    MinHash near-dup gate.  Key-only anti/semi joins — the text never
    shuffles."""
    from ..pipeline.incremental import dedup_ingest

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    return (dedup_ingest(existing, incoming, "doc_id", "text",
                         num_hashes=8, bands=4)
            .select("doc_id").orderBy("doc_id"))


def _ingest_sql() -> str:
    from .sql_shared import mh_sig_cte
    return mh_sig_cte("") + """
, banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(format('{}:{}', seed, minhash), ','
             ORDER BY format('{}:{}', seed, minhash))) AS band_hash
  FROM sig GROUP BY doc_id, CAST(seed // 2 AS INT)
), exact_dup AS (
  SELECT DISTINCT i.doc_id
  FROM documents i JOIN documents e
    ON i.doc_id % 2 = 1 AND e.doc_id % 2 = 0 AND md5(i.text) = md5(e.text)
), near_dup AS (
  SELECT DISTINCT i.doc_id
  FROM banded i JOIN banded e
    ON i.doc_id % 2 = 1 AND e.doc_id % 2 = 0
   AND i.band = e.band AND i.band_hash = e.band_hash
)
SELECT doc_id FROM documents
WHERE doc_id % 2 = 1
  AND doc_id NOT IN (SELECT doc_id FROM exact_dup)
  AND doc_id NOT IN (SELECT doc_id FROM near_dup)
ORDER BY doc_id
"""


# --- ann_recall_eval ---------------------------------------------------------

def q_ann_recall_eval(spark, sf_dir):
    """Recall@5 of the hyperplane-LSH index against the exact cosine top-5
    (pipeline.similarity.recall_at_k) — the evaluation every ANN deployment
    runs before trading the brute-force scan for buckets."""
    from ..pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(queries, emb, k=5)
    approx = similarity.lsh_topk(queries, emb, k=5, num_planes=4)
    return (similarity.recall_at_k(approx, exact, k=5)
            .orderBy("query_id"))


def _ann_recall_sql(k: int = 5, num_planes: int = 4, dim: int = 64) -> str:
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
), exact AS (
  SELECT query_id, data_id FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS data_id,
           CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
                list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                d.vec_id ASC) AS INT) AS rank
    FROM (SELECT * FROM embeddings WHERE vec_id < 5) q, embeddings d) t
  WHERE rank <= {k}
), approx AS (
  SELECT query_id, data_id FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS data_id,
           CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY
                list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                d.vec_id ASC) AS INT) AS rank
    FROM (SELECT * FROM b WHERE vec_id < 5) q JOIN b d ON d.bucket = q.bucket) t
  WHERE rank <= {k}
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


# --- doc_perplexity_proxy ----------------------------------------------------

def q_doc_perplexity_proxy(spark, sf_dir):
    """Unigram-LM cross-entropy per document (nats) — the perplexity proxy
    a quality filter uses when no neural scorer is in the loop.  The LM is
    the corpus's own unigram distribution: one vocab-keyed count shuffle,
    a token↔vocab join, and a per-doc aggregation; the corpus total rides
    in via a broadcast single-row crossJoin (never a driver collect)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (spread(docs).select("doc_id",
                               F.explode(text.tokens(F.col("text"))).alias("_t"))
           .filter(F.col("_t") != ""))
    freq = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    total = freq.agg(F.sum("_c").alias("_n"))
    return (tok.join(freq, "_t")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(-F.avg(F.log(F.col("_c") / F.col("_n"))), 6)
                 .alias("cross_entropy"))
            .orderBy("doc_id"))


_QPPL_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents
), tk AS (
  SELECT doc_id, t FROM tok WHERE t != ''
), freq AS (
  SELECT t, COUNT(*) AS c FROM tk GROUP BY t
), total AS (
  SELECT SUM(c) AS n FROM freq
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-AVG(ln(CAST(c AS DOUBLE) / n)), 6) AS cross_entropy
FROM tk JOIN freq USING (t) CROSS JOIN total
GROUP BY doc_id ORDER BY doc_id
"""


# --- doc_langid_confusion ----------------------------------------------------

def q_doc_langid_confusion(spark, sf_dir):
    """Confusion matrix of the n-gram lang-id heuristic against the
    labeled ``lang`` column — the classifier-evaluation report (the
    documents table carries ground truth, so the detector is checkable)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(F.col("lang").alias("labeled_lang"),
                        text.lang_id(F.col("text")).alias("detected_lang"))
            .groupBy("labeled_lang", "detected_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("labeled_lang", "detected_lang"))


def _langid_confusion_sql() -> str:
    scores = {}
    for lang, lex in text.LANG_LEXICONS.items():
        arr = "['" + "','".join(lex) + "']"
        scores[lang] = (f"len(list_filter({_TOKS_SQL},"
                        f" t -> list_contains({arr}, t)))")
    mx = "greatest(" + ", ".join(scores.values()) + ")"
    case = f"CASE WHEN {mx} <= 0 THEN 'und'"
    for lang in sorted(scores):
        case += f" WHEN {scores[lang]} = {mx} THEN '{lang}'"
    case += " END"
    return f"""
SELECT lang AS labeled_lang, {case} AS detected_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY labeled_lang, detected_lang
ORDER BY labeled_lang, detected_lang
"""


# --- corpus_vocab_stats ------------------------------------------------------

def q_corpus_vocab_stats(spark, sf_dir):
    """Corpus vocabulary census: token/type counts, type-token ratio,
    hapax legomena — the Zipf-health numbers a corpus report leads with.
    One vocab-keyed count shuffle, then an aggregation over the vocab."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (spread(docs)
           .select(F.explode(text.tokens(F.col("text"))).alias("_t"))
           .filter(F.col("_t") != ""))
    freq = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    return freq.agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("_c").cast("double"), 6)
        .alias("type_token_ratio"),
        F.count_if(F.col("_c") == 1).alias("n_hapax"),
        F.round(F.count_if(F.col("_c") == 1)
                / F.count(F.lit(1)).cast("double"), 6).alias("hapax_share"))


_QVOCAB_SQL = f"""
WITH tok AS (
  SELECT unnest({_TOKS_SQL}) AS t FROM documents
), freq AS (
  SELECT t, COUNT(*) AS c FROM tok WHERE t != '' GROUP BY t
)
SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio,
       CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) FILTER (c = 1) AS DOUBLE) / COUNT(*), 6)
           AS hapax_share
FROM freq
"""


QUALITY_QUERIES = {
    "corpus_top_bigrams": (q_corpus_top_bigrams, _QBIGRAM_SQL, False),
    "quality_filter_funnel": (q_quality_filter_funnel, _QFUNNEL_SQL, False),
    "token_len_histogram": (q_token_len_histogram, _QTOKHIST_SQL, False),
    "dedup_rate_by_source": (q_dedup_rate_by_source, _QDUPRATE_SQL, False),
    "customer_rfm": (q_customer_rfm, _QRFM_SQL, False),
    "orders_monthly_growth": (q_orders_monthly_growth, _QMOM_SQL, False),
    "events_anomaly_zscore": (q_events_anomaly_zscore, _QZSCORE_SQL, False),
    "spatial_grid_density": (q_spatial_grid_density, _QGRID_SQL, False),
    "embedding_norm_quantiles": (q_embedding_norm_quantiles, _QNORMQ_SQL, False),
    "incremental_dedup_ingest": (q_incremental_dedup_ingest, _ingest_sql(), False),
    "ann_recall_eval": (q_ann_recall_eval, _ann_recall_sql(), False),
    "doc_perplexity_proxy": (q_doc_perplexity_proxy, _QPPL_SQL, False),
    "doc_langid_confusion": (q_doc_langid_confusion, _langid_confusion_sql(), False),
    "corpus_vocab_stats": (q_corpus_vocab_stats, _QVOCAB_SQL, False),
}
