"""Round-6 operator inventory.  Each declared query has an exact DuckDB
oracle (FIXTURES.md conventions: total ORDER BY, ROUND on float outputs,
identical aliases both sides, BIGINT casts).

- doc_ngram_repetition      — Gopher-style duplicate-bigram fraction per
                              doc (within-doc boilerplate that cross-doc
                              dedup cannot see)
- training_shard_packing    — token-budget shard manifest via the
                              two-level scan (no single-partition global
                              window)
- pq_ann_topk               — product-quantization ADC top-k with a
                              deterministic codebook (m code bytes per
                              vector; per-query LUT built before the
                              broadcast join)
- bpe_pair_counts           — BPE merge-candidate counts over the
                              VOCABULARY, weighted by word frequency
- doc_bigram_lm_ppl         — CCNet-style add-k bigram-LM cross-entropy
                              quality score
- spatial_split_boxes       — polygon ST_Split with arithmetic-mirrored
                              piece areas (face walk value-checked per row)
- spatial_buildarea_donuts  — ST_BuildArea hole nesting value-checked per
                              row the same way
- minhash_calibration_curve — estimated-vs-exact Jaccard per estimator
                              value over the LSH candidate set (the
                              banding-threshold table)
- cms_user_event_counts     — count-min frequency estimates vs truth
                              (deterministic cells, collisions included)
- streaming_cms_cells       — the same sketch maintained by a real
                              availableNow stream (state = the sketch,
                              bounded at depth x width rows)

Scale notes: repetition is two map-side-combinable aggregations and
nothing else; shard packing's only single-partition window runs over the
|buckets|-row totals table (tiny by construction); PQ encodes the corpus
in one narrow codegen pass and scores candidates with m array lookups per
pair instead of a dim-wide dot product; the LM/BPE aggregations shuffle
vocab-sized tables, never the token stream; the sketch queries shuffle at
most depth x width cells.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..pipeline import similarity, text
from ..sources import load_table

from .sql_shared import TOKS_SQL as _TOKS_SQL


# --- doc_ngram_repetition ---------------------------------------------------

def q_doc_ngram_repetition(spark, sf_dir):
    """Per-doc duplicate-bigram fraction (text.ngram_repetition) — the
    Gopher repetition filter signal, full corpus, total order."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.ngram_repetition(docs, "doc_id", "text", n=2)
    return (out.select("doc_id", "n_grams", "n_distinct",
                       F.round("dup_fraction", 6).alias("dup_fraction"))
            .orderBy("doc_id"))


# token_shingles(n=2): indices 1..greatest(len-1, 1), shingle = the
# (clamped) 2-token slice joined by one space — mirrored exactly
_QREP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), grams AS (
  SELECT doc_id, array_to_string(list_slice(tk, i, i + 1), ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 1) + 1)) AS i) t
), per AS (
  SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND((SUM(c) - COUNT(*)) / CAST(SUM(c) AS DOUBLE), 6) AS dup_fraction
FROM per
GROUP BY doc_id
ORDER BY doc_id
"""


# --- training_shard_packing -------------------------------------------------

def q_training_shard_packing(spark, sf_dir):
    """Token-budget shard manifest (text.shard_packing, 2000 tokens/shard,
    256-doc scan buckets)."""
    docs = load_table(spark, sf_dir, "documents")
    out = text.shard_packing(docs, "doc_id", "text",
                             budget_tokens=2000, chunk=256)
    return out.orderBy("shard_id")


_QSHARD_SQL = f"""
WITH tok AS (
  SELECT doc_id, len({_TOKS_SQL}) AS nt FROM documents
), cum AS (
  SELECT doc_id, nt,
         COALESCE(SUM(nt) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM tok
)
SELECT CAST(FLOOR(before / 2000.0) AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS shard_tokens,
       MIN(doc_id) AS first_id,
       MAX(doc_id) AS last_id
FROM cum
GROUP BY 1
ORDER BY shard_id
"""


# --- pq_ann_topk ------------------------------------------------------------

def q_pq_ann_topk(spark, sf_dir):
    """PQ asymmetric-distance ANN (similarity.pq_adc_topk): 4 sub-spaces x
    16 dims, 8 codes each, DETERMINISTIC codebook = sub-vectors of the 8
    smallest vec_ids — so encoding, the per-query LUT, and the ADC ranking
    are all reproducible in SQL and the oracle checks values.  (As with
    ivf_ann_topk, a trained codebook only shifts recall; the encode/LUT/
    scoring machinery is identical.)  Sub-distances fold left over the
    same doubles in both engines; the oracle fixes its ADC summation order
    to sub-space order to match."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (emb.select("vec_id", "embedding")
            .orderBy("vec_id").limit(8).collect())
    m, sub = 4, 16
    codebooks = [[[float(v) for v in r["embedding"][s * sub:(s + 1) * sub]]
                  for r in rows] for s in range(m)]
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.pq_adc_topk(queries, emb, k=5, codebooks=codebooks)
    return (out.select("query_id", "data_id",
                       F.round("adc_dist", 6).alias("adc_dist"), "rank")
            .orderBy("query_id", "rank"))


_QPQ_SQL = """
WITH cb AS (
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
)
SELECT query_id, data_id, ROUND(adc_dist, 6) AS adc_dist, rank
FROM (
  SELECT query_id, data_id, adc_dist,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adc_dist ASC, data_id ASC) AS INT) AS rank
  FROM adc) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


R6_QUERIES = {
    "doc_ngram_repetition": (q_doc_ngram_repetition, _QREP_SQL, False),
    "training_shard_packing": (q_training_shard_packing, _QSHARD_SQL, False),
    "pq_ann_topk": (q_pq_ann_topk, _QPQ_SQL, False),
}


# --- bpe_pair_counts --------------------------------------------------------

def q_bpe_pair_counts(spark, sf_dir):
    """Top-20 BPE merge candidates over the corpus (text.bpe_pair_counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return (text.bpe_pair_counts(docs, "text", top_k=20)
            .select("pair", "n", "rank").orderBy("rank"))


_QBPE_SQL = f"""
WITH vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
  FROM (SELECT unnest({_TOKS_SQL}) AS w FROM documents)
  WHERE len(w) >= 2
  GROUP BY w
), pairs AS (
  SELECT substr(w, i, 2) AS pair, wf
  FROM vocab, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
)
SELECT pair, CAST(SUM(wf) AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY SUM(wf) DESC, pair ASC) AS INT) AS rank
FROM pairs
GROUP BY pair
ORDER BY rank
LIMIT 20
"""

R6_QUERIES["bpe_pair_counts"] = (q_bpe_pair_counts, _QBPE_SQL, False)


# --- doc_bigram_lm_ppl ------------------------------------------------------

def q_doc_bigram_lm_ppl(spark, sf_dir):
    """Per-document cross-entropy under an add-k-smoothed BIGRAM language
    model trained on the corpus itself (k = 0.5) — the CCNet-style LM
    quality filter, one step up from the unigram proxy: template/boiler-
    plate docs score low, token-salad docs score high.

    Scale shape: the bigram-count and head-count tables are vocab²-/vocab-
    keyed aggregations with map-side combine; the doc-bigram stream joins
    them co-partitioned on the same keys; the vocabulary size rides in as
    a broadcast single-row crossJoin (never a driver collect)."""
    from ..pipeline.dedup import spread

    docs = load_table(spark, sf_dir, "documents")
    tokd = (spread(docs)
            .select("doc_id", text.tokens(F.col("text")).alias("_toks"))
            .filter(F.size("_toks") >= 2))
    idx = F.explode(F.sequence(F.lit(0), F.size("_toks") - 2))
    big = (tokd.select("doc_id", idx.alias("_i"), "_toks")
           .select("doc_id",
                   F.get("_toks", F.col("_i")).alias("w1"),
                   F.get("_toks", F.col("_i") + 1).alias("w2")))
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    ucnt = big.groupBy("w1").agg(F.count(F.lit(1)).alias("uc"))
    vocab = (big.select(F.col("w1").alias("w"))
             .union(big.select(F.col("w2").alias("w")))
             .agg(F.count_distinct("w").alias("v")))
    nll = -F.log((F.col("bc") + 0.5) / (F.col("uc") + 0.5 * F.col("v")))
    return (big.join(bcnt, ["w1", "w2"]).join(ucnt, "w1")
            .crossJoin(F.broadcast(vocab))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(nll), 6).alias("cross_entropy"))
            .orderBy("doc_id"))


_QBLM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
), big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) t
  WHERE len(tk) >= 2
), bcnt AS (
  SELECT w1, w2, COUNT(*) AS bc FROM big GROUP BY w1, w2
), ucnt AS (
  SELECT w1, COUNT(*) AS uc FROM big GROUP BY w1
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT w1 AS w FROM big UNION ALL SELECT w2 AS w FROM big)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-ln((bc + 0.5) / (uc + 0.5 * v))), 6) AS cross_entropy
FROM big JOIN bcnt USING (w1, w2) JOIN ucnt USING (w1) CROSS JOIN vocab
GROUP BY doc_id
ORDER BY doc_id
"""

R6_QUERIES["doc_bigram_lm_ppl"] = (q_doc_bigram_lm_ppl, _QBLM_SQL, False)


# --- spatial_split_boxes ----------------------------------------------------

def q_spatial_split_boxes(spark, sf_dir):
    """Polygon ST_Split end-to-end with a VALUE-checked oracle: each nation
    box (14 x 180 degrees) is split by a meridian at a per-key fraction
    ((k % 7 + 1)/8 of the width), so the two piece areas are pure
    arithmetic the plain-SQL oracle reproduces — the planar-arrangement
    face walk is checked on every row, not just in unit tests."""
    from ..functions import api as ST

    nation = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    xmin = (k * 14 - 180).cast("double")
    w = ((k % 7) + 1).cast("double") * F.lit(14.0) / F.lit(8.0)
    boxes = ST.with_box_geometry(
        nation.select("n_nationkey"),
        xmin, F.lit(-90.0), (k * 14 - 166).cast("double"), F.lit(90.0))
    bx = F.col("_bx").cast("string")
    split = (boxes
             .withColumn("_bx", (xmin + w))
             .withColumn("_blade", F.concat(
                 F.lit("LINESTRING ("), bx, F.lit(" -91, "),
                 bx, F.lit(" 91)")))
             .withColumn("_parts", F.expr(
                 "ST_Split(geo, ST_GeomFromText(_blade))")))
    a0 = F.expr("ST_Area(ST_GeometryN(_parts, 0))")
    a1 = F.expr("ST_Area(ST_GeometryN(_parts, 1))")
    return (split.select(
        "n_nationkey",
        F.expr("ST_NumGeometries(_parts)").alias("n_parts"),
        F.round(F.least(a0, a1), 6).alias("min_part_area"),
        F.round(a0 + a1, 6).alias("total_area"))
        .orderBy("n_nationkey"))


_QSPLITBOX_SQL = """
SELECT n_nationkey,
       2 AS n_parts,
       ROUND(LEAST(w, 14.0 - w) * 180.0, 6) AS min_part_area,
       ROUND(CAST(2520.0 AS DOUBLE), 6) + 0.0 AS total_area
FROM (SELECT n_nationkey,
             CAST((n_nationkey % 7) + 1 AS DOUBLE) * 14.0 / 8.0 AS w
      FROM nation)
ORDER BY n_nationkey
"""

R6_QUERIES["spatial_split_boxes"] = (q_spatial_split_boxes, _QSPLITBOX_SQL, False)


# --- spatial_buildarea_donuts -----------------------------------------------

def q_spatial_buildarea_donuts(spark, sf_dir):
    """ST_BuildArea end-to-end with a VALUE-checked oracle: per nation, a
    multilinestring of two concentric box boundaries (outer 14 x 180, hole
    inset by a per-key margin m = (k % 5 + 1) degrees) assembles into a
    polygon-with-hole whose area = 2520 - hole area — pure arithmetic the
    plain-SQL oracle reproduces, so the half-edge face assembly and
    odd-even nesting are checked on every row."""
    nation = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    x0 = (k * 14 - 180).cast("double")
    m = ((k % 5) + 1).cast("double")

    def s(c):
        return c.cast("string")

    ring = lambda xa, ya, xb, yb: F.concat(  # noqa: E731
        F.lit("("), s(xa), F.lit(" "), s(ya), F.lit(", "),
        s(xb), F.lit(" "), s(ya), F.lit(", "),
        s(xb), F.lit(" "), s(yb), F.lit(", "),
        s(xa), F.lit(" "), s(yb), F.lit(", "),
        s(xa), F.lit(" "), s(ya), F.lit(")"))
    wkt = F.concat(F.lit("MULTILINESTRING ("),
                   ring(x0, F.lit(-90.0), x0 + 14.0, F.lit(90.0)),
                   F.lit(", "),
                   ring(x0 + m, -90.0 + m * 10, x0 + 14.0 - m,
                        90.0 - m * 10),
                   F.lit(")"))
    built = (nation.select("n_nationkey")
             .withColumn("_wkt", wkt)
             .withColumn("_poly", F.expr(
                 "ST_BuildArea(ST_GeomFromText(_wkt))")))
    return (built.select(
        "n_nationkey",
        F.expr("ST_NumInteriorRings(_poly)").alias("n_holes"),
        F.round(F.expr("ST_Area(_poly)"), 6).alias("area"))
        .orderBy("n_nationkey"))


_QBUILDAREA_SQL = """
SELECT n_nationkey,
       1 AS n_holes,
       ROUND(2520.0 - (14.0 - 2 * m) * (180.0 - 20 * m), 6) AS area
FROM (SELECT n_nationkey, CAST((n_nationkey % 5) + 1 AS DOUBLE) AS m
      FROM nation)
ORDER BY n_nationkey
"""

R6_QUERIES["spatial_buildarea_donuts"] = (
    q_spatial_buildarea_donuts, _QBUILDAREA_SQL, False)


# --- minhash_calibration_curve ----------------------------------------------

def q_minhash_calibration_curve(spark, sf_dir):
    """Estimated-vs-exact Jaccard calibration for the LSH candidate set:
    per estimator value (fraction of agreeing MinHash seeds, 8 seeds →
    ninths of 1/8), the count of candidate pairs and the avg/min/max of
    their EXACT Jaccard — the table a dedup operator reads to pick a
    banding threshold at corpus scale.  Candidates with no shared shingle
    (pure banding hash luck) score exact 0 via the left join."""
    from ..pipeline import dedup as D
    from .sql_shared import LSH_MAX_BUCKET

    docs = load_table(spark, sf_dir, "documents")
    est = D.minhash_estimate_pairs(docs, "doc_id", "text", num_hashes=8,
                                   bands=4, max_bucket=LSH_MAX_BUCKET)
    # The exact side only annotates the (small) candidate set — semi-join
    # the corpus down to candidate docs BEFORE the posting groupBy, so the
    # exact-Jaccard pipeline runs at |candidates| scale, never generating
    # corpus-wide pairs (at 100 TB the uncapped posting explode is
    # quadratic in stop-shingle bucket size — the scale-killer
    # jaccard_pairs' own docstring warns about).  est is persisted because
    # it is consumed twice (candidate ids + the left join).
    est = est.persist()
    cand_ids = (est.select(F.col("id_a").alias("doc_id"))
                .unionByName(est.select(F.col("id_b").alias("doc_id")))
                .distinct())
    docs_cand = docs.join(cand_ids, "doc_id", "left_semi")
    exact = D.jaccard_pairs(docs_cand, "doc_id", "text", shingle_n=3,
                            threshold=0.0)
    joined = (est.join(exact, ["id_a", "id_b"], "left")
              .withColumn("_ex", F.coalesce("jaccard", F.lit(0.0))))
    return (joined.groupBy(F.round("jaccard_est", 6).alias("jaccard_est"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.avg("_ex"), 6).alias("avg_exact"),
                 F.round(F.min("_ex"), 6).alias("min_exact"),
                 F.round(F.max("_ex"), 6).alias("max_exact"))
            .orderBy("jaccard_est"))


def _mh_calibration_sql() -> str:
    from .sql_shared import lsh_pairs_cte, mh_sig_cte

    agree = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(8))
    return mh_sig_cte("") + lsh_pairs_cte() + f"""
, est AS (
  SELECT p.id_a, p.id_b,
         ROUND(CAST({agree} AS DOUBLE) / 8.0, 6) AS jaccard_est
  FROM pairs p
  JOIN sigw a ON a.doc_id = p.id_a
  JOIN sigw b ON b.doc_id = p.id_b
), cand AS (
  SELECT id_a AS doc_id FROM pairs UNION SELECT id_b FROM pairs
), toksx AS (
  -- mirror of the Spark-side semi-join: exact Jaccard only over docs in
  -- the candidate set (restricting the corpus does not change a pair's
  -- shared shingles or either doc's full shingle-set size)
  SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
  WHERE doc_id IN (SELECT doc_id FROM cand)
), shing AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 2), ' ') AS shingle
  FROM toksx, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i) t
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM shing GROUP BY doc_id
), com AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM shing a JOIN shing b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), ex AS (
  SELECT id_a, id_b,
         CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS exact_j
  FROM com
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT jaccard_est, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(COALESCE(exact_j, 0)), 6) AS avg_exact,
       ROUND(MIN(COALESCE(exact_j, 0)), 6) AS min_exact,
       ROUND(MAX(COALESCE(exact_j, 0)), 6) AS max_exact
FROM est LEFT JOIN ex USING (id_a, id_b)
GROUP BY jaccard_est
ORDER BY jaccard_est
"""


R6_QUERIES["minhash_calibration_curve"] = (
    q_minhash_calibration_curve, _mh_calibration_sql(), False)


# --- cms_user_event_counts --------------------------------------------------

def q_cms_user_event_counts(spark, sf_dir):
    """Count-min-sketch frequency estimates for users 0-49 from a 4 x 256
    sketch over the whole event stream, next to the true counts — the
    overestimate is collision inflation, deterministic and value-checked
    cell by cell (sketch.cms_cells / cms_estimate)."""
    from ..pipeline import sketch as SK

    events = load_table(spark, sf_dir, "events")
    cells = SK.cms_cells(events, "user_id", width=256, depth=4)
    probe = (events.filter(F.col("user_id") < 50)
             .select("user_id").distinct())
    est = SK.cms_estimate(cells, probe, "user_id", width=256, depth=4)
    truth = (events.filter(F.col("user_id") < 50)
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count")))
    return (est.join(truth, "user_id")
            .select("user_id", "est_count", "true_count")
            .orderBy("user_id"))


_QCMS_SQL = """
WITH ks AS (
  SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events
), rows_ AS (
  SELECT unnest(range(0, 4)) AS r
), cell AS (
  SELECT r.r,
         ('0x' || substr(md5(ks.k || '#cms' || CAST(r.r AS VARCHAR)), 1, 15))::BIGINT % 256 AS c,
         COUNT(*) AS cnt
  FROM ks CROSS JOIN rows_ r
  GROUP BY 1, 2
), probe AS (
  SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS k
  FROM events WHERE user_id < 50
), pc AS (
  SELECT p.user_id, r.r,
         ('0x' || substr(md5(p.k || '#cms' || CAST(r.r AS VARCHAR)), 1, 15))::BIGINT % 256 AS c
  FROM probe p CROSS JOIN rows_ r
), est AS (
  -- LEFT + COALESCE 0: canonical CMS min over ALL depth cells (empty
  -- cell => estimate 0); identical to the engine's cms_estimate
  SELECT user_id, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS est_count
  FROM pc LEFT JOIN cell USING (r, c)
  GROUP BY user_id
)
SELECT e.user_id, e.est_count, CAST(t.cnt AS BIGINT) AS true_count
FROM est e
JOIN (SELECT user_id, COUNT(*) AS cnt FROM events
      WHERE user_id < 50 GROUP BY user_id) t USING (user_id)
ORDER BY user_id
"""

R6_QUERIES["cms_user_event_counts"] = (
    q_cms_user_event_counts, _QCMS_SQL, False)


# --- streaming_cms_cells ----------------------------------------------------

def q_streaming_cms_cells(spark, sf_dir):
    """Count-min sketch maintained BY A STREAM: the cell table is a
    streaming groupBy aggregation in complete mode (cell-wise counts are
    mergeable, so state = the sketch itself, bounded at depth x width
    rows regardless of stream length).  availableNow over the events
    table; the final cell table equals the batch sketch, so the oracle is
    exact.  Returns the top 40 heaviest cells (stable tie-break) — the
    heavy-hitter fingerprint a monitoring job would alert on."""
    import tempfile

    from ..pipeline import sketch as SK
    from ..sources import stream_table

    stream = stream_table(spark, sf_dir, "events")
    cells = SK.cms_cells(stream, "user_id", width=256, depth=4)
    name = "q_stream_cms_sink"
    q = (cells.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
         .trigger(availableNow=True).start())
    from ..streaming import drain as _drain
    _drain(q)  # raises on timeout — a partial sketch must not be read
    return spark.sql(
        f"SELECT r, c, cnt FROM {name} "
        f"ORDER BY cnt DESC, r ASC, c ASC LIMIT 40")


_QSTREAM_CMS_SQL = """
WITH ks AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
), rows_ AS (
  SELECT unnest(range(0, 4)) AS r
), cell AS (
  SELECT r.r,
         ('0x' || substr(md5(ks.k || '#cms' || CAST(r.r AS VARCHAR)), 1, 15))::BIGINT % 256 AS c,
         COUNT(*) AS cnt
  FROM ks CROSS JOIN rows_ r
  GROUP BY 1, 2
)
SELECT CAST(r AS INT) AS r, CAST(c AS BIGINT) AS c, CAST(cnt AS BIGINT) AS cnt
FROM cell
ORDER BY cnt DESC, r ASC, c ASC
LIMIT 40
"""

R6_QUERIES["streaming_cms_cells"] = (
    q_streaming_cms_cells, _QSTREAM_CMS_SQL, False)
