"""Shared DuckDB-oracle SQL fragments — leaf module so every query
inventory (queries.py, queries_quality.py) can import them without a
load-order cycle.  Each fragment is the exact SQL mirror of a Spark-side
operator; keeping them single-sourced is what keeps the oracles and the
plans in lock-step.
"""

from __future__ import annotations

from ..pipeline import dedup, text

#: whitespace tokenization, lowercased — mirror of pipeline.text.tokens
TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"

#: stopword list literal — mirror of pipeline.text._STOPWORDS
STOP_SQL = "['" + "','".join(text._STOPWORDS) + "']"

#: Bucket-size cap used by every declared LSH query — mirrored between the
#: Spark plan (window-count filter before collect_list, dedup.py) and the
#: oracle SQL (window COUNT(*) OVER the bucket key).  64 never binds on the
#: driver testdata (max observed bucket: 12 at sf0.1) but bounds the
#: pathological mega-bucket at scale.
LSH_MAX_BUCKET = 64


def mh_mix_sql(i: int) -> str:
    """DuckDB mirror of dedup._mix60 for seed i (same constants)."""
    c, r = dedup.minhash_mix_params(i + 1)[i]
    low = (1 << (60 - r)) - 1
    return f"xor(((h & {low}) * {1 << r}) + (h >> {60 - r}), {c})"


def mh_sig_cte(where: str) -> str:
    """Shingle → one md5 per shingle → 8 per-seed mins (wide)."""
    mins = ", ".join(f"MIN({mh_mix_sql(i)}) AS m{i}" for i in range(8))
    return f"""
WITH toks AS (
  SELECT doc_id, {TOKS_SQL} AS tk FROM documents {where}
), shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i, i + 2), ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS i) t
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle || '#mh'), 1, 15))::BIGINT AS h
  FROM shingles
), sigw AS (
  SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
), sig AS (
  {" UNION ALL ".join(f"SELECT doc_id, {i} AS seed, m{i} AS minhash FROM sigw"
                      for i in range(8))}
)"""


def lsh_pairs_cte(max_bucket: int = LSH_MAX_BUCKET,
                  num_hashes: int = 8, bands: int = 4) -> str:
    """banded → capped → pairs CTEs shared by every MinHash-LSH oracle —
    identical semantics to dedup._capped_bucket_pairs: all rows of a bucket
    over the cap are removed BEFORE pair generation.  Buckets are keyed by
    the band's RAW signature rows (bk_*), mirroring dedup.minhash_banded —
    no band hash on either engine, so no portable-hash contract to keep."""
    rows = num_hashes // bands
    keys = ", ".join(f"bk_{j}" for j in range(rows))
    on = " AND ".join(["a.band = b.band"]
                      + [f"a.bk_{j} = b.bk_{j}" for j in range(rows)])
    banded = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {cols} FROM sigw".format(
            b=b, cols=", ".join(f"m{b * rows + j} AS bk_{j}"
                                for j in range(rows)))
        for b in range(bands))
    return f"""
, banded AS (
  {banded}
), capped AS (
  SELECT doc_id, band, {keys} FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, {keys}) AS _n FROM banded) s
  WHERE _n <= {max_bucket}
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON {on} AND a.doc_id < b.doc_id
)"""


def simhash_sql(bits: int = 60, where: str = "WHERE doc_id < 100") -> str:
    """DuckDB mirror of pipeline.text.simhash: one md5 per token, 60
    per-bit majority votes (shared by the simhash pair/cluster oracles)."""
    terms = []
    for b in range(bits):
        vote = ("list_sum(list_transform(hs, "
                f"x -> CASE WHEN ((x >> {b}) & 1) = 1 THEN 1 ELSE -1 END))")
        terms.append(f"CASE WHEN {vote} > 0 THEN {2 ** b} ELSE 0 END")
    expr = " + ".join(terms)
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform({TOKS_SQL},
                        t -> ('0x' || substr(md5(t || '#sim'), 1, 15))::BIGINT) AS hs
  FROM documents {where}
)
SELECT doc_id, CAST({expr} AS BIGINT) AS simhash
FROM h
ORDER BY doc_id
"""
