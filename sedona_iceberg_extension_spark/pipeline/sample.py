"""Deterministic sampling operators for training-data pipelines.

Spark's built-in ``df.sample`` / ``sampleBy`` are seeded-random and
partition-order dependent — fine for exploration, wrong for reproducible
corpus construction (re-runs and engine comparisons must pick the SAME
rows).  These operators derive sampling decisions from a portable content
hash instead, so the sample is a pure function of the data:

- :func:`hash_sample` — Bernoulli-style p% sample via hash threshold;
- :func:`stratified_sample` — exactly n rows per stratum, the n smallest
  hashes (a per-stratum uniform draw that any engine can reproduce).

Scale: ``hash_sample`` is a stateless map (no shuffle at all);
``stratified_sample`` is one window over the stratum shuffle — the same
cost as any per-group top-k, skew-safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .text import portable_hash64


def _id_hash(id_col: Column, seed: str) -> Column:
    return portable_hash64(id_col.cast("string"), seed)


def hash_sample(df: DataFrame, id_col: str = "doc_id", pct: int = 10,
                seed: str = "samp") -> DataFrame:
    """Keep ~pct% of rows: ``hash(id) % 100 < pct``.  Deterministic,
    shuffle-free, and identically expressible in any SQL engine."""
    if not 0 <= pct <= 100:
        raise ValueError("pct must be 0..100")
    return df.filter(_id_hash(F.col(id_col), seed) % 100 < pct)


def stratified_sample(df: DataFrame, strata_col: str, n: int,
                      id_col: str = "doc_id",
                      seed: str = "samp") -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum — the rows whose id
    hashes are smallest within the stratum (ties broken by id).  Adds
    ``sample_rank`` (1-based within stratum)."""
    if n <= 0:
        raise ValueError("n must be positive")
    hk = _id_hash(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy(hk.asc(), F.col(id_col).asc())
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= n))
