"""Incremental corpus ingestion — dedup a new batch AGAINST the existing
corpus (the operation a 100 TB training-data pipeline actually runs daily:
the corpus is already deduped; only the delta needs checking).

Two gates, both expressed as key-only anti/semi joins so the full document
text never shuffles:

- **exact**: md5(text) anti-join against the existing corpus's content
  hashes (at scale the existing side is a precomputed hash index, not a
  rescan — the plan shape is identical either way);
- **near**: banded MinHash signatures of the incoming batch semi-joined
  against the existing corpus's banding on (band, bk_*) — any band
  collision marks the incoming doc as a near-dup candidate and drops it
  (the conservative ingest policy: false-positive drops cost one document,
  false-negative keeps cost a duplicate in the training set).

The existing side's signatures are recomputed here; a production deployment
persists them once (they are exactly the ``minhash_banded`` output) and the
incoming batch — typically orders of magnitude smaller — drives both joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import band_key_cols, minhash_banded


def dedup_ingest(existing: DataFrame, incoming: DataFrame,
                 id_col: str, text_col: str,
                 num_hashes: int = 8, bands: int = 4,
                 shingle_n: int = 3) -> DataFrame:
    """Rows of ``incoming`` that survive exact- and near-dedup against
    ``existing`` (schema preserved)."""
    ex_hashes = existing.select(F.md5(F.col(text_col)).alias("_md5")).distinct()
    exact_clean = (incoming.withColumn("_md5", F.md5(F.col(text_col)))
                   .join(ex_hashes, "_md5", "left_anti").drop("_md5"))
    keys = ["band"] + band_key_cols(num_hashes, bands)
    inc_b = minhash_banded(incoming, id_col, text_col, num_hashes, bands,
                           shingle_n)
    ex_b = minhash_banded(existing, id_col, text_col, num_hashes, bands,
                          shingle_n).select(*keys)
    near_ids = (inc_b.join(ex_b, keys, "left_semi")
                .select(id_col).distinct())
    return exact_clean.join(near_ids, id_col, "left_anti")
