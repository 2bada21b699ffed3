"""Skew-handling utilities for holistic aggregations.

Algebraic aggregates (sum/min/max/count) are skew-immune in Spark — partial
aggregation reduces every partition before the shuffle.  Holistic aggregates
(``collect_list``/``collect_set``) are not: a heavy-hitter key funnels its
entire group through one reduce task.  At 100 TB, one hot key (an empty
document's shingle, a null-island geometry cell) stalls the stage.

``salted_collect_list`` runs the canonical two-stage shape:
stage 1 groups on (key, salt) — the hot group splits across ``salt_n``
tasks; stage 2 groups on key and flattens the per-salt lists.  The second
shuffle carries one row per (key, salt) — already aggregated, tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, salt_n: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt from a stable hash of the whole row's monotonic id
    substitute: use crc32 of a concatenated projection when determinism
    across runs matters; here pmod of a per-row hash spreads uniformly."""
    return df.withColumn(
        col_name, F.pmod(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                                       for c in df.columns])),
                         F.lit(salt_n)).cast("int"))


def salted_collect_list(df: DataFrame, key: str, value: str,
                        salt_n: int = 16, out_col: str = "values") -> DataFrame:
    """``groupBy(key).agg(collect_list(value))`` with two-stage salting —
    identical result set (list order is engine-undefined either way), hot
    keys split across ``salt_n`` reduce tasks."""
    salted = with_salt(df.select(F.col(key), F.col(value)), salt_n)
    stage1 = (salted.groupBy(key, "_salt")
              .agg(F.collect_list(F.col(value)).alias("_part")))
    return (stage1.groupBy(key)
            .agg(F.flatten(F.collect_list("_part")).alias(out_col)))


def salted_count_distinct(df: DataFrame, key: str, value: str,
                          salt_n: int = 16,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact distinct count per key without a single-task hot group:
    stage 1 dedupes (key, value) on (key, salt-of-value); stage 2 sums
    per-salt partial distinct counts (value-salting makes partials disjoint)."""
    vs = df.select(
        F.col(key), F.col(value),
        F.pmod(F.crc32(F.col(value).cast("string")), F.lit(salt_n))
        .cast("int").alias("_vsalt"))
    stage1 = (vs.dropDuplicates([key, value])
              .groupBy(key, "_vsalt")
              .agg(F.count(F.lit(1)).alias("_n")))
    return stage1.groupBy(key).agg(F.sum("_n").cast("long").alias(out_col))
