"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship query smoke (sf0.001).
``queries``  — every implemented operator from SURVEY.md §2, spatial Tier A–D
               parity + Tier E pipeline operators (see
               sedona_iceberg_extension_spark/plans/queries.py).
``oracle_sql`` — exactly-mirrored DuckDB SQL per query: ALL 151 declared
               queries carry an exact oracle (including the approximate
               paths — LSH/IVF ANN regenerate their hash-derived planes/
               codebooks in SQL; the HLL estimate is value-checked via
               portable-hash registers; multimodal's deterministic fake
               decode is mirrored byte-for-byte).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> SparkSession:
    from sedona_iceberg_extension_spark.session import register_all

    # the driver may hand us a session it built itself — make sure the
    # engine's function catalog and the nanos-parquet escape hatch are set
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's own first
    real query shape (App.scala:55-56) — spatial range filter + projection
    over points derived from customer, fully native plan."""
    from sedona_iceberg_extension_spark.plans.queries import q_spatial_range_contains

    _prepare(spark)
    return q_spatial_range_contains(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, qd in QUERIES.items():
        def run(spark: SparkSession, sf_dir: str, _fn=qd.fn) -> DataFrame:
            _prepare(spark)
            return _fn(spark, sf_dir)
        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
