"""Canonical loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Centralizes the one environment quirk: the testdata's timestamp columns are
parquet TIMESTAMP(NANOS), which Spark only reads via the
``spark.sql.legacy.parquet.nanosAsLong`` escape hatch (set in
``session.get_session``).  ``load_tables`` converts those raw nanosecond
longs back to proper TimestampType so every downstream operator (and the
DuckDB oracle, which reads NANOS natively) sees identical wall-clock values.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# timestamp-nanos columns per table (only events.ts in the driver testdata;
# orders/lineitem timestamps are [ms] and load natively)
_NANO_TS_COLS = {
    "events": ["ts"],
}


def normalize_nanos(df: DataFrame, name: str) -> DataFrame:
    """Convert raw nanosecond longs (the nanosAsLong escape hatch) back to
    TimestampType.  Works on batch and streaming DataFrames alike."""
    for c in _NANO_TS_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            # integer division: ns values (~1.7e18) overflow double precision
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Analyzed-plan cache per session: ``spark.read.parquet`` re-lists the
    path and re-reads footers for schema inference on every call, which at a
    100 TB table is a real driver cost a catalog normally pays once.  The
    cached object is the immutable base DataFrame (a logical plan, not
    data) — every query builds its own transformations on top."""
    cache = getattr(spark, "_graft_table_cache", None)
    if cache is None:
        cache = {}
        spark._graft_table_cache = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = normalize_nanos(
            spark.read.parquet(f"{sf_dir}/{name}.parquet"), name)
        cache[key] = df
    return df


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """readStream over a testdata table (raw parquet schema, then nanos
    normalization) — used by the streaming tests with AvailableNow."""
    raw_schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    # file-stream sources require a directory path; select the single table
    # file with a glob filter
    stream = (spark.readStream.schema(raw_schema)
              .option("pathGlobFilter", f"{name}.parquet")
              .parquet(sf_dir))
    stream = normalize_nanos(stream, name)
    # watermarks require TIMESTAMP (LTZ) event time — untagged parquet
    # timestamps read as NTZ, so lift them for the streaming path only
    # (batch keeps NTZ: wall-clock arithmetic matches the DuckDB oracle
    # under any session timezone)
    for f in stream.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            stream = stream.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return stream


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
