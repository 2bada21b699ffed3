"""Timezone-proof epoch arithmetic over either timestamp flavor.

The driver's parquet carries untagged ``timestamp[us]`` columns, which
Spark 4 reads as ``TIMESTAMP_NTZ`` (``spark.sql.parquet.inferTimestampNTZ``
defaults on).  ``CAST(ntz AS BIGINT)`` is an analysis error, and the
session-timezone routes (``unix_timestamp`` / ``cast('timestamp')``) would
shift wall clocks in a non-UTC session — diverging from DuckDB's
``epoch()``/``epoch_us()``, which treat naive timestamps as-is.

``timestampdiff`` from an NTZ epoch literal is wall-clock arithmetic with no
timezone in the computation at all, so it matches the oracle under any
session timezone, and it stays inside whole-stage codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import TimestampNTZType

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def is_ntz(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, TimestampNTZType)


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Seconds since epoch (truncated), as BIGINT.  ``col`` must be a plain
    column name present in ``df`` (the NTZ path goes through ``expr``)."""
    if is_ntz(df, col):
        return F.expr(f"timestampdiff(SECOND, {_EPOCH_NTZ}, {col})")
    return F.col(col).cast("long")


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Microseconds since epoch as BIGINT (DuckDB ``epoch_us`` parity)."""
    if is_ntz(df, col):
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {col})")
    return F.unix_micros(F.col(col))


def timestamp_from_epoch_seconds(df: DataFrame, like_col: str,
                                 secs_col: str) -> Column:
    """Timestamp of the same flavor as ``df[like_col]`` from an
    epoch-seconds column — keeps unions/window orders type-consistent."""
    if is_ntz(df, like_col):
        return F.expr(f"timestampadd(SECOND, {secs_col}, {_EPOCH_NTZ})")
    return F.timestamp_seconds(F.col(secs_col))
