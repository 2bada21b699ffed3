"""As-of join — for each left row, the most recent right row with
``right_ts <= left_ts`` (backward, inclusive) per key.

Spark has no ASOF JOIN operator (DuckDB does — it serves as the oracle).
The classic range-join formulation explodes candidates; this implementation
is the scale-correct union+window shape:

1. Tag and union both sides (right rows sort before left rows at equal ts).
2. One window per key ordered by (ts, tag): ``last(right_value, ignorenulls)``
   over the unbounded-preceding frame carries the latest right value forward.
3. Keep the left rows.

Cost: ONE shuffle of |L|+|R| rows on the key — no range-candidate blowup,
AQE-skew-splittable, fully native (no Python)."""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Optional[List[str]] = None,
              suffix: str = "_r",
              direction: str = "backward") -> DataFrame:
    """As-of join with a ``direction``:

    - ``backward`` (default): most recent right row with right_ts <=
      left_ts (DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``);
    - ``forward``: earliest right row with right_ts >= left_ts (the
      reversed window order — same single-shuffle plan);
    - ``nearest``: whichever of the two sits closer in time, ties to the
      backward match (both fills computed in the same plan — still ONE
      shuffle: the windows share the union's partitioning).

    ``value_cols``: right columns carried to the matched left row
    (default: all non-key, non-ts right columns), renamed with
    ``suffix``.  Unmatched left rows keep nulls (left-outer semantics)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    value_cols = value_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    l = left.withColumn("_src", F.lit(1)) \
        .withColumn("_ats", F.col(left_ts))
    # ONE struct carries all right values: the window fills whole right ROWS,
    # so every carried value comes from the same (latest) right row and a
    # NULL field in that row stays NULL instead of falling back to an older
    # row's value (per-column last(ignorenulls) would mix rows).  The
    # matched right ts rides along for the ``nearest`` arbitration.
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_src"),
        F.struct(F.col(right_ts).alias("_mts"),
                 *[F.col(c) for c in value_cols]).alias("_rvals"))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (_src=0) order before left rows at the same timestamp in
    # BOTH directions → equal-ts right rows are inclusive matches; among
    # several right rows at the same ts the last by union order wins,
    # matching ASOF's "most recent" semantics
    wb = (Window.partitionBy(on)
          .orderBy(F.col("_ats").asc(), F.col("_src").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(on)
          .orderBy(F.col("_ats").desc(), F.col("_src").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    if direction == "backward":
        filled = u.withColumn(
            "_rv", F.last(F.col("_rvals"), ignorenulls=True).over(wb))
    elif direction == "forward":
        filled = u.withColumn(
            "_rv", F.last(F.col("_rvals"), ignorenulls=True).over(wf))
    else:
        both = (u.withColumn("_rb", F.last(F.col("_rvals"),
                                           ignorenulls=True).over(wb))
                .withColumn("_rf", F.last(F.col("_rvals"),
                                          ignorenulls=True).over(wf)))
        db = F.abs(F.col("_ats").cast("double")
                   - F.col("_rb._mts").cast("double"))
        df_ = F.abs(F.col("_rf._mts").cast("double")
                    - F.col("_ats").cast("double"))
        filled = both.withColumn(
            "_rv", F.when(F.col("_rb").isNull(), F.col("_rf"))
                    .when(F.col("_rf").isNull(), F.col("_rb"))
                    .when(df_ < db, F.col("_rf")).otherwise(F.col("_rb"))) \
            .drop("_rb", "_rf")
    return (filled.filter(F.col("_src") == 1)
            .select("*", *[F.col("_rv")[c].alias(f"{c}{suffix}")
                           for c in value_cols])
            .drop("_src", "_ats", "_rv"))


def resample_ffill(df: DataFrame, on: str, ts_col: str,
                   value_cols: Optional[List[str]] = None,
                   every_s: int = 3600) -> DataFrame:
    """Regularize an irregular time series: per key, a grid of ``every_s``-
    second points spanning [floor(min ts), max ts], each carrying the
    latest observation at-or-before it (forward fill).

    Scale shape: the grid is generated natively (one tiny per-key bounds
    agg + ``sequence``/``explode`` — no driver-side loop), and the fill is
    the as-of union+window — ONE shuffle of |grid|+|data| rows on the key.
    The naive range join (grid × observations, filter, argmax) explodes
    candidates quadratically per key; this doesn't.

    Returns one row per (key, grid epoch second ``t_s``) plus the filled
    ``value_cols`` (suffix ``_r`` from :func:`asof_join`)."""
    from ..functions.timeops import epoch_seconds, timestamp_from_epoch_seconds

    # NTZ-safe wall-clock epoch (matches DuckDB epoch() on naive timestamps)
    ep = epoch_seconds(df, ts_col)
    bounds = df.groupBy(on).agg(
        (F.floor(F.min(ep) / every_s) * every_s).cast("long").alias("_lo"),
        F.max(ep).cast("long").alias("_hi"))
    grid = bounds.select(
        F.col(on),
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"),
                             F.lit(every_s))).alias("t_s"))
    # grid timestamps take the source column's flavor so the as-of union
    # orders one consistent type
    grid = grid.withColumn("_gts", timestamp_from_epoch_seconds(df, ts_col, "t_s"))
    return asof_join(grid, df, on=on, left_ts="_gts", right_ts=ts_col,
                     value_cols=value_cols).drop("_gts")
