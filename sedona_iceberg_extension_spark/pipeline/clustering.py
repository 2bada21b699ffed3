"""Distributed DBSCAN over point geometries — PostGIS's ``ST_ClusterDBSCAN``
re-expressed with the engine's own scale-shaped operators:

1. neighbor pairs via the grid-partitioned ``dwithin`` spatial self-join
   (cell equi-join, never all-pairs — the step that makes DBSCAN feasible
   at 100 TB);
2. core points: neighborhood size (self included, per DBSCAN) >= min_pts,
   one groupBy;
3. clusters: connected components over the core-core edges
   (``pipeline.components`` min-label propagation);
4. border points attach to the MINIMUM cluster id among their core
   neighbors (classic DBSCAN leaves the choice arbitrary; min makes the
   result deterministic and oracle-checkable);
5. everything else is noise (cluster NULL).

Every stage is a native DataFrame op over well-distributed keys; nothing
is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.spatial_join import spatial_join
from .components import connected_components


def dbscan(points: DataFrame, id_col: str, eps: float, min_pts: int,
           geom_col: str = "geo") -> DataFrame:
    """(id, role, cluster): role in core|border|noise; cluster is the min
    member id of the core-connected component (NULL for noise)."""
    pts = points.select(id_col, geom_col,
                        *([f"{geom_col}_env"] if f"{geom_col}_env"
                          in points.columns else []))
    pairs = spatial_join(pts, pts, predicate="dwithin",
                         on=(geom_col, geom_col), d=eps, strategy="grid",
                         left_is_points=True, right_is_points=True)
    rid = f"r_{id_col}"
    nbrs = pairs.select(F.col(id_col), F.col(rid))  # includes the self-pair

    core = (nbrs.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= min_pts)
            .select(id_col))

    core_l = core.withColumnRenamed(id_col, "_cl")
    core_r = core.withColumnRenamed(id_col, "_cr")
    core_edges = (nbrs.filter(F.col(id_col) != F.col(rid))
                  .join(core_l, F.col(id_col) == F.col("_cl"))
                  .join(core_r, F.col(rid) == F.col("_cr"))
                  .select(F.col(id_col).alias("id_a"), F.col(rid).alias("id_b")))

    comp = connected_components(core_edges, "id_a", "id_b")
    # a core point with no core neighbor is its own singleton cluster
    singleton = core.join(comp.select(F.col("id").alias(id_col)),
                          id_col, "left_anti") \
        .select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    core_comp = comp.unionByName(singleton)

    assigned_core = core_comp.select(
        F.col("id").alias(id_col), F.lit("core").alias("role"),
        F.col("component").alias("cluster"))

    border = (nbrs.filter(F.col(id_col) != F.col(rid))
              .join(assigned_core.select(F.col(id_col).alias(rid),
                                         F.col("cluster")), rid)
              .join(core.withColumnRenamed(id_col, "_c"),
                    F.col(id_col) == F.col("_c"), "left_anti")
              .groupBy(id_col)
              .agg(F.min("cluster").alias("cluster"))
              .select(id_col, F.lit("border").alias("role"), "cluster"))

    labeled = assigned_core.unionByName(border)
    noise = (points.select(id_col)
             .join(labeled.select(id_col), id_col, "left_anti")
             .select(id_col, F.lit("noise").alias("role"),
                     F.lit(None).cast("long").alias("cluster")))
    return labeled.unionByName(noise)
