"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — native zip_with/aggregate expressions,
broadcast query side, windowed top-k.  Scale path: random-hyperplane LSH
bucketing (deterministic, hash-derived hyperplanes so the bucketing is
reproducible across engines and runs) to cut the candidate set before exact
scoring — the standard IVF/LSH two-stage ANN shape (SURVEY.md §2 Tier E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import cosine_sim
from .text import portable_hash64


def cosine_topk(queries: DataFrame, data: DataFrame, k: int,
                q_id: str = "vec_id", q_vec: str = "embedding",
                d_id: str = "vec_id", d_vec: str = "embedding") -> DataFrame:
    """For each query vector: the k most-cosine-similar data vectors.
    Query side is broadcast (queries ≪ data at scale); score computation is
    native; top-k via window over query id."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    d = data.select(F.col(d_id).alias("data_id"), F.col(d_vec).alias("_dv"))
    scored = d.crossJoin(F.broadcast(q)) \
        .withColumn("cosine", cosine_sim(F.col("_dv"), F.col("_qv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("data_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "data_id", "cosine", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list:
    """Deterministic pseudo-random hyperplane from the portable hash recipe —
    reproducible across engines without any RNG state."""
    import hashlib
    vec = []
    for i in range(dim):
        h = int(hashlib.md5(f"hp:{plane}:{i}".encode()).hexdigest()[:15], 16)
        vec.append((h % 2001 - 1000) / 1000.0)
    return vec


def hyperplane_buckets(df: DataFrame, vec_col: str, num_planes: int = 8,
                       dim: int = 64) -> DataFrame:
    """Add a ``bucket`` column: the sign pattern of num_planes random
    hyperplane projections (cosine-LSH).  Vectors with high cosine similarity
    collide with high probability; candidates then join on bucket equality."""
    bucket = F.lit(0).cast("long")
    vd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    for p in range(num_planes):
        plane = _hyperplane(dim, p)
        proj = F.aggregate(
            F.zip_with(vd, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def lsh_topk(queries: DataFrame, data: DataFrame, k: int,
             q_id: str = "vec_id", q_vec: str = "embedding",
             d_id: str = "vec_id", d_vec: str = "embedding",
             num_planes: int = 6, dim: int = 64) -> DataFrame:
    """Approximate top-k: exact cosine, but only within matching LSH buckets.
    Trades recall for a |data|/2^planes candidate reduction — the scale path
    when the data side no longer fits a broadcast-crossjoin budget."""
    qb = hyperplane_buckets(
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv")),
        "_qv", num_planes, dim)
    db = hyperplane_buckets(
        data.select(F.col(d_id).alias("data_id"), F.col(d_vec).alias("_dv")),
        "_dv", num_planes, dim)
    scored = (
        db.join(F.broadcast(qb), "bucket")
        .withColumn("cosine", cosine_sim(F.col("_dv"), F.col("_qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("data_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "data_id", "cosine", "rank")
    )
