"""Connected components over a pair/edge list — duplicate *clusters*.

Pair generators (``minhash_lsh_pairs``, ``simhash_pairs``,
``embedding_dup_pairs``) emit near-duplicate *edges*; a training-data dedup
pipeline needs the transitive *clusters* those edges imply, plus one kept
canonical document per cluster.  This module closes that gap with an
iterative min-label propagation expressed purely in DataFrame ops.

Algorithm: every vertex starts labeled with itself; each round, a vertex's
label becomes the min of its own and its neighbors' labels.  Convergence
takes O(diameter) rounds — near-dup clusters are small and dense (duplicate
families, not social graphs), so this is typically 2-4 rounds.  Each round
is one equi-join of the undirected edge list against the label table plus
one ``groupBy(min)`` — two shuffles on well-distributed keys, no driver
state, AQE-skew-splittable.

Scale notes (100 TB): labels monotonically decrease, so convergence is
detected with a single ``sum(label)`` aggregate per round (no change-join).
`lineage.truncate_lineage` truncates the per-round lineage (without it the
plan doubles every iteration) — it routes to fault-tolerant
``.checkpoint()`` automatically when the session has a checkpoint dir
configured (the cluster deployment step; unreplicated ``localCheckpoint``
blocks would otherwise turn one executor loss into a whole-query failure)
and to ``localCheckpoint`` in local mode.
For adversarial high-diameter graphs swap in
large-star/small-star (Kiveris et al., "Connected Components in MapReduce
and Beyond", SOCC'14) — same join-per-round shape, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..lineage import truncate_lineage


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """(id, component) for every vertex of the edge list; ``component`` is
    the minimum vertex id reachable from ``id`` (a canonical, deterministic
    cluster key).  Vertices with no edge are absent — union them back with
    ``component = id`` if singletons are wanted."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # materialize the edge list ONCE (lazy — rides the first round's job):
    # every round's neighbor join references `und`, and each driver-side
    # convergence job otherwise re-executes the whole upstream pair
    # pipeline (minhash/simhash/embedding candidate generation over the
    # corpus) — measured at sf0.1: dedup_components re-ran the documents
    # scan 10× per query (round 12).  At 100 TB that is re-hashing the
    # corpus once per propagation round for want of one |E|-row
    # materialization.  Same cluster note as the label checkpoints below:
    # prefer fault-tolerant .checkpoint() on a real cluster.
    und = und.transform(truncate_lineage)
    labels = (und.select(F.col("u").alias("id"))
              .distinct()
              .select("id", F.col("id").alias("component")))

    prev_sum: object = object()  # sentinel != any sum
    # Two propagation rounds per driver-side convergence check: the
    # checkpoints are LAZY, so the scalar sum job materializes the whole
    # batch at once — one Spark job per two rounds instead of one per
    # round (each driver round-trip is a full job at 100 TB).  Labels
    # only decrease, so an unchanged sum across the batch == fixpoint.
    #
    # Each round is neighbor-min PLUS a pointer jump (component :=
    # min(component, component[component]) — one |V|-row self-equi-join):
    # label chains halve every round, so convergence is O(log diameter)
    # rounds instead of O(diameter).  A 1500-point DBSCAN component with
    # graph diameter ~60 converged in 49 rounds (25 jobs) without the
    # jump and 7 rounds (4 jobs) with it; at 100 TB the round count — a
    # full shuffle each — is the dominant cost of the whole operator.
    it = 0
    while it < max_iter:
        for _ in range(min(2, max_iter - it)):
            nbr_min = (
                und.join(labels.withColumnRenamed("id", "v"), "v")
                .groupBy("u").agg(F.min("component").alias("_nbr"))
                .withColumnRenamed("u", "id")
            )
            stepped = (
                labels.join(nbr_min, "id", "left")
                .select("id", F.least("component",
                                      F.coalesce("_nbr", F.col("component")))
                        .alias("component"))
            )
            jump = stepped.select(F.col("id").alias("_jid"),
                                  F.col("component").alias("_jcomp"))
            labels = (
                stepped.join(jump,
                             stepped["component"] == jump["_jid"], "left")
                .select("id", F.least("component",
                                      F.coalesce("_jcomp",
                                                 F.col("component")))
                        .alias("component"))
                .transform(truncate_lineage)
            )
            it += 1
        s = labels.agg(F.sum("component")).collect()[0][0]
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def keep_canonical(components: DataFrame, id_col: str = "id",
                   comp_col: str = "component") -> DataFrame:
    """Per cluster, the kept document (min id) and the drop count — the
    actionable output of a dedup pass."""
    return (
        components.groupBy(comp_col)
        .agg(F.min(id_col).alias("keep_id"),
             (F.count(F.lit(1)) - 1).alias("n_dropped"))
    )


def bfs_hops(edges: DataFrame, seeds: DataFrame, rounds: int = 4,
             src: str = "u", dst: str = "v") -> DataFrame:
    """Multi-source BFS over an undirected edge list, fixed round count:
    returns (id, dist) for every vertex reachable from any seed within
    ``rounds`` hops.  ``seeds``: a DataFrame with an ``id`` column
    (distance 0).

    Each round is one vertex-keyed join + one groupBy(min) — the same
    two-shuffle iteration shape as connected_components / pagerank; the
    frontier table stays bounded by |V| rows and lineage is truncated with
    truncate_lineage per round (configure a checkpoint dir on a
    cluster)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.transform(truncate_lineage)
    dist = seeds.select("id", F.lit(0).cast("int").alias("dist"))
    for _ in range(rounds):
        nd = (sym.join(dist.withColumnRenamed("id", "u"), "u")
              .select(F.col("v").alias("id"),
                      (F.col("dist") + 1).cast("int").alias("dist")))
        dist = (dist.unionByName(nd)
                .groupBy("id").agg(F.min("dist").alias("dist")))
        dist = dist.transform(truncate_lineage)
    return dist


def pagerank(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
             damping: float = 0.85, iterations: int = 10) -> DataFrame:
    """Synchronous PageRank over an undirected edge list, fixed iteration
    count — the canonical iterative-algorithm shape next to label
    propagation.  Input edges are one row per unordered pair; they are
    symmetrized here.  No dangling-node handling is needed because every
    vertex of an undirected edge has out-degree >= 1.

    Each iteration is one (vertex-keyed) join + one groupBy(sum) — the
    same two-shuffle round as connected_components.  Lineage is truncated
    with truncate_lineage every iteration (on a cluster use a fault-
    tolerant checkpoint dir); ranks stay a |V|-row table throughout.
    Returns (id, rank) with sum(rank) ~= 1."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.transform(truncate_lineage)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("u").alias("id"))
    n = nodes.count()
    ranks = nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    base = (1.0 - damping) / float(n)
    for _ in range(iterations):
        contrib = (sym.join(ranks.withColumnRenamed("id", "u"), "u")
                   .join(deg, "u")
                   .select(F.col("v").alias("id"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        ranks = (nodes.join(
            contrib.groupBy("id").agg(F.sum("c").alias("s")), "id", "left")
            .select("id", (F.lit(base) + F.lit(damping)
                           * F.coalesce(F.col("s"), F.lit(0.0)))
                    .alias("rank")))
        ranks = ranks.transform(truncate_lineage)
    return ranks
