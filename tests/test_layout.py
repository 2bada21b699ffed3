"""Physical layout levers: bucketed co-located joins (no Exchange) and
spatial grid partition pruning (PartitionFilters) — the engine's plain-parquet
equivalents of the reference's Iceberg partition pruning + data skipping."""

import re

import pytest
from pyspark.sql import functions as F

from sedona_iceberg_extension_spark.sources import layout


def test_bucketed_join_has_no_shuffle(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    layout.write_bucketed(orders, "orders_b", "o_orderkey", 8,
                          path=str(tmp_path / "orders_b"))
    layout.write_bucketed(li, "lineitem_b", "l_orderkey", 8,
                          path=str(tmp_path / "lineitem_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # disable auto-broadcast so the plan shows what matters at scale —
        # a sort-merge join over co-located buckets with no shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a["o_orderkey"] == b["l_orderkey"]) \
            .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join inputs must come straight from bucketed scans — the only
        # allowed Exchange is the final aggregation's, above the join
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_part, join_part[:500]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_grid_partition_pruning(spark, tmp_path, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .withColumn("x", (F.col("c_custkey") % 360 - 180).cast("double")) \
        .withColumn("y", ((F.col("c_custkey") * 7) % 180 - 90).cast("double"))
    path = str(tmp_path / "cust_grid")
    layout.write_grid_partitioned(cust, path, "x", "y", cell_deg=30.0)

    pruned = layout.read_grid_range(spark, path, -170, -60, -150, -10,
                                    cell_deg=30.0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]", plan)
    assert m, "grid scan did not prune partitions"

    # correctness: pruned scan + exact filter ≡ full scan + exact filter
    exact = (F.col("x").between(-170, -150)) & (F.col("y").between(-60, -10))
    got = sorted(r["c_custkey"] for r in pruned.filter(exact).collect())
    want = sorted(r["c_custkey"] for r in
                  spark.read.parquet(path).filter(exact).collect())
    assert got == want and len(got) > 0


def test_cells_for_envelope_cover():
    cells = layout.cells_for_envelope(-10, -10, 10, 10, cell_deg=30.0)
    # envelope spans 1 cell column boundary in x and none... compute: x in
    # [-10,10] → cols floor(170/30)=5..floor(190/30)=6; y → rows 2..3 ⇒ 4 cells
    assert len(cells) == 4
