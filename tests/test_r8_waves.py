"""Unit tests for the round-8 continuation-wave primitives (plans/
queries_r8b.py): properties the DuckDB differential oracle can't express —
bit-level Morton interleave correctness, fold-vs-reference recursions,
metric properties of the EMD, and greedy-trace checks for MMR."""

import math

import pytest
from pyspark.sql import Row, functions as F

from sedona_iceberg_extension_spark.plans.queries_r8b import (
    _morton_spread, R8B_QUERIES)


# -- Morton interleave ---------------------------------------------------------

def _py_spread(v: int) -> int:
    out = 0
    for i in range(16):
        if v & (1 << i):
            out |= 1 << (2 * i)
    return out


def test_morton_spread_matches_bit_reference(spark):
    vals = [0, 1, 2, 3, 255, 256, 359, 12345, 65535]
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = {r["v"]: r["s"]
           for r in df.select("v", _morton_spread(F.col("v")).alias("s"))
           .collect()}
    for v in vals:
        assert got[v] == _py_spread(v), v


def test_morton_order_preserves_locality(spark):
    # interleave(x, y) sorts points in the same cell next to each other:
    # two points in the same 16x16 tile are closer in morton order than
    # points in far tiles — spot-check monotonicity of tile prefixes
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 200) for y in (0, 1, 100)], "x LONG, y LONG")
    out = (df.withColumn(
        "m", _morton_spread(F.col("x"))
        .bitwiseOR(F.shiftleft(_morton_spread(F.col("y")), 1)))
        .collect())
    m = {(r["x"], r["y"]): r["m"] for r in out}
    assert m[(0, 0)] < m[(1, 1)] < m[(200, 100)]
    # interleave is invertible: distinct points -> distinct codes
    assert len(set(m.values())) == len(m)


# -- Holt / Holt-Winters folds ---------------------------------------------------

def _holt_ref(ys, alpha=0.6, beta=0.3):
    l, b = float(ys[0]), 0.0
    for y in ys[1:]:
        nl = alpha * y + (1 - alpha) * (l + b)
        b = beta * (nl - l) + (1 - beta) * b
        l = nl
    return l, b


def test_holt_fold_matches_python_reference(spark, sf_dir):
    from sedona_iceberg_extension_spark.sources import load_table
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("y"))
            .orderBy("day").collect())
    ys = [r["y"] for r in days]
    l, b = _holt_ref(ys)
    out = R8B_QUERIES["events_holt_forecast"][0](spark, sf_dir).collect()
    assert len(out) == 7
    for r in out:
        assert r["forecast"] == pytest.approx(l + r["horizon"] * b, abs=1e-5)


def _hw_ref(ys, alpha=0.6, beta=0.3, gamma=0.4, m=7):
    l, b, s = float(ys[0]), 0.0, [0.0] * m
    for y in ys[1:]:
        s0 = s[0]
        nl = alpha * (y - s0) + (1 - alpha) * (l + b)
        b = beta * (nl - l) + (1 - beta) * b
        s = s[1:] + [gamma * (y - nl) + (1 - gamma) * s0]
        l = nl
    return l, b, s


def test_holt_winters_fold_matches_python_reference(spark, sf_dir):
    from sedona_iceberg_extension_spark.sources import load_table
    ev = load_table(spark, sf_dir, "events")
    days = (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("double").alias("y"))
            .orderBy("day").collect())
    ys = [r["y"] for r in days]
    l, b, s = _hw_ref(ys)
    out = R8B_QUERIES["events_holt_winters"][0](spark, sf_dir).collect()
    assert len(out) == 7
    for r in out:
        want = l + r["horizon"] * b + s[r["horizon"] - 1]
        assert r["forecast"] == pytest.approx(want, abs=1e-5)


# -- EMD metric properties -------------------------------------------------------

def test_emd_zero_on_identical_distributions(spark):
    # same multiset on both sides -> distance 0 (triangle/identity check
    # the oracle can't see: it only checks one fixed pair)
    rows = ([Row(o_orderpriority="1-URGENT", o_totalprice=float(v))
             for v in (10, 20, 20, 30)]
            + [Row(o_orderpriority="5-LOW", o_totalprice=float(v))
               for v in (10, 20, 20, 30)])
    df = spark.createDataFrame(rows)
    import tempfile
    import os
    d = tempfile.mkdtemp(prefix="emdt_")
    df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    out = R8B_QUERIES["orders_emd_priority"][0](spark, d).collect()
    assert len(out) == 1 and out[0]["emd"] == 0.0


def test_emd_known_value(spark):
    # point masses at 0 and 10 -> EMD = 10 exactly
    rows = ([Row(o_orderpriority="1-URGENT", o_totalprice=0.0)]
            + [Row(o_orderpriority="5-LOW", o_totalprice=10.0)])
    df = spark.createDataFrame(rows)
    import tempfile
    import os
    d = tempfile.mkdtemp(prefix="emdt_")
    df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    out = R8B_QUERIES["orders_emd_priority"][0](spark, d).collect()
    assert out[0]["emd"] == pytest.approx(10.0, abs=1e-9)


# -- MMR greedy ------------------------------------------------------------------

def test_mmr_first_pick_is_top_relevance_and_no_repeats(spark, sf_dir):
    out = R8B_QUERIES["embedding_mmr_topk"][0](spark, sf_dir).collect()
    assert [r["rank"] for r in out] == list(range(1, 11))
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 10
    # rank 1 is the max-relevance candidate, and its mmr equals rel
    assert out[0]["mmr_e7"] == int(round(out[0]["rel"] * 1e7))
    assert out[0]["rel"] == max(r["rel"] for r in out)


# -- HITS integer iteration --------------------------------------------------------

def test_hits_scores_integer_exact_and_normalized(spark, sf_dir):
    out = R8B_QUERIES["part_hits_scores"][0](spark, sf_dir).collect()
    assert len(out) == 20
    assert out[0]["auth_norm"] == 1.0          # top authority is the max
    assert all(isinstance(r["auth_raw"], int) for r in out)
    assert all(0.0 < r["auth_norm"] <= 1.0 for r in out)
    raws = [r["auth_raw"] for r in out]
    assert raws == sorted(raws, reverse=True)
