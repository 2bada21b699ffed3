"""Deterministic HyperLogLog — the distributed cardinality sketch, built
from native expressions only.

Spark ships ``approx_count_distinct`` (HLL++), but its register hashing is
engine-internal — the estimate can't be value-checked against another
engine.  This sketch derives registers from the portable md5 hash recipe
the rest of the pipeline uses (``pipeline.text.portable_hash64``), so the
whole sketch — register indexes, leading-zero ranks, bias-corrected
estimate, small-range correction — is reproducible in plain SQL and the
oracle checks the VALUE, not just the shape (Flajolet et al., "HyperLogLog:
the analysis of a near-optimal cardinality estimation algorithm", 2007).

Scale shape: one narrow projection (hash → register, rank), ONE shuffle of
at most ``m`` = 2^p register rows (map-side ``max`` combine), and a scalar
finish.  Sketches merge by register-wise max, so the operator is
partition-parallel end to end — the point of HLL at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .text import portable_hash64


def hll_registers(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """(register, max_rank) rows of the HLL sketch over ``key_col``.
    The 60-bit portable hash splits into p low bits (register index) and
    the remaining ``50`` bits (for p=10) whose leading-zero count gives the
    rank: rho = (60-p) - floor(log2(w)) for w > 0, else (60-p)+1."""
    m = 1 << p
    bits = 60 - p
    h = portable_hash64(F.col(key_col).cast("string"), "hll")
    reg = F.pmod(h, F.lit(m)).alias("register")
    # integer shift, not float division: h exceeds double's 53-bit mantissa
    w = F.shiftright(h, p)
    rho = F.when(w > 0, F.lit(bits) - F.floor(F.log2(w))) \
           .otherwise(F.lit(bits + 1)).cast("long")
    return (df.select(reg, rho.alias("_rho"))
            .groupBy("register").agg(F.max("_rho").alias("max_rank")))


def hll_estimate(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """One-row DataFrame: ``n_registers``, ``estimate`` (bias-corrected
    harmonic mean with the small-range linear-counting correction)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = hll_registers(df, key_col, p)
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_s"))
    raw = (F.lit(alpha * m * m)
           / ((F.lit(float(m)) - F.col("n_registers")) + F.col("_s")))
    zeros = F.lit(float(m)) - F.col("n_registers")
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
           .otherwise(raw)
    return agg.select("n_registers", est.alias("estimate"))
