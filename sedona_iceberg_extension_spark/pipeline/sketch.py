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


def bloom_filter_words(df, text_col: str, m_words: int = 1024,
                       k: int = 4):
    """Build a Bloom filter over a column as (word_idx, bits) rows — the
    64-bit-word transpose of an m_words×64-bit filter.  Fully
    deterministic: bit positions come from the portable md5 hash recipe,
    so the DuckDB oracle sets the same bits and reproduces even the false
    positives bit-for-bit.

    Scale shape: k narrow projections per row, then ONE bit_or aggregation
    whose shuffle carries at most m_words rows per map task (map-side
    combine) — the filter itself is a ≤m_words-row DataFrame, broadcastable
    to any probe side.  This is the standard pre-filter in front of exact
    dedup: at 100 TB the filter for a billion-key corpus (m ≈ 10 bits/key)
    stays a few GB of words, while the probe is a broadcast join instead
    of a full shuffle of the corpus."""
    from pyspark.sql import functions as F

    from .text import portable_hash64

    # 63 usable bits per word: bit 63 would need 1 << 63, which overflows
    # a signed BIGINT on the oracle side — one spare bit costs ~1.6% space
    nbits = m_words * 63
    pos_cols = [
        (portable_hash64(F.col(text_col), f"bloom{j}") % nbits).alias("p")
        for j in range(k)
    ]
    exploded = (df.select(F.explode(F.array(*pos_cols)).alias("p"))
                .select(F.floor(F.col("p") / 63).alias("word_idx"),
                        F.expr("shiftleft(CAST(1 AS BIGINT), "
                               "CAST(p % 63 AS INT))").alias("mask")))
    return (exploded.groupBy("word_idx")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_probe(filter_words, probe_df, id_col: str, text_col: str,
                m_words: int = 1024, k: int = 4):
    """Probe a `bloom_filter_words` filter: (id, maybe_present).  A doc is
    ``maybe_present`` iff ALL k of its bits are set (Bloom semantics: false
    positives possible — deterministic here — false negatives never).
    The filter side is broadcast; the probe is k narrow rows per doc and
    one all-k aggregation."""
    from pyspark.sql import functions as F

    from .text import portable_hash64

    nbits = m_words * 63
    pos_cols = [
        (portable_hash64(F.col(text_col), f"bloom{j}") % nbits).alias("p")
        for j in range(k)
    ]
    probes = (probe_df.select(F.col(id_col),
                              F.explode(F.array(*pos_cols)).alias("p"))
              .select(F.col(id_col),
                      F.floor(F.col("p") / 63).alias("word_idx"),
                      F.expr("shiftleft(CAST(1 AS BIGINT), "
                             "CAST(p % 63 AS INT))").alias("mask")))
    joined = probes.join(F.broadcast(filter_words), "word_idx", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
           == F.col("mask"))
    return (joined.groupBy(id_col)
            .agg((F.sum(F.when(hit, 1).otherwise(0)) == k)
                 .alias("maybe_present")))


def hll_registers_grouped(df: DataFrame, group_cols, key_col: str,
                          p: int = 10) -> DataFrame:
    """(group..., register, max_rank) — one HLL sketch PER GROUP, the shape
    a 100 TB rollup actually materializes (per-day / per-source sketches,
    merged later by register-wise max instead of rescanning)."""
    m = 1 << p
    bits = 60 - p
    h = portable_hash64(F.col(key_col).cast("string"), "hll")
    reg = F.pmod(h, F.lit(m)).alias("register")
    w = F.shiftright(h, p)
    rho = F.when(w > 0, F.lit(bits) - F.floor(F.log2(w))) \
           .otherwise(F.lit(bits + 1)).cast("long")
    return (df.select(*group_cols, reg, rho.alias("_rho"))
            .groupBy(*group_cols, "register")
            .agg(F.max("_rho").alias("max_rank")))


def hll_estimate_grouped(df: DataFrame, group_cols, key_col: str,
                         p: int = 10) -> DataFrame:
    """(group..., n_registers, estimate) — per-group cardinality estimates
    from the grouped registers (bias-corrected harmonic mean + the
    small-range linear-counting correction, per group)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = hll_registers_grouped(df, group_cols, key_col, p)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_s"))
    raw = (F.lit(alpha * m * m)
           / ((F.lit(float(m)) - F.col("n_registers")) + F.col("_s")))
    zeros = F.lit(float(m)) - F.col("n_registers")
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)) \
           .otherwise(raw)
    return agg.select(*group_cols, "n_registers",
                      est.alias("estimate"))


def hll_set_estimates(df_a: DataFrame, df_b: DataFrame, key_col: str,
                      p: int = 10) -> DataFrame:
    """Approximate set algebra from two HLL sketches WITHOUT rescanning
    either input: |A|, |B|, |A ∪ B| (register-wise max merge — the HLL
    union is exact over sketches), and |A ∩ B| by inclusion–exclusion.
    One row: (est_a, est_b, est_union, est_intersection).  This is the
    sketch-merge pattern that lets a 100 TB pipeline answer overlap
    questions from per-partition summaries."""
    def agg_of(regs):
        m = 1 << p
        alpha = 0.7213 / (1 + 1.079 / m)
        a = regs.agg(
            F.count(F.lit(1)).cast("double").alias("nr"),
            F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("s"))
        raw = (F.lit(alpha * m * m)
               / ((F.lit(float(m)) - F.col("nr")) + F.col("s")))
        zeros = F.lit(float(m)) - F.col("nr")
        return a.select(
            F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                   F.lit(float(m)) * F.log(F.lit(float(m)) / zeros))
            .otherwise(raw).alias("est"))

    ra = hll_registers(df_a, key_col, p)
    rb = hll_registers(df_b, key_col, p)
    merged = (ra.unionAll(rb).groupBy("register")
              .agg(F.max("max_rank").alias("max_rank")))
    ea = agg_of(ra).select(F.col("est").alias("est_a"))
    eb = agg_of(rb).select(F.col("est").alias("est_b"))
    eu = agg_of(merged).select(F.col("est").alias("est_union"))
    return (ea.crossJoin(eb).crossJoin(eu)
            .select(F.round("est_a", 6).alias("est_a"),
                    F.round("est_b", 6).alias("est_b"),
                    F.round("est_union", 6).alias("est_union"),
                    F.round(F.col("est_a") + F.col("est_b")
                            - F.col("est_union"), 6)
                    .alias("est_intersection")))


# ---------------------------------------------------------------------------
# count-min sketch — the frequency member of the mergeable-summary trio
# (HLL = cardinality, Bloom = membership, CMS = frequency)
# ---------------------------------------------------------------------------

def cms_cells(df: DataFrame, key_col: str, width: int = 256,
              depth: int = 4) -> DataFrame:
    """(r, c, cnt) cells of a depth x width count-min sketch over the
    occurrences of ``key_col`` (Cormode & Muthukrishnan 2005).  Fully
    deterministic: each row's hash comes from the portable md5 recipe
    with seed ``cms<r>``, so an oracle reproduces every cell — including
    collision inflation — and estimates are value-checkable.

    Scale shape: depth narrow projections per row, then ONE count
    aggregation whose shuffle carries at most depth x width cell rows per
    map task (map-side combine).  Sketches merge by cell-wise sum, so
    per-partition sketches combine without rescans — the reason to keep a
    CMS next to the data at 100 TB instead of re-running heavy-hitter
    group-bys."""
    k = F.col(key_col).cast("string")
    ex = df.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (portable_hash64(k, f"cms{r}") % width).alias("c"))
        for r in range(depth)])).alias("_rc"))
    return (ex.groupBy(F.col("_rc.r").alias("r"), F.col("_rc.c").alias("c"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(cells: DataFrame, probe_df: DataFrame, key_col: str,
                 width: int = 256, depth: int = 4) -> DataFrame:
    """(key, est_count) count-min estimates: min over the depth addressed
    cells — an upper bound on the true count (never under).  The sketch
    side broadcasts; the probe is depth narrow rows per key and one min
    aggregation.

    The join is LEFT with empty cells counting 0 (round-10 fix, caught by
    the Python-mirror property test): the canonical CMS estimate is the
    min over ALL depth cells, so a probe key with any EMPTY addressed
    cell estimates 0 — it provably never occurred.  The earlier inner
    join dropped empty cells from the min, reporting collision inflation
    (>=1) for some absent keys while omitting others entirely; still an
    upper bound, but looser than CMS guarantees and inconsistent.  Every
    key present in the data addresses only non-empty cells, so estimates
    for present keys are unchanged."""
    k = F.col(key_col).cast("string")
    probes = probe_df.select(F.col(key_col), F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"),
                 (portable_hash64(k, f"cms{r}") % width).alias("c"))
        for r in range(depth)])).alias("_rc"))
    return (probes.select(F.col(key_col), F.col("_rc.r").alias("r"),
                          F.col("_rc.c").alias("c"))
            .join(F.broadcast(cells), ["r", "c"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)).cast("long"))
                 .alias("est_count")))


def kmv_bottom_k(df: DataFrame, key_col: str, k: int = 256,
                 seed: str = "kmv", keep_cols=()) -> DataFrame:
    """Bottom-k (KMV) sketch: the ``k`` rows whose portable hash of
    ``key_col`` is smallest — a deterministic uniform sample that is also
    MERGEABLE (bottom-k of a union = bottom-k of the concatenated
    sketches), completing the mergeable-summary family next to HLL
    (distinct), CMS (frequency), and Bloom (membership): KMV serves both
    distinct-count estimation ((k-1) * H / h_k, Bar-Yossef et al. 2002)
    and sample-based quantiles over any carried value column.

    Scale shape: Spark compiles orderBy(h).limit(k) to
    TakeOrderedAndProject — a per-partition k-heap merged at the driver,
    exactly the sketch-merge tree; the full table is never sorted.
    ``keep_cols`` ride along for sample-based statistics."""
    h = portable_hash64(F.col(key_col).cast("string"), seed)
    return (df.select(h.alias("h"), *[F.col(c) for c in keep_cols])
            .orderBy("h").limit(k))
