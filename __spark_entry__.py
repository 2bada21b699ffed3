"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship query smoke (sf0.001).
``queries``  — every implemented operator from SURVEY.md §2, spatial Tier A–D
               parity + Tier E pipeline operators (see
               sedona_iceberg_extension_spark/plans/queries.py).
``oracle_sql`` — exactly-mirrored DuckDB SQL per query: ALL declared
               queries carry an exact oracle (including the approximate
               paths — LSH/IVF ANN regenerate their hash-derived planes/
               codebooks in SQL; the HLL estimate is value-checked via
               portable-hash registers; multimodal's deterministic fake
               decode is mirrored byte-for-byte).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> SparkSession:
    """Make a DRIVER-BUILT session inherit every engine-session setting
    that is still settable at runtime (VERDICT r10 item #6).  The full
    tuning set lives in session.py:get_session; settability on an
    already-running session (probed on this Spark build, r11):

    conf                                          | kind    | here
    ----------------------------------------------|---------|---------------
    spark.sql.adaptive.* (enabled/coalesce/skew)  | runtime | set below
    …adaptive.coalescePartitions.minPartitionSize | runtime | set below
    spark.sql.execution.arrow.pyspark.enabled     | runtime | set below
    spark.sql.execution.arrow.maxRecordsPerBatch  | runtime | set below
    spark.sql.legacy.parquet.nanosAsLong          | runtime | set below
    spark.sql.shuffle.partitions                  | runtime | NOT set — the
        driver's choice is part of what its hash certifies
    spark.sql.codegen.cache.maxEntries            | STATIC  | engine builds
        only (CANNOT_MODIFY_STATIC_CONFIG on a live session)
    spark.python.sql.dataFrameDebugging.enabled   | STATIC  | Python-side
        module cache pre-seeded below (same effect for wrapper overhead)
    spark.shuffle.sort.bypassMergeThreshold       | STATIC  | engine builds
        only (core SparkConf, fixed at context launch)
    spark.local.dir / driver Xms=Xmx+G1           | STATIC  | JVM/context
        launch only (conf.set succeeds for local.dir but is a no-op —
        dirs are created at startup)
    """
    from sedona_iceberg_extension_spark.session import register_all

    # the driver may hand us a session it built itself — make sure the
    # engine's function catalog and the nanos-parquet escape hatch are set
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for k, v in (("spark.sql.adaptive.enabled", "true"),
                 ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
                 ("spark.sql.adaptive.skewJoin.enabled", "true"),
                 ("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                  "64k"),
                 ("spark.sql.execution.arrow.pyspark.enabled", "true"),
                 ("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    try:
        # drop PySpark's ~4-py4j-calls-per-operator call-site capture
        # (see session.py, where engine-built sessions disable it via the
        # static conf spark.python.sql.dataFrameDebugging.enabled).  On a
        # session the driver already built, the static conf can't change,
        # but the wrapper gates on a module-level cache of that conf —
        # pre-seed it.  Guarded: if the internal moves in a future
        # PySpark, this degrades to the (correct, slower) default.
        import pyspark.errors.utils as _peu

        if hasattr(_peu, "_enable_debugging_cache"):
            _peu._enable_debugging_cache = False
    except Exception:
        pass
    return register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's own first
    real query shape (App.scala:55-56) — spatial range filter + projection
    over points derived from customer, fully native plan."""
    from sedona_iceberg_extension_spark.plans.queries import q_spatial_range_contains

    _prepare(spark)
    return q_spatial_range_contains(spark, "/root/testdata/sf0.001")


# Post-ledger sampling policy (round 12, VERDICT r11 item #2).  The
# never-driver-hashed ledger closed in round 11 (all 340 declared queries
# hold at least one green driver hash), so the rotating 50-query sample
# now runs a FRESHNESS rotation:
#
#   1. tranche 0 — queries whose plan/oracle changed THIS round (below);
#   2. any declared query with no driver hash yet (new queries —
#      infinitely stale);
#   3. everything else, STALEST driver hash first (the round of each
#      query's most recent appearance in CORRECTNESS_r*.json, computed at
#      import time from the committed records; ties broken by declared
#      order).
#
# SLO: with 340 declared queries and a 50-query sample, a plan-change-free
# round refreshes the 50 stalest greens, so every query is re-hashed at
# least every ceil(340/50) = 7 rounds; tranche-0-heavy rounds extend the
# tail proportionally (the staleness sort makes the backlog self-draining
# — skipped names only get staler and bubble up).
#
# Tranche-0 policy (stated per r9 ADVICE): a query enters tranche 0 when
# ITS OWN code OR shared code it consumes changed the distributed
# computation STRUCTURE — different operators, exchanges, or aggregation
# paths — even when the rewrite is value-identical (only a driver hash
# certifies the driver's environment).  EXEMPT: pure expression-level
# rewrites that compute bit-identical values per row by construction and
# pure construction-mechanism changes that leave the analyzed plan
# structurally identical, certified by the local differential gate plus
# a property test.  Purely driver-side/telemetry changes never qualify.
#
# Round-12 changes: the spatial grid join, minhash_lsh_pairs, and
# cosine_topk constructors moved to single-``spark.sql``-statement
# construction (operators/spatial_join.py:_stmt_grid_join,
# pipeline/dedup.py, pipeline/similarity.py — VERDICT r11 items #1/#3),
# and with_point_geometry/with_box_geometry collapsed to one projection.
# Physical plans are gated row-identical and exchange-equal to the
# operator spellings (tests/test_spatial_join.py, tests/test_pipeline.py),
# but the ANALYZED plans differ (CTE tree vs Project chain), so every
# declared consumer is promoted — the 27 names below (18 spatial + 4
# minhash-LSH + 5 cosine-topk consumers), each green through the local
# differential gate at sf0.01 and the standing sf0.1 sweep.
# Round-13 changes (r12 ADVICE, medium): the minhash_lsh_pairs statement
# construction gained the null-id filter the operator path always had
# (pipeline/dedup.py src CTE — without it the window bucket count at the
# max_bucket boundary included null-id rows, so the two constructions
# could keep/drop boundary buckets differently on null-bearing corpora).
# One extra Filter node in the stmt's ANALYZED plan → every declared
# consumer of the stmt spelling is promoted.  EXEMPT under the stated
# policy (analyzed plan unchanged, differential-gated locally): the
# auto-strategy probe unification (operators/spatial_join.py
# _resolve_auto_strategy — no declared query passes strategy="auto";
# all spell "grid"/"broadcast" explicitly, and the SQL front door
# defaults to "grid", so no declared plan can flip) and the
# truncate_lineage checkpoint
# routing (lineage.py — byte-identical behavior when no checkpoint dir is
# configured, as in the driver's sessions).
# Second r13 wave (the scan-budget discovery audit): three one-pass plan
# rewrites — order_backlog_sweepline emits its +1/-1 sweep events via
# inline() instead of a two-branch union that re-executed the
# orders⋈lineitem join per branch, and lineitem_price_index /
# brand_price_volume_mix replace two year-filtered aggregations joined
# back with ONE year-conditional aggregation (half the corpus scans, one
# shuffle fewer; sum(when(yr=Y,x)) nulls reproduce the old join
# membership exactly).  Each measured faster at sf0.1 (-12%/-12%/-37%
# single-shot) AND halves input records.  The six OTHER fan-out
# candidates the audit surfaced were A/B'd and deliberately left
# redundant (cache/checkpoint/local-relation sharing measured +10% to
# +481% at sf0.1 — parallel redundant stages beat serialized
# materialization on this host; negative result documented in
# tools/REHEARSALS.md).
_TRANCHE0 = [
    "minhash_lsh_pairs", "dedup_components", "dedup_keep",
    "doc_dedup_pipeline", "near_dup_rate_by_source",
    "lsh_edit_distance_verify",
    "order_backlog_sweepline", "lineitem_price_index",
    "brand_price_volume_mix",
    # third r13 wave, same audit: four more one-pass rewrites —
    # ship_survival_km derives its total-at-risk from the 61-row day
    # table (full window) instead of a second corpus aggregation;
    # orders_littles_law folds the span min/max into its main aggregate;
    # lineitem_effect_size / lineitem_discount_rdd replace
    # group-then-filter-then-crossJoin with one conditional global
    # aggregation.  Input records halved on all four; every value is
    # the same exact sum re-expressed.
    "ship_survival_km", "orders_littles_law",
    "lineitem_effect_size", "lineitem_discount_rdd",
]


def _is_green(rec: object) -> bool:
    """Whether one CORRECTNESS record certifies its query (see
    `_staleness_order`).  Non-dict records (older/foreign formats) count
    green so a format drift degrades to the pre-r13 behavior instead of
    marking the whole ledger stale."""
    if not isinstance(rec, dict):
        return True
    if rec.get("err"):
        return False
    hm = rec.get("hash_match")
    if hm is not None:
        return bool(hm)
    return bool(rec.get("rows_match")) and bool(rec.get("schema_match", True))


def _staleness_order(declared: list[str]) -> list[str]:
    """Declared names sorted by the round of their most recent GREEN driver
    hash (ascending = stalest first), read from the committed
    CORRECTNESS_r*.json records next to this file.  Names never hashed
    green sort first (round 0) — in particular a query that FAILED its
    last driver check counts as maximally stale and re-enters the very
    next sample instead of hiding behind its own red record for ~7 rounds
    (r12 ADVICE).  Green = hash_match true, or — for the weaker
    rows-only check on non-SQL-expressible ops — rows/schema match with
    no hash verdict; any err is red.  Returns [] when the records are
    unreadable — the caller falls back to declared order."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    try:
        for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
            rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            with open(p) as fh:
                for n, rec in json.load(fh).items():
                    if not _is_green(rec):
                        continue
                    last[n] = max(rnd, last.get(n, 0))
        if not last:
            return []
    except Exception:
        return []
    idx = {n: i for i, n in enumerate(declared)}
    return sorted(declared, key=lambda n: (last.get(n, 0), idx[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    declared = list(QUERIES)
    t0 = [n for n in _TRANCHE0 if n in QUERIES]
    rest = _staleness_order([n for n in declared if n not in set(t0)])
    names = t0 + (rest or [n for n in declared if n not in set(t0)])
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in names:
        def run(spark: SparkSession, sf_dir: str,
                _fn=QUERIES[name].fn) -> DataFrame:
            _prepare(spark)
            return _fn(spark, sf_dir)
        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES

    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
