"""Distributed spatial join — the engine's ``JoinQueryDetector`` equivalent.

The reference injects a Sedona planner strategy that plans
``Join ... ON ST_pred(l.geo, r.geo)`` as ``BroadcastIndexJoin`` or
``RangeJoin`` (``SedonaIcebergExtensions.scala:47``,
``TestSedonaIcebergExtension.scala:122,137``).  This engine plans at the API
level instead (SURVEY.md §4.2) and emits plain DataFrame operations Catalyst
and AQE can keep optimizing:

- **broadcast strategy** (small side): native broadcast join on envelope
  conjuncts, then exact refinement — Spark plans a BroadcastNestedLoopJoin /
  BroadcastHashJoin; the analogue of Sedona's BroadcastIndexJoin.
- **grid strategy** (both sides large): each row is assigned the grid cells
  its envelope overlaps (native ``sequence``+``explode`` — no Python), the
  join becomes a cell-id **equi-join** (sort-merge/shuffled-hash + AQE skew
  splitting), refined by the exact predicate.  Duplicate pair elimination is
  algebraic — a pair is emitted only in the *reference cell* containing the
  min-corner of the two envelopes' intersection — so no ``dropDuplicates``
  shuffle is needed (SURVEY.md §7.4 hard-part 4).

At 100 TB the grid path shuffles each side once on a well-distributed key,
supports AQE skew-join splitting, and never builds driver-side state; the
broadcast path moves only the small side.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import udfs

# exact-refinement UDF per predicate name
_PRED_UDFS = {
    "intersects": udfs.st_intersects,
    "contains": udfs.st_contains,
    "within": udfs.st_within,
    "covers": udfs.st_covers,
    "covered_by": udfs.st_coveredby,
    "touches": udfs.st_touches,
    "crosses": udfs.st_crosses,
    "overlaps": udfs.st_overlaps,
    "equals": udfs.st_equals,
}

_SYM = {"intersects", "touches", "crosses", "overlaps", "equals", "dwithin"}


def _ensure_env(df: DataFrame, geom_col: str, prefix: str) -> Tuple[DataFrame, str]:
    """Attach envelope fields <prefix>_xmin.. (native if an _env struct exists)."""
    env_struct = f"{geom_col}_env"
    cols = set(df.columns)
    if env_struct in cols:
        src = F.col(env_struct)
        df = df.select(
            "*",
            src["xmin"].alias(f"{prefix}_xmin"), src["ymin"].alias(f"{prefix}_ymin"),
            src["xmax"].alias(f"{prefix}_xmax"), src["ymax"].alias(f"{prefix}_ymax"),
        )
        return df, prefix
    from ..functions.api import add_geometry
    df = add_geometry(df, geom_col, f"_tmp_env_{prefix}")
    src = F.col(f"_tmp_env_{prefix}")
    df = df.select(
        "*",
        src["xmin"].alias(f"{prefix}_xmin"), src["ymin"].alias(f"{prefix}_ymin"),
        src["xmax"].alias(f"{prefix}_xmax"), src["ymax"].alias(f"{prefix}_ymax"),
    ).drop(f"_tmp_env_{prefix}")
    return df, prefix


def _env_join_cond(lp: str, rp: str, predicate: str, d: float) -> Column:
    """Envelope-level (relaxed) join condition — superset filter, exact
    refinement retained, mirroring SedonaPredicatePushDown.scala:77,138-144."""
    if predicate in ("contains", "covers"):
        return (
            (F.col(f"{lp}_xmin") <= F.col(f"{rp}_xmin")) & (F.col(f"{lp}_xmax") >= F.col(f"{rp}_xmax"))
            & (F.col(f"{lp}_ymin") <= F.col(f"{rp}_ymin")) & (F.col(f"{lp}_ymax") >= F.col(f"{rp}_ymax"))
        )
    if predicate in ("within", "covered_by"):
        return (
            (F.col(f"{rp}_xmin") <= F.col(f"{lp}_xmin")) & (F.col(f"{rp}_xmax") >= F.col(f"{lp}_xmax"))
            & (F.col(f"{rp}_ymin") <= F.col(f"{lp}_ymin")) & (F.col(f"{rp}_ymax") >= F.col(f"{lp}_ymax"))
        )
    pad = float(d) if predicate == "dwithin" else 0.0
    return (
        (F.col(f"{lp}_xmax") + pad >= F.col(f"{rp}_xmin")) & (F.col(f"{rp}_xmax") >= F.col(f"{lp}_xmin") - pad)
        & (F.col(f"{lp}_ymax") + pad >= F.col(f"{rp}_ymin")) & (F.col(f"{rp}_ymax") >= F.col(f"{lp}_ymin") - pad)
    )


def _exact_cond(lg: str, rg: str, predicate: str, d: float,
                rect_l: bool, rect_r: bool) -> Optional[Column]:
    """Exact refinement; None when the envelope condition is already exact —
    both operands are their own envelopes (points or axis-aligned rects), so
    the relaxed predicate IS the exact predicate and no UDF enters the plan."""
    if predicate == "dwithin":
        return udfs.st_distance(F.col(lg), F.col(rg)) <= F.lit(float(d))
    if rect_l and rect_r and predicate in (
            "intersects", "contains", "covers", "within", "covered_by"):
        return None
    return _PRED_UDFS[predicate](F.col(lg), F.col(rg))


def _resolve_auto_strategy(right: DataFrame,
                           broadcast_threshold_rows: int) -> str:
    """broadcast-vs-grid resolution for ``strategy="auto"``, probed on the
    RAW right side so the stmt and operator constructions resolve
    identically (r12 ADVICE: Project nodes RESCALE Catalyst's sizeInBytes
    by row width, so probing a renamed/env-flattened projection could flip
    a borderline join under one construction but not the other).

    Catalyst plan statistics (file-size-derived for parquet scans,
    filter-estimated, computed WITHOUT running a job) decide; the
    limit/count probe is the fallback only when stats are unavailable.
    ~64 MB estimated right side ≈ Spark's own autoBroadcastJoinThreshold
    territory once the grid-cell explosion is priced in."""
    try:
        size = int(right._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
        return "broadcast" if size <= 64 * 1024 * 1024 else "grid"
    except Exception:
        pass
    try:
        r_small = (right.limit(broadcast_threshold_rows).count()
                   < broadcast_threshold_rows)
    except Exception:
        r_small = False
    return "broadcast" if r_small else "grid"


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    on: Tuple[str, str] = ("geo", "geo"),
    how: str = "inner",
    d: float = 0.0,
    strategy: str = "auto",
    grid_size: Optional[float] = None,
    broadcast_threshold_rows: int = 1_000_000,
    left_is_points: bool = False,
    right_is_points: bool = False,
    left_is_rects: bool = False,
    right_is_rects: bool = False,
    construction: str = "auto",
) -> DataFrame:
    """Join two DataFrames on a spatial predicate between WKB columns.

    ``how``: inner | left (outer, right side null-extended) | left_semi |
    left_anti.  Columns of both inputs are kept (right's prefixed with
    ``r_`` on collision) for inner/left joins.

    ``left_is_points`` / ``right_is_points`` / ``right_is_rects`` are
    optional exactness hints: when a side is known to be all points (or the
    right side all axis-aligned rectangles), the envelope algebra is already
    the exact predicate and the refinement UDF is dropped from the plan.

    ``construction``: "auto" (default) emits the grid join as ONE
    ``spark.sql`` statement when the shape allows it — inner join, grid
    strategy, persisted ``<geom>_env`` structs on both sides, and a fully
    native (hint-exact) condition; everything else takes the operator
    path.  "operator" forces the classic Dataset-op chain (the
    differential gates compare the two); "stmt" forces the statement and
    raises when the shape is ineligible.  Results and physical plan shape
    are identical by construction — the statement exists because
    classic-mode PySpark analyzes EAGERLY per Dataset op, so the
    operator chain re-analyzes its growing subtree each step (measured
    r11: ~0.26–0.30 s of pure construction per declared spatial join, of
    a 2.05 s suite-wide construction total); one statement = one parse,
    one analysis (the exact-Jaccard precedent, pipeline/dedup.py).
    """
    if predicate not in _PRED_UDFS and predicate != "dwithin":
        raise ValueError(f"unsupported predicate {predicate!r}")
    lg, rg = on

    # shape hints can also arrive as column metadata stamped by the geometry
    # builders (with_point_geometry/with_box_geometry) — it travels through
    # selects, views, and parquet, so SQL-text joins get the Python-free
    # exact-envelope plan without the caller passing flags
    def _shape_hint(df: DataFrame, col: str) -> Optional[str]:
        try:
            md = df.schema[col].metadata or {}
        except Exception:
            return None
        return md.get("geom_shape")

    if not (left_is_points or left_is_rects):
        h = _shape_hint(left, lg)
        left_is_points, left_is_rects = h == "points", h == "rects"
    if not (right_is_points or right_is_rects):
        h = _shape_hint(right, rg)
        right_is_points, right_is_rects = h == "points", h == "rects"

    # ---- single-statement fast path (round 12; see ``construction``) ----
    if construction not in ("auto", "operator", "stmt"):
        raise ValueError(f"unsupported construction {construction!r}")
    if construction != "operator":
        native_sql = _native_cond_sql(predicate, d, left_is_points,
                                      left_is_rects, right_is_points,
                                      right_is_rects)
        stmt_ok = (how == "inner" and native_sql is not None
                   and f"{lg}_env" in left.columns
                   and f"{rg}_env" in right.columns)
        if stmt_ok and strategy == "auto":
            # THE auto resolution — one helper, probed on the raw right
            # side in both constructions (r12 ADVICE)
            strategy = _resolve_auto_strategy(right, broadcast_threshold_rows)
        stmt_ok = stmt_ok and strategy == "grid"
        if construction == "stmt" and not stmt_ok:
            raise ValueError(
                "construction='stmt' requires an inner grid join with "
                "persisted <geom>_env structs and a hint-exact condition")
        if stmt_ok:
            if grid_size is None:
                grid_size = _grid_size_from_env(left, right, lg, rg, d)
            return _stmt_grid_join(left, right, lg, rg, native_sql,
                                   float(grid_size), d)

    if strategy == "auto":
        # same helper, same RAW-right probe frame as the stmt fast path
        # above — resolved BEFORE _ensure_env/rename so neither
        # construction's projections can flip a borderline join (r12
        # ADVICE: Project rescales Catalyst's size estimate by row width)
        strategy = _resolve_auto_strategy(right, broadcast_threshold_rows)

    left, lp = _ensure_env(left, lg, "_l")
    right, rp = _ensure_env(right, rg, "_r")

    # resolve collisions before join — ONE projection (toDF aliases every
    # column in a single plan node, keeping column metadata/shape hints),
    # not a withColumnRenamed per collision: each of those is a separate
    # driver round-trip + plan rewrite, and this builder runs on the
    # interactive path (measured ~0.1s of per-join construction time)
    common = set(left.columns) & set(right.columns)
    if common:
        right_renamed = right.toDF(
            *[f"r_{c}" if c in common else c for c in right.columns])
    else:
        right_renamed = right
    rg2 = f"r_{rg}" if rg in common else rg

    env_cond = _env_join_cond(lp, rp, predicate, d)

    rect_l = left_is_points or left_is_rects  # side == its own envelope
    rect_r = right_is_points or right_is_rects

    # does the final join condition ever read the RAW geometry columns?
    # (False for every hint-exact branch, where envelope algebra IS the
    # predicate — lets the outer/semi/anti row-id hash skip the geometry
    # column so Catalyst can still prune a UDF-built geometry away)
    cond_reads_geom = True
    if predicate == "dwithin" and left_is_points and right_is_points:
        # fully native distance join: (x1-x2)² + (y1-y2)² ≤ d²
        dx = F.col(f"{lp}_xmin") - F.col(f"{rp}_xmin")
        dy = F.col(f"{lp}_ymin") - F.col(f"{rp}_ymin")
        exact: Optional[Column] = (dx * dx + dy * dy) <= F.lit(float(d) * float(d))
        cond_reads_geom = False
    elif predicate == "contains" and right_is_points and not left_is_points:
        # OGC contains over a point right side: the point must be in the left
        # interior → strict envelope bounds (exact when left rows are rects,
        # a superset prefilter refined by the UDF otherwise)
        env_cond = (
            (F.col(f"{lp}_xmin") < F.col(f"{rp}_xmin")) & (F.col(f"{lp}_xmax") > F.col(f"{rp}_xmax"))
            & (F.col(f"{lp}_ymin") < F.col(f"{rp}_ymin")) & (F.col(f"{lp}_ymax") > F.col(f"{rp}_ymax"))
        )
        exact = None if left_is_rects else _PRED_UDFS[predicate](F.col(lg), F.col(rg2))
    elif predicate == "within" and left_is_points and not right_is_points:
        env_cond = (
            (F.col(f"{rp}_xmin") < F.col(f"{lp}_xmin")) & (F.col(f"{rp}_xmax") > F.col(f"{lp}_xmax"))
            & (F.col(f"{rp}_ymin") < F.col(f"{lp}_ymin")) & (F.col(f"{rp}_ymax") > F.col(f"{lp}_ymax"))
        )
        exact = None if right_is_rects else _PRED_UDFS[predicate](F.col(lg), F.col(rg2))
    else:
        exact = _exact_cond(lg, rg2, predicate, d, rect_l, rect_r)
    if exact is None:
        cond_reads_geom = False

    cond = env_cond if exact is None else (env_cond & exact)
    # geometry-free condition ⇒ rows identical outside the geometry column
    # are interchangeable in match/unmatch reconciliation, so the content
    # hash may exclude it (and pruning then drops an unprojected UDF-built
    # geometry from the whole outer-join plan — measured: the SQL LEFT JOIN
    # query kept two ArrowEvalPython point-constructor stages alive solely
    # through the row-id hash)
    _id_exclude = () if cond_reads_geom else (lg,)

    if strategy == "broadcast":
        joined = left.join(F.broadcast(right_renamed), cond, how)
    elif how == "left":
        # grid path, left outer: inner matches via the cell equi-join, then
        # null-extend the unmatched left rows (found by anti-join on a row
        # id — the cell-exploded copies must collapse back to one row)
        lid = _stamp_row_id(left, exclude=_id_exclude)
        inner = _grid_join(lid, right_renamed, lp, rp, cond, "inner",
                           grid_size, d)
        unmatched = lid.join(inner.select("_lid").distinct(), "_lid",
                             "left_anti")
        joined = inner.unionByName(unmatched, allowMissingColumns=True) \
            .drop("_lid")
    elif how in ("left_semi", "left_anti"):
        # grid path with semi/anti: run the inner grid join over a synthetic
        # row id, then equi-semi/anti back — the exploded cell copies of a
        # left row must not leak into anti results
        lid = _stamp_row_id(left, exclude=_id_exclude)
        matched = _grid_join(lid, right_renamed, lp, rp, cond, "inner", grid_size, d) \
            .select("_lid").distinct()
        joined = lid.join(matched, "_lid", "left_semi" if how == "left_semi" else "left_anti") \
            .drop("_lid")
    else:
        joined = _grid_join(left, right_renamed, lp, rp, cond, how, grid_size, d)

    drop_cols = [f"{p}_{m}" for p in (lp, rp) for m in ("xmin", "ymin", "xmax", "ymax")]
    if how in ("left_semi", "left_anti"):
        drop_cols = [f"{lp}_{m}" for m in ("xmin", "ymin", "xmax", "ymax")]
    return joined.drop(*drop_cols)


def _dlit(x: float) -> str:
    """A Python double as a bit-exact SQL double literal.  A bare SQL
    decimal literal parses as DECIMAL (different arithmetic type);
    string→double cast is the same correctly-rounded parse as Python's —
    bit-identical to ``F.lit(float)`` in the operator spelling."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _native_cond_sql(predicate: str, d: float,
                     left_is_points: bool, left_is_rects: bool,
                     right_is_points: bool, right_is_rects: bool) -> Optional[str]:
    """SQL-text mirror of the hint-exact condition branches of
    ``spatial_join`` (same branch order, same comparison operators, same
    literal arithmetic — the differential gates in
    tests/test_spatial_join.py hold the two spellings row-identical).
    Returns None when the shape needs a refinement UDF — those joins stay
    on the operator path.

    The envelope references are ``str.format`` placeholders (lx0/ly0/lx1/
    ly1, rx0/ry0/rx1/ry1) filled in by `_stmt_grid_join` with direct
    ``<env struct>.<field>`` paths (round 16): the statement no longer
    flattens the env structs into ``_l_*``/``_r_*`` columns, so the cell
    exchanges ship each side's envelope ONCE (the struct) instead of
    twice (struct + four flattened doubles) — 32 bytes/row/side off the
    family's widest shuffle — and the statement analyzes a smaller tree."""
    lx0, ly0 = "{lx0}", "{ly0}"
    lx1, ly1 = "{lx1}", "{ly1}"
    rx0, ry0 = "{rx0}", "{ry0}"
    rx1, ry1 = "{rx1}", "{ry1}"
    if predicate == "dwithin":
        if not (left_is_points and right_is_points):
            return None
        pad, dd = _dlit(d), _dlit(float(d) * float(d))
        env = (f"{lx1} + {pad} >= {rx0} AND {rx1} >= {lx0} - {pad}"
               f" AND {ly1} + {pad} >= {ry0} AND {ry1} >= {ly0} - {pad}")
        exact = (f"({lx0} - {rx0}) * ({lx0} - {rx0})"
                 f" + ({ly0} - {ry0}) * ({ly0} - {ry0}) <= {dd}")
        return f"({env}) AND ({exact})"
    if predicate == "contains" and right_is_points and not left_is_points:
        if not left_is_rects:
            return None                      # strict prefilter + UDF refine
        return (f"{lx0} < {rx0} AND {lx1} > {rx1}"
                f" AND {ly0} < {ry0} AND {ly1} > {ry1}")
    if predicate == "within" and left_is_points and not right_is_points:
        if not right_is_rects:
            return None
        return (f"{rx0} < {lx0} AND {rx1} > {lx1}"
                f" AND {ry0} < {ly0} AND {ry1} > {ly1}")
    rect_l = left_is_points or left_is_rects
    rect_r = right_is_points or right_is_rects
    if rect_l and rect_r and predicate in (
            "intersects", "contains", "covers", "within", "covered_by"):
        if predicate in ("contains", "covers"):
            return (f"{lx0} <= {rx0} AND {lx1} >= {rx1}"
                    f" AND {ly0} <= {ry0} AND {ly1} >= {ry1}")
        if predicate in ("within", "covered_by"):
            return (f"{rx0} <= {lx0} AND {rx1} >= {lx1}"
                    f" AND {ry0} <= {ly0} AND {ry1} >= {ly1}")
        return (f"{lx1} >= {rx0} AND {rx1} >= {lx0}"
                f" AND {ly1} >= {ry0} AND {ry1} >= {ly0}")
    return None


def _stmt_grid_join(left: DataFrame, right: DataFrame, lg: str, rg: str,
                    cond_sql: str, grid_size: float, d: float) -> DataFrame:
    """The inner grid join as ONE ``spark.sql`` statement (promoted round
    12 from the r11 `_grid_join_sql` prototype, which measured the grid
    fragment alone at −30% construction).  Everything the operator path
    spreads over ~12 eager Dataset ops folds into the statement: the
    right-side ``r_`` collision rename
    (the same convention as the operator path — closing the r11 ADVICE
    duplicate-column finding on the prototype), both nested cell explodes,
    the cell equi-join + reference-cell algebraic dedup + hint-exact
    condition, and the env-free output projection.  One parse, one
    analysis; the logical shape, exchanges, and output columns match the
    operator form exactly (gated in tests/test_spatial_join.py).  The
    source DataFrames enter via ``spark.sql`` named-args — no temp views,
    no catalog residue."""
    spark = left.sparkSession
    s, pad = _dlit(grid_size), _dlit(d)
    common = set(left.columns) & set(right.columns)
    rname = {c: (f"r_{c}" if c in common else c) for c in right.columns}
    lenv = f"`{lg}_env`"
    renv_in = f"`{rg}_env`"               # before the collision rename
    renv = f"`{rname[rg + '_env']}`"      # after it
    # direct struct-field envelope paths (round 16): no _l_*/_r_* flatten
    # projections — the exchanges carry each side's env struct once, and
    # the statement tree is two SELECT levels shallower per side
    cond = cond_sql.format(
        lx0=f"l.{lenv}.`xmin`", ly0=f"l.{lenv}.`ymin`",
        lx1=f"l.{lenv}.`xmax`", ly1=f"l.{lenv}.`ymax`",
        rx0=f"r.{renv}.`xmin`", ry0=f"r.{renv}.`ymin`",
        rx1=f"r.{renv}.`xmax`", ry1=f"r.{renv}.`ymax`")
    lsel = ", ".join(f"`{c}`" for c in left.columns)
    rsel = ", ".join(f"`{c}` AS `{rname[c]}`" for c in right.columns)
    lproj = ", ".join(f"l.`{c}`" for c in left.columns)
    rproj = ", ".join(f"r.`{rname[c]}`" for c in right.columns)
    return spark.sql(f"""
WITH lcell AS (
  SELECT *, explode(sequence(floor(({lenv}.`ymin` - {pad}) / {s}),
                             floor(({lenv}.`ymax` + {pad}) / {s}))) AS _cy
  FROM (SELECT {lsel}, explode(sequence(floor(({lenv}.`xmin` - {pad}) / {s}),
                                        floor(({lenv}.`xmax` + {pad}) / {s}))) AS _cx
        FROM {{sj_left}})
), rcell AS (
  SELECT *, explode(sequence(floor({renv}.`ymin` / {s}),
                             floor({renv}.`ymax` / {s}))) AS _cy
  FROM (SELECT {rsel}, explode(sequence(floor({renv_in}.`xmin` / {s}),
                                        floor({renv_in}.`xmax` / {s}))) AS _cx
        FROM {{sj_right}})
)
SELECT {lproj}, {rproj}
FROM lcell l JOIN rcell r
  ON l._cx = r._cx AND l._cy = r._cy
 AND l._cx = floor(greatest(l.{lenv}.`xmin` - {pad}, r.{renv}.`xmin`) / {s})
 AND l._cy = floor(greatest(l.{lenv}.`ymin` - {pad}, r.{renv}.`ymin`) / {s})
 AND ({cond})
""", sj_left=left, sj_right=right)


def _stamp_row_id(df: DataFrame, exclude: tuple = ()) -> DataFrame:
    """Deterministic per-row id for the outer/semi/anti reconciliation
    joins.  ``monotonically_increasing_id`` is nondeterministic under stage
    retry — the id frame is referenced by TWO plans (the inner grid join and
    the anti-join back), so a recomputed partition could stamp different ids
    and drop or duplicate rows at cluster scale.  A 128-bit content hash is
    stable across recomputation; identical duplicate rows share an id, which
    is semantics-preserving for match/unmatch reconciliation (duplicates are
    interchangeable).  Falls back to an eager localCheckpoint for
    un-hashable column types (maps)."""
    cols = [F.col(f"`{c}`") for c in df.columns if c not in exclude]
    if not cols:
        cols = [F.col(f"`{c}`") for c in df.columns]
    try:
        return df.withColumn(
            "_lid", F.struct(F.xxhash64(*cols).alias("h1"),
                             F.xxhash64(F.lit(17), *cols).alias("h2")))
    except Exception:
        from ..lineage import truncate_lineage
        return truncate_lineage(
            df.withColumn("_lid", F.monotonically_increasing_id()),
            eager=True)


# session-lifetime cache of sample-driven grid sizes, keyed by the
# canonicalized (semantic) plan hashes of both join inputs: repeated
# executions of the same join skip the stats job entirely (the same
# derived-statistics caching Spark applies to relation stats).  Stale only
# if the underlying files change within one session — the same staleness
# window Spark's own cached file listings have.
_GRID_SIZE_CACHE: dict = {}


# session-lifetime cache of per-SIDE envelope statistics, keyed by the
# OPTIMIZED plan hash of the side's stats frame (round 16, guide §5)
_ENV_STATS_CACHE: dict = {}


def _cached_grid_size(level1_key, lstats_fn, rstats_fn, d: float) -> float:
    """Two-level grid-size cache (round 16, guide §5 — driver-side cost).

    Level 1 (pre-existing): the analyzed-plan semantic hashes of the raw
    join inputs — a cheap exact match for re-running the same join.
    Level 2 (new): per-SIDE envelope statistics keyed by the OPTIMIZED
    plan hash of each side's stats frame.  Column pruning sees through
    projection/rename variants of the same side — the operator-form and
    SQL-text spellings of one declared join project different column
    subsets (and arrive with the sides SWAPPED, since the SQL front door
    plans ``ST_Contains(r, l)`` as the inverse predicate) but prune to
    identical per-side stats queries; canonicalization also ignores the
    l/r output aliases.  A join whose sides were BOTH seen before (in any
    orientation, under any projection, even paired differently) derives
    its grid size with NO job at all; one new side costs a single-side
    aggregate instead of the two-sided crossJoin.  Measured: a full-miss
    job is ~110-230 ms and 4 AQE jobs; a both-sides-hit is ~75 ms of
    driver-only work (stats-frame build + optimize).  At 100 TB each
    side's stats job is a full scan of that input, so every hit saves
    real work, not just dispatch latency."""
    if level1_key is not None and level1_key in _GRID_SIZE_CACHE:
        return _GRID_SIZE_CACHE[level1_key]
    lstats, rstats = lstats_fn(), rstats_fn()

    def _h(df):
        try:
            return df._jdf.queryExecution().optimizedPlan().semanticHash()
        except Exception:
            return None
    hl, hr = _h(lstats), _h(rstats)
    ls = _ENV_STATS_CACHE.get(hl) if hl is not None else None
    rs = _ENV_STATS_CACHE.get(hr) if hr is not None else None
    if ls is None and rs is None:
        row = lstats.crossJoin(rstats).first()
        ls = {k: row[f"l{k}"] for k in ("w", "h", "W", "H")}
        rs = {k: row[f"r{k}"] for k in ("w", "h", "W", "H")}
    elif ls is None:
        row = lstats.first()
        ls = {k: row[f"l{k}"] for k in ("w", "h", "W", "H")}
    elif rs is None:
        row = rstats.first()
        rs = {k: row[f"r{k}"] for k in ("w", "h", "W", "H")}
    if hl is not None and len(_ENV_STATS_CACHE) < 512:
        _ENV_STATS_CACHE[hl] = ls
    if hr is not None and len(_ENV_STATS_CACHE) < 512:
        _ENV_STATS_CACHE[hr] = rs
    grid_size = _derive_grid_size(ls, rs, d)
    if level1_key is not None and len(_GRID_SIZE_CACHE) < 256:
        _GRID_SIZE_CACHE[level1_key] = grid_size
    return grid_size


def _derive_grid_size(ls: dict, rs: dict, d: float) -> float:
    """Cell size from both sides' envelope stats: target ~2 cells per
    average envelope.  Both sides matter — sizing off the left alone would
    shred a wide-envelope right side (e.g. points JOIN polygons) across
    millions of cells each.  Cells ~2× the *smaller* side's average
    envelope give that side ~1 cell per row; the floor sqrt(area_big/64)
    caps the wide side's cell replication at ~64 copies per row, so a
    points-vs-polygons join still spreads across many cells instead of
    collapsing into the handful of whole-extent cells the polygons
    dictate."""
    lw = max(ls["w"] or 0.0, ls["h"] or 0.0)
    rw = max(rs["w"] or 0.0, rs["h"] or 0.0)
    extent = max(ls["W"] or 1.0, ls["H"] or 1.0,
                 rs["W"] or 1.0, rs["H"] or 1.0, 1e-9)
    big_area = max((ls["w"] or 0.0) * (ls["h"] or 0.0),
                   (rs["w"] or 0.0) * (rs["h"] or 0.0))
    return max(2.0 * min(lw, rw) + 2.0 * d,
               (big_area / 64.0) ** 0.5,
               extent / 4096.0)


def _grid_size_from_env(left: DataFrame, right: DataFrame,
                        lg: str, rg: str, d: float) -> float:
    """Sample-driven grid size for the single-statement path, read straight
    off the persisted ``<geom>_env`` structs (the operator path computes the
    same aggregates over its flattened env fields — identical values, so the
    two constructions derive identical cell sizes).  Cached per
    (semantic-plan-hash, d) like the operator path's sizing."""
    key = None
    try:
        key = (left._jdf.queryExecution().analyzed().semanticHash(),
               right._jdf.queryExecution().analyzed().semanticHash(),
               float(d), ("env", lg, rg))
    except Exception:
        pass

    def _stats(df, g, pre):
        e = F.col(f"{g}_env")
        return df.select(
            F.avg(e["xmax"] - e["xmin"]).alias(f"{pre}w"),
            F.avg(e["ymax"] - e["ymin"]).alias(f"{pre}h"),
            (F.max(e["xmax"]) - F.min(e["xmin"])).alias(f"{pre}W"),
            (F.max(e["ymax"]) - F.min(e["ymin"])).alias(f"{pre}H"),
        )
    return _cached_grid_size(key, lambda: _stats(left, lg, "l"),
                             lambda: _stats(right, rg, "r"), d)


def _grid_join(left: DataFrame, right: DataFrame, lp: str, rp: str,
               cond: Column, how: str, grid_size: Optional[float], d: float) -> DataFrame:
    if grid_size is None:
        key = None
        try:
            key = (left._jdf.queryExecution().analyzed().semanticHash(),
                   right._jdf.queryExecution().analyzed().semanticHash(),
                   float(d), lp, rp)
        except Exception:
            pass

        # sample-driven cell sizing — see _derive_grid_size.  ONE job for
        # both sides (1×1 cross of two single-row aggregates) — at 100 TB
        # this is still two scans' worth of work, but scheduled together
        # instead of as two sequential driver round-trips; the two-level
        # cache (`_cached_grid_size`) skips it for re-runs and for
        # projection variants of the same inputs
        def _stats(df, p, pre):
            return df.select(
                F.avg(F.col(f"{p}_xmax") - F.col(f"{p}_xmin")).alias(f"{pre}w"),
                F.avg(F.col(f"{p}_ymax") - F.col(f"{p}_ymin")).alias(f"{pre}h"),
                (F.max(f"{p}_xmax") - F.min(f"{p}_xmin")).alias(f"{pre}W"),
                (F.max(f"{p}_ymax") - F.min(f"{p}_ymin")).alias(f"{pre}H"),
            )
        grid_size = _cached_grid_size(key, lambda: _stats(left, lp, "l"),
                                      lambda: _stats(right, rp, "r"), d)

    s = float(grid_size)

    # left side padded by d for dwithin; right side unpadded.  The cell
    # explodes, dedup predicate and output projection are built as SQL
    # expression STRINGS (one parse round-trip each) rather than stacked
    # Column operators: this builder is on the interactive path and the
    # operator-at-a-time spelling cost ~1200 driver IPC round-trips
    # (~0.18s) per join construction, all of it avoidable chatter — the
    # parsed plans are identical.
    # float literals are embedded as CAST('<repr>' AS DOUBLE): a bare SQL
    # decimal literal parses as DECIMAL (different arithmetic type), while
    # string->double cast is the same correctly-rounded parse as Python's —
    # bit-identical to the F.lit(float) the operator spelling used.
    lpad = f"CAST('{float(d)!r}' AS DOUBLE)"
    sv = f"CAST('{s!r}' AS DOUBLE)"
    lcell = left.selectExpr(
        "*",
        f"explode(sequence(floor((`{lp}_xmin` - {lpad}) / {sv}), "
        f"floor((`{lp}_xmax` + {lpad}) / {sv}))) AS _cx",
    ).selectExpr(
        "*",
        f"explode(sequence(floor((`{lp}_ymin` - {lpad}) / {sv}), "
        f"floor((`{lp}_ymax` + {lpad}) / {sv}))) AS _cy",
    )
    rcell = right.selectExpr(
        "*",
        f"explode(sequence(floor(`{rp}_xmin` / {sv}), "
        f"floor(`{rp}_xmax` / {sv}))) AS _cx",
    ).selectExpr(
        "*",
        f"explode(sequence(floor(`{rp}_ymin` / {sv}), "
        f"floor(`{rp}_ymax` / {sv}))) AS _cy",
    )

    # reference-cell dedup: emit the pair only in the cell holding the
    # min-corner of the envelope intersection (algebraic exactly-once)
    dedup = F.expr(
        f"l._cx = floor(greatest(l.`{lp}_xmin` - {lpad}, r.`{rp}_xmin`) / {sv})"
        f" AND l._cy = floor(greatest(l.`{lp}_ymin` - {lpad}, r.`{rp}_ymin`) / {sv})"
        f" AND l._cx = r._cx AND l._cy = r._cy")

    lal = lcell.alias("l")
    ral = rcell.alias("r")
    out = lal.join(ral, dedup & cond, how)
    if how in ("left_semi", "left_anti"):
        return out.drop("_cx", "_cy")
    return out.selectExpr(
        *[f"l.`{c}`" for c in lcell.columns if c not in ("_cx", "_cy")],
        *[f"r.`{c}`" for c in rcell.columns if c not in ("_cx", "_cy")])
