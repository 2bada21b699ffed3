"""SQL-text spatial join planning — the ``JoinQueryDetector`` front door.

The reference plans a *plain SQL* spatial join —
``SELECT ... FROM l JOIN r ON ST_Contains(r.geo, l.geo)`` — into
``BroadcastIndexJoin``/``RangeJoin`` via an injected planner strategy
(``SedonaIcebergExtensions.scala:47``, asserted by plan-string regex at
``TestSedonaIcebergExtension.scala:117-142``).  PySpark cannot inject a
Catalyst strategy, so this module does the same detection one level up, on
the SQL text itself:

1. find ``FROM <rel> [a] JOIN <rel> [b] ON ST_pred(x.geo, y.geo) [AND ...]``
   (table aliases optional — a bare table name is its own alias),
2. plan that join through :func:`operators.spatial_join.spatial_join`
   (grid cell equi-join — sort-merge/shuffled-hash + AQE, never a
   BroadcastNestedLoopJoin/CartesianProduct),
3. expose the join result as a temp view with one **struct column per table
   alias**, so every ``a.col`` / ``b.col`` reference in the rest of the
   statement keeps resolving unchanged (struct field access), and run the
   rewritten statement through ``spark.sql``.

**Chained spatial joins** (``FROM a JOIN b ON ST_p(...) JOIN c ON
ST_q(...)``) are planned left-to-right: each join's pair view becomes the
left input of the next detection pass, and geometry references like
``a.geo`` resolve through the prior view's alias-struct columns (shape-hint
metadata is re-stamped on extraction, so the Python-free exact-envelope
paths survive the chain).  Detection runs on consecutive spatial joins at
the head of the FROM clause; a trailing *non*-spatial equi-join after the
spatial chain also works, since the pair view's struct columns keep
``alias.col`` references valid in the untouched remainder.

Statements with no spatial equi-theta join — or shapes this detector does
not recognize — fall through to ``spark.sql`` verbatim: the registered ST_*
UDFs still evaluate them correctly, just without the planner upgrade (the
same correct-but-unindexed fallback the reference has for non-join
predicates).
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from .spatial_join import spatial_join

# SQL name -> (internal predicate, inverse when arg order is (right, left))
_PREDICATES = {
    "st_contains": ("contains", "within"),
    "st_within": ("within", "contains"),
    "st_covers": ("covers", "covered_by"),
    "st_coveredby": ("covered_by", "covers"),
    "st_covered_by": ("covered_by", "covers"),
    "st_intersects": ("intersects", "intersects"),
    "st_touches": ("touches", "touches"),
    "st_crosses": ("crosses", "crosses"),
    "st_overlaps": ("overlaps", "overlaps"),
    "st_equals": ("equals", "equals"),
    "st_dwithin": ("dwithin", "dwithin"),
}

# a bare word after a relation is an alias only if it isn't a keyword
_NOT_KW = (r"(?!ON\b|JOIN\b|INNER\b|CROSS\b|LEFT\b|RIGHT\b|FULL\b|WHERE\b"
           r"|GROUP\b|HAVING\b|ORDER\b|LIMIT\b|UNION\b|EXCEPT\b|INTERSECT\b)")

_JOIN_RE = re.compile(
    rf"""FROM\s+
        (?P<lrel>[\w.]+)(?:\s+(?:AS\s+)?{_NOT_KW}(?P<lalias>\w+))?\s+
        (?:(?P<outer>LEFT\s+(?:OUTER\s+)?)|INNER\s+)?JOIN\s+
        (?P<rrel>[\w.]+)(?:\s+(?:AS\s+)?{_NOT_KW}(?P<ralias>\w+))?\s+
        ON\s+(?P<pred>ST_\w+)\s*\(""",
    re.IGNORECASE | re.VERBOSE,
)

# end of a trailing AND-conjunct run after the ON clause: next clause,
# next JOIN (the conjuncts belong to *this* join, not the one after), or EOS
_CLAUSE_END_RE = re.compile(
    r"\b((?:INNER\s+|CROSS\s+|LEFT\s+(?:OUTER\s+)?|RIGHT\s+(?:OUTER\s+)?"
    r"|FULL\s+(?:OUTER\s+)?)?JOIN|WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT"
    r"|UNION|EXCEPT|INTERSECT)\b|$",
    re.IGNORECASE,
)

# where a deferred WHERE clause may be injected in the statement tail
_WHERE_SLOT_RE = re.compile(
    r"\b(GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|UNION|EXCEPT|INTERSECT)\b|$",
    re.IGNORECASE,
)

_ARG_RE = re.compile(r"^(\w+)\.(\w+)$")

_VIEW_PREFIX = "__spatial_sql_join_"
_VIEW_COUNTER = [0]


class _Match(NamedTuple):
    span: Tuple[int, int]      # [start, end) of the full FROM..ON..(args)[AND..] text
    lrel: str
    lalias: str
    rrel: str
    ralias: str
    pred_sql: str
    args: List[str]
    extra: Optional[str]       # trailing AND-conjuncts (verbatim SQL) or None
    how: str                   # "inner" | "left"


def _balanced_args(sql: str, open_idx: int) -> Tuple[List[str], int]:
    """Split the argument list starting after ``(`` at *open_idx*; returns
    (args, index just past the closing paren)."""
    depth, i, start, args = 1, open_idx + 1, open_idx + 1, []
    while i < len(sql) and depth:
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[start:i].strip())
        elif c == "," and depth == 1:
            args.append(sql[start:i].strip())
            start = i + 1
        i += 1
    if depth:
        raise ValueError("unbalanced parentheses in spatial predicate")
    return args, i


def _find_spatial_join(sql: str) -> Optional[_Match]:
    m = _JOIN_RE.search(sql)
    if not m:
        return None
    pred = m.group("pred").lower()
    if pred not in _PREDICATES:
        return None
    args, after = _balanced_args(sql, m.end() - 1)
    # optional trailing AND-conjuncts belong to the join condition
    extra = None
    rest = sql[after:]
    am = re.match(r"\s+AND\s+", rest, re.IGNORECASE)
    if am:
        em = _CLAUSE_END_RE.search(rest, am.end())
        extra = rest[am.end():em.start()].strip()
        after += em.start()
    lalias = m.group("lalias") or m.group("lrel").rsplit(".", 1)[-1]
    ralias = m.group("ralias") or m.group("rrel").rsplit(".", 1)[-1]
    how = "left" if m.group("outer") else "inner"
    return _Match((m.start(), after), m.group("lrel"), lalias,
                  m.group("rrel"), ralias, pred, args, extra, how)


def _resolve_geom(df: DataFrame, side_alias: str, arg_alias: str,
                  arg_col: str) -> Optional[Tuple[DataFrame, str, List[str]]]:
    """Resolve a predicate argument ``arg_alias.arg_col`` against one join
    side.  Plain case: the alias names the side and the column exists.
    Pair-view case: the alias is a struct column of a prior spatial-join
    view — extract the geometry (and its ``_env`` companion) into flat temp
    columns, re-stamping shape-hint metadata so the native envelope paths
    survive.  Returns (df, flat_geom_col, temp_cols) or None."""
    if arg_alias == side_alias and arg_col in df.columns:
        return df, arg_col, []
    if arg_alias in df.columns and isinstance(df.schema[arg_alias].dataType, StructType):
        inner: StructType = df.schema[arg_alias].dataType
        if arg_col not in inner.fieldNames():
            return None
        tmp = f"__geo_{arg_alias}_{arg_col}"
        md = inner[arg_col].metadata
        extract = [F.col(f"`{arg_alias}`.`{arg_col}`").alias(tmp, metadata=md or None)]
        tmps = [tmp]
        env = f"{arg_col}_env"
        if env in inner.fieldNames():
            extract.append(F.col(f"`{arg_alias}`.`{env}`").alias(f"{tmp}_env"))
            tmps.append(f"{tmp}_env")
        return df.select("*", *extract), tmp, tmps
    return None


def plan_spatial_join_sql(
    spark: SparkSession,
    match: _Match,
    strategy: str = "grid",
) -> str:
    """Plan the matched spatial join; returns the temp-view name exposing the
    result as one struct column per table alias (prior-join alias structs on
    the left side pass through unchanged)."""
    ldf = spark.table(match.lrel)
    rdf = spark.table(match.rrel)
    l_is_pair_view = match.lrel.startswith(_VIEW_PREFIX)

    args = match.args
    d = 0.0
    if match.pred_sql == "st_dwithin":
        if len(args) != 3:
            raise ValueError("ST_DWithin requires (geomA, geomB, distance)")
        d = float(args[2])
        args = args[:2]
    refs = [_ARG_RE.match(a) for a in args]
    if not all(refs):
        raise ValueError(f"unsupported spatial join arguments {args!r}")
    (a_alias, a_col), (b_alias, b_col) = [(r.group(1), r.group(2)) for r in refs]

    fwd, inv = _PREDICATES[match.pred_sql]
    left_res = _resolve_geom(ldf, match.lalias, a_alias, a_col)
    right_res = _resolve_geom(rdf, match.ralias, b_alias, b_col)
    if left_res and right_res:
        predicate = fwd
    else:
        # args are (right, left): pred(r, l) == inverse-pred(l, r)
        left_res = _resolve_geom(ldf, match.lalias, b_alias, b_col)
        right_res = _resolve_geom(rdf, match.ralias, a_alias, a_col)
        if not (left_res and right_res):
            raise ValueError(
                f"spatial predicate references {a_alias}/{b_alias}, "
                f"join aliases are {match.lalias}/{match.ralias}")
        predicate = inv

    ldf2, lgeo, ltmps = left_res
    rdf2, rgeo, _ = right_res

    joined = spatial_join(ldf2, rdf2, predicate=predicate, on=(lgeo, rgeo),
                          how=match.how, strategy=strategy, d=d)

    lcols, rcols = ldf2.columns, rdf2.columns
    common = set(lcols) & set(rcols)
    rstruct = F.struct(*[F.col(f"`r_{c}`" if c in common else f"`{c}`").alias(c)
                         for c in rcols]).alias(match.ralias)
    if l_is_pair_view:
        # left columns are already one struct per prior alias — pass through
        keep = [F.col(f"`{c}`").alias(c) for c in lcols if c not in ltmps]
        out = joined.select(*keep, rstruct)
    else:
        out = joined.select(
            F.struct(*[F.col(f"`{c}`").alias(c) for c in lcols
                       if c not in ltmps]).alias(match.lalias),
            rstruct,
        )

    _VIEW_COUNTER[0] += 1
    view = f"{_VIEW_PREFIX}{_VIEW_COUNTER[0]}"
    out.createOrReplaceTempView(view)
    return view


def _inject_where(tail: str, extra: str) -> str:
    """Fold a join's deferred AND-conjuncts into the statement tail: into an
    existing WHERE if present, else as a new WHERE at the clause slot after
    any remaining joins (inner-join semantics make the placement exact)."""
    wm = re.search(r"\bWHERE\b", tail, re.IGNORECASE)
    if wm:
        return tail[:wm.end()] + f" ({extra}) AND" + tail[wm.end():]
    sm = _WHERE_SLOT_RE.search(tail)
    return f"{tail[:sm.start()]} WHERE {extra} {tail[sm.start():]}"


def spatial_sql(spark: SparkSession, sql: str, strategy: str = "grid") -> DataFrame:
    """Run a SQL statement, planning every recognized ``JOIN ... ON ST_pred``
    (including chains of them) through the distributed spatial join instead
    of Spark's default BroadcastNestedLoopJoin-over-UDF.

    Unrecognized statements run unchanged (correct, unoptimized)."""
    for _ in range(8):  # bounded chain of spatial joins per statement
        match = _find_spatial_join(sql)
        if match is None:
            break
        try:
            view = plan_spatial_join_sql(spark, match, strategy=strategy)
        except Exception:
            # fall back to vanilla evaluation — the ST_* UDFs are registered,
            # so the unrewritten statement still computes the right answer
            return spark.sql(sql)
        start, end = match.span
        head, tail = sql[:start], sql[end:]
        if tail and not tail[0].isspace():
            tail = " " + tail
        if match.extra:
            tail = _inject_where(tail, match.extra)
        sql = f"{head}FROM {view}{tail}"
    return spark.sql(sql)
