"""Row-level DML over parquet tables: UPDATE / DELETE / MERGE with
file-granularity copy-on-write.

The reference's row-level surface is Iceberg copy-on-write DML with spatial
predicates pushed to the scan (``example/.../App.scala:66`` —
``UPDATE ... WHERE ST_Contains(...)``; test assertions on the UPDATE's scan at
``TestSedonaIcebergExtension.scala:82-87``).  Without an Iceberg runtime the
engine reproduces the same semantics over a plain parquet directory:

1. **Plan**: find the files that contain matching rows —
   ``filter(pred).select(input_file_name()).distinct()``.  The predicate
   (including its envelope prefilter, SURVEY.md §2 Tier B) is pushed to the
   scan, so non-matching files are skipped via parquet min/max stats without
   being read — the analogue of Iceberg's manifest-level file pruning.
2. **Rewrite**: only the touched files are read again and rewritten
   (``CASE WHEN pred THEN new ELSE old``); untouched files are never opened.
   At 100 TB a selective UPDATE rewrites a handful of files, not the table.
3. **Commit**: new files are written to a staging directory and swapped in
   with atomic per-file renames; touched originals are removed last.
   (Single-writer semantics — full snapshot isolation needs a real table
   format; this mirrors what Iceberg's CoW writer does per file.)

SQL surface: :func:`sql_dml` accepts the reference's literal statement shapes
(``UPDATE t SET c = expr WHERE pred`` / ``DELETE FROM t WHERE pred``), plus
the Iceberg MERGE shape (``MERGE INTO t USING s ON t.k = s.k WHEN MATCHED
THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``), and dispatches to the
API, so the reference's example job lines run verbatim.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Observation, SparkSession, functions as F


def _to_col(expr) -> Column:
    return F.expr(expr) if isinstance(expr, str) else expr


def bounded_file_list(df: DataFrame, what: str = "rewrite") -> list:
    """Driver-side matched-file list (column ``_f``) for a copy-on-write
    commit, bounded.

    The emulation layer keeps manifests driver-side, so the matched-file
    set must land on the driver — but collected unbounded, a wide predicate
    over a 100 TB table (millions of files) is a silent driver OOM that
    real Iceberg avoids with distributed manifest reads.  A hard cap (env
    ``SPARK_GRAFT_MAX_COW_FILES``, default 100k paths ≈ ~10 MB of strings)
    turns that into a clear, actionable error instead of an OOM."""
    cap = int(os.environ.get("SPARK_GRAFT_MAX_COW_FILES", "100000"))
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise RuntimeError(
            f"copy-on-write {what} matches more than {cap} data files; "
            "this snapshot emulation keeps the matched-file manifest on "
            "the driver — raise SPARK_GRAFT_MAX_COW_FILES if the driver "
            "has memory for it, or narrow the predicate")
    return [r["_f"].replace("file://", "") or r["_f"] for r in rows]


def _table_files(spark: SparkSession, path: str, predicate) -> list:
    """Paths of data files containing at least one matching row (the
    predicate reaches the parquet scan, so stats-skipped files cost nothing)."""
    df = spark.read.parquet(path)
    # the file name must be materialized as a column BEFORE the predicate:
    # pandas-UDF filters re-batch rows across file boundaries, making a
    # post-filter input_file_name() attribute rows to the wrong file
    return bounded_file_list(
        df.withColumn("_f", F.input_file_name())
        .filter(_to_col(predicate))
        .select("_f").distinct(), "update/delete")


def _swap_in(path: str, staged_dir: str, touched: list) -> int:
    """Per-file rename commit: move staged part files into the table dir,
    then drop the rewritten originals."""
    n_new = 0
    for name in os.listdir(staged_dir):
        if name.startswith("part-") or name.endswith(".parquet"):
            os.rename(os.path.join(staged_dir, name),
                      os.path.join(path, f"cow-{uuid.uuid4().hex}-{name}"))
            n_new += 1
    shutil.rmtree(staged_dir, ignore_errors=True)
    for f in touched:
        if os.path.exists(f):
            os.remove(f)
    return n_new


def update_where(spark: SparkSession, path: str,
                 assignments: Dict[str, object], predicate) -> dict:
    """Copy-on-write ``UPDATE path SET assignments WHERE predicate``.

    ``assignments``: column → Column or SQL-expression string.
    Returns ``{"files_rewritten": n, "rows_updated": n}``.
    """
    pred = _to_col(predicate)
    cols = set(spark.read.parquet(path).columns)
    unknown = set(assignments) - cols
    if unknown:
        raise ValueError(f"UPDATE SET references unknown column(s) "
                         f"{sorted(unknown)} (table has {sorted(cols)})")
    touched = _table_files(spark, path, pred)
    if not touched:
        return {"files_rewritten": 0, "rows_updated": 0}

    df = spark.read.parquet(*touched)
    # row count rides the rewrite job itself (Observation metric) — no
    # second scan of the touched files just to count
    obs = Observation()
    dfo = df.observe(obs, F.count(F.when(pred, 1)).alias("n"))
    updated = dfo.select(*[
        (F.when(pred, _to_col(assignments[c]).cast(df.schema[c].dataType))
         .otherwise(F.col(c))).alias(c) if c in assignments else F.col(c)
        for c in df.columns
    ])
    staged = os.path.join(os.path.dirname(path.rstrip("/")),
                          f".staged-{uuid.uuid4().hex}")
    updated.write.mode("overwrite").parquet(staged)
    n_rows = obs.get["n"]
    _swap_in(path, staged, touched)
    return {"files_rewritten": len(touched), "rows_updated": n_rows}


def delete_where(spark: SparkSession, path: str, predicate) -> dict:
    """Copy-on-write ``DELETE FROM path WHERE predicate``."""
    pred = _to_col(predicate)
    touched = _table_files(spark, path, pred)
    if not touched:
        return {"files_rewritten": 0, "rows_deleted": 0}
    df = spark.read.parquet(*touched)
    obs = Observation()
    dfo = df.observe(obs, F.count(F.when(pred, 1)).alias("n"))
    kept = dfo.filter(~pred | pred.isNull())
    staged = os.path.join(os.path.dirname(path.rstrip("/")),
                          f".staged-{uuid.uuid4().hex}")
    kept.write.mode("overwrite").parquet(staged)
    n_rows = obs.get["n"]
    _swap_in(path, staged, touched)
    return {"files_rewritten": len(touched), "rows_deleted": n_rows}


def merge_into(spark: SparkSession, target_path: str, source: DataFrame,
               on: str, update_cols: Optional[list] = None,
               insert_when_not_matched: bool = True,
               update_when_matched: bool = True) -> dict:
    """``MERGE INTO target USING source ON target.on = source.on`` with
    WHEN MATCHED THEN UPDATE (all or ``update_cols``) and optional
    WHEN NOT MATCHED THEN INSERT.

    Scale shape: touched files are found by *semi-joining* the materialized
    file-name column against the source keys — a hash join (broadcast when
    the key side is small, shuffle otherwise) at ANY key count.  No key set
    is ever collected to the driver, and there is no full-table-rewrite
    fallback; only the file *list* (metadata-scale, like an Iceberg
    manifest) comes back.  Duplicate source join keys raise — SQL MERGE
    cardinality semantics (a second match for the same target row is an
    error, not a silent row multiplication).
    """
    target = spark.read.parquet(target_path)
    cols = target.columns
    update_cols = update_cols or [c for c in cols if c != on]
    unknown = set(update_cols) - set(cols)
    if unknown:
        raise ValueError(f"MERGE UPDATE SET references unknown column(s) "
                         f"{sorted(unknown)} (table has {sorted(cols)})")

    keys = source.select(on).distinct()
    dup = (source.groupBy(on).agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") > 1).limit(1).collect())
    if dup:
        raise ValueError(
            f"MERGE: source has multiple rows for key {on}={dup[0][on]!r} "
            "(SQL MERGE forbids multiple matches per target row)")

    touched = [] if not update_when_matched else bounded_file_list(
        target.withColumn("_f", F.input_file_name())
        .join(keys, on, "left_semi")
        .select("_f").distinct(), "merge")

    src = source.select(*[F.col(c).alias(f"_src_{c}") for c in source.columns])
    obs_u = None
    rewritten = None
    if touched:
        matched_files_df = spark.read.parquet(*touched)
        joined = matched_files_df.join(
            src, matched_files_df[on] == src[f"_src_{on}"], "left")
        obs_u = Observation()
        joined = joined.observe(obs_u, F.count(F.col(f"_src_{on}")).alias("n"))
        rewritten = joined.select(*[
            (F.when(F.col(f"_src_{on}").isNotNull(), F.col(f"_src_{c}"))
             .otherwise(F.col(c))).alias(c)
            if c in update_cols and f"_src_{c}" in joined.columns else F.col(c)
            for c in cols
        ])
    obs_i = None
    inserts = None
    if insert_when_not_matched:
        obs_i = Observation()
        inserts = (src.join(target.select(on),
                            src[f"_src_{on}"] == F.col(on), "left_anti")
                   .observe(obs_i, F.count(F.lit(1)).alias("n"))
                   # null-fill target columns the source lacks — the table's
                   # schema must not drift per-file on insert
                   .select(*[(F.col(f"_src_{c}") if f"_src_{c}" in src.columns
                              else F.lit(None).cast(target.schema[c].dataType))
                             .alias(c) for c in cols]))
    if rewritten is None and inserts is None:
        return {"files_rewritten": 0, "rows_updated": 0, "rows_inserted": 0}

    staged = os.path.join(os.path.dirname(target_path.rstrip("/")),
                          f".staged-{uuid.uuid4().hex}")
    if rewritten is not None and inserts is not None:
        out = rewritten.unionByName(inserts, allowMissingColumns=True)
    else:
        out = rewritten if rewritten is not None else inserts
    out.write.mode("overwrite").parquet(staged)
    n_updated = obs_u.get["n"] if obs_u is not None else 0
    n_inserted = obs_i.get["n"] if obs_i is not None else 0
    _swap_in(target_path, staged, touched)
    return {"files_rewritten": len(touched), "rows_updated": n_updated,
            "rows_inserted": n_inserted}


# ---------------------------------------------------------------------------
# SQL statement surface (the reference's literal UPDATE/DELETE shapes)
# ---------------------------------------------------------------------------

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<t>\S+)\s+SET\s+(?P<set>.+?)\s+WHERE\s+(?P<w>.+?)\s*$",
    re.IGNORECASE | re.DOTALL)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<t>\S+)\s+WHERE\s+(?P<w>.+?)\s*$",
    re.IGNORECASE | re.DOTALL)
# the Iceberg/ANSI MERGE shape the reference's substrate speaks:
#   MERGE INTO t [AS a] USING s [AS b] ON <x>.k = <y>.k
#   WHEN MATCHED THEN UPDATE SET * | c1 = src.c1 [, ...]
#   [WHEN NOT MATCHED THEN INSERT *]
_MERGE_RE = re.compile(
    r"""^\s*MERGE\s+INTO\s+(?P<t>\S+)(?:\s+(?:AS\s+)?(?P<ta>\w+))?\s+
        USING\s+(?P<s>\S+)(?:\s+(?:AS\s+)?(?P<sa>\w+))?\s+
        ON\s+(?P<on1>\w+)\.(?P<k1>\w+)\s*=\s*(?P<on2>\w+)\.(?P<k2>\w+)\s+
        (?:WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(?P<set>.+?)\s*)?
        (?P<ins>WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*)?$""",
    re.IGNORECASE | re.DOTALL | re.VERBOSE)


def _split_assignments(s: str) -> Dict[str, str]:
    """Split ``a = expr1, b = expr2`` at top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur)); cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = {}
    for p in parts:
        c, e = p.split("=", 1)
        out[c.strip().strip("`")] = e.strip()
    return out


def sql_dml(spark: SparkSession, stmt: str,
            tables: Dict[str, str]) -> dict:
    """Run an ``UPDATE``/``DELETE`` statement against parquet-backed tables.
    ``tables`` maps table names used in the statement to directory paths."""
    m = _UPDATE_RE.match(stmt)
    if m:
        return update_where(spark, tables[m.group("t")],
                            _split_assignments(m.group("set")), m.group("w"))
    m = _DELETE_RE.match(stmt)
    if m:
        return delete_where(spark, tables[m.group("t")], m.group("w"))
    m = _MERGE_RE.match(stmt)
    if m:
        t_alias = m.group("ta") or m.group("t")
        s_alias = m.group("sa") or m.group("s")
        k1_side, k2_side = m.group("on1"), m.group("on2")
        if {k1_side, k2_side} != {t_alias, s_alias}:
            raise ValueError(
                f"MERGE ON must equate target and source keys "
                f"(got {k1_side}/{k2_side}, aliases {t_alias}/{s_alias})")
        on = m.group("k1") if k1_side == t_alias else m.group("k2")
        on_src = m.group("k2") if k1_side == t_alias else m.group("k1")
        if on != on_src:
            raise ValueError("MERGE ON key must have the same column name "
                             "on both sides in this engine")
        set_clause = (m.group("set") or "").strip()
        if not set_clause and not m.group("ins"):
            raise ValueError("MERGE needs WHEN MATCHED and/or WHEN NOT "
                             "MATCHED clause")
        if set_clause in ("*", ""):
            update_cols = None
        else:
            # "c = src.c, d = src.d" — this engine's MERGE takes values from
            # the source row, so only the column list matters
            update_cols = [p.split("=", 1)[0].strip().strip("`")
                           for p in set_clause.split(",")]
        source = spark.table(m.group("s"))
        return merge_into(spark, tables[m.group("t")], source, on,
                          update_cols=update_cols,
                          insert_when_not_matched=bool(m.group("ins")),
                          update_when_matched=bool(set_clause))
    raise ValueError(f"unsupported DML statement: {stmt[:80]}")
