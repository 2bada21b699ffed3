"""SQL DDL front door — the reference's ``USING ICEBERG`` table surface.

The reference App drives its whole lifecycle as plain SQL statements
(``example/.../App.scala:42-80``): ``CREATE TABLE ... USING ICEBERG``,
``INSERT INTO ... VALUES/SELECT``, ``DROP TABLE IF EXISTS``, ``CACHE
TABLE``, and a ``CREATE TABLE ... USING ICEBERG AS SELECT`` with a spatial
join.  The environment has no Iceberg runtime, so these statements map onto
the engine's snapshot tables (``operators.snapshots.SnapshotTable`` —
versioned manifests, CoW DML, time travel), which reproduce the semantics
the DDL spelling implies.

Tables live under a session warehouse directory
(``$SPARK_GRAFT_WAREHOUSE`` or a tempdir) and are exposed as temp views
after every commit, so follow-up SELECT / spatial-join / UPDATE statements
resolve them like any other relation.  Dotted identifiers
(``catalog.db.tbl``) are flattened to ``catalog_db_tbl`` for the view name
— Spark would otherwise resolve them against a real catalog.

``GEOMETRY`` columns map to the engine's WKB ``BINARY`` representation
(SURVEY.md §2 Tier A, UdtRegistratorWrapper-by-design).
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .snapshots import SnapshotTable

def _state(spark: Optional[SparkSession] = None) -> dict:
    """Per-session DDL state: ``{"catalog": {name: SnapshotTable},
    "warehouse": path|None}``.  Scoped to the SparkSession (not the
    module), so two sessions in one process keep separate warehouse
    namespaces; sparkless accessors resolve the active session.  With no
    session at all, a detached empty state is returned (read paths become
    no-ops)."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        return {"catalog": {}, "warehouse": None}
    st = getattr(spark, "_graft_ddl_state", None)
    if st is None:
        st = {"catalog": {}, "warehouse": None}
        spark._graft_ddl_state = st
    return st


def _catalog(spark: Optional[SparkSession] = None) -> Dict[str, SnapshotTable]:
    return _state(spark)["catalog"]


def iceberg_runtime_configured(extensions: str, conf: Dict[str, str]) -> bool:
    """True when the session was launched with a REAL Iceberg runtime — the
    reference's own launch shape (``example/launch.sh:16-20``,
    ``TestSedonaIcebergExtension.scala:44-48``): the Iceberg session
    extensions and/or a ``spark.sql.catalog.<name>`` bound to an Iceberg
    SparkCatalog/SparkSessionCatalog.  Pure function of the conf so the
    detection is unit-testable without jars."""
    if "IcebergSparkSessionExtensions" in (extensions or ""):
        return True
    return any(k.startswith("spark.sql.catalog.")
               and k.count(".") == 3       # the catalog binding itself
               and "iceberg" in (v or "").lower()
               for k, v in conf.items())


def delegate_to_iceberg(spark: SparkSession) -> bool:
    """Whether ``USING ICEBERG`` DDL/DML should be delegated to vanilla
    ``spark.sql`` (real Iceberg jars + catalog configured) instead of the
    snapshot-table emulation.  Cached per session; the env knob
    ``SPARK_GRAFT_FORCE_EMULATION=1`` pins the emulation for testing."""
    if os.environ.get("SPARK_GRAFT_FORCE_EMULATION"):
        return False
    cached = getattr(spark, "_graft_iceberg_delegate", None)
    if cached is None:
        try:
            exts = spark.conf.get("spark.sql.extensions", "") or ""
        except Exception:
            exts = ""
        try:
            conf = dict(spark.sparkContext.getConf().getAll())
        except Exception:
            conf = {}
        cached = iceberg_runtime_configured(exts, conf)
        spark._graft_iceberg_delegate = cached
    return cached

_ALTER_ADD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+COLUMNS?\s*"
    r"\(?\s*(?P<cols>[^()]+?)\s*\)?\s*$", re.IGNORECASE | re.DOTALL)
_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$", re.IGNORECASE)
_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+COLUMNS?\s*"
    r"\(?\s*(?P<cols>[\w\s,]+?)\s*\)?\s*$", re.IGNORECASE)

_ALTER_ADD_PART_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+PARTITION\s+FIELD\s+"
    r"(?P<field>.+?)\s*$", re.IGNORECASE)

_ALTER_REF_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+"
    r"(?P<op>CREATE|DROP)\s+(?P<kind>BRANCH|TAG)\s+(?P<ref>\w+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?\s*$", re.IGNORECASE)

_CALL_RE = re.compile(
    r"^\s*CALL\s+(?:[\w.]*\bsystem\.)?(?P<proc>\w+)\s*\((?P<args>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL)

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*"
    r"\((?P<cols>.*)\)\s*USING\s+ICEBERG\s*$",
    re.IGNORECASE | re.DOTALL)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
    r"USING\s+ICEBERG\s+AS\s+(?P<select>.+)$",
    re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*$",
    re.IGNORECASE)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:INTO|(?P<ow>OVERWRITE)(?:\s+TABLE)?)\s+(?P<name>[\w.]+)"
    r"\s+(?P<body>(?:VALUES|SELECT)\b.+)$",
    re.IGNORECASE | re.DOTALL)
_CACHE_RE = re.compile(
    r"^\s*(?P<un>UN)?CACHE\s+TABLE\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE)

_DML_TARGET_RES = (
    re.compile(r"^\s*UPDATE\s+(?P<name>[\w.]+)\b", re.IGNORECASE),
    re.compile(r"^\s*DELETE\s+FROM\s+(?P<name>[\w.]+)\b", re.IGNORECASE),
    re.compile(r"^\s*MERGE\s+INTO\s+(?P<name>[\w.]+)\b", re.IGNORECASE),
)


def _view_name(name: str) -> str:
    return name.replace(".", "_")


def _warehouse(spark: Optional[SparkSession] = None) -> str:
    st = _state(spark)
    if st["warehouse"] is None:
        st["warehouse"] = (os.environ.get("SPARK_GRAFT_WAREHOUSE")
                           or tempfile.mkdtemp(prefix="snapshot_warehouse_"))
    os.makedirs(st["warehouse"], exist_ok=True)
    return st["warehouse"]


def _register(spark: SparkSession, name: str) -> None:
    tbl = _catalog(spark)[name]
    tbl.read(spark).createOrReplaceTempView(_view_name(name))


def _split_top(s: str, sep: str = ",") -> list:
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    parts.append(s[start:].strip())
    return [p for p in parts if p]


def _schema_ddl(cols: str) -> str:
    """Column list of a CREATE statement → Spark DDL schema string;
    GEOMETRY becomes BINARY (the engine's WKB representation)."""
    out = []
    for c in _split_top(cols):
        m = re.match(r"^(\w+)\s+(.+)$", c.strip(), re.DOTALL)
        if not m:
            raise ValueError(f"unparseable column definition {c!r}")
        typ = m.group(2).strip()
        if typ.upper() == "GEOMETRY":
            typ = "BINARY"
        out.append(f"{m.group(1)} {typ}")
    return ", ".join(out)


def _align(df: DataFrame, target: SnapshotTable,
           spark: SparkSession) -> DataFrame:
    """Positionally align an insert source to the table schema (names and
    types), the way SQL INSERT resolves columns."""
    schema = target.read(spark).schema
    if len(df.columns) != len(schema):
        raise ValueError(
            f"INSERT column count {len(df.columns)} != table arity {len(schema)}")
    return df.select(*[
        F.col(f"`{c}`").cast(f.dataType).alias(f.name)
        for c, f in zip(df.columns, schema.fields)])


def _values_to_select(body: str) -> str:
    """``VALUES (a, b), (c, d)`` → ``SELECT a, b UNION ALL SELECT c, d``.
    Spark's inline VALUES requires foldable expressions; the reference
    inserts UDF calls (``IcebergSTGeomFromText('POINT ...')``,
    App.scala:46-52), which a SELECT evaluates fine."""
    rest = body[len("VALUES"):].strip()
    selects = []
    i, n = 0, len(rest)
    while i < n:
        c = rest[i]
        if c == "'":
            # skip string literal (SQL escapes ' as '' — each pair re-opens)
            i += 1
            while i < n and rest[i] != "'":
                i += 1
            i += 1
        elif c == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                cj = rest[j]
                if cj == "'":
                    j += 1
                    while j < n and rest[j] != "'":
                        j += 1
                elif cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ValueError("unbalanced VALUES tuple")
            selects.append("SELECT " + rest[i + 1:j - 1])
            i = j
        else:
            i += 1
    if not selects:
        raise ValueError("empty VALUES list")
    return " UNION ALL ".join(selects)


def dml_target(statement: str,
               spark: Optional[SparkSession] = None) -> Optional[str]:
    """Catalog table name targeted by an UPDATE/DELETE/MERGE, if any."""
    cat = _catalog(spark)
    for rx in _DML_TARGET_RES:
        m = rx.match(statement)
        if m and m.group("name") in cat:
            return m.group("name")
    return None


def table(name: str, spark: Optional[SparkSession] = None) -> SnapshotTable:
    return _catalog(spark)[name]


def is_ddl(statement: str) -> bool:
    return any(rx.match(statement) for rx in
               (_CTAS_RE, _CREATE_RE, _DROP_RE, _INSERT_RE, _CACHE_RE,
                _ALTER_ADD_RE, _ALTER_RENAME_RE, _ALTER_DROP_RE,
                _ALTER_ADD_PART_RE, _ALTER_REF_RE, _CALL_RE))


def _call_arg(s: str):
    s = s.strip()
    if s.startswith("'") and s.endswith("'"):
        return s[1:-1]
    try:
        return int(s)
    except ValueError:
        return s


def _parse_call_args(argstr: str):
    """Iceberg procedure argument syntax: positional and/or
    ``name => value`` named arguments."""
    pos, named = [], {}
    for part in _split_top(argstr):
        if "=>" in part:
            k, v = part.split("=>", 1)
            named[k.strip().lower()] = _call_arg(v)
        else:
            pos.append(_call_arg(part))
    return pos, named


def show_tables(spark: SparkSession) -> DataFrame:
    """``SHOW TABLES`` over the snapshot catalog — Spark's result shape
    (namespace, tableName, isTemporary), with dotted catalog names split
    into their namespace and table parts."""
    rows = []
    for name in sorted(_catalog(spark)):
        ns, _, tbl = name.rpartition(".")
        rows.append((ns, tbl, False))
    return spark.createDataFrame(
        rows, "namespace string, tableName string, isTemporary boolean")


def describe_table(spark: SparkSession, name: str) -> DataFrame:
    """``DESCRIBE TABLE t`` over the snapshot catalog — Spark's result
    shape (col_name, data_type, comment), resolved from the table's
    CURRENT logical schema (post-ALTER evolution); the active partition
    spec follows Spark's "# Partition Information" section convention."""
    tbl = _catalog(spark)[name]
    df = tbl.read(spark)
    rows = [(f.name, f.dataType.simpleString(), None) for f in df.schema.fields]
    spec = tbl.partition_spec()
    if spec:
        rows.append(("# Partition Information", "", None))
        for fld in spec:
            rows.append((fld["name"], fld["transform"], None))
    return spark.createDataFrame(
        rows, "col_name string, data_type string, comment string")


def run_procedure(spark: SparkSession, proc: str, pos: list,
                  named: dict) -> dict:
    """Iceberg's maintenance procedures (``CALL catalog.system.<proc>``,
    SparkProcedures surface) over the snapshot layer: rollback_to_snapshot,
    expire_snapshots, rewrite_data_files (binpack default; ``strategy =>
    'sort', sort_order => 'zorder(a, b)'`` routes to the Z-order rewrite),
    set_current_snapshot, cherrypick_snapshot, remove_orphan_files."""
    name = named.get("table") or (pos[0] if pos else None)
    if name is None:
        raise ValueError(f"CALL {proc}: missing table argument")
    tbl = _catalog(spark)[name]
    if proc == "rollback_to_snapshot":
        v = named.get("to_snapshot_id")
        if v is None:
            v = pos[1] if len(pos) > 1 else None
        if v is None:
            raise ValueError("rollback_to_snapshot needs to_snapshot_id")
        newv = tbl.rollback(int(v))
        _register(spark, name)
        return {"proc": proc, "table": name, "version": newv}
    if proc == "expire_snapshots":
        keep = named.get("retain_last",
                         pos[1] if len(pos) > 1 else 2)
        res = tbl.expire(int(keep))
        return {"proc": proc, "table": name, **res}
    if proc == "rewrite_data_files":
        order = str(named.get("sort_order", ""))
        zm = re.match(r"^\s*zorder\s*\(([\w\s,]+)\)\s*$", order,
                      re.IGNORECASE)
        if str(named.get("strategy", "")).lower() == "sort" and zm:
            cols = [c.strip() for c in zm.group(1).split(",")]
            res = tbl.rewrite_zorder(spark, cols)
        else:
            target = int(named.get("target_file_size_bytes",
                                   128 * 1024 * 1024))
            res = tbl.compact(spark, target_file_bytes=target)
        _register(spark, name)
        return {"proc": proc, "table": name, **res}
    if proc == "set_current_snapshot":
        v = named.get("snapshot_id")
        if v is None:
            v = pos[1] if len(pos) > 1 else None
        if v is None:
            raise ValueError("set_current_snapshot needs snapshot_id")
        newv = tbl.set_current(int(v))
        _register(spark, name)
        return {"proc": proc, "table": name, "version": newv}
    if proc == "cherrypick_snapshot":
        v = named.get("snapshot_id")
        if v is None:
            v = pos[1] if len(pos) > 1 else None
        if v is None:
            raise ValueError("cherrypick_snapshot needs snapshot_id")
        newv = tbl.cherrypick(int(v))
        _register(spark, name)
        return {"proc": proc, "table": name, "version": newv}
    if proc == "remove_orphan_files":
        grace = named.get("older_than_seconds")
        if grace is None:
            res = tbl.remove_orphans()
        else:
            res = tbl.remove_orphans(older_than_seconds=float(grace))
        return {"proc": proc, "table": name, **res}
    if proc == "fast_forward":
        branch = named.get("branch", pos[1] if len(pos) > 1 else None)
        to = named.get("to", pos[2] if len(pos) > 2 else None)
        if branch is None or to is None:
            raise ValueError("fast_forward needs branch and to")
        v = tbl.fast_forward(str(branch), str(to))
        _register(spark, name)
        return {"proc": proc, "table": name, "branch": branch,
                "version": v}
    raise ValueError(f"unknown procedure {proc!r} (supported: "
                     "rollback_to_snapshot, expire_snapshots, "
                     "rewrite_data_files, set_current_snapshot, "
                     "cherrypick_snapshot, remove_orphan_files, "
                     "fast_forward)")


def run_ddl(spark: SparkSession, statement: str,
            run_select=None) -> dict:
    """Execute one DDL statement against the snapshot-table warehouse.
    ``run_select``: callable used for embedded SELECTs (the session front
    door passes ``spatial_sql`` so CTAS joins get the planner upgrade)."""
    run_select = run_select or (lambda sp, s: sp.sql(s))

    m = _CTAS_RE.match(statement)
    if m and not _CREATE_RE.match(statement):
        name = m.group("name")
        df = run_select(spark, resolve_names(m.group("select").strip(), spark))
        path = os.path.join(_warehouse(spark), _view_name(name))
        _catalog(spark)[name] = SnapshotTable.create(spark, path, df)
        _register(spark, name)
        return {"ddl": "ctas", "table": name, "rows": df.count()}

    m = _CREATE_RE.match(statement)
    if m:
        name = m.group("name")
        if name in _catalog(spark):
            if not m.group("ine"):
                # Spark/Iceberg raise TABLE_ALREADY_EXISTS for a plain
                # CREATE TABLE — a silent no-op would keep stale data
                raise ValueError(
                    f"[TABLE_OR_VIEW_ALREADY_EXISTS] Cannot create table "
                    f"{name} because it already exists. Use CREATE TABLE "
                    f"IF NOT EXISTS to tolerate a pre-existing table.")
            return {"ddl": "create", "table": name, "existed": True}
        empty = spark.createDataFrame([], _schema_ddl(m.group("cols")))
        path = os.path.join(_warehouse(spark), _view_name(name))
        _catalog(spark)[name] = SnapshotTable.create(spark, path, empty)
        _register(spark, name)
        return {"ddl": "create", "table": name, "existed": False}

    m = _DROP_RE.match(statement)
    if m:
        name = m.group("name")
        tbl = _catalog(spark).pop(name, None)
        if tbl is not None:
            spark.catalog.dropTempView(_view_name(name))
        else:
            # a real Spark-managed table may own the name (the statement
            # carries IF EXISTS semantics itself)
            try:
                spark.sql(statement)
            except Exception:
                pass
        return {"ddl": "drop", "table": name, "existed": tbl is not None}

    m = _INSERT_RE.match(statement)
    if m:
        name = m.group("name")
        if name not in _catalog(spark):
            # not a catalog table — a real Spark-managed table may own the
            # name; delegate the statement unchanged
            spark.sql(statement)
            return {"ddl": "insert", "table": name, "delegated": True}
        body = resolve_names(m.group("body").strip(), spark)
        if body.upper().startswith("VALUES"):
            src = spark.sql(_values_to_select(body))
        else:
            src = run_select(spark, body)
        tbl = _catalog(spark)[name]
        aligned = _align(src, tbl, spark)
        if m.group("ow"):
            tbl.overwrite(spark, aligned)
        else:
            tbl.append(spark, aligned)
        _register(spark, name)
        return {"ddl": "insert_overwrite" if m.group("ow") else "insert",
                "table": name, "version": tbl.versions()[-1]}

    m = _CACHE_RE.match(statement)
    if m:
        name = m.group("name")
        view = _view_name(name) if name in _catalog(spark) else name
        if m.group("un"):
            spark.catalog.uncacheTable(view)
        else:
            spark.catalog.cacheTable(view)
        return {"ddl": "uncache" if m.group("un") else "cache", "table": name}

    m = _CALL_RE.match(statement)
    if m:
        pos, named = _parse_call_args(m.group("args"))
        target = named.get("table") or (pos[0] if pos else None)
        if target not in _catalog(spark):
            # not a catalog table — a real Iceberg runtime may own it
            spark.sql(statement)
            return {"proc": m.group("proc").lower(), "delegated": True}
        return run_procedure(spark, m.group("proc").lower(), pos, named)

    m = _ALTER_REF_RE.match(statement)
    if m:
        name = m.group("name")
        if name not in _catalog(spark):
            spark.sql(statement)
            return {"ddl": "alter_ref", "table": name, "delegated": True}
        tbl = _catalog(spark)[name]
        kind = m.group("kind").lower()
        ref = m.group("ref")
        if m.group("op").upper() == "CREATE":
            v = tbl.create_ref(ref, kind,
                               int(m.group("v")) if m.group("v") else None)
            return {"ddl": "alter_ref", "table": name, "op": "create",
                    "kind": kind, "ref": ref, "version": v}
        tbl.drop_ref(ref, kind=kind)
        return {"ddl": "alter_ref", "table": name, "op": "drop",
                "kind": kind, "ref": ref}

    m = _ALTER_ADD_PART_RE.match(statement)
    if m:
        name = m.group("name")
        if name not in _catalog(spark):
            spark.sql(statement)
            return {"ddl": "alter_partition", "table": name,
                    "delegated": True}
        tbl = _catalog(spark)[name]
        fld = m.group("field").strip()
        fm = re.match(r"^(?i:bucket)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$", fld)
        if fm:
            v = tbl.add_partition_field(fm.group(2), f"bucket[{fm.group(1)}]")
        else:
            fm = re.match(r"^(?i:truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$",
                          fld)
            if fm:
                v = tbl.add_partition_field(fm.group(2),
                                            f"truncate[{fm.group(1)}]")
            else:
                fm = re.match(r"^(?i:years?|months?|days?)\s*\(\s*(\w+)\s*\)$",
                              fld)
                if fm:
                    tr = fld.split("(")[0].strip().lower().rstrip("s")
                    v = tbl.add_partition_field(fm.group(1), tr)
                elif re.match(r"^\w+$", fld):
                    v = tbl.add_partition_field(fld, "identity")
                else:
                    raise ValueError(f"unsupported partition field {fld!r}")
        _register(spark, name)
        return {"ddl": "alter_partition", "table": name, "version": v}

    for rx, kind in ((_ALTER_RENAME_RE, "rename"), (_ALTER_DROP_RE, "drop"),
                     (_ALTER_ADD_RE, "add")):
        m = rx.match(statement)
        if not m:
            continue
        name = m.group("name")
        if name not in _catalog(spark):
            # a real Spark-managed table may own the name — delegate
            spark.sql(statement)
            return {"ddl": "alter", "table": name, "delegated": True}
        tbl = _catalog(spark)[name]
        if kind == "rename":
            v = tbl.rename_column(spark, m.group("old"), m.group("new"))
        elif kind == "drop":
            for c in _split_top(m.group("cols")):
                v = tbl.drop_column(spark, c.strip())
        else:
            for c in _split_top(m.group("cols")):
                cm = re.match(r"^(\w+)\s+(.+)$", c.strip(), re.DOTALL)
                if not cm:
                    raise ValueError(f"unparseable column definition {c!r}")
                typ = cm.group(2).strip()
                v = tbl.add_column(spark, cm.group(1),
                                   "BINARY" if typ.upper() == "GEOMETRY"
                                   else typ)
        _register(spark, name)
        return {"ddl": f"alter_{kind}", "table": name,
                "version": tbl.versions()[-1]}

    raise ValueError(f"not a DDL statement: {statement[:80]!r}")


def run_catalog_dml(spark: SparkSession, statement: str) -> Optional[dict]:
    """Route UPDATE/DELETE/MERGE that target a catalog table through the
    snapshot table's versioned CoW DML (keeps time travel across the DML);
    None when the target isn't a catalog table."""
    name = dml_target(statement, spark)
    if name is None:
        return None
    from .dml import _DELETE_RE, _MERGE_RE, _UPDATE_RE, _split_assignments

    tbl = _catalog(spark)[name]
    res = None
    m = _UPDATE_RE.match(statement)
    if m:
        res = tbl.update_where(spark, _split_assignments(m.group("set")),
                               m.group("w").strip())
    if res is None:
        m = _DELETE_RE.match(statement)
        if m:
            res = tbl.delete_where(spark, m.group("w").strip())
    if res is None:
        m = _MERGE_RE.match(statement)
        if m:
            set_clause = (m.group("set") or "").strip()
            update_cols = None if set_clause in ("*", "") else [
                p.split("=", 1)[0].strip().strip("`")
                for p in set_clause.split(",")]
            src_name = m.group("s")
            if src_name in _catalog(spark):
                src_name = _view_name(src_name)
            res = tbl.merge_into(
                spark, spark.table(src_name), on=m.group("k1"),
                update_cols=update_cols,
                insert_when_not_matched=bool(m.group("ins")))
    if res is not None:
        _register(spark, name)
    return res


def resolve_names(statement: str,
                  spark: Optional[SparkSession] = None) -> str:
    """Replace dotted catalog-table identifiers (``demo.db.t`` — the
    reference test suite's spelling, TestSedonaIcebergExtension.scala:53+)
    with their registered view names; Spark would otherwise resolve the
    dots against a real catalog.  Undotted names already match their view
    name and need nothing.  String literals are left untouched (a table
    name occurring inside quoted data must not be rewritten)."""
    cat = _catalog(spark)
    parts = re.split(r"('(?:[^']|'')*')", statement)
    for idx in range(0, len(parts), 2):   # even indices = outside literals
        seg = parts[idx]
        for name in sorted(cat, key=len, reverse=True):
            if "." in name and name in seg:
                seg = re.sub(rf"(?<![\w.]){re.escape(name)}(?![\w.])",
                             _view_name(name), seg)
        parts[idx] = seg
    return "".join(parts)


def rewrite_metadata_tables(spark: SparkSession, statement: str) -> str:
    """Iceberg's metadata-table spellings over catalog tables:
    ``SELECT * FROM t.history`` / ``FROM t.files`` resolve to the snapshot
    layer's history/files DataFrames, registered as views on demand."""
    for name, tbl in list(_catalog(spark).items()):
        for meta in ("history", "files"):
            ref = rf"(?<![\w.]){re.escape(name)}\.{meta}(?![\w.])"
            if re.search(ref, statement):
                view = f"{_view_name(name)}__{meta}"
                df = (tbl.history_df(spark) if meta == "history"
                      else tbl.files_df(spark))
                df.createOrReplaceTempView(view)
                statement = re.sub(ref, view, statement)
    return statement


_TTV_RE = re.compile(
    r"\bFROM\s+(?P<name>[\w.]+)\s+(?:FOR\s+)?(?:SYSTEM_VERSION|VERSION)"
    r"\s+AS\s+OF\s+(?P<v>\d+)", re.IGNORECASE)
_TTS_RE = re.compile(
    r"\bFROM\s+(?P<name>[\w.]+)\s+(?:FOR\s+)?(?:SYSTEM_TIME|TIMESTAMP)"
    r"\s+AS\s+OF\s+'(?P<ts>[^']+)'", re.IGNORECASE)
_TTR_RE = re.compile(
    r"\bFROM\s+(?P<name>[\w.]+)\s+(?:FOR\s+)?(?:SYSTEM_VERSION|VERSION)"
    r"\s+AS\s+OF\s+'(?P<ref>\w+)'", re.IGNORECASE)


def rewrite_time_travel(spark: SparkSession, statement: str) -> str:
    """Iceberg's time-travel SQL spellings over catalog tables:
    ``FROM t VERSION AS OF <n>`` / ``FROM t TIMESTAMP AS OF '<ts>'``
    (also the ``FOR SYSTEM_VERSION/SYSTEM_TIME`` forms).  The referenced
    snapshot is registered as a temp view and the clause rewritten to it;
    non-catalog tables pass through untouched."""
    def sub_version(m):
        name = m.group("name")
        if name not in _catalog(spark):
            return m.group(0)
        v = int(m.group("v"))
        view = f"{_view_name(name)}__v{v}"
        _catalog(spark)[name].read(spark, version=v) \
            .createOrReplaceTempView(view)
        return f"FROM {view}"

    def sub_timestamp(m):
        name = m.group("name")
        if name not in _catalog(spark):
            return m.group(0)
        from datetime import datetime, timezone
        dt = datetime.fromisoformat(m.group("ts"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        target_ms = dt.timestamp() * 1000
        eligible = [h["version"] for h in _catalog(spark)[name].history()
                    if h["timestamp_ms"] <= target_ms]
        if not eligible:
            raise ValueError(
                f"no snapshot of {name!r} at or before {m.group('ts')!r}")
        v = max(eligible)
        view = f"{_view_name(name)}__v{v}"
        _catalog(spark)[name].read(spark, version=v) \
            .createOrReplaceTempView(view)
        return f"FROM {view}"

    def sub_ref(m):
        name = m.group("name")
        if name not in _catalog(spark):
            return m.group(0)
        tbl = _catalog(spark)[name]
        v = tbl.resolve_ref(m.group("ref"))
        if v is None:
            raise ValueError(f"unknown branch/tag {m.group('ref')!r} "
                             f"on {name!r}")
        view = f"{_view_name(name)}__v{v}"
        tbl.read(spark, version=v).createOrReplaceTempView(view)
        return f"FROM {view}"

    statement = _TTV_RE.sub(sub_version, statement)
    statement = _TTR_RE.sub(sub_ref, statement)
    return _TTS_RE.sub(sub_timestamp, statement)


def reset(spark: Optional[SparkSession] = None) -> None:
    """Drop the session's in-memory catalog (tests)."""
    st = _state(spark)
    st["catalog"].clear()
    st["warehouse"] = None
