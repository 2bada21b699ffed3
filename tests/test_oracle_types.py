"""Type-drift gate over every declared DuckDB oracle.

Round-7 driver lesson (VERDICT r7 "What's wrong #1"): DuckDB widens
SUM(BIGINT) to HUGEINT, and the driver's correctness hash materializes the
oracle result through pandas, where HUGEINT becomes float64 — so `123`
hashes as `123.0` and the value hash fails even though rows/schema match
and `fetchall()` (Python ints) compares equal locally.  This swept exactly
two queries in round 7 (`grouping_sets_revenue`, `ship_survival_km`).

This test closes the CLASS: it plans (does not execute) every declared
oracle against the sf0.001 views and asserts no output column has a type
the driver's pandas path renders differently from Spark's double/bigint:
HUGEINT, UHUGEINT, or DECIMAL.  Any aggregate that can widen must be
wrapped in an explicit CAST in the oracle SQL.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TYPE_SF", "/root/testdata/sf0.001")
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_output_type_drift(con):
    oracles = entrymod.oracle_sql()
    assert oracles, "no oracles declared"
    drift = {}
    for name, sql in oracles.items():
        rel = con.sql(sql)  # plans only; no execution
        bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
               if str(t).upper().split("(")[0] in FORBIDDEN]
        if bad:
            drift[name] = bad
    assert not drift, (
        f"oracle output columns with driver-hash-unsafe types "
        f"(wrap in CAST(... AS BIGINT/DOUBLE)): {drift}")
