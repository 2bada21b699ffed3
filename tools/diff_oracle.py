"""Local differential harness: run every declared query on Spark AND its
DuckDB oracle, compare row count / schema / values — the same gate the
driver applies (CORRECTNESS_r{N}.json), runnable during development.

Usage: python tools/diff_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import decimal
import math
import struct
import sys
import time

sys.path.insert(0, ".")


def canon(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Bit-pattern the rounded float so -0.0 != 0.0 locally, matching the
        # driver's string/hash sensitivity (round-6 lesson: Spark's ROUND via
        # BigDecimal drops the sign of tiny negatives, DuckDB preserves IEEE
        # -0.0; plain round()/== both hid the difference and the driver's
        # hash caught it — spatial_affine_ops, CORRECTNESS_r06).
        return struct.pack(">d", round(v, 9)).hex()
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entrymod
    from sedona_iceberg_extension_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sdata = sorted(
                tuple(canon(r[c]) for c in scols) for r in srows)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols_raw = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ocols = sorted(ocols_raw)
            idx = [ocols_raw.index(c) for c in ocols]
            odata = sorted(tuple(canon(r[i]) for i in idx) for r in orows)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:200]}")
            continue
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} != {len(orows)}")
        if scols != ocols:
            status.append(f"cols {scols} != {ocols}")
        if not status and sdata != odata:
            n_bad = sum(1 for a, b in zip(sdata, odata) if a != b)
            for a, b in zip(sdata, odata):
                if a != b:
                    status.append(f"values differ ({n_bad} rows), first: {a} != {b}")
                    break
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
