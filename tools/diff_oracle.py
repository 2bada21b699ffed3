"""Local differential harness: run every declared query on Spark AND its
DuckDB oracle, compare row count / schema / values — the same gate the
driver applies (CORRECTNESS_r{N}.json), runnable during development.

Usage: python tools/diff_oracle.py [sf_dir] [query_name ...]

Env knobs (round-8, VERDICT r7 item #3 — rehearse at driver parallelism
before the driver's first hash; summation order differs between local[8]/16
shuffle partitions and the driver's local[32]):
  SPARK_GRAFT_MASTER   spark master (default local[8])
  SPARK_GRAFT_SHUFFLE  spark.sql.shuffle.partitions (default 16)
  SPARK_GRAFT_CHECKPOINT_DIR  if set, `setCheckpointDir` on the session —
      lineage.truncate_lineage then routes every iterative lineage cut
      through fault-tolerant `DataFrame.checkpoint` instead of
      `localCheckpoint`, i.e. the CLUSTER configuration the router exists
      for (r13 VERDICT item #4: rehearse that mode differentially)
"""

from __future__ import annotations

import decimal
import math
import os
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

    master = os.environ.get("SPARK_GRAFT_MASTER", "local[8]")
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16"))
    spark = get_session(master=master, shuffle_partitions=shuffle)
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
    print(f"# master={master} shuffle_partitions={shuffle}"
          + (f" checkpoint_dir={ckpt}" if ckpt else ""))

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
            rel = con.sql(oracles[name])
            # Type gate (round-7 driver lesson): DuckDB widens SUM(BIGINT) to
            # HUGEINT, and the driver's hash path materializes HUGEINT via
            # pandas as float64 (123 -> 123.0) while fetchall() returns Python
            # ints that compare equal — so an uncast SUM passes here but fails
            # the driver hash. Reject the whole type class locally.
            bad_types = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                         if str(t).upper().split("(")[0]
                         in ("HUGEINT", "UHUGEINT", "DECIMAL")]
            if bad_types:
                failures.append(name)
                print(f"FAIL {name}: oracle output type drift "
                      f"(wrap in CAST): {bad_types}")
                continue
            ocols_raw = list(rel.columns)
            orows = rel.fetchall()
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
