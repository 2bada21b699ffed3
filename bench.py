"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sedona_iceberg_extension_spark.plans.queries import QUERIES
    from sedona_iceberg_extension_spark.session import get_session

    spark = get_session(master=f"local[{cpus}]")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    headline = [(n, qd) for n, qd in QUERIES.items() if qd.headline]

    # warm the JVM + python workers once (outside timing)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    times = {}
    for name, qd in headline:
        t0 = time.time()
        df = qd.fn(spark, sf_dir)
        n = df.count()  # materialize the full result
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    # second pass: steady-state (warm codegen/JIT) — the throughput a
    # long-running cluster actually sees; the cold first pass stays the
    # headline `value` for methodology continuity across rounds
    warm = {}
    for name, qd in headline:
        t0 = time.time()
        qd.fn(spark, sf_dir).count()
        warm[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "warm_total": round(sum(warm.values()), 3),
        "warm_queries": warm,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
