"""Dump .explain("formatted") for every headline query to
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r16).

Usage: python tools/explain_headline.py <suffix> [query ...]

Writes plans/<round>/<name>_<suffix>.txt for each headline query (or the
named subset).  The judge reads these files to check plan claims; the
queries are built against $SPARK_GRAFT_SF_DIR (default sf0.1) with the
same session the bench uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sedona_iceberg_extension_spark.plans.queries import QUERIES
    from sedona_iceberg_extension_spark.session import get_session

    spark = get_session(master=f"local[{cpus}]")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    for name, qd in QUERIES.items():
        if not qd.headline and name not in only:
            continue
        if only and name not in only:
            continue
        df = qd.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
