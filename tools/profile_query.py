"""Stage-level profile of one headline query at $SPARK_GRAFT_SF_DIR.

Usage: python tools/profile_query.py <query_name> [runs]

Runs the query once to warm codegen + AQE, then `runs` measured passes,
and prints per-stage wall time / task counts / shuffle bytes from the
statusTracker REST-free job data — the cheap way to see WHERE a query's
seconds go without the UI (spark.ui.enabled is off in the engine session).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sedona_iceberg_extension_spark.plans.queries import QUERIES
    from sedona_iceberg_extension_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_PROFILE_UI"] = "1"   # see session.py hook
    spark = get_session(master=f"local[{cpus}]")
    if spark.conf.get("spark.ui.enabled") != "true":
        print("# NOTE: UI disabled; per-stage REST metrics unavailable")
    qd = QUERIES[name]

    # warm passes (codegen, C2 JIT, AQE stats, page cache) — ngram-class
    # queries keep speeding up through ~3 repeats as C2 reaches the
    # generated classes, same reason bench.py replays the suite first
    warmups = int(os.environ.get("SPARK_GRAFT_PROFILE_WARMUPS", "3"))
    for w in range(warmups):
        t0 = time.time()
        qd.fn(spark, sf_dir).count()
        print(f"# warm pass {w + 1}: {time.time() - t0:.3f}s")

    import json
    import urllib.request

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def rest(path):
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/{path}") as fh:
            return json.loads(fh.read())

    for r in range(runs):
        group = f"profile-run-{r}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        n = qd.fn(spark, sf_dir).count()
        wall = time.time() - t0
        sc.setJobGroup("idle", "idle")
        print(f"\n=== run {r + 1}: {wall:.3f}s ({n} rows) ===")
        if not ui:
            continue
        jobs = sorted(sc.statusTracker().getJobIdsForGroup(group) or [])
        stage_ids = set()
        for j in jobs:
            ji = sc.statusTracker().getJobInfo(j)
            if ji:
                stage_ids.update(ji.stageIds)
        for st in sorted(rest("stages?status=complete"),
                         key=lambda s: s["stageId"]):
            sid = st["stageId"]
            if sid not in stage_ids or st["numCompleteTasks"] == 0:
                continue
            dur = ""
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                f0 = datetime.strptime(st["firstTaskLaunchedTime"], fmt)
                c0 = datetime.strptime(st["completionTime"], fmt)
                dur = f"{(c0 - f0).total_seconds():6.3f}s"
            except Exception:
                pass
            print(f"stage {sid:>4} tasks {st['numCompleteTasks']:>3} "
                  f"wall {dur:>8} cpuSum {st['executorRunTime'] / 1e3:7.2f}s "
                  f"in {st['inputBytes'] >> 20:>5}MB "
                  f"sRd {st['shuffleReadBytes'] >> 20:>4}MB "
                  f"sWr {st['shuffleWriteBytes'] >> 20:>4}MB  "
                  f"{st['name'][:60]}")
    spark.stop()


if __name__ == "__main__":
    main()
