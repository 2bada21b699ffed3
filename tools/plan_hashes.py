"""Mechanized plan diff over the declared query set (the r15 promotion
mechanism, now a committed tool): md5 of the normalized optimizedPlan
string for every declared query, one JSONL line per query.

Usage:
    python tools/plan_hashes.py [sf_dir] > /tmp/hashes.jsonl
    # diff two dumps to enumerate plan-changed queries:
    python tools/plan_hashes.py --compare A.jsonl B.jsonl

Normalization scrubs expression ids (#123), temp-view UUID suffixes, and
tmp paths, so a hash difference means the distributed plan STRUCTURE
changed — the tranche-0 promotion criterion (__spark_entry__.py).  Streaming
queries (no batch optimizedPlan) hash their analyzed logical plan text.

Known flicker sources (adjudicate a CHANGED name by direct plan-string
diff in ISOLATED sessions before promoting it):
- queries whose subtrees match another query's in-query ``persist()``
  get CacheManager-substituted InMemoryRelations whose presence depends
  on unpersist timing earlier in the dump session (observed:
  minhash_calibration_curve / minhash_threshold_pr_curve hash
  differently across full-set dumps yet byte-identical in isolation);
- the distinct-aggregate rewrite assigns Expand gid tags
  nondeterministically across constructions (observed:
  q21_sole_fault_supplier).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(s: str) -> str:
    s = re.sub(r"#\d+", "#x", s)
    s = re.sub(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
               "UUID", s)
    s = re.sub(r"/tmp/[^\s,\)\]]+", "/tmp/X", s)
    s = re.sub(r"cist_cache_[0-9a-f]+", "cist_cache_X", s)
    return s


def dump(sf_dir: str) -> None:
    from sedona_iceberg_extension_spark.plans.queries import QUERIES
    from sedona_iceberg_extension_spark.session import get_session

    spark = get_session(master="local[8]")
    for name, qd in QUERIES.items():
        try:
            df = qd.fn(spark, sf_dir)
            try:
                plan = df._jdf.queryExecution().optimizedPlan().toString()
            except Exception:
                plan = df._jdf.queryExecution().analyzed().toString()
            h = hashlib.md5(_normalize(plan).encode()).hexdigest()
            print(json.dumps({"query": name, "plan_md5": h}))
        except Exception as e:
            print(json.dumps({"query": name,
                              "err": f"{type(e).__name__}: {e}"[:200]}))
        sys.stdout.flush()
    spark.stop()


def compare(a_path: str, b_path: str) -> int:
    def load(p):
        out = {}
        for line in open(p):
            rec = json.loads(line)
            out[rec["query"]] = rec.get("plan_md5") or rec.get("err")
        return out
    a, b = load(a_path), load(b_path)
    changed = sorted(n for n in a if n in b and a[n] != b[n])
    missing = sorted(set(a) - set(b))
    added = sorted(set(b) - set(a))
    for n in changed:
        print(f"CHANGED {n}")
    for n in missing:
        print(f"MISSING {n}")
    for n in added:
        print(f"ADDED {n}")
    print(f"# {len(changed)} changed, {len(missing)} missing, "
          f"{len(added)} added, {len(a)} total")
    return 0 if not (changed or missing) else 1


if __name__ == "__main__":
    if sys.argv[1:2] == ["--compare"]:
        sys.exit(compare(sys.argv[2], sys.argv[3]))
    dump(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
