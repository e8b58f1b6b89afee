"""Isolation measurement for declared queries: warm seconds + Spark job count.

Usage: python tools/measure_queries.py [names...] [--out /tmp/x.json]

Replicates bench.py's headline methodology (cold pass, then min of two warm
`.count()` passes) and additionally counts the Spark jobs each warm pass
submits via setJobGroup + statusTracker — the "action boundary" evidence
VERDICT r13 directive #1 asks for. Writes {name: {warm, cold, jobs}} JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--out", default="/tmp/measure_queries.json")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from semadb_spark import get_spark
    from semadb_spark.functions.analyzer import tokenize

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="measure-queries", cpus=cpus)
    sc = spark.sparkContext

    # session warm, mirroring bench.py
    for t in ("lineitem", "documents", "embeddings"):
        spark.read.parquet(os.path.join(args.sf, f"{t}.parquet")).count()
    spark.read.parquet(os.path.join(args.sf, "documents.parquet")).select(
        F.explode(tokenize("text"))
    ).count()

    qs = entrymod.queries(merge=False)
    names = args.names or list(qs)
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        try:
            t0 = time.time()
            qs[name](spark, args.sf).count()
            cold = time.time() - t0
            warms = []
            jobs = []
            for i in range(2):
                group = f"{name}_warm{i}"
                sc.setJobGroup(group, name)
                t0 = time.time()
                qs[name](spark, args.sf).count()
                warms.append(time.time() - t0)
                jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
                sc.setJobGroup("", "")
            out[name] = {
                "warm": round(min(warms), 3),
                "cold": round(cold, 3),
                "jobs": min(jobs),
            }
            print(f"# {name}: warm {min(warms):.2f}s cold {cold:.2f}s "
                  f"jobs {jobs}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - record and continue
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"!! {name}: {e}", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"total_warm": round(sum(
        v.get("warm", 0.0) for v in out.values()), 3), "n": len(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
