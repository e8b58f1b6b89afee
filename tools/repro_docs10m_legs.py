"""Isolation A/B for the two sublinear docs_10m legs (VERDICT r13 #2/#7):
repetition_signals and lm_score, timed bench-identically (persist().count(),
min of N) at 1M and 10M, plus the fitted LM model's row count and
serialized size (directive #7's >100 MB broadcast check).

Usage: python tools/repro_docs10m_legs.py [--legs repetition,lm_score]
       [--rows 1000000,10000000] [--passes 2]
Requires the bench fixtures /tmp/semadb_bench_docs_{rows}.parquet (built by
a prior bench.py run).
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
    ap.add_argument("--legs", default="repetition,lm_score")
    ap.add_argument("--rows", default="1000000,10000000")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default="/tmp/repro_docs10m_legs.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from semadb_spark import get_spark
    from semadb_spark.operators import textstats as ts_ops

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="repro-docs10m", cpus=cpus)
    out: dict = {"cpus": cpus}

    legs = args.legs.split(",")
    for rows in [int(r) for r in args.rows.split(",")]:
        path = f"/tmp/semadb_bench_docs_{rows}.parquet"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            print(f"!! fixture missing: {path}", file=sys.stderr)
            continue
        d = spark.read.parquet(path).withColumn(
            "_id", F.col("doc_id").cast("string")
        )
        n = d.count()
        key = f"rows_{rows}"
        out[key] = {"n": n}

        def timed(make):
            best = None
            per_pass = []
            for _ in range(args.passes):
                frame = make()
                t0 = time.time()
                frame.persist().count()
                dt = time.time() - t0
                frame.unpersist(blocking=True)
                per_pass.append(round(dt, 2))
                best = dt if best is None else min(best, dt)
            print(f"#   passes: {per_pass}", file=sys.stderr)
            return round(best, 2)

        if "repetition" in legs:
            spark.sparkContext.setJobDescription(f"repetition {rows}")
            dt = timed(lambda: ts_ops.repetition_signals(d, "text"))
            out[key]["repetition_sec"] = dt
            out[key]["repetition_dps"] = round(n / dt)
        if "lm_score" in legs:
            # model stats once (fit is part of the timed leg in bench; here
            # we also materialize it alone for the #7 size check)
            model = ts_ops.ngram_lm_fit(
                d.where(F.xxhash64("_id") % 50 == 0), "text", min_count=2
            )
            mp = model.toPandas()
            size_bytes = int(
                mp["gram"].str.len().sum() + 8 * len(mp) + 16 * len(mp)
            )
            out[key]["model_rows"] = int(len(mp))
            out[key]["model_est_bytes"] = size_bytes
            spark.sparkContext.setJobDescription(f"lm_score {rows}")
            dt = timed(
                lambda: ts_ops.ngram_lm_score(
                    d, "text",
                    ts_ops.ngram_lm_fit(
                        d.where(F.xxhash64("_id") % 50 == 0), "text",
                        min_count=2,
                    ),
                )
            )
            out[key]["lm_score_sec"] = dt
            out[key]["lm_score_dps"] = round(n / dt)
        print(f"# {key}: {out[key]}", file=sys.stderr)

    for leg in ("repetition", "lm_score"):
        a, b = out.get("rows_1000000", {}), out.get("rows_10000000", {})
        if f"{leg}_dps" in a and f"{leg}_dps" in b:
            out[f"{leg}_linearity"] = round(a[f"{leg}_dps"] / b[f"{leg}_dps"], 2)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
