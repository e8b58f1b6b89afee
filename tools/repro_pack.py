"""Isolated bench-identical timing of the pack_sequences 1M leg (and the
sf0.1 gate shape) for the r14 totals-subtree A/B.

Usage: python tools/repro_pack.py [--passes 3]
Requires /tmp/semadb_bench_docs_1000000.parquet.
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
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from semadb_spark import get_spark
    from semadb_spark.operators import packing as pk

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="repro-pack", cpus=cpus)
    out = {}

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn("_id", F.col("doc_id").cast("string"))
        .withColumn("ord", F.col("doc_id"))
    )
    docs.count()  # warm

    def timed(make):
        best = None
        for _ in range(args.passes):
            frame = make()
            t0 = time.time()
            frame.persist().count()
            dt = time.time() - t0
            frame.unpersist(blocking=True)
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out["gate_sf01"] = timed(
        lambda: pk.pack_sequences(docs, "text", "_id", max_tokens=256,
                                  order_col="ord")
    )

    p1m = "/tmp/semadb_bench_docs_1000000.parquet"
    if os.path.exists(os.path.join(p1m, "_SUCCESS")):
        d1m = spark.read.parquet(p1m).withColumn(
            "_id", F.col("doc_id").cast("string")
        )
        d1m.count()
        out["leg_1m"] = timed(
            lambda: pk.pack_sequences(d1m, "text", "_id", max_tokens=2048,
                                      order_col="doc_id")
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
