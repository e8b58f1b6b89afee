"""Standalone repro of the bench angular IVF block: fresh session, no
preceding BQ/PQ blocks. Disambiguates 'real kernel regression' from
'bench-state contamination' for the r3 214.5 QPS collapse (r2: 1254.4)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from semadb_spark import get_spark
from semadb_spark.operators.ann import ivf_build, ivf_search, recall_at_k
from semadb_spark.operators.knn import knn_topk_scan as _scan


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="repro-angular", cpus=cpus)
    ang = spark.read.parquet("/tmp/semadb_bench_angh_1000000.parquet")
    print("rows:", ang.count())

    t0 = time.time()
    ang_index = ivf_build(ang, "embedding", "_id", nlist=128, seed=42)
    ang_index.assigned.persist().count()
    print(f"build: {time.time() - t0:.1f}s")

    aq_rows = ang.limit(1024).collect()
    rngq = np.random.RandomState(99)
    aq = []
    for i, r in enumerate(aq_rows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rngq.normal(scale=0.05, size=100)
        v /= np.linalg.norm(v)
        aq.append((str(i), v.tolist()))

    for dtype in ("float64", "float32"):
        for trial in range(3):
            t0 = time.time()
            approx = ivf_search(ang_index, aq, "cosine", 10, nprobe=8, compute_dtype=dtype)
            approx.persist().count()
            dt = time.time() - t0
            print(f"{dtype} trial {trial}: {dt:.2f}s -> {len(aq)/dt:.1f} QPS")
            if not (dtype == "float32" and trial == 2):
                approx.unpersist()

    t0 = time.time()
    ang_exact = _scan(ang, "embedding", aq[:64], "cosine", 10)
    ang_exact.persist().count()
    print(f"exact 64q: {time.time() - t0:.2f}s")
    aq64 = {q[0] for q in aq[:64]}
    print("recall:", recall_at_k(approx.filter(F.col("query_id").isin(aq64)), ang_exact))
    spark.stop()


if __name__ == "__main__":
    main()
