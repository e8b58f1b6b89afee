"""Standalone repro of the bench hierarchical-angular + IVF-PQ block.
Verdict r4 bar: raw ADC recall >= 0.4 AND served QPS within 2x of 628.6."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from semadb_spark import get_spark
from semadb_spark.operators.ann import (
    ivf_build,
    ivf_search,
    ivfpq_build,
    ivfpq_search,
    recall_at_k,
)
from semadb_spark.operators.knn import knn_topk_scan as _scan
from semadb_spark.operators.quantize import pq_adc_topk_batch


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    rows = int(os.environ.get("ROWS", 1_000_000))
    spark = get_spark(app_name="repro-pq", cpus=cpus)
    ang_path = f"/tmp/semadb_bench_angh_{rows}.parquet"
    if not os.path.exists(os.path.join(ang_path, "_SUCCESS")):
        import pandas as pd

        rng0 = np.random.RandomState(7)
        centers = rng0.normal(size=(1024, 100))
        sub_offsets = rng0.normal(scale=0.30, size=(8192, 100))

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                rng = np.random.RandomState(int(ids[0]) % (2**31))
                c = ids % 1024
                sub = (ids // 1024) % 64
                v = (
                    centers[c]
                    + sub_offsets[(c * 64 + sub) % 8192]
                    + rng.normal(scale=0.05, size=(len(ids), 100))
                )
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {"_id": ids.astype(str), "embedding": list(v.astype(np.float32))}
                )

        t0 = time.time()
        (
            spark.range(rows)
            .repartition(cpus)
            .mapInPandas(gen, "_id string, embedding array<float>")
            .write.mode("overwrite")
            .parquet(ang_path)
        )
        print(f"corpus gen: {time.time()-t0:.1f}s")
    ang = spark.read.parquet(ang_path)
    print("rows:", ang.count())

    aq_rows = ang.limit(1024).collect()
    rngq = np.random.RandomState(99)
    aq = []
    for i, r in enumerate(aq_rows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rngq.normal(scale=0.05, size=100)
        v /= np.linalg.norm(v)
        aq.append((str(i), v.tolist()))
    aq64 = {q[0] for q in aq[:64]}

    t0 = time.time()
    ang_exact = _scan(ang, "embedding", aq[:64], "cosine", 10)
    ang_exact.persist().count()
    print(f"exact 64q: {time.time()-t0:.2f}s")

    # IVF block on the same corpus (sanity for vector_1m_angular)
    t0 = time.time()
    ivf = ivf_build(ang, "embedding", "_id", nlist=128, seed=42)
    ivf.assigned.persist().count()
    print(f"ivf build: {time.time()-t0:.1f}s")
    for trial in range(3):
        t0 = time.time()
        a = ivf_search(ivf, aq, "cosine", 10, nprobe=8, compute_dtype="float32")
        a.persist().count()
        dt = time.time() - t0
        print(f"ivf f32 trial {trial}: {dt:.2f}s -> {len(aq)/dt:.1f} QPS")
        if trial < 2:
            a.unpersist()
    print("ivf recall:", round(recall_at_k(a.filter(F.col("query_id").isin(aq64)), ang_exact), 4))
    a.unpersist()
    ivf.assigned.unpersist()

    t0 = time.time()
    ivfpq = ivfpq_build(
        ang, "embedding", "_id", nlist=128, num_subvectors=20,
        num_centroids=256, metric="cosine", seed=42, sample_cap=65_536,
    )
    ivfpq.coded.persist().count()
    print(f"ivfpq build: {time.time()-t0:.1f}s")

    pq_codes = ivfpq.coded.select("_id", "pq_code")
    for trial in range(2):
        t0 = time.time()
        adc = pq_adc_topk_batch(pq_codes, "pq_code", ivfpq.books, aq, 10)
        adc.persist().count()
        dt = time.time() - t0
        print(f"full ADC trial {trial}: {dt:.2f}s -> {len(aq)/dt:.1f} QPS")
        if trial < 1:
            adc.unpersist()
    print("raw ADC recall:", round(recall_at_k(adc.filter(F.col("query_id").isin(aq64)), ang_exact), 4))
    adc.unpersist()

    for nprobe, ovs in [(4, 5), (8, 5), (8, 10), (2, 5)]:
        best = None
        for trial in range(3):
            t0 = time.time()
            rr = ivfpq_search(ivfpq, aq, "cosine", 10, nprobe=nprobe, oversample=ovs)
            rr.persist().count()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
            rec = recall_at_k(rr.filter(F.col("query_id").isin(aq64)), ang_exact)
            rr.unpersist()
        print(
            f"ivfpq serve nprobe={nprobe} ovs={ovs}: best {best:.2f}s -> "
            f"{len(aq)/best:.1f} QPS, recall {rec:.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
