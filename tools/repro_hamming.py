"""Instrumented repro of the raw-hamming 1M scan: where does the time go?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from semadb_spark import get_spark
from semadb_spark.operators.quantize import bq_encode, bq_fit, encode_bits_np
from semadb_spark.operators.knn import knn_topk_scan


def main():
    spark = get_spark(app_name="repro-hamming", cpus=32)
    big = spark.read.parquet("/tmp/semadb_bench_emb_1000000.parquet")
    t0 = time.time()
    thr = bq_fit(big, "embedding")
    codes = bq_encode(big.select("_id", "embedding"), "embedding", thr).select(
        "_id", "bq_code"
    )
    codes.persist()
    print("codes:", codes.count(), f"build {time.time()-t0:.1f}s")
    print("partitions:", codes.rdd.getNumPartitions())

    qrows = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").limit(1024).collect()
    qmat_f = np.asarray([[float(x) for x in r["embedding"]] for r in qrows], dtype=np.float64)
    qcodes = encode_bits_np(qmat_f, thr)
    cq = [(str(i), qcodes[i].tolist()) for i in range(len(qcodes))]

    # instrumented kernel: same work as knn_topk_scan's local_topk, with timers
    from semadb_spark.functions.distances import (
        arrow_list_matrix,
        id_order_ranks,
        numpy_distance_matrix,
        topk_per_group,
    )

    qmat = np.asarray([q[1] for q in cq], dtype=np.int64)

    def probe(batches):
        import pyarrow as pa

        td = tc = tp = tz = tr = 0.0
        nb = 0
        t_start = time.time()
        for batch in batches:
            nb += 1
            t0 = time.time()
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            vecs = arrow_list_matrix(batch.column(1), dtype=np.int64)
            tc += time.time() - t0
            t0 = time.time()
            dists = numpy_distance_matrix("hamming", vecs, qmat)
            td += time.time() - t0
            t0 = time.time()
            kth = np.partition(dists, 9, axis=0)[9]
            tp += time.time() - t0
            t0 = time.time()
            sr, sc = np.nonzero(dists <= kth[None, :])
            tz += time.time() - t0
            t0 = time.time()
            keep = topk_per_group(sc, dists[sr, sc], ranks[sr], 10)
            tr += time.time() - t0
        total = time.time() - t_start
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([nb], type=pa.int64()),
                pa.array([round(tc, 2)]),
                pa.array([round(td, 2)]),
                pa.array([round(tp, 2)]),
                pa.array([round(tz, 2)]),
                pa.array([round(tr, 2)]),
                pa.array([round(total, 2)]),
            ],
            names=["nb", "convert", "dist", "part", "nonzero", "trim", "total"],
        )

    t0 = time.time()
    stats = codes.mapInArrow(
        probe,
        "nb long, convert double, dist double, part double, nonzero double, trim double, total double",
    ).collect()
    wall = time.time() - t0
    import pandas as pd

    pdf = pd.DataFrame([r.asDict() for r in stats])
    print(pdf.describe().loc[["mean", "max"]])
    print(f"WALL: {wall:.1f}s for {len(cq)} queries -> {len(cq)/wall:.1f} QPS")

    # and the real operator for comparison
    for trial in range(2):
        t0 = time.time()
        r = knn_topk_scan(codes, "bq_code", cq, "hamming", 10)
        n = r.count()
        dt = time.time() - t0
        print(f"knn_topk_scan trial {trial}: {dt:.1f}s -> {len(cq)/dt:.1f} QPS ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
