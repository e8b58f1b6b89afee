"""Standalone repro of the bench vamana_1m row: fresh session, nothing else
running. Pins the packed-graph serving number against host noise (this host
has documented 4-5x noisy-neighbor swings; see the best_of docstring in
bench.py).

Serves the build-once packed artifact (tools/build_vamana_1m.py — rebuilds
it first if missing, ~450 s one-time) with the batched beam kernel at the
bench configuration: 4096-query batch, nprobe 4 of 64 centroids,
search_size 75, 64 id-stride seeds, float32 blobs/arithmetic. Recall@10 is
measured against the exact scan on the first 64 queries, exactly like
bench.py. Run several trials and take the best as the steady-state number.

Usage: python tools/repro_vamana.py [trials]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from semadb_spark.operators.knn import knn_topk_scan as _scan
from semadb_spark.operators.vamana import vamana_serve_packed


def main():
    from semadb_spark import get_spark
    from tools.build_vamana_1m import ART_PATH, ensure_vamana_1m
    from tools.gen_clustered_corpus import generate

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="repro-vamana", cpus=cpus)
    corpus_path = generate(spark, 1_000_000)
    meta = ensure_vamana_1m(spark, corpus_path)
    disk = spark.read.parquet(ART_PATH)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    big = spark.read.parquet(corpus_path)
    rows = big.limit(4096).collect()
    rng = np.random.RandomState(99)
    aq = []
    for i, r in enumerate(rows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rng.normal(
            scale=0.05, size=100
        )
        v /= np.linalg.norm(v)
        aq.append((str(i), v.tolist()))

    exact = _scan(
        big.withColumn("_id", F.col("_id").cast("string")),
        "embedding", aq[:64], "cosine", 10, id_col="_id",
    )
    ex: dict[str, set] = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["_id"])

    best = None
    rec = None
    for t in range(trials):
        t0 = time.time()
        res = vamana_serve_packed(
            disk, aq, 10, metric="cosine",
            search_size=int(meta["search_size"]),
            centroids=cents, nprobe=4,
            dtype=meta.get("pack_dtype", "float64"),
            kernel="batched", compute_dtype="float32", n_seeds=64,
        )
        got: dict[str, set] = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["_id"])
        dt = time.time() - t0
        rec = float(np.mean([len(got.get(q, set()) & ex[q]) / 10 for q in ex]))
        best = dt if best is None else min(best, dt)
        print(
            f"trial {t}: {dt:.2f}s = {4096 / dt:.0f} QPS, recall@10 {rec:.4f}",
            file=sys.stderr,
        )
    print(json.dumps({
        "qps_best": round(4096 / best, 1),
        "recall_at10": round(rec, 4),
        "trials": trials,
        "build_sec_once": meta["build_sec"],
        "nprobe": 4, "n_seeds": 64, "search_size": meta["search_size"],
    }))


if __name__ == "__main__":
    main()
