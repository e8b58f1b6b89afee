"""Isolation timing for the 1M Vamana build floor (r7 directive #6).

r6 recorded 449.5 s for the 1M merged build (64 centroids, ~16k-row
sub-shards, build_passes=1). Round 7's prune-path optimization (skip
padding ranks in robustPrune; degree-sort overflow pools before reverse
re-prune — commit ccaa9ba) targeted the profiled bottleneck (the prune
phases dominate each shard build). This tool re-times EXACTLY the bench
build shape on an idle host — same corpus fixture, same params, same
vamana_build call — WITHOUT touching the serving artifact (output goes to
a scratch dir, deleted afterward), then reports build seconds and a
recall check against the exact scan so any speedup is provably
quality-neutral.

Usage: python tools/repro_build_floor.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

SCRATCH = "/tmp/semadb_repro_build_floor.parquet"


def main() -> None:
    from semadb_spark import get_spark
    from semadb_spark.operators.knn import knn_topk_scan as _scan
    from semadb_spark.operators.vamana import (
        vamana_pack,
        vamana_serve_packed,
        vamana_build,
    )
    from tools.gen_clustered_corpus import generate

    spark = get_spark(
        app_name="repro-build-floor",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )
    corpus_path = generate(spark, 1_000_000)
    big = spark.read.parquet(corpus_path)
    # EXACTLY the tools/build_vamana_1m.py call (so the delta vs the r6
    # 449.5 s is attributable to the kernel, not the harness)
    t0 = time.time()
    index = vamana_build(
        big, "embedding", "_id", degree_bound=32, alpha=1.2, search_size=75,
        num_shards=64, metric="cosine", keep_sharded=True, seed=42,
        max_shard_rows=16_000, build_mode="batch", build_passes=1,
    )
    packed = vamana_pack(index.shard_nodes, index.shard_edges, dtype="float32")
    packed.write.mode("overwrite").partitionBy("cent").parquet(SCRATCH)
    build_sec = round(time.time() - t0, 1)
    print(f"# build+pack: {build_sec}s (r6 bench recorded 449.5s)", file=sys.stderr)

    # recall parity vs exact (the bench query shape: 64 scored queries)
    rows = big.limit(64).collect()
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
        "embedding", aq, "cosine", 10, id_col="_id",
    )
    ex: dict[str, set] = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["_id"])
    cents = np.asarray(index.centroids, dtype=np.float64)
    disk = spark.read.parquet(SCRATCH)
    got: dict[str, set] = {}
    res = vamana_serve_packed(
        disk, aq, 10, metric="cosine", search_size=75,
        centroids=cents, nprobe=4,
        dtype="float32", kernel="batched", compute_dtype="float32",
        n_seeds=64,
    )
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(str(r["_id"]))
    hits = sum(len(ex[q] & got.get(q, set())) for q in ex)
    recall = round(hits / (len(ex) * 10), 4)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    print(json.dumps({"build_sec": build_sec, "recall_at10": recall}))


if __name__ == "__main__":
    main()
