"""One-time builder for the 1M Vamana serving fixture (bench vamana_1m row).

Builds the DiskANN merged graph over the clustered 1M angular corpus
(tools/gen_clustered_corpus.py fixture), packs it with vamana_pack, and
writes /tmp/semadb_bench_vamana_1m.parquet partitioned by cent, plus a
sidecar .meta.json carrying the measured build seconds and the routing
centroids. bench.py reuses the artifact across rounds (the VERDICT r4
directive says build once, serve per round) and reports build_sec from the
sidecar, flagged as built-once.

Version 2 (round 6): build_mode="batch" (batch-parallel Vamana build,
_local_build_batch) with 64 routing centroids and ~16k-row sub-shards
— larger shards mean each routed query runs ~4 beams per probed centroid
pair instead of ~56, and the batched serve kernel amortizes one einsum per
beam step across the whole routed query batch.

Version 4 (round 8): int16 CSR neighbor ids from vamana_pack (halves
the adjacency payload, the largest single transfer component at
degree 32). Version 3 (round 8): vector blobs pack float16, following the 10M
artifact's measured serve breakdown (a batched serve is ~85%
artifact-transfer-bound, so blob bytes are the QPS lever; the 10M
interleaved A/B measured f16 +15-21% QPS at a ~0.003 recall cost).
Serving arithmetic stays float32 (compute_dtype), distances report
float64, and vamana_pack computes the medoid at >=float32.

Params: degree_bound 32 / search_size 75 / alpha 1.2 are inside the
reference's own ranges (models/index.go:275-313).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART_PATH = "/tmp/semadb_bench_vamana_1m.parquet"
META_PATH = ART_PATH + ".meta.json"
VERSION = 4


def ensure_vamana_1m(spark, corpus_path: str) -> dict:
    """Build the packed artifact if missing or stale; return the sidecar
    meta. A meta without the current version marker forces a rebuild (the
    v1 artifact used 2.5k-row shards + float64 blobs)."""
    if os.path.exists(META_PATH) and os.path.exists(
        os.path.join(ART_PATH, "_SUCCESS")
    ):
        with open(META_PATH) as f:
            meta = json.load(f)
        if meta.get("version") == VERSION:
            return meta
    from semadb_spark.operators.vamana import vamana_build, vamana_pack

    big = spark.read.parquet(corpus_path)
    t0 = time.time()
    idx = vamana_build(
        big, "embedding", "_id", degree_bound=32, alpha=1.2, search_size=75,
        num_shards=64, metric="cosine", keep_sharded=True, seed=42,
        max_shard_rows=16000, build_mode="batch",
        build_passes=int(os.environ.get("SPARK_GRAFT_VAMANA_PASSES", "1")),
    )
    packed = vamana_pack(idx.shard_nodes, idx.shard_edges, dtype="float16")
    packed.write.mode("overwrite").partitionBy("cent").parquet(ART_PATH)
    build_sec = round(time.time() - t0, 3)
    meta = {
        "version": VERSION,
        "rows": big.count(),
        "build_sec": build_sec,
        "centroids": idx.centroids.tolist(),
        "degree_bound": 32,
        "search_size": 75,
        "metric": "cosine",
        "max_shard_rows": 16000,
        "build_mode": "batch",
        "build_passes": int(os.environ.get("SPARK_GRAFT_VAMANA_PASSES", "1")),
        "pack_dtype": "float16",
    }
    with open(META_PATH, "w") as f:
        json.dump(meta, f)
    idx.edges.unpersist()
    idx.shard_edges.unpersist()
    idx.shard_nodes.unpersist()
    return meta


if __name__ == "__main__":
    from semadb_spark import get_spark
    from tools.gen_clustered_corpus import generate

    spark = get_spark(
        app_name="build-vamana-1m", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    path = generate(spark, 1_000_000)
    meta = ensure_vamana_1m(spark, path)
    print(json.dumps({k: v for k, v in meta.items() if k != "centroids"}))
