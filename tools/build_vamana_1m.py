"""One-time builder for the 1M Vamana serving fixture (bench vamana_1m row).

Builds the DiskANN merged graph over the clustered 1M angular corpus
(tools/gen_clustered_corpus.py fixture), packs it with vamana_pack, and
writes /tmp/semadb_bench_vamana_1m.parquet partitioned by cent, plus a
sidecar .meta.json carrying the measured build seconds and the routing
centroids. bench.py reuses the artifact across rounds (the VERDICT r4
directive says build once, serve per round) and reports build_sec from the
sidecar, flagged as built-once.

Params: degree_bound 32 / search_size 75 / alpha 1.2 are inside the
reference's own ranges (models/index.go:275-313); max_shard_rows=2500
trades build wall-clock for ~6x fewer beams per query at serve time (see
vamana_build docstring).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART_PATH = "/tmp/semadb_bench_vamana_1m.parquet"
META_PATH = ART_PATH + ".meta.json"


def ensure_vamana_1m(spark, corpus_path: str) -> dict:
    """Build the packed artifact if missing; return the sidecar meta."""
    if os.path.exists(META_PATH) and os.path.exists(
        os.path.join(ART_PATH, "_SUCCESS")
    ):
        with open(META_PATH) as f:
            return json.load(f)
    from semadb_spark.operators.vamana import vamana_build, vamana_pack

    big = spark.read.parquet(corpus_path)
    t0 = time.time()
    idx = vamana_build(
        big, "embedding", "_id", degree_bound=32, alpha=1.2, search_size=75,
        num_shards=128, metric="cosine", keep_sharded=True, seed=42,
        max_shard_rows=2500,
    )
    packed = vamana_pack(idx.shard_nodes, idx.shard_edges)
    packed.write.mode("overwrite").partitionBy("cent").parquet(ART_PATH)
    build_sec = round(time.time() - t0, 3)
    meta = {
        "rows": big.count(),
        "build_sec": build_sec,
        "centroids": idx.centroids.tolist(),
        "degree_bound": 32,
        "search_size": 75,
        "metric": "cosine",
        "max_shard_rows": 2500,
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
