"""Filtered Vamana serving A/B: row-table cogroup path vs the r9 packed
filtered seeded-beam (vamana_serve_packed(candidate_ids=...)).

Both implement the reference's filtered search semantics (search.go:28-51:
filter-seeded beams over the full graph, only filtered points in the
result). The packed path additionally (a) join-prunes shards holding no
filtered point before any blob is read, (b) decodes blobs instead of
cogrouping two row tables per query batch, and (c) keeps the beam on
baked codes when the artifact carries them. This tool pins the wall-clock
difference and checks both sides' recall against the exact filtered scan.

Fixture: a 200k-row 100d clustered corpus (tools/gen_clustered_corpus),
~13 shards of ~16k rows, built once into /tmp and reused.

Usage: python tools/repro_filtered_graph.py [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

ROWS = 200_000
BASE = "/tmp/semadb_repro_fltgraph"


def _ensure_artifacts(spark):
    from semadb_spark.operators.vamana import vamana_build, vamana_pack
    from tools.gen_clustered_corpus import generate

    corpus_path = generate(spark, ROWS)
    if not os.path.exists(os.path.join(BASE, "packed", "_SUCCESS")):
        emb = (
            spark.read.parquet(corpus_path)
            .filter(F.col("embedding").isNotNull())
            .select(F.col("_id").cast("string"), F.col("embedding").alias("v"))
        )
        t0 = time.time()
        idx = vamana_build(
            emb, "v", "_id", degree_bound=32, alpha=1.2, search_size=75,
            num_shards=13, seed=7, metric="cosine", keep_sharded=True,
        )
        idx.shard_nodes.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(BASE, "nodes")
        )
        idx.shard_edges.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(BASE, "edges")
        )
        vamana_pack(idx.shard_nodes, idx.shard_edges, dtype="float32").write.mode(
            "overwrite"
        ).partitionBy("cent").parquet(os.path.join(BASE, "packed"))
        with open(os.path.join(BASE, "meta.json"), "w") as fh:
            json.dump(
                {"build_sec": round(time.time() - t0, 1),
                 "centroids": idx.centroids.tolist()},
                fh,
            )
        idx.edges.unpersist()
        idx.shard_nodes.unpersist()
        idx.shard_edges.unpersist()
    with open(os.path.join(BASE, "meta.json")) as fh:
        return corpus_path, json.load(fh)


def main() -> None:
    from semadb_spark import get_spark
    from semadb_spark.operators.knn import knn_topk_scan
    from semadb_spark.operators.vamana import vamana_serve, vamana_serve_packed

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="repro-filtered-graph",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )
    corpus_path, meta = _ensure_artifacts(spark)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    big = spark.read.parquet(corpus_path).filter(F.col("embedding").isNotNull())
    qrows = big.limit(64).collect()
    rng = np.random.RandomState(99)
    queries = []
    for i, r in enumerate(qrows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rng.normal(
            scale=0.05, size=len(r["embedding"])
        )
        v /= np.linalg.norm(v)
        queries.append((str(i), v.tolist()))

    # ~30% of ids pass the filter (a broad payload predicate)
    flt = (
        big.select(F.col("_id").cast("string"))
        .filter(F.pmod(F.xxhash64("_id"), F.lit(10)) < 3)
    )
    exact = knn_topk_scan(
        big.join(flt, "_id", "left_semi").select(
            F.col("_id"), F.col("embedding")
        ),
        "embedding", queries, "cosine", 10, id_col="_id",
    )
    ex: dict[str, set] = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["_id"])

    nodes = spark.read.parquet(os.path.join(BASE, "nodes"))
    edges = spark.read.parquet(os.path.join(BASE, "edges"))
    packed = spark.read.parquet(os.path.join(BASE, "packed"))

    def run_row():
        return vamana_serve(
            nodes, edges, queries, 10, metric="cosine", search_size=75,
            centroids=cents, candidate_ids=flt,
        )

    def run_packed():
        return vamana_serve_packed(
            packed, queries, 10, metric="cosine", search_size=75,
            candidate_ids=flt, beam_on="float", dtype="float32",
            compute_dtype="float32",
        )

    out: dict = {"rows": ROWS, "build_sec": meta["build_sec"]}
    for name, fn in (("row_table", run_row), ("packed", run_packed)):
        fn().count()  # warm codegen + file listing
        best = None
        got: dict[str, set] = {}
        for t in range(trials):
            t0 = time.time()
            frame = fn()
            rows = frame.collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"# {name} trial {t}: {dt:.2f}s", file=sys.stderr)
            got = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["_id"])
        rec = np.mean([
            len(got.get(q, set()) & ex.get(q, set())) / max(len(ex.get(q, set())), 1)
            for q, _ in queries
        ])
        out[name] = {
            "best_sec": round(best, 2),
            "qps": round(len(queries) / best, 1),
            "recall_at10": round(float(rec), 4),
        }
    out["speedup_packed_vs_row"] = round(
        out["row_table"]["best_sec"] / out["packed"]["best_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
