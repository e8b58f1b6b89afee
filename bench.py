"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports ``vector_qps`` (batch kNN queries/sec via the scale-path
partition-local top-k scan) — the comparable number against the reference's
ann-benchmarks QPS table (BASELINE.md), measured batch-style per
BASELINE.json's batch-first north star.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


BENCH_QUERIES = [
    # relational-shaped operator throughput
    "filter_bool_compose",
    "filter_int_range",
    "shaping_sort_page",
    "agg_events_rollup",
    # vector search
    "knn_euclidean",
    "knn_batch",
    "knn_filtered",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_vamana_topk",
    "bq_hamming_topk",
    "pq_adc_topk",
    # text search + hybrid
    "text_tfidf_any",
    "text_tfidf_all",
    "hybrid_or",
    # pipeline operators
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "embed_neardup",
    "lang_id_counts",
    "quality_scores",
    "token_count_by_source",
    "fingerprint_docs",
    # write path
    "dml_update_merge",
    # multimodal
    "multimodal_image_meta",
]

VECTOR_QPS_BATCH = 512  # queries in the throughput batch (batch-first regime)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from semadb_spark import get_spark
    from semadb_spark.operators.knn import knn_topk_scan

    spark = get_spark(app_name="semadb-bench", cpus=cpus)

    # warm the JVM + file listing + codegen paths shared across queries so
    # per-query timings measure the operator, not one-time session setup
    for t in ("lineitem", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    from semadb_spark.functions.analyzer import tokenize

    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.explode(tokenize("text"))
    ).count()

    # Two-pass timing per query: the first (cold) run pays one-time codegen
    # and index build; the second (warm) run is steady-state — the number
    # comparable to the reference's published QPS, which is measured with a
    # full in-memory cache and excludes index build / cold start
    # (BASELINE.md caveats, reference README.md:198,204). Both are reported.
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: warm {dt:.2f}s / cold {cold[name]:.2f}s ({n} rows)", file=sys.stderr)

    # vector throughput: batch of exact top-10 over the embeddings table via
    # the partition-local scan (the serving-shaped workload)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
        "_id", F.col("vec_id").cast("string")
    )
    qrows = emb.limit(VECTOR_QPS_BATCH).select("_id", "embedding").collect()
    qlist = [(r["_id"], [float(x) for x in r["embedding"]]) for r in qrows]
    t0 = time.time()
    knn_topk_scan(emb, "embedding", qlist, "euclidean", 10).count()
    dt = time.time() - t0
    timings["vector_batch_scan"] = round(dt, 3)
    vector_qps = round(len(qlist) / dt, 1)
    total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "cold_queries": cold,
                "timing": "warm steady-state (cold incl. codegen+index-build in cold_queries)",
                "sf": sf,
                "vector_qps": vector_qps,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
