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
    "knn_hamming",
    "ann_ivf_topk",
    "ann_ivf_recall",
    "ann_lsh_topk",
    "ann_vamana_recall",
    "bq_hamming_topk",
    "pq_adc_recall",
    "quantized_bq_serving",
    # text search + hybrid
    "text_tfidf_any",
    "text_tfidf_all",
    "hybrid_or",
    # pipeline operators
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_components",
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

    # ann-benchmarks-scale vector block: replicate the embeddings table to
    # ~1M vectors (glove-100-angular, the reference's headline row, is
    # 1.18M x 100d) and measure (a) IVF index build — the north-star batch
    # workload, (b) IVF batch serving QPS, (c) recall@10 vs the exact scan
    # on the same corpus, (d) exact-scan batch QPS. Corpus setup is one-time
    # and untimed (parquet in /tmp, reused).
    from semadb_spark.operators.ann import ivf_build, ivf_search, recall_at_k

    target_rows = int(os.environ.get("SPARK_GRAFT_BENCH_VEC_ROWS", 1_000_000))
    big_path = f"/tmp/semadb_bench_emb_{target_rows}.parquet"
    if not os.path.exists(os.path.join(big_path, "_SUCCESS")):
        emb0 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        reps = max(1, target_rows // emb0.count())
        (
            emb0.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
            .select(
                (F.col("vec_id") * reps + F.col("rep")).cast("string").alias("_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (x + F.sin((F.col("rep") + 1) * (i + 1)) * F.lit(0.03)).cast("float"),
                ).alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(big_path)
        )
    big = spark.read.parquet(big_path)
    big_n = big.count()

    t0 = time.time()
    index = ivf_build(big, "embedding", "_id", nlist=128, seed=42)
    index.assigned.persist().count()
    build_1m = round(time.time() - t0, 3)

    qrows_1m = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(1024).collect()
    qlist_1m = [(str(i), [float(x) for x in r["embedding"]]) for i, r in enumerate(qrows_1m)]
    # Best-of-3 full-batch passes: the first pass measures JIT warm-up, not
    # throughput (580 -> 800 QPS across identical back-to-back runs), and
    # the host is shared, so min-of-N is the stable steady-state estimator.
    ivf_dt = None
    approx = None
    for _ in range(3):
        t0 = time.time()
        approx = ivf_search(index, qlist_1m, "euclidean", 10, nprobe=8)
        approx.persist().count()
        dt = time.time() - t0
        if ivf_dt is None or dt < ivf_dt:
            ivf_dt = dt
        else:
            approx.unpersist()

    from semadb_spark.operators.knn import knn_topk_scan as _scan

    t0 = time.time()
    exact = _scan(big, "embedding", qlist_1m[:64], "euclidean", 10)
    exact.persist().count()
    exact_dt = time.time() - t0
    qids64 = {q[0] for q in qlist_1m[:64]}
    recall = recall_at_k(approx.filter(F.col("query_id").isin(qids64)), exact)
    vector_1m = {
        "rows": big_n,
        "dim": len(qlist_1m[0][1]),
        "ivf_build_sec": build_1m,
        "ivf_qps": round(len(qlist_1m) / ivf_dt, 1),
        "ivf_recall_at10": round(recall, 4),
        "exact_scan_qps": round(64 / exact_dt, 1),
    }
    print(f"# vector_1m: {vector_1m}", file=sys.stderr)
    # release the block's persisted frames so the angular block measures
    # itself, not this block's storage pressure
    approx.unpersist()
    exact.unpersist()
    index.assigned.unpersist()

    # glove-100-angular-LIKE block: the container has no network/h5py for
    # the real ann-benchmarks HDF5 (S6 loader stays import-gated), so this
    # closes the "64d synthetic is easier" caveat as far as possible
    # locally: 1M x 100d clustered mixture (1024 centers + noise),
    # l2-normalized, cosine metric — the same shape/regime as the
    # reference's headline glove-100-angular row (BASELINE.md: v2 0.853
    # recall / 773.9 QPS, single thread).
    import numpy as np

    ang_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ANG_ROWS", 1_000_000))
    ang_path = f"/tmp/semadb_bench_ang_{ang_rows}.parquet"
    if not os.path.exists(os.path.join(ang_path, "_SUCCESS")):
        import pandas as pd

        centers = np.random.RandomState(7).normal(size=(1024, 100))

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                rng = np.random.RandomState(int(ids[0]) % (2**31))
                v = centers[ids % 1024] + rng.normal(scale=0.35, size=(len(ids), 100))
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {"_id": ids.astype(str), "embedding": list(v.astype(np.float32))}
                )

        (
            spark.range(ang_rows)
            .repartition(cpus)
            .mapInPandas(gen, "_id string, embedding array<float>")
            .write.mode("overwrite")
            .parquet(ang_path)
        )
    ang = spark.read.parquet(ang_path)
    ang_n = ang.count()
    t0 = time.time()
    ang_index = ivf_build(ang, "embedding", "_id", nlist=128, seed=42)
    ang_index.assigned.persist().count()
    ang_build = round(time.time() - t0, 3)
    aq_rows = ang.limit(1024).collect()
    rngq = np.random.RandomState(99)
    aq = []
    for i, r in enumerate(aq_rows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rngq.normal(scale=0.05, size=100)
        v /= np.linalg.norm(v)
        aq.append((str(i), v.tolist()))
    ang_dt = None
    ang_approx = None
    for _ in range(3):  # best-of-3, same policy as vector_1m
        t0 = time.time()
        ang_approx = ivf_search(ang_index, aq, "cosine", 10, nprobe=8)
        ang_approx.persist().count()
        dt = time.time() - t0
        if ang_dt is None or dt < ang_dt:
            ang_dt = dt
        else:
            ang_approx.unpersist()
    t0 = time.time()
    ang_exact = _scan(ang, "embedding", aq[:64], "cosine", 10)
    ang_exact.persist().count()
    ang_exact_dt = time.time() - t0
    aq64 = {q[0] for q in aq[:64]}
    ang_recall = recall_at_k(ang_approx.filter(F.col("query_id").isin(aq64)), ang_exact)
    vector_1m_angular = {
        "rows": ang_n,
        "dim": 100,
        "ivf_build_sec": ang_build,
        "ivf_qps": round(len(aq) / ang_dt, 1),
        "ivf_recall_at10": round(ang_recall, 4),
        "exact_scan_qps": round(64 / ang_exact_dt, 1),
    }
    print(f"# vector_1m_angular: {vector_1m_angular}", file=sys.stderr)

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
                "vector_1m": vector_1m,
                "vector_1m_angular": vector_1m_angular,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
