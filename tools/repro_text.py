"""Isolation repro for single-query text serving at 1M docs.

Builds (once) the term-bucket-partitioned on-disk posting index for the 1M
bench corpus at /tmp/semadb_bench_textidx_1000000.parquet — the layout
Collection.build_text_index persists — then times the per-query path three
ways so regressions can be localized:

  a) cached unbucketed frame (the round-4 bench shape, ~5 QPS)
  b) disk index, bucket-pruned, num_docs literal (the serving shape)
  c) same as (b) via a fresh read per query (no lingering cache)

Run: python tools/repro_text.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semadb_spark import get_spark  # noqa: E402
from semadb_spark.functions.hashing import md5_hash64  # noqa: E402
from semadb_spark.operators.text_search import (  # noqa: E402
    TERM_BUCKETS,
    build_text_index,
    text_search,
)

QUERIES = [
    ("spark query", "containsAny"),
    ("window merge stream", "containsAny"),
    ("data join", "containsAll"),
    ("table scan filter", "containsAny"),
    ("shuffle partition", "containsAll"),
    ("index search", "containsAny"),
    ("batch row group", "containsAny"),
    ("sort spill", "containsAny"),
]

IDX_PATH = "/tmp/semadb_bench_textidx_1000000.parquet"
DOCS_PATH = "/tmp/semadb_bench_docs_1000000.parquet"


def ensure_index(spark, d1m):
    if not os.path.exists(os.path.join(IDX_PATH, "_SUCCESS")):
        t0 = time.time()
        (
            build_text_index(d1m, "text")
            .withColumn(
                "term_bucket", F.pmod(md5_hash64(F.col("term")), F.lit(TERM_BUCKETS))
            )
            .repartition("term_bucket")
            # lead with the partition column: the partitionBy writer
            # re-sorts by partition cols unstably (see bench.py note)
            .sortWithinPartitions("term_bucket", "term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(IDX_PATH)
        )
        print(f"# index built+written in {time.time()-t0:.1f}s", file=sys.stderr)


def run_block(label, d1m, doc_terms, num_docs, passes=3):
    best = None
    for _ in range(passes):
        t0 = time.time()
        for qtext, op in QUERIES:
            text_search(
                d1m, "text", qtext, op, limit=75, doc_terms=doc_terms,
                num_docs=num_docs,
            ).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {len(QUERIES)/best:.1f} QPS ({best/len(QUERIES)*1000:.0f} ms/q)")
    return len(QUERIES) / best


def main():
    spark = get_spark(app_name="repro-text", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    d1m = spark.read.parquet(DOCS_PATH).withColumn("_id", F.col("doc_id").cast("string"))
    n = d1m.count()
    ensure_index(spark, d1m)

    # (a) round-4 shape: cached unbucketed frame
    flat = build_text_index(d1m, "text")
    flat.persist().count()
    run_block("a_cached_unbucketed", d1m, flat, n)
    flat.unpersist()

    # (b) disk index, bucket pruning + row-group skip + num_docs literal
    disk = spark.read.parquet(IDX_PATH)
    run_block("b_disk_bucketed", d1m, disk, n)

    # (c) cold-ish: fresh DataFrame per query (file listing cached by FS)
    t0 = time.time()
    for qtext, op in QUERIES:
        text_search(
            d1m, "text", qtext, op, limit=75,
            doc_terms=spark.read.parquet(IDX_PATH), num_docs=n,
        ).count()
    dt = time.time() - t0
    print(f"c_fresh_read: {len(QUERIES)/dt:.1f} QPS ({dt/len(QUERIES)*1000:.0f} ms/q)")

    # (d) the serving fast path: text_serve (one spark.sql call/query),
    # sequential then 16 concurrent clients. Context for (d)-sequential:
    # a bare 1-task rdd.count() on this host floors at ~150 ms, so the
    # sequential number IS the per-job overhead, not query work.
    from concurrent.futures import ThreadPoolExecutor

    from semadb_spark.operators.text_search import text_serve

    disk.createOrReplaceTempView("repro_postings")

    def serve(args):
        qtext, op = args
        return text_serve(
            spark, "repro_postings", qtext, op, limit=75, num_docs=n
        ).count()

    rdd1 = spark.sparkContext.parallelize([1], 1)
    rdd1.count()
    t0 = time.time()
    for _ in range(8):
        rdd1.count()
    print(f"bare_1task_job_floor: {(time.time()-t0)/8*1000:.0f} ms")
    for q in QUERIES:
        serve(q)
    t0 = time.time()
    for q in QUERIES:
        serve(q)
    dt = time.time() - t0
    print(f"d_serve_sequential: {len(QUERIES)/dt:.1f} QPS ({dt/len(QUERIES)*1000:.0f} ms/q)")
    q64 = QUERIES * 8
    with ThreadPoolExecutor(16) as ex:
        t0 = time.time()
        list(ex.map(serve, q64))
        dt = time.time() - t0
    print(f"d_serve_16clients: {len(q64)/dt:.1f} QPS")


if __name__ == "__main__":
    main()
