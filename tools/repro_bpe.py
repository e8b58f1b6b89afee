"""Measured-throughput repro for the BPE tokenizer at 1M documents.

Fits a merge table on a 2% hash-sample of the bench docs_1m corpus
(min_count high enough to bound the vocab table), then times one full
bpe_encode pass over all 1M docs — the honest cost of the Arrow-batched
Python encode path (the module docstring's "UDFs are the slow path"
claim, made a number). Ledgered in COVERAGE.md rather than run
per-round: the encode pass is minutes, and the per-round bench budget
belongs to the serving rows.

Usage: python tools/repro_bpe.py [num_merges] (default 512)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from semadb_spark import get_spark
    from semadb_spark.operators import bpe as B

    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rows = int(os.environ.get("SPARK_GRAFT_BPE_ROWS", 1_000_000))
    path = f"/tmp/semadb_bench_docs_{rows}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise SystemExit(f"bench corpus missing at {path} - run bench.py first")
    spark = get_spark(app_name="repro-bpe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    docs = spark.read.parquet(path).withColumn(
        "_id", F.col("doc_id").cast("string"))
    n = docs.count()

    t0 = time.time()
    merges = B.bpe_fit(
        docs.where(F.xxhash64("_id") % 50 == 0), "text",
        num_merges=num_merges, min_count=4,
    )
    fit_sec = time.time() - t0

    out = {"rows": n, "num_merges": len(merges), "fit_sec": round(fit_sec, 2)}
    for p in range(2):  # pass 0 warms codegen/Arrow; pass 1 is steady-state
        t0 = time.time()
        total = B.bpe_encode(
            docs, "text", merges, keep_cols=["_id"]
        ).agg(F.sum("n_bpe_tokens")).first()[0]
        dt = time.time() - t0
        out[f"encode_sec_p{p}"] = round(dt, 2)
    out["encode_docs_per_sec"] = round(n / dt)
    out["encode_tokens_per_sec"] = round(total / dt)
    out["total_bpe_tokens"] = int(total)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
