"""Quantized-through-graph serving evaluation at 1M: all beam variants over
the SAME packed Vamana artifact (tools/build_vamana_1m.py), 4096-query
batch, recall vs the exact scan on the first 64 queries — the experiment
behind the BQ/PQ graph-serving rows in COVERAGE.md.

Variants:
- float    — the graded plain route (vamana_1m bench row)
- bq       — symmetric hamming beam (reference v2-BQ architecture verbatim,
             vamana.go:257-259 + binary.go:152-175), exact rerank
- bq_adc   — asymmetric: float query margins vs binary corpus codes via
             byte LUTs (_bq_margin_luts), exact rerank; same artifact bytes
- pq       — product-quantizer ADC beam (v2-PQ, product.go:238-305) over
             uint8 codes, exact rerank

Code-bearing artifacts are derived from the packed graph once and cached in
/tmp beside it (the codes are a serving-layout fact, not a rebuild).

Usage: python tools/repro_quantized_graph.py [variant ...] [--trials N]
       [--search-size S] [--oversample M] [--nprobe P]
(default: all four variants, 3 trials, bench config 75/4/4)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

BQ_PATH = "/tmp/semadb_bench_vamana_1m_bqcodes.parquet"
PQ_PATH = "/tmp/semadb_bench_vamana_1m_pqcodes.parquet"
SIDE_PATH = "/tmp/semadb_bench_vamana_1m_quant.side.pkl"


def ensure_code_artifacts(spark, corpus_path: str, meta: dict):
    """Derive BQ- and PQ-coded copies of the packed 1M artifact (one pass
    each over the blobs) plus the fitted thresholds/books sidecar."""
    from semadb_spark.operators.quantize import bq_fit, pq_fit
    from semadb_spark.operators.vamana import (
        vamana_pack_add_codes,
        vamana_pack_add_pq_codes,
    )
    from tools.build_vamana_1m import ART_PATH

    # cache key ties the derived code artifacts to the EXACT base packed
    # artifact they were encoded from: a 1M rebuild (version bump or
    # re-run) invalidates them, otherwise quant rows would keep serving
    # codes derived from a graph that no longer exists
    base_fp = (
        meta.get("version"),
        os.stat(os.path.join(ART_PATH, "_SUCCESS")).st_mtime_ns,
    )
    if (
        os.path.exists(SIDE_PATH)
        and os.path.exists(os.path.join(BQ_PATH, "_SUCCESS"))
        and os.path.exists(os.path.join(PQ_PATH, "_SUCCESS"))
    ):
        with open(SIDE_PATH, "rb") as f:
            side = pickle.load(f)
        if side.get("base_fp") == list(base_fp) or side.get("base_fp") == base_fp:
            return side
    big = spark.read.parquet(corpus_path)
    thr = bq_fit(big, "embedding")
    books = pq_fit(big, "embedding", num_subvectors=20, num_centroids=256,
                   metric="cosine", seed=42)
    packed = spark.read.parquet(ART_PATH)
    dtype = meta.get("pack_dtype", "float64")
    vamana_pack_add_codes(packed, thr, dtype=dtype).write.mode(
        "overwrite"
    ).partitionBy("cent").parquet(BQ_PATH)
    vamana_pack_add_pq_codes(packed, books, dtype=dtype).write.mode(
        "overwrite"
    ).partitionBy("cent").parquet(PQ_PATH)
    side = {"thresholds": thr, "books": books, "base_fp": base_fp}
    with open(SIDE_PATH, "wb") as f:
        pickle.dump(side, f)
    return side


def main():
    from semadb_spark import get_spark
    from semadb_spark.operators.knn import knn_topk_scan as _scan
    from semadb_spark.operators.vamana import vamana_serve_packed
    from tools.build_vamana_1m import ART_PATH, ensure_vamana_1m
    from tools.gen_clustered_corpus import generate

    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*",
                    default=["float", "bq", "bq_adc", "pq"])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--search-size", type=int, default=0,
                    help="0 = the artifact's build-time search_size (75)")
    ap.add_argument("--oversample", type=int, default=4)
    ap.add_argument("--nprobe", type=int, default=4)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="repro-quantized-graph", cpus=cpus)
    corpus_path = generate(spark, 1_000_000)
    meta = ensure_vamana_1m(spark, corpus_path)
    side = ensure_code_artifacts(spark, corpus_path, meta)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    dtype = meta.get("pack_dtype", "float64")
    L = args.search_size or int(meta["search_size"])

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

    frames = {
        "float": spark.read.parquet(ART_PATH),
        "bq": spark.read.parquet(BQ_PATH),
        "bq_adc": spark.read.parquet(BQ_PATH),
        "pq": spark.read.parquet(PQ_PATH),
    }
    out = {}
    for variant in args.variants:
        kw = {}
        if variant in ("bq", "bq_adc"):
            kw = {"beam_on": variant, "thresholds": side["thresholds"],
                  "oversample": args.oversample}
        elif variant == "pq":
            kw = {"beam_on": "pq", "books": side["books"],
                  "oversample": args.oversample}
        best = None
        rec = None
        for t in range(args.trials):
            t0 = time.time()
            res = vamana_serve_packed(
                frames[variant], aq, 10, metric="cosine", search_size=L,
                centroids=cents, nprobe=args.nprobe, dtype=dtype,
                kernel="batched", compute_dtype="float32", n_seeds=64, **kw,
            )
            got: dict[str, set] = {}
            for r in res.collect():
                got.setdefault(r["query_id"], set()).add(r["_id"])
            dt = time.time() - t0
            rec = float(np.mean([len(got.get(q, set()) & ex[q]) / 10 for q in ex]))
            best = dt if best is None else min(best, dt)
            print(
                f"{variant} trial {t}: {dt:.2f}s = {4096 / dt:.0f} QPS, "
                f"recall@10 {rec:.4f}",
                file=sys.stderr,
            )
        out[variant] = {"qps_best": round(4096 / best, 1),
                        "recall_at10": round(rec, 4)}
    print(json.dumps({"search_size": L, "oversample": args.oversample,
                      "nprobe": args.nprobe, **out}))


if __name__ == "__main__":
    main()
