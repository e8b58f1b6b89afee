"""Serving-parameter sweep for the bench vamana_10m row.

The first r8 full-bench run recorded 473.8 QPS @ recall 0.9797 with
nprobe=4 — below the directive bar (>= ~630, half the 1M figure) but with
0.08 recall headroom over the 0.9 floor. (Resolved: nprobe=1 + float16 +
int16 CSR landed 794.0 @ 0.975 in the final r8 bench; this tool remains
the measurement harness for future artifact/param changes.) Per-query beam work is scale-invariant by
construction (rows/cent constant 1M -> 10M), so the 3.2x QPS gap vs the 1M
row is per-shard FIXED cost: at 640 centroids each probed shard sees ~25
of the 4096 batched queries (vs ~256 at 1M's 64 centroids), so blob decode
and beam-setup amortize 10x worse. Fewer probes per query (nprobe) and
fewer stride seeds per beam (n_seeds) cut exactly that fixed cost; this
tool measures the (nprobe, n_seeds) frontier on the committed artifact
with the bench's own queries, oracle, and best_of timing so the chosen
point can be copied into bench.py verbatim.

Usage: python tools/sweep_vamana10m.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.build_vamana_10m import ART_PATH, META_PATH

CONFIGS = [
    # (nprobe, n_seeds, search_size) — bench r8 shipped (4, 64, 75).
    # First sweep (full 4096q): (2,64,75) won at 610.6 QPS @ 0.9828 —
    # fewer probes cut the per-shard fixed cost and recall stayed flat
    # (per-probe beam work is unchanged; the extra probes were adding
    # near-duplicate candidates). Second sweep: push nprobe=1 and trim
    # the beam queue, recall floor is 0.9.
    (1, 64, 75),
    (1, 32, 75),
    (1, 64, 50),
    (2, 64, 50),
    (2, 64, 36),
    (1, 64, 36),
]


def main() -> None:
    from pyspark.sql import functions as F

    from bench import best_of
    from semadb_spark import get_spark
    from semadb_spark.operators.ann import recall_at_k
    from semadb_spark.operators.knn import knn_topk_scan
    from semadb_spark.operators.vamana import vamana_serve_packed

    quick = "--quick" in sys.argv
    if not (
        os.path.exists(os.path.join(ART_PATH, "_SUCCESS"))
        and os.path.exists(META_PATH)
    ):
        print(json.dumps({"skipped": "artifact absent"}))
        return
    with open(META_PATH) as fh:
        meta = json.load(fh)

    spark = get_spark(
        app_name="sweep-vamana10m",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )
    from tools.gen_clustered_corpus import generate as _gen_corpus

    path10 = _gen_corpus(spark, 10_000_000)
    big10 = spark.read.parquet(path10)

    # identical query derivation to bench.py's 10M block
    q10_rows = big10.limit(4096).collect()
    rng10 = np.random.RandomState(1234)
    aq10 = []
    for i, r in enumerate(q10_rows):
        v = np.asarray(r["embedding"], dtype=np.float64) + rng10.normal(
            scale=0.05, size=100
        )
        v /= np.linalg.norm(v)
        aq10.append((str(i), v.tolist()))
    if quick:
        aq10 = aq10[:1024]

    t0 = time.time()
    exact10, _ = best_of(
        2, lambda: knn_topk_scan(big10, "embedding", aq10[:64], "cosine", 10)
    )
    print(f"# exact oracle in {time.time() - t0:.1f}s", file=sys.stderr)
    aq10_64 = {q[0] for q in aq10[:64]}

    vam10_disk = spark.read.parquet(ART_PATH)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    out = []
    for nprobe, n_seeds, search_size in CONFIGS:
        frame, dt = best_of(
            3,
            lambda: vamana_serve_packed(
                vam10_disk, aq10, 10, metric="cosine",
                search_size=search_size,
                centroids=cents, nprobe=nprobe,
                dtype=meta.get("pack_dtype", "float64"),
                kernel="batched", compute_dtype="float32", n_seeds=n_seeds,
            ),
        )
        rec = recall_at_k(
            frame.filter(F.col("query_id").isin(aq10_64)), exact10
        )
        frame.unpersist()
        row = {
            "nprobe": nprobe,
            "n_seeds": n_seeds,
            "search_size": search_size,
            "qps": round(len(aq10) / dt, 1),
            "recall_at10": round(rec, 4),
        }
        out.append(row)
        print(json.dumps(row))
    exact10.unpersist()
    print(json.dumps({"sweep": out}))


if __name__ == "__main__":
    main()
