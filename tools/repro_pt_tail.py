"""Isolate the vamana_10m point-read latency tail (VERDICT r13 #5).

Runs the bench's exact 64-query point-read latency pass against the packed
10M artifact and prints the per-query latency distribution plus how many
queries paid a synchronous fingerprint re-walk or a cent decode, before and
after the r14 stale-while-revalidate fix.

Usage: python tools/repro_pt_tail.py [--queries 64] [--ttl 1.0]
Requires /tmp/semadb_bench_vamana_10m.parquet (tools/build_vamana_10m.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--ttl", type=float, default=None)
    args = ap.parse_args()

    from tools.build_vamana_10m import ART_PATH, META_PATH

    if not os.path.exists(META_PATH):
        print("artifact absent - run tools/build_vamana_10m.py", file=sys.stderr)
        return 1
    with open(META_PATH) as f:
        meta = json.load(f)
    from semadb_spark.operators import vamana as vm

    cents = np.asarray(meta["centroids"], dtype=np.float64)
    rng = np.random.default_rng(7)
    dim = cents.shape[1]
    qs = [
        (cents[rng.integers(0, len(cents))] + rng.normal(0, 0.05, dim)).tolist()
        for _ in range(args.queries)
    ]
    pkw = dict(
        metric="cosine", search_size=int(meta["search_size"]),
        centroids=cents, nprobe=1,
        dtype=meta.get("pack_dtype", "float64"), n_seeds=64,
    )
    if args.ttl is not None:
        pkw["fp_ttl_sec"] = args.ttl
    # warm pass (decodes the routed cents)
    for v in qs:
        vm.vamana_serve_local(ART_PATH, v, 10, **pkw)
    lat = []
    for v in qs:
        t0 = time.time()
        vm.vamana_serve_local(ART_PATH, v, 10, **pkw)
        lat.append(time.time() - t0)
    lat_ms = sorted(x * 1000 for x in lat)
    p50 = lat_ms[len(lat_ms) // 2]
    p99 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))]
    out = {
        "n": len(lat_ms),
        "p50_ms": round(p50, 2),
        "p90_ms": round(lat_ms[int(len(lat_ms) * 0.9)], 2),
        "p99_ms": round(p99, 2),
        "max_ms": round(lat_ms[-1], 2),
        "p99_over_p50": round(p99 / max(p50, 1e-9), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
