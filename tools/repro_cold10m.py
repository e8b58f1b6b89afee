"""Isolation repro for the 10M TRUE-cold first batch (VERDICT r11 #1).

r10 committed 15.5 s on this artifact + methodology; both r11 runs
measured 32.8/46.2 s and the ledger blamed IO windows without an
isolation bisect. This script is that bisect: N independent trials of
the exact bench cold path (fadvise-evict every artifact parquet page,
race the open-time readahead via prefetch_packed_artifact, time the
first 4096-query serve batch), each trial paired with a RAW-IO probe —
a sequential re-read of a fixed ~512 MB evicted artifact slice — so the
cold number can be normalized by what the storage actually delivered in
the same seconds-window:

    io_floor_sec = artifact_bytes / probe_MBps
    cold_ratio   = cold_sec / io_floor_sec   (>= ~1 when IO-bound)

A stable cold_ratio across trials with swinging absolute numbers = IO
windows (ledger the band as the ratio); a ratio drift = a real code/
layout regression. bench.py publishes the same probe+ratio per round so
windows can never mask a regression again.

Usage: python tools/repro_cold10m.py [trials]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_BYTES = 512 << 20


def evict(path: str) -> int:
    """fadvise-DONTNEED every parquet page under path; returns bytes."""
    total = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        fd = os.open(f, os.O_RDONLY)
        try:
            total += os.fstat(fd).st_size
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
    return total


def io_probe(path: str, budget: int = PROBE_BYTES) -> float:
    """Sequential MB/s over ~budget bytes of freshly-evicted artifact
    files — the raw storage rate in the same window as the cold trial."""
    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True),
        key=os.path.getsize, reverse=True,
    )
    read = 0
    t0 = time.time()
    for f in files:
        with open(f, "rb", buffering=0) as fh:
            while read < budget:
                chunk = fh.read(1 << 20)
                if not chunk:
                    break
                read += len(chunk)
        if read >= budget:
            break
    dt = time.time() - t0
    # drop the probe's pages so the serve trial stays cold
    for f in files:
        fd = os.open(f, os.O_RDONLY)
        try:
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
    return read / dt / (1 << 20)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import numpy as np

    from semadb_spark import get_spark
    from semadb_spark.operators.vamana import (
        prefetch_packed_artifact,
        vamana_serve_packed,
    )
    from tools.build_vamana_10m import ART_PATH, META_PATH
    from tools.gen_clustered_corpus import generate as gen_corpus

    if not os.path.exists(os.path.join(ART_PATH, "_SUCCESS")):
        print(f"artifact absent at {ART_PATH} - run tools/build_vamana_10m.py")
        return
    with open(META_PATH) as f:
        meta = json.load(f)
    spark = get_spark(app_name="repro-cold10m",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    corpus = spark.read.parquet(gen_corpus(spark, meta["rows"]))
    rng = np.random.RandomState(1234)
    aq = []
    for i, r in enumerate(corpus.limit(4096).collect()):
        v = np.asarray(r["embedding"], dtype=np.float64) + rng.normal(
            scale=0.05, size=100)
        v /= np.linalg.norm(v)
        aq.append((str(i), v.tolist()))
    disk = spark.read.parquet(ART_PATH)
    cents = np.asarray(meta["centroids"], dtype=np.float64)

    def serve():
        return vamana_serve_packed(
            disk, aq, 10, metric="cosine",
            search_size=int(meta["search_size"]), centroids=cents, nprobe=1,
            dtype=meta.get("pack_dtype", "float64"), kernel="batched",
            compute_dtype="float32", n_seeds=64,
        ).count()

    serve()  # session warm-up: codegen + file listing, NOT page cache
    rows = []
    for t in range(trials):
        art_bytes = evict(ART_PATH)
        mbps = io_probe(ART_PATH)
        prefetch_packed_artifact(ART_PATH, threads=12)
        t0 = time.time()
        serve()
        cold = time.time() - t0
        t0 = time.time()
        serve()
        warm = time.time() - t0
        floor = art_bytes / (mbps * (1 << 20))
        rows.append({
            "trial": t, "cold_sec": round(cold, 1), "warm_sec": round(warm, 1),
            "probe_mbps": round(mbps, 1), "io_floor_sec": round(floor, 1),
            "cold_ratio_vs_io_floor": round(cold / floor, 2),
        })
        print(f"# trial {t}: {rows[-1]}", flush=True)
        time.sleep(3)
    print(json.dumps({
        "artifact_gb": round(evict(ART_PATH) / (1 << 30), 2),
        "trials": rows,
        "cold_best": min(r["cold_sec"] for r in rows),
        "cold_ratio_band": [min(r["cold_ratio_vs_io_floor"] for r in rows),
                            max(r["cold_ratio_vs_io_floor"] for r in rows)],
    }))


if __name__ == "__main__":
    main()
