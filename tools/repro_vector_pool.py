"""Isolation repro for VectorServePool on the 10M packed Vamana artifact.

Pins the bench's `vamana_10m.point_read.qps_mp16` band: N worker
processes with cent-affinity dispatch serving the same 256-query batch
the bench times, vs the 1-client vamana_serve_local loop. Queries are
drawn deterministically from the artifact's own corpus slice metadata
(the same aq10 recipe the bench uses: first rows of the angular-hard
corpus), so a run here and a bench run measure the same work.

Usage: python tools/repro_vector_pool.py [workers] [trials] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.build_vamana_10m import ART_PATH, META_PATH  # noqa: E402


def main() -> None:
    import numpy as np
    import pyarrow.dataset as pads

    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    with open(META_PATH) as f:
        meta = json.load(f)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    kw = dict(
        metric="cosine",
        search_size=int(meta["search_size"]),
        centroids=cents,
        nprobe=1,
        dtype=meta.get("pack_dtype", "float64"),
        n_seeds=64,
    )

    # queries: first n_q corpus vectors off the angular-hard bench corpus
    # (what aq10 samples); falls back to artifact rows if the corpus
    # parquet is absent
    corpus = f"/tmp/semadb_bench_angh_{meta['rows']}.parquet"
    if os.path.exists(os.path.join(corpus, "_SUCCESS")):
        tbl = pads.dataset(corpus).head(n_q, columns=["embedding"])
        qvs = [list(map(float, v)) for v in tbl.column("embedding").to_pylist()]
    else:
        raise SystemExit(f"bench corpus absent at {corpus}")

    from semadb_spark.operators.vamana import VectorServePool, vamana_serve_local

    # 1-client baseline (parent-process cache)
    for v in qvs[:64]:
        vamana_serve_local(ART_PATH, v, 10, **kw)  # warm decode
    t0 = time.time()
    for v in qvs[:64]:
        vamana_serve_local(ART_PATH, v, 10, **kw)
    one = 64 / (time.time() - t0)
    print(f"1-client: {one:.1f} QPS ({1000/one:.1f} ms/q)")

    with VectorServePool(ART_PATH, workers=workers, **kw) as pool:
        t0 = time.time()
        res = pool.search_many(qvs, 10)
        print(f"pool warm pass ({workers}w, {n_q}q): {time.time()-t0:.2f}s")
        assert all(len(r) == 10 for r in res)
        best = None
        for t in range(trials):
            t0 = time.time()
            pool.search_many(qvs, 10)
            dt = time.time() - t0
            qps = n_q / dt
            best = max(best or 0.0, qps)
            print(f"trial {t}: {qps:.1f} QPS ({dt:.2f}s)")
        # spot parity vs the in-process path on 4 queries
        for v in qvs[:4]:
            want = vamana_serve_local(ART_PATH, v, 10, **kw)
            got = pool.search(v, 10)
            assert [(i, round(d, 6)) for i, d in got] == [
                (i, round(d, 6)) for i, d in want
            ]
    print(f"best: {best:.1f} QPS @ {workers} workers; parity ok")


if __name__ == "__main__":
    main()
