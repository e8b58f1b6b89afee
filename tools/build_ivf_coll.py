"""Build-once bench Collection for the IVF local point-read serving row.

VERDICT r11 directive #5 asked the local tier to serve the IVF probe
route in-process instead of falling back to the ~150 ms/job Spark floor.
This sidecar is the ledger artifact: the 200k hybrid collection COPIED
(same clustered vectors, same snapshot layout) with an IVF index built on
the vector property — so ``Collection.search(req, route="auto")`` takes
the compiler's probe route on the engine and the resident probe+rerank
(`LocalSearchEngine._ivf_topk`) locally. bench.py measures the request
mix on it and records whether the fallback fired.

Usage: python tools/build_ivf_coll.py  (or import ensure_ivf_coll)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VERSION = 1
NLIST = 64


def paths_for(rows: int) -> tuple[str, str]:
    p = f"/tmp/semadb_bench_ivf_coll_{rows}"
    return p, p + ".meta.json"


def ensure_ivf_coll(spark, sf_dir: str = "/root/testdata/sf0.1",
                    rows: int = 200_000):
    """Returns (collection_path, meta); builds by copying the hybrid
    sidecar (ensure_hybrid_coll) and materializing the IVF artifact."""
    from semadb_spark import Collection
    from tools.build_hybrid_coll import ensure_hybrid_coll

    path, meta_path = paths_for(rows)
    hpath, hmeta = ensure_hybrid_coll(spark, sf_dir=sf_dir, rows=rows)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("version") == VERSION and meta.get("rows") == rows
                and meta.get("base_version") == hmeta["version"]):
            return path, meta
        shutil.rmtree(path, ignore_errors=True)
        os.remove(meta_path)
    t0 = time.time()
    shutil.rmtree(path, ignore_errors=True)
    shutil.copytree(hpath, path)
    coll = Collection.open(spark, path)
    nlist = coll.build_vector_index("v", nlist=NLIST)
    meta = {
        "version": VERSION,
        "base_version": hmeta["version"],
        "rows": rows,
        "dim": hmeta["dim"],
        "nlist": nlist,
        "build_sec": round(time.time() - t0, 1),
        "qvecs": hmeta["qvecs"],
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return path, meta


def ivf_requests(meta, n_requests: int = 48) -> list[dict]:
    """Pure vector point-reads — the shape whose route='auto' used to pay
    the Spark floor on IVF-indexed collections. searchSize 40 -> nprobe 5
    of 64 cells, the bounded-probe serving config."""
    qvecs = meta["qvecs"]
    return [
        {"query": {"property": "v", "vectorVamana": {
            "vector": qvecs[i % len(qvecs)], "limit": 10,
            "searchSize": 40}}, "limit": 10}
        for i in range(n_requests)
    ]


def main() -> None:
    from semadb_spark import Collection, get_spark

    spark = get_spark(app_name="build-ivf-coll",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    path, meta = ensure_ivf_coll(spark)
    print(f"artifact at {path}: "
          f"{json.dumps({k: v for k, v in meta.items() if k != 'qvecs'})}")
    coll = Collection.open(spark, path)
    reqs = ivf_requests(meta)
    import time as _t

    for r in reqs[:8]:
        coll.search(r, route="auto")
    best = None
    for _ in range(3):
        t0 = _t.time()
        for r in reqs:
            coll.search(r, route="auto")
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"route=auto IVF point-read: {len(reqs) / best:.1f} QPS "
          f"({1000 * best / len(reqs):.1f} ms/query)")


if __name__ == "__main__":
    main()
