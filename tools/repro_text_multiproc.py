"""Process-parallel serving for text_serve_local (r8 isolation finding).

The 16-thread in-process run of text_serve_local measured ~13 QPS vs
~36 for 1 thread: the pyarrow row-group reads release the GIL but the
per-query pandas scoring does not, so threads contend. A real serving
tier runs one PROCESS per core instead — each process opens its own
ParquetFile handles against the same immutable artifact (no shared
state; the artifact is read-only parquet). This tool measures that
shape: N worker processes, each serving the bench's 8 query texts from
the 10M posting index, warmed, several trials.

Usage: python tools/repro_text_multiproc.py [nprocs] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIDX10 = "/tmp/semadb_bench_textidx_10000000.parquet"
NUM_DOCS = 10_000_000

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


def _serve(args):
    # runs in the worker process; imports + caches are per-process
    qtext, op = args
    from semadb_spark.operators.text_search import text_serve_local

    return len(
        text_serve_local(TIDX10, qtext, op, limit=75, num_docs=NUM_DOCS)
    )


def main() -> None:
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if not os.path.exists(os.path.join(TIDX10, "_SUCCESS")):
        print(json.dumps({"skipped": "10M text index absent - run bench"}))
        return
    q64 = QUERIES * 8
    with ProcessPoolExecutor(nprocs) as ex:
        list(ex.map(_serve, QUERIES))  # warm each worker's caches
        results = []
        for t in range(trials):
            t0 = time.time()
            list(ex.map(_serve, q64))
            dt = time.time() - t0
            qps = round(len(q64) / dt, 1)
            results.append(qps)
            print(f"# trial {t}: {qps} qps ({nprocs} procs)", file=sys.stderr)
    print(
        json.dumps(
            {
                "nprocs": nprocs,
                "trials": results,
                "best": max(results),
                "median": sorted(results)[len(results) // 2],
            }
        )
    )


if __name__ == "__main__":
    main()
