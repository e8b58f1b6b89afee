"""One-time generator for the clustered angular bench corpus at any scale.

Writes /tmp/semadb_bench_angh_{rows}.parquet with EXACTLY the same
hierarchical mixture as bench.py's angular block (1024 coarse centers x 64
subcenters, point noise, l2-normalized) so bench runs at any row count reuse
the same fixture. Usage: python tools/gen_clustered_corpus.py [rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(spark, rows: int) -> str:
    import numpy as np

    path = f"/tmp/semadb_bench_angh_{rows}.parquet"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import pandas as pd

    cpus = spark.sparkContext.defaultParallelism
    rng0 = np.random.RandomState(7)
    centers = rng0.normal(size=(1024, 100))
    sub_offsets = rng0.normal(scale=0.30, size=(8192, 100))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            c = ids % 1024
            sub = (ids // 1024) % 64
            v = (
                centers[c]
                + sub_offsets[(c * 64 + sub) % 8192]
                + rng.normal(scale=0.05, size=(len(ids), 100))
            )
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame(
                {"_id": ids.astype(str), "embedding": list(v.astype(np.float32))}
            )

    (
        spark.range(rows)
        .repartition(max(cpus, rows // 250_000))
        .mapInPandas(gen, "_id string, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


if __name__ == "__main__":
    from semadb_spark import get_spark

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="gen-corpus", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    t0 = time.time()
    p = generate(spark, rows)
    print(f"{p} rows={spark.read.parquet(p).count()} in {time.time()-t0:.1f}s")
