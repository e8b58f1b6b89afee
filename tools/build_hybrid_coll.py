"""Build-once bench Collection for the hybrid point-read serving row.

A 200k-row Collection (text + string + integer + 64d vector properties,
text index built) that `bench.py` serves through Collection.search_local —
the one-process query lifecycle (reference: shard/shard.go:329-472). Built
once into /tmp like the other bench sidecars; meta pins rows + builder
VERSION so a stale artifact is rebuilt, never silently mis-measured.

Query material (sample tokens, integer percentiles, query vectors) is
captured INTO the meta at build time so the bench constructs identical
requests every round without touching the corpus again.

Usage: python tools/build_hybrid_coll.py  (or import ensure_hybrid_coll)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_HYBRID_ROWS", 200_000))
DIM = 64
PATH = f"/tmp/semadb_bench_hybrid_coll_{ROWS}"
META_PATH = PATH + ".meta.json"
VERSION = 4

SCHEMA = {
    "body": {"type": "text", "text": {"analyser": "standard"}},
    "lang": {"type": "string", "string": {"caseSensitive": False}},
    "n": {"type": "integer", "integer": {}},
    "v": {"type": "vectorFlat", "vectorFlat": {
        "vectorSize": DIM, "distanceMetric": "euclidean"}},
}


def ensure_hybrid_coll(spark, sf_dir: str = "/root/testdata/sf0.1"):
    """Returns (collection_path, meta); builds the artifact if absent or
    version/row-count stale."""
    from pyspark.sql import functions as F

    from semadb_spark import Collection

    if os.path.exists(META_PATH):
        with open(META_PATH) as f:
            meta = json.load(f)
        if meta.get("version") == VERSION and meta.get("rows") == ROWS:
            return PATH, meta
        shutil.rmtree(PATH, ignore_errors=True)
        os.remove(META_PATH)
    t0 = time.time()
    shutil.rmtree(PATH, ignore_errors=True)
    src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = max(1, ROWS // src.count() + 1)
    # deterministic 64d vectors from xxhash64(doc_id, lane): uniform in
    # [-1, 1), no driver-side materialization of the matrix
    vec = F.array(
        *[
            (
                F.xxhash64(F.col("doc_id"), F.lit(j)).cast("double")
                / F.lit(float(2**63))
            ).cast("float")
            for j in range(DIM)
        ]
    )
    # body = real text + a 4-token md5 tail per doc over a ~65k-token
    # vocabulary (df ~= 12 at 200k rows): the synthetic corpus's own
    # vocabulary is ~30 words ALL at df ~150k (no Zipf tail at all), so
    # without the tail every possible query term forces a 150k-row posting
    # scan — unrepresentative of any real corpus. Same trick as the 10M
    # text bench corpus (token-soup selectivity).
    tail = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat_ws("_", F.col("doc_id").cast("string"), F.lit(j))),
                1, 4,
            )
            for j in range(4)
        ],
    )
    rows = (
        src.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            "text", "lang",
        )
        .limit(ROWS)
        .select(
            F.col("doc_id").cast("string").alias("_id"),
            F.concat_ws(" ", F.col("text"), tail).alias("body"),
            "lang",
            F.pmod(F.xxhash64("doc_id"), F.lit(1000)).alias("n"),
            vec.alias("v"),
        )
    )
    coll = Collection.create(spark, PATH, SCHEMA, num_buckets=16)
    coll.insert(rows)
    coll.build_text_index()
    # query material: df-banded tokens off the posting index — informative
    # query terms (the md5-tail vocabulary sits at df ~8-40; the corpus's
    # natural words all sit at df ~150k and make every text leg a full
    # posting scan, measured 100 ms/leg).
    postings = spark.read.parquet(coll._index_path("body"))
    tokens = [
        r["term"]
        for r in postings.select("term", "df").distinct()
        .filter((F.col("df") >= 8) & (F.col("df") <= 1000))
        .orderBy(F.col("term").asc()).limit(64).collect()
    ]
    sample = coll.df().limit(400).select("_id", "body", "lang", "v").collect()
    langs = sorted({r["lang"] for r in sample if r["lang"]})[:4]
    qvecs = [[float(x) for x in r["v"]] for r in sample[:24]]
    meta = {
        "version": VERSION,
        "rows": ROWS,
        "dim": DIM,
        "build_sec": round(time.time() - t0, 1),
        "tokens": tokens,
        "langs": langs,
        "qvecs": qvecs,
    }
    with open(META_PATH, "w") as f:
        json.dump(meta, f)
    return PATH, meta


def bench_requests(meta, n_requests: int = 48) -> list[dict]:
    """Deterministic hybrid request mix: text+vector _or, filter+vector
    _and, filter+text — the two-leg trees VERDICT r9 #2 names, plus a
    three-leg kitchen-sink every 8th request."""
    toks, langs, qvecs = meta["tokens"], meta["langs"], meta["qvecs"]
    reqs = []
    for i in range(n_requests):
        qv = qvecs[i % len(qvecs)]
        t2 = f"{toks[i % len(toks)]} {toks[(i * 7 + 3) % len(toks)]}"
        lo = (i * 37) % 800
        shape = i % 4
        if shape == 0:
            q = {"property": "_or", "_or": [
                {"property": "body", "text": {
                    "operator": "containsAny", "value": t2, "limit": 10,
                    "weight": 2.0}},
                {"property": "v", "vectorFlat": {
                    "vector": qv, "limit": 10, "weight": 0.5}},
            ]}
        elif shape == 1:
            q = {"property": "_and", "_and": [
                {"property": "n", "integer": {
                    "operator": "inRange", "value": lo, "endValue": lo + 150}},
                {"property": "v", "vectorFlat": {"vector": qv, "limit": 10}},
            ]}
        elif shape == 2:
            q = {"property": "_and", "_and": [
                {"property": "lang", "string": {
                    "operator": "equals", "value": langs[i % len(langs)]}},
                {"property": "body", "text": {
                    "operator": "containsAny", "value": t2, "limit": 10}},
            ]}
        else:
            q = {"property": "_or", "_or": [
                {"property": "_and", "_and": [
                    {"property": "n", "integer": {
                        "operator": "greaterThan", "value": lo}},
                    {"property": "v", "vectorFlat": {
                        "vector": qv, "limit": 10}},
                ]},
                {"property": "body", "text": {
                    "operator": "containsAll", "value": t2, "limit": 10}},
            ]}
        reqs.append({"query": q, "limit": 10})
    return reqs


def main() -> None:
    from semadb_spark import Collection, get_spark

    spark = get_spark(app_name="build-hybrid-coll",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    path, meta = ensure_hybrid_coll(spark)
    print(f"artifact at {path}: {json.dumps({k: v for k, v in meta.items() if k != 'qvecs'})[:400]}")
    coll = Collection.open(spark, path)
    reqs = bench_requests(meta)
    # isolation measurement: warm then best-of-3 passes
    import time as _t

    for r in reqs[:8]:
        coll.search_local(r)
    best = None
    for _ in range(3):
        t0 = _t.time()
        for r in reqs:
            coll.search_local(r)
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"search_local: {len(reqs) / best:.1f} QPS ({1000 * best / len(reqs):.1f} ms/q)")
    with coll.open_search_pool(workers=8, warm_requests=reqs[:4]) as pool:
        pool.search_many(reqs)
        best = None
        for _ in range(3):
            t0 = _t.time()
            pool.search_many(reqs)
            best = min(best or 9e9, _t.time() - t0)
    print(f"search pool(8): {len(reqs) / best:.1f} QPS")
    t0 = _t.time()
    coll.search(reqs[0]).collect()
    coll.search(reqs[1]).collect()
    t0 = _t.time()
    for r in reqs[:4]:
        coll.search(r).collect()
    print(f"engine same queries: {(_t.time() - t0) * 250 / 4:.0f} ms/q")


if __name__ == "__main__":
    main()
