"""Checkpointed builder for the 10M Vamana serving fixture (bench
vamana_10m row).

Same DiskANN merged-build recipe as tools/build_vamana_1m.py, one decade up
on the same clustered angular generator (tools/gen_clustered_corpus.py):
routing centroids scale 64 -> 640 so per-probe work stays ~constant, and
sub-shards stay ~16k rows so each shard build matches the measured
per-shard profile (~31 s / ~0.5 GB peak in _local_build_batch).

Why phases instead of one vamana_build call: the all-in-one build persists
the 20M-row assignment AND the ~640M-row edge table in executor memory
before packing — at 10M rows on this host that is what pushed the JVM past
the global memory line (the r7 attempt died to the kernel OOM killer, java
at 49 GB RSS). The checkpointed shape is also the honest 100 TB posture:
at cluster scale every phase boundary is a parquet write (lineage cut,
restartable, no multi-hour in-memory job), which is exactly what the
comment in vamana_build says production would do. Phases:

  A. sample + k-means(640) driver-side; overlap-assign (replicas=2) via
     the shared assign_top_shards kernel; salt-split oversized shards;
     write (id, v, shard, slice) parquet partitioned by slice.
  B. per slice: groupBy(shard) -> make_shard_builder kernel -> write the
     slice's edge rows. Each slice is a few minutes; a _SUCCESS per slice
     makes the ~25 min phase resumable at slice granularity.
  C. per slice: cogroup nodes+edges -> vamana_pack(PACK_DTYPE) -> write
     ART_PATH/slice=N partitioned by cent. Readers see one artifact with
     (slice, cent) partition columns; the cent routing predicate prunes
     directories exactly as with the unsliced 1M artifact.

Slices are keyed cent % NSLICES, so a shard's nodes and edges always land
in the same slice and phase C's cogroup never crosses slice boundaries.

Resume safety: state.json records a per-phase parameter fingerprint
(_phase_params); on any VERSION / param change the affected phase outputs
are DELETED before resuming (A ⊃ B ⊃ C cascade, _invalidate_stale_phases)
— a _SUCCESS marker alone is never trusted across a recipe change.

Params degree_bound 32 / search_size 75 / alpha 1.2 are inside the
reference's own ranges (models/index.go:275-313).

v4 re-packs with int16 CSR neighbor ids (vamana_pack now stores them
2 bytes/edge for <=32k-row shards — the adjacency is the largest single
transfer payload at degree 32, 1.28 GB int32 -> 0.64 GB at 10M; phase C
re-runs, edges/centroids unchanged). v3 packed the vector blobs float16 (edges/centroids unchanged — only
phase C re-runs when upgrading from v2): a scan diagnosis showed serving
a 4096-query batch is ~85% artifact-transfer-bound (JVM scan 1.5 s,
Arrow transfer to Python 5.5 s of the 6.3 s serve), so halving the
8 GB vec payload is the direct QPS lever; beams and rerank compute in
float32 regardless (compute_dtype), and the sweep's recall check guards
the half-precision storage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = 10_000_000
ART_PATH = "/tmp/semadb_bench_vamana_10m.parquet"
META_PATH = ART_PATH + ".meta.json"
WORK = "/tmp/semadb_vamana10m_work"
VERSION = 4
PACK_DTYPE = "float16"
NSLICES = 16
REPLICAS = 2
NUM_SHARDS = 640
MAX_SHARD_ROWS = 16_000
DEGREE_BOUND = 32
SEARCH_SIZE = 75
ALPHA = 1.2
METRIC = "cosine"
SEED = 42


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _state() -> dict:
    p = os.path.join(WORK, "state.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"phase_sec": {}}


def _save_state(st: dict) -> None:
    os.makedirs(WORK, exist_ok=True)
    with open(os.path.join(WORK, "state.json"), "w") as f:
        json.dump(st, f)


def _phase_params() -> dict:
    """The build parameters each phase's on-disk output depends on. A
    _SUCCESS marker alone is NOT resume evidence (ADVICE r8): a VERSION /
    param bump between runs would otherwise skip phases A-C and stamp the
    new version onto unchanged bytes — e.g. meta.pack_dtype=float16 over
    float32 blobs, which serving would frombuffer-reshape into garbage."""
    a = {
        "rows": ROWS, "seed": SEED, "nslices": NSLICES,
        "replicas": REPLICAS, "num_shards": NUM_SHARDS,
        "max_shard_rows": MAX_SHARD_ROWS,
    }
    b = dict(a, degree_bound=DEGREE_BOUND, search_size=SEARCH_SIZE,
             alpha=ALPHA, metric=METRIC, build_mode="batch", build_passes=1)
    c = dict(b, pack_dtype=PACK_DTYPE, version=VERSION)
    return {"a": a, "b": b, "c": c}


def _invalidate_stale_phases(st: dict) -> dict:
    """Compare the current builder params against the ones recorded when
    each phase's outputs were written; delete every phase output downstream
    of the first mismatch (A ⊃ B ⊃ C cascade). Returns the updated state
    with the new fingerprints recorded and stale phase_sec entries
    dropped."""
    import shutil

    want = _phase_params()
    have = st.get("phase_params")
    if have is None:
        # Legacy workdir written before fingerprints existed. If a META
        # completed the old build, reconstruct the params it recorded and
        # diff those; with no META (mid-build crash) adopt the current
        # params — a same-session crash-resume always has them, and every
        # run from here on stamps real fingerprints.
        if os.path.exists(META_PATH):
            with open(META_PATH) as f:
                m = json.load(f)
            legacy_a = dict(
                want["a"], rows=m.get("rows"),
                num_shards=m.get("num_shards"),
                max_shard_rows=m.get("max_shard_rows"),
            )
            legacy_b = dict(
                want["b"], **{k: legacy_a[k] for k in legacy_a},
                degree_bound=m.get("degree_bound"),
                search_size=m.get("search_size"),
                metric=m.get("metric"),
                build_mode=m.get("build_mode"),
                build_passes=m.get("build_passes"),
            )
            legacy_c = dict(
                legacy_b, version=m.get("version"),
                pack_dtype=m.get("pack_dtype"),
            )
            have = {"a": legacy_a, "b": legacy_b, "c": legacy_c}
        else:
            have = want
    stale_a = have.get("a") != want["a"]
    stale_b = stale_a or have.get("b") != want["b"]
    stale_c = stale_b or have.get("c") != want["c"]
    secs = st.get("phase_sec", {})

    def _rm(path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    if stale_c:
        # META + root _SUCCESS first so a crash mid-wipe can't leave a
        # "complete" artifact pointing at mixed-recipe slices
        _rm(META_PATH)
        _rm(os.path.join(ART_PATH, "_SUCCESS"))
        for s in range(NSLICES):
            _rm(os.path.join(ART_PATH, f"slice={s}"))
        secs = {k: v for k, v in secs.items() if not k.startswith("pack_")}
        print("# params/version changed: phase C outputs invalidated",
              file=sys.stderr)
    if stale_b:
        for s in range(NSLICES):
            _rm(os.path.join(WORK, f"edges_{s}"))
        secs = {k: v for k, v in secs.items() if not k.startswith("build_")}
        print("# graph params changed: phase B outputs invalidated",
              file=sys.stderr)
    if stale_a:
        _rm(os.path.join(WORK, "assigned"))
        _rm(os.path.join(WORK, "centroids.npy"))
        secs.pop("assign", None)
        st.pop("n_subshards", None)
        print("# assignment params changed: phase A outputs invalidated",
              file=sys.stderr)
    st["phase_sec"] = secs
    st["phase_params"] = want
    _save_state(st)
    return st


def ensure_vamana_10m(spark, corpus_path: str) -> dict:
    """Build the packed 10M artifact phase-by-phase (resuming whatever is
    already on disk); return the sidecar meta."""
    if os.path.exists(META_PATH) and _done(ART_PATH):
        with open(META_PATH) as f:
            meta = json.load(f)
        if meta.get("version") == VERSION:
            return meta

    from pyspark.sql import functions as F

    from semadb_spark.functions.kmeans import collect_vector_sample, kmeans_np
    from semadb_spark.operators.vamana import (
        assign_top_shards,
        make_shard_builder,
        vamana_pack,
    )

    st = _invalidate_stale_phases(_state())
    big = spark.read.parquet(corpus_path)
    base = big.filter(F.col("embedding").isNotNull()).select(
        F.col("_id").cast("string").alias("id"), F.col("embedding").alias("v")
    )

    # -- Phase A: centroids + salted overlap assignment ------------------
    assigned_path = os.path.join(WORK, "assigned")
    cents_path = os.path.join(WORK, "centroids.npy")
    if not (_done(assigned_path) and os.path.exists(cents_path)):
        t0 = time.time()
        sample = collect_vector_sample(base, "v", seed=SEED)
        cents = kmeans_np(sample, NUM_SHARDS, seed=SEED)
        os.makedirs(WORK, exist_ok=True)
        np.save(cents_path, cents)
        raw = assign_top_shards(base, cents, REPLICAS)
        # Skew-salting (the vamana_build policy): shards past
        # MAX_SHARD_ROWS split into hash-salted sub-builds. One extra
        # counting pass over the assignment UDF instead of a 20M-row
        # persist — two cheap GEMM scans beat holding 16 GB in the JVM.
        counts = {
            r["shard"]: r["n"]
            for r in raw.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        splits = {s: -(-n // MAX_SHARD_ROWS) for s, n in counts.items()}
        split_expr = F.coalesce(
            *[F.when(F.col("shard") == s, F.lit(k)) for s, k in splits.items()]
            or [F.lit(1)],
            F.lit(1),
        )
        (
            raw.withColumn("slice", F.col("shard") % NSLICES)
            .withColumn(
                "shard",
                F.concat_ws(
                    "_", F.col("shard"), F.pmod(F.xxhash64("id"), split_expr)
                ),
            )
            .write.mode("overwrite")
            .partitionBy("slice")
            .parquet(assigned_path)
        )
        st["phase_sec"]["assign"] = round(time.time() - t0, 3)
        st["n_subshards"] = int(sum(splits.values()))
        _save_state(st)
    cents = np.load(cents_path)

    # -- Phase B: per-slice shard builds ---------------------------------
    builder = make_shard_builder(
        DEGREE_BOUND, ALPHA, SEARCH_SIZE, METRIC, SEED,
        build_mode="batch", build_passes=1,
    )
    n_parts = spark.sparkContext.defaultParallelism
    for s in range(NSLICES):
        epath = os.path.join(WORK, f"edges_{s}")
        if _done(epath):
            continue
        t0 = time.time()
        nodes_s = spark.read.parquet(assigned_path).filter(F.col("slice") == s)
        (
            # 4x the sub-shard count in hash buckets keeps key collisions
            # (two 31 s builds serialized in one task) rare
            nodes_s.repartition(max(n_parts, 4 * (st.get("n_subshards", 1280) // NSLICES)), "shard")
            .groupBy("shard")
            .applyInPandas(
                builder, "shard string, src string, dst string, dist double"
            )
            .write.mode("overwrite")
            .parquet(epath)
        )
        st["phase_sec"][f"build_{s}"] = round(time.time() - t0, 3)
        _save_state(st)
        print(f"# slice {s}: built in {st['phase_sec'][f'build_{s}']}s", file=sys.stderr)

    # -- Phase C: per-slice pack + artifact write ------------------------
    for s in range(NSLICES):
        spath = os.path.join(ART_PATH, f"slice={s}")
        if _done(spath):
            continue
        t0 = time.time()
        nodes_s = (
            spark.read.parquet(assigned_path)
            .filter(F.col("slice") == s)
            .select("shard", "id", "v")
        )
        edges_s = spark.read.parquet(os.path.join(WORK, f"edges_{s}")).select(
            "shard", "src", "dst"
        )
        (
            vamana_pack(nodes_s, edges_s, dtype=PACK_DTYPE)
            .write.mode("overwrite")
            .partitionBy("cent")
            .parquet(spath)
        )
        st["phase_sec"][f"pack_{s}"] = round(time.time() - t0, 3)
        _save_state(st)
        print(f"# slice {s}: packed in {st['phase_sec'][f'pack_{s}']}s", file=sys.stderr)

    build_sec = round(sum(st["phase_sec"].values()), 3)
    meta = {
        "version": VERSION,
        "rows": big.count(),
        "build_sec": build_sec,
        "phase_sec": st["phase_sec"],
        "centroids": cents.tolist(),
        "degree_bound": DEGREE_BOUND,
        "search_size": SEARCH_SIZE,
        "metric": METRIC,
        "num_shards": NUM_SHARDS,
        "max_shard_rows": MAX_SHARD_ROWS,
        "build_mode": "batch",
        "build_passes": 1,
        "pack_dtype": PACK_DTYPE,
    }
    with open(META_PATH, "w") as f:
        json.dump(meta, f)
    # root completeness marker (bench and this builder's resume check)
    with open(os.path.join(ART_PATH, "_SUCCESS"), "w"):
        pass
    return meta


BQ_ART_PATH = ART_PATH + ".bq"
PQ_ART_PATH = ART_PATH + ".pq"
BQ_SIDE_PATH = ART_PATH + ".bq_side.pkl"


def ensure_vamana_10m_codes(spark, corpus_path: str, meta: dict) -> dict:
    """BQ- and PQ-coded copies of the packed 10M artifact for CODE-DOMAIN
    serving (vamana_serve_packed rerank="none"): fit thresholds + 20x256
    product books on the corpus (sample-capped k-means), bake codes into
    every shard row (vamana_pack_add_codes / _add_pq_codes), write beside
    the base artifact. Keyed on the base artifact's (version, _SUCCESS
    mtime) like the 1M repro's coded artifacts, so a base rebuild
    invalidates the codes. Returns {"thresholds", "books"}."""
    import pickle

    base_fp = [
        meta.get("version"),
        os.stat(os.path.join(ART_PATH, "_SUCCESS")).st_mtime_ns,
    ]
    if (
        os.path.exists(BQ_SIDE_PATH)
        and os.path.exists(os.path.join(BQ_ART_PATH, "_SUCCESS"))
        and os.path.exists(os.path.join(PQ_ART_PATH, "_SUCCESS"))
    ):
        with open(BQ_SIDE_PATH, "rb") as f:
            side = pickle.load(f)
        if list(side.get("base_fp", [])) == base_fp and "books" in side:
            return side
    from semadb_spark.operators.quantize import bq_fit, pq_fit
    from semadb_spark.operators.vamana import (
        vamana_pack_add_codes,
        vamana_pack_add_pq_codes,
    )

    corpus = spark.read.parquet(corpus_path)
    thr = bq_fit(corpus, "embedding")
    books = pq_fit(
        corpus, "embedding", num_subvectors=20, num_centroids=256,
        metric="cosine", seed=42,
    )
    # "slice" is phase-resume bookkeeping on the base artifact, not part
    # of the vamana_pack layout add_codes emits; cent stays for routing
    packed = spark.read.parquet(ART_PATH).drop("slice")
    dtype = meta.get("pack_dtype", "float64")
    (
        vamana_pack_add_codes(packed, thr, dtype=dtype)
        .write.mode("overwrite")
        .partitionBy("cent")
        .parquet(BQ_ART_PATH)
    )
    (
        vamana_pack_add_pq_codes(packed, books, dtype=dtype)
        .write.mode("overwrite")
        .partitionBy("cent")
        .parquet(PQ_ART_PATH)
    )
    side = {"base_fp": base_fp, "thresholds": thr, "books": books}
    with open(BQ_SIDE_PATH, "wb") as f:
        pickle.dump(side, f)
    return side


if __name__ == "__main__":
    from semadb_spark import get_spark
    from tools.gen_clustered_corpus import generate

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "20g")
    spark = get_spark(
        app_name="build-vamana-10m",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )
    path = generate(spark, ROWS)
    meta = ensure_vamana_10m(spark, path)
    print(json.dumps({k: v for k, v in meta.items() if k != "centroids"}))
