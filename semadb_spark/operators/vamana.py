"""Vamana (DiskANN-family) graph index — built as a Spark batch job.

Reference parity (Go, shard/index/vamana/):
- insert: greedy beam search from the start node collects a visited set;
  robustPrune(alpha) selects <= degreeBound diverse neighbours;
  bi-directional edges added with re-prune past the bound
  (insert.go:16-68, search.go:9-102 greedy, search.go:106-138 robustPrune).
- delete: neighbours of deleted nodes absorb the deleted nodes' own edges
  (one level deep), re-pruned; stranded nodes reconnect to the start node
  (prune.go:12-154, vamana.go:136-263).
- params: searchSize 25-75, degreeBound 32-64, alpha 1.1-1.5
  (models/index.go:275-313).

Spark shape (SURVEY.md §7 M7): query-time graph traversal is pointer
chasing and stays out of Spark; the *build* is the distributed part. This is
the published DiskANN merged-build recipe: overlap-partition the corpus
(each point assigned to its ``replicas`` nearest coarse centroids), build a
local Vamana graph per shard with the reference's exact insert algorithm
(NumPy kernels inside ``applyInPandas``), then union the per-shard edge
lists and cap each node's merged neighbour list. Overlapping membership is
what stitches shards into one navigable graph. The resulting edge DataFrame
is the serving artifact (export to your ANN server); ``beam_search`` over
the collected graph doubles as the in-test serving path — the analogue of
the reference's shardpy bench shim (internal/shardpy/shardpy.go:20-80).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "VamanaIndex",
    "vamana_build",
    "vamana_delete",
    "vamana_update",
    "vamana_serve",
    "vamana_pack",
    "vamana_serve_packed",
    "beam_search",
    "bfs_reachable",
]

# Metrics the graph kernels support (the reference builds/searches with the
# collection's metric, vamana.go:101-109): euclidean, dot, and cosine —
# cosine assumes pre-normalized inputs exactly like the reference
# (distance/distance.go:23-25). Bit metrics go through the quantized store,
# never the graph kernels.
GRAPH_METRICS = ("euclidean", "cosine", "dot")
MAX_UPDATE_BATCH = 100  # httpapi/v2/handlers.go:314 (UpdatePointsRequest)


def _dist_rows(metric: str, X: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Distances from each row of X to the single vector q -> (n,)."""
    from semadb_spark.functions.distances import numpy_distance_matrix

    return numpy_distance_matrix(metric, X, q[None, :])[:, 0]


# ---------------------------------------------------------------------------
# Local (per-shard) kernels — the reference algorithm, NumPy-vectorized


def _greedy_search(
    X: np.ndarray,
    adj: list[list[int]],
    start: int,
    q: np.ndarray,
    search_size: int,
    metric: str = "euclidean",
    seeds: list[int] | None = None,
    result_filter: "set[int] | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy beam search (search.go:9-102). Returns (ids, dists) of the
    visited set sorted by distance — the robustPrune candidate pool.

    Filtered mode (search.go:28-51, 95-97): ``seeds`` (filtered points, up
    to searchSize) are added to the initial beam alongside the entry, and
    the returned set is ``seeds ∪ (visited ∩ result_filter)`` — the
    reference's optimistic filtered search, where only filtered points can
    enter the result but the walk itself explores the full graph."""
    init = [start] + [s for s in (seeds or []) if s != start]
    d0 = _dist_rows(metric, X[init], q)
    dists: dict[int, float] = dict(zip(init, d0.tolist()))
    beam: list[int] = list(init)
    in_beam: set[int] = set(init)
    visited: set[int] = set()
    while True:
        # closest unvisited beam member (searchSet scan, search.go:66-72)
        beam.sort(key=dists.__getitem__)
        if len(beam) > search_size:
            for dropped in beam[search_size:]:
                in_beam.discard(dropped)
            del beam[search_size:]
        nxt = next((i for i in beam if i not in visited), None)
        if nxt is None:
            break
        visited.add(nxt)
        nbrs = [n for n in adj[nxt] if n not in in_beam]
        if nbrs:
            new = [i for i in nbrs if i not in dists]
            if new:
                d = _dist_rows(metric, X[new], q)
                dists.update(zip(new, d.tolist()))
            beam.extend(nbrs)
            in_beam.update(nbrs)
    if result_filter is None:
        vis = sorted(visited, key=dists.__getitem__)
    else:
        res = set(seeds or []) | (visited & result_filter)
        vis = sorted(res, key=dists.__getitem__)
    return np.asarray(vis, dtype=np.int64), np.asarray([dists[i] for i in vis])


def _robust_prune(
    X: np.ndarray,
    node: int,
    cand_ids: np.ndarray,
    cand_dists: np.ndarray,
    degree_bound: int,
    alpha: float,
    metric: str = "euclidean",
) -> list[int]:
    """alpha-RNG pruning, exactly search.go:106-138: walk candidates by
    distance; keep c; drop any later candidate j with
    alpha * d(c, j) < d(node, j) — d is the collection metric, as in the
    reference (robustPrune uses the index distFn)."""
    keep: list[int] = []
    removed = np.zeros(len(cand_ids), dtype=bool)
    for i in range(len(cand_ids)):
        if removed[i] or cand_ids[i] == node:
            continue
        c = int(cand_ids[i])
        keep.append(c)
        if len(keep) >= degree_bound:
            break
        rest = np.arange(i + 1, len(cand_ids))
        rest = rest[~removed[rest]]
        if len(rest):
            d_c = _dist_rows(metric, X[cand_ids[rest]], X[c])
            removed[rest[alpha * d_c < cand_dists[rest]]] = True
    return keep


def _local_build(
    X: np.ndarray,
    degree_bound: int,
    alpha: float,
    search_size: int,
    metric: str = "euclidean",
) -> tuple[list[list[int]], int]:
    """Sequential Vamana construction (insert.go:16-68) over one shard.
    Start node = shard medoid by euclidean proximity to the mean — a purely
    navigational choice (the reference keeps a synthetic start point with
    the same role, vamana.go:93-120); all graph distances use ``metric``."""
    n = len(X)
    start = int(((X - X.mean(axis=0)) ** 2).sum(axis=1).argmin())
    adj: list[list[int]] = [[] for _ in range(n)]
    for a in range(n):
        if a == start:
            continue
        vis_ids, vis_dists = _greedy_search(X, adj, start, X[a], search_size, metric)
        adj[a] = _robust_prune(X, a, vis_ids, vis_dists, degree_bound, alpha, metric)
        # bi-directional edges with re-prune past the degree bound
        # (insert.go:34-66)
        for b in adj[a]:
            if a in adj[b]:
                continue
            if len(adj[b]) + 1 > degree_bound:
                cand = np.asarray(adj[b] + [a], dtype=np.int64)
                d = _dist_rows(metric, X[cand], X[b])
                order = np.argsort(d, kind="stable")
                adj[b] = _robust_prune(
                    X, b, cand[order], d[order], degree_bound, alpha, metric
                )
            else:
                adj[b].append(a)
    return adj, start


# ---------------------------------------------------------------------------
# Distributed build


@dataclass
class VamanaIndex:
    """edges: (src string, dst string, dist double); entry_id: global start.

    When built with ``keep_sharded=True`` the pre-merge per-shard subgraphs
    are retained for distributed serving (:func:`vamana_serve`):
    ``shard_nodes`` (shard, id, v) — the overlap assignment, and
    ``shard_edges`` (shard, src, dst) — each shard's local adjacency.
    ``centroids`` are the build's coarse k-means centers, used to route
    queries to their nearest shards at serve time."""

    edges: DataFrame
    entry_id: str
    degree_bound: int
    alpha: float
    search_size: int
    metric: str = field(default="euclidean")
    shard_nodes: DataFrame | None = field(default=None)
    shard_edges: DataFrame | None = field(default=None)
    centroids: np.ndarray | None = field(default=None)


def vamana_build(
    df: DataFrame,
    vec_col: str,
    id_col: str = "_id",
    degree_bound: int = 64,
    alpha: float = 1.2,
    search_size: int = 75,
    num_shards: int | None = None,
    replicas: int = 2,
    seed: int = 42,
    metric: str = "euclidean",
    keep_sharded: bool = False,
    max_shard_rows: int = 400,
) -> VamanaIndex:
    """DiskANN merged build: overlap-assign -> per-shard Vamana
    (applyInPandas) -> edge union -> per-node merge cap.

    Each shard must fit one worker's memory (tune ``num_shards`` ~
    rows/100k, mirroring the reference's 100k-point shard cap,
    config/singleServer.yaml:41-42); shards build in parallel across the
    cluster, which is the published way DiskANN scales its build.

    ``max_shard_rows`` is the skew-salting cap: any shard past it splits
    into hash-salted sub-builds. Small (400, the default) minimizes build
    wall-clock — the local sequential insert is the expensive part and
    sub-shards parallelize. LARGE serves better: a beam costs
    O(search_size x degree) regardless of shard size, so a query over
    2.5k-row sub-shards runs ~6x fewer beams than over 400-row ones for
    the same routed fraction of the corpus. Build an index intended for
    :func:`vamana_serve`/:func:`vamana_serve_packed` with
    ``max_shard_rows`` in the low thousands.
    """
    from semadb_spark.functions.kmeans import collect_vector_sample, kmeans_np

    if metric not in GRAPH_METRICS:
        raise ValueError(
            f"vamana metric must be one of {GRAPH_METRICS}, got {metric} "
            "(bit metrics serve from the quantized store, not the graph)"
        )
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("v")
    )
    sample = collect_vector_sample(base, "v", seed=seed)
    if num_shards is None:
        # target ~200 rows per shard build (sequential-insert cost grows
        # superlinearly with shard size; more, smaller shards parallelize)
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        num_shards = max(2, min(parallelism, (len(sample) * replicas) // 200 or 2))
    cents = kmeans_np(sample, num_shards, seed=seed)
    c_sq = (cents**2).sum(axis=1)
    # global entry point: sample point nearest the sample mean (the medoid
    # role of the reference start node)
    entry_vec = sample[((sample - sample.mean(axis=0)) ** 2).sum(axis=1).argmin()]

    @F.pandas_udf("array<int>")
    def top_shards(col: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(col), dtype=object)
        mask = col.notna()
        if mask.any():
            Xb = np.stack(col[mask].to_numpy()).astype(np.float64)
            d = (Xb**2).sum(axis=1)[:, None] - 2.0 * (Xb @ cents.T) + c_sq[None, :]
            r = min(replicas, d.shape[1])
            out[np.flatnonzero(mask.to_numpy())] = list(
                np.argsort(d, axis=1)[:, :r].astype(np.int32).tolist()
            )
        return out

    assigned = (
        base.withColumn("shards", top_shards(F.col("v")))
        .select("id", "v", F.explode("shards").alias("shard"))
        # persisted: the skew-count pass below and the build pass would
        # otherwise each run the assignment UDF over the full corpus
        .persist()
    )
    # Skew guard (salting): k-means shards can be very uneven and the local
    # build is sequential, so the biggest shard sets the wall clock. Split
    # any shard past ``max_shard_rows`` into hash-salted sub-builds — the
    # replica overlap still stitches the sub-graphs together.
    counts = {r["shard"]: r["n"] for r in assigned.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    splits = {s: -(-n // max_shard_rows) for s, n in counts.items()}
    split_expr = F.coalesce(
        *[
            F.when(F.col("shard") == s, F.lit(k)) for s, k in splits.items()
        ] or [F.lit(1)],
        F.lit(1),
    )
    assigned = assigned.withColumn(
        "shard",
        F.concat_ws("_", F.col("shard"), F.pmod(F.xxhash64("id"), split_expr)),
    )

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["shard", "src", "dst", "dist"])
        shard = pdf["shard"].iloc[0]
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy()
        adj, _ = _local_build(X, degree_bound, alpha, search_size, metric)
        rows = []
        for a, nbrs in enumerate(adj):
            if nbrs:
                d = _dist_rows(metric, X[nbrs], X[a])
                for b, dd in zip(nbrs, d):
                    rows.append((shard, ids[a], ids[b], float(dd)))
        return pd.DataFrame(rows, columns=["shard", "src", "dst", "dist"])

    # Explicit repartition by shard BEFORE the grouped build: the group
    # shuffle is tiny in bytes but huge in CPU, and AQE would coalesce it to
    # one task (byte-based target). The explicit partition count is
    # non-coalescible and satisfies the groupBy's distribution, so shard
    # builds actually run in parallel.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    raw_edges = (
        assigned.repartition(n_parts, "shard")
        .groupBy("shard")
        .applyInPandas(build_shard, "shard string, src string, dst string, dist double")
    )
    if keep_sharded:
        # Retain the per-shard subgraphs for distributed serving
        # (vamana_serve): one local-build pass feeds both artifacts.
        raw_edges = raw_edges.persist()
    # Merge overlapping shards' lists: distinct edge set, then keep each
    # node's closest ``degree_bound`` (the cheap merge cap from the DiskANN
    # merged-build recipe; in-shard diversity came from robustPrune).
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    edges = (
        raw_edges.groupBy("src", "dst").agg(F.min("dist").alias("dist"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= degree_bound)
        .drop("_rn")
    )
    # The edge table is the index artifact: persist and materialize once so
    # downstream consumers (search, delete-repair, export) don't re-run the
    # build — at full scale you would `.write.parquet()` it instead.
    edges = edges.persist()
    edges.count()
    if not keep_sharded:
        assigned.unpersist()

    # entry id: row nearest the global medoid vector (navigational choice,
    # euclidean regardless of metric — same role as the reference's
    # synthetic start point)
    entry_lit = F.array(*[F.lit(float(x)) for x in entry_vec])
    entry_id = (
        base.withColumn(
            "_d",
            F.aggregate(
                F.zip_with(F.col("v").cast("array<double>"), entry_lit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .orderBy(F.col("_d").asc(), F.col("id").asc())
        .select("id")
        .head()[0]
    )
    return VamanaIndex(
        edges, entry_id, degree_bound, alpha, search_size, metric,
        shard_nodes=assigned if keep_sharded else None,
        shard_edges=raw_edges.select("shard", "src", "dst") if keep_sharded else None,
        centroids=cents if keep_sharded else None,
    )


def vamana_delete(
    index: VamanaIndex, vectors: DataFrame, delete_ids: list[str],
    vec_col: str = "v", id_col: str = "id",
) -> VamanaIndex:
    """Graph repair on delete (prune.go:12-154, removeInboundEdges
    prune.go:85-154) as DataFrame ops:

    1. drop all edges touching the delete set;
    2. nodes that pointed at a deleted node absorb that node's surviving
       out-edges (one level deep — the reference explicitly does not
       recurse), deduped, capped to degreeBound by distance;
    3. stranded nodes (all inbound edges gone) reconnect to the entry node.
    """
    spark = index.edges.sparkSession
    if index.entry_id in delete_ids:
        raise ValueError("cannot delete the entry node; rebuild instead")
    del_df = F.broadcast(
        spark.createDataFrame([(i,) for i in delete_ids], "del_id string")
    )
    e = index.edges
    # surviving edges of deleted nodes: what their in-neighbours will absorb
    del_out = (
        e.join(del_df, e.src == F.col("del_id"))
        .drop("del_id")
        .join(del_df, e.dst == F.col("del_id"), "left_anti")
        .select(F.col("src").alias("mid"), F.col("dst").alias("cand"))
    )
    # A -> B(deleted) => A absorbs B's survivors
    absorbed = (
        e.join(del_df, e.dst == F.col("del_id"))
        .select("src", F.col("dst").alias("mid"))
        .join(del_out, "mid")
        .filter(F.col("src") != F.col("cand"))
        .select("src", F.col("cand").alias("dst"))
    )
    kept = (
        e.join(del_df, e.src == F.col("del_id"), "left_anti")
        .join(del_df, e.dst == F.col("del_id"), "left_anti")
        .select("src", "dst")
    )
    from semadb_spark.functions.distances import distance_expr

    vecs = vectors.select(
        F.col(id_col).cast("string").alias("vid"), F.col(vec_col).alias("vv")
    )
    merged = (
        kept.unionByName(absorbed)
        .distinct()
        .join(vecs.withColumnRenamed("vid", "src").withColumnRenamed("vv", "_sv"), "src")
        .join(vecs.withColumnRenamed("vid", "dst").withColumnRenamed("vv", "_dv"), "dst")
        .withColumn(
            "dist",
            distance_expr(
                index.metric,
                F.col("_sv").cast("array<double>"),
                F.col("_dv").cast("array<double>"),
            ),
        )
        .select("src", "dst", "dist")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    capped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= index.degree_bound)
        .drop("_rn")
    )
    # stranded: alive nodes with no inbound edge -> reconnect from entry
    entry_vec = vecs.filter(F.col("vid") == index.entry_id).head()[1]
    entry_lit = F.array(*[F.lit(float(x)) for x in entry_vec])
    alive = vecs.join(del_df, vecs.vid == F.col("del_id"), "left_anti")
    stranded = (
        alive.join(capped.select(F.col("dst").alias("vid")).distinct(), "vid", "left_anti")
        .filter(F.col("vid") != index.entry_id)
        .select(
            F.lit(index.entry_id).alias("src"),
            F.col("vid").alias("dst"),
            distance_expr(
                index.metric, entry_lit, F.col("vv").cast("array<double>")
            ).alias("dist"),
        )
    )
    return VamanaIndex(
        capped.unionByName(stranded),
        index.entry_id,
        index.degree_bound,
        index.alpha,
        index.search_size,
        index.metric,
    )


def vamana_update(
    index: VamanaIndex,
    vectors: DataFrame,
    updated_ids: list[str],
    vec_col: str = "v",
    id_col: str = "id",
) -> VamanaIndex:
    """W8: UpdatePoints re-inserts updated vectors (the reference routes an
    update through delete-repair + re-insert, vamana.go:136-263 with
    insert.go:16-68). ``vectors`` must already hold the NEW values for
    ``updated_ids``; ids absent from ``vectors`` are no-ops (missing points
    are silently skipped, shard/shard.go:252-256). Spark shape:

    1. graph repair as if the updated nodes were deleted (:func:`vamana_delete`);
    2. re-insert: each updated point's candidate pool is its exact top
       ``search_size`` alive neighbours from one bounded distributed scan —
       the distributed analogue (and a recall superset) of the reference's
       greedy search — then robust-pruned per point driver-side (pools are
       tiny: batch x searchSize);
    3. bidirectional edges unioned in; every touched adjacency list re-capped
       to degreeBound by distance (the merged-build cap).

    Updating the entry node in place is refused (same policy as delete);
    rebuild instead. For update fractions beyond a few percent, a rebuild is
    both cheaper and better — the same tradeoff the reference's maintenance
    path acknowledges.
    """
    from pyspark.sql import Window

    from semadb_spark.operators.knn import knn_topk_scan

    spark = index.edges.sparkSession
    if len(updated_ids) > MAX_UPDATE_BATCH:
        # the driver-side prune pools scale with the batch; the reference
        # bounds update requests at 100 points (httpapi/v2/handlers.go:314)
        # and beyond a few percent of the corpus a rebuild wins anyway
        raise ValueError(
            f"vamana_update batch too large: {len(updated_ids)} ids, max "
            f"{MAX_UPDATE_BATCH} (rebuild the index for bulk updates)"
        )
    if index.entry_id in updated_ids:
        raise ValueError("cannot update the entry node in place; rebuild instead")
    vecs = vectors.select(
        F.col(id_col).cast("string").alias("vid"), F.col(vec_col).alias("vv")
    )
    upd_df = spark.createDataFrame([(i,) for i in updated_ids], "vid string")
    upd_rows = vecs.join(F.broadcast(upd_df), "vid", "left_semi").collect()
    if not upd_rows:
        return index
    present_ids = [r["vid"] for r in upd_rows]
    repaired = vamana_delete(index, vectors, present_ids, vec_col=vec_col, id_col=id_col)

    qlist = [(r["vid"], [float(x) for x in r["vv"]]) for r in upd_rows]
    alive = (
        vecs.join(F.broadcast(upd_df), "vid", "left_anti")
        .select(F.col("vid").alias("id"), F.col("vv").alias("v"))
    )
    cand = knn_topk_scan(alive, "v", qlist, index.metric, index.search_size, id_col="id")
    cand_rows = (
        cand.join(vecs.withColumnRenamed("vid", "id"), "id")
        .select("query_id", "id", "_distance", "vv")
        .collect()
    )
    by_q: dict[str, list] = {}
    for r in cand_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    new_edges: list[tuple[str, str, float]] = []
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: (r["_distance"], r["id"]))
        Xl = np.stack([np.asarray(r["vv"], dtype=np.float64) for r in rows])
        dists = np.asarray([r["_distance"] for r in rows], dtype=np.float64)
        keep = _robust_prune(
            Xl, -1, np.arange(len(rows)), dists,
            index.degree_bound, index.alpha, index.metric,
        )
        for j in keep:
            nid, dd = rows[j]["id"], float(rows[j]["_distance"])
            new_edges.append((qid, nid, dd))
            new_edges.append((nid, qid, dd))  # bidirectional (insert.go:34-66)
    ne_df = spark.createDataFrame(new_edges, "src string, dst string, dist double")
    merged = (
        repaired.edges.unionByName(ne_df)
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
    )
    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    capped = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= index.degree_bound)
        .drop("_rn")
    )
    # A point updated far from its old neighbourhood can lose every inbound
    # edge to the degree cap; reconnect such orphans from the entry node —
    # the same repair the reference applies to stranded nodes
    # (prune.go:12-154). The entry list may transiently exceed the bound,
    # exactly as with delete-repair; the next rebuild re-prunes it.
    inbound = {
        r["dst"]
        for r in capped.filter(F.col("dst").isin(present_ids))
        .select("dst").distinct().collect()
    }
    stranded = [i for i in present_ids if i not in inbound]
    if stranded:
        from semadb_spark.functions.distances import python_distance

        entry_vec = np.asarray(
            vecs.filter(F.col("vid") == index.entry_id).head()["vv"], dtype=np.float64
        )
        qvecs = {qid: np.asarray(v, dtype=np.float64) for qid, v in qlist}
        rescue = spark.createDataFrame(
            [
                (index.entry_id, i, python_distance(index.metric, entry_vec, qvecs[i]))
                for i in stranded
            ],
            "src string, dst string, dist double",
        )
        capped = capped.unionByName(rescue)
    return VamanaIndex(
        capped, index.entry_id, index.degree_bound, index.alpha,
        index.search_size, index.metric,
    )


# ---------------------------------------------------------------------------
# Distributed serving over the persisted per-shard subgraphs


def vamana_serve(
    shard_nodes: DataFrame,
    shard_edges: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int,
    metric: str = "euclidean",
    search_size: int = 75,
    centroids: np.ndarray | None = None,
    nprobe: int | None = None,
    candidate_ids: DataFrame | None = None,
) -> DataFrame:
    """Distributed Vamana serving: partition-local beam search over the
    persisted per-shard subgraphs, merged to a global top-k.

    This is the Spark-native analogue of the reference's own serving model —
    the cluster fans a search out to every shard's local Vamana graph and
    merges the per-shard results (cluster/actions.go SearchPoints;
    shard-local search shard/shard.go:331-395). Here a shard is a cogrouped
    partition: ``shard_nodes`` (shard, id, v) carries the overlap
    assignment, ``shard_edges`` (shard, src, dst) the local adjacency. Each
    task rebuilds its shard's in-memory graph and runs the reference greedy
    beam search (search.go:9-102) for its routed queries; nothing — neither
    edges nor vectors — is ever collected to the driver, and the final
    global cut is a groupBy/window over q×k×shards rows.

    ``nprobe`` + ``centroids`` route each query to its nearest build
    centroids only (DiskANN memory-index routing); shard partition values
    are ``<centroid>_<salt>``, so routing prunes whole partitions of the
    parquet artifact. Default: search every shard (exhaustive over the
    overlap cover).

    ``candidate_ids`` (one id column) enables the reference's filtered
    seeded-beam mode (search.go:28-51): each shard seeds its beam with up
    to ``search_size`` of its filtered points (id ascending — the roaring
    iterator order) plus the shard entry, walks the FULL graph, and only
    filtered points enter the result set. Recall is optimistic exactly as
    documented (docs/content/docs/search/filtered.md:49-51). The flag joins
    into the node table before the cogroup, so the filter never needs to be
    collected or broadcast whole.
    """
    from pyspark.sql import Window

    if not queries:
        raise ValueError("queries must be non-empty")
    qvecs = [(str(qid), np.asarray(v, dtype=np.float64)) for qid, v in queries]

    filtered_mode = candidate_ids is not None
    if filtered_mode:
        flt = candidate_ids.select(
            F.col(candidate_ids.columns[0]).cast("string").alias("id")
        ).distinct().withColumn("_flt", F.lit(True))
        shard_nodes = (
            shard_nodes.withColumn("id", F.col("id").cast("string"))
            .join(flt, "id", "left")
            .withColumn("_flt", F.coalesce(F.col("_flt"), F.lit(False)))
        )

    routed: dict[int, list[int]] | None = None
    if nprobe is not None and centroids is not None and nprobe < len(centroids):
        Q = np.stack([v for _, v in qvecs])
        d = (Q**2).sum(axis=1)[:, None] - 2.0 * (Q @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        near = np.argsort(d, axis=1)[:, :nprobe]
        routed = {}
        for qi, cents_for_q in enumerate(near):
            for c in cents_for_q:
                routed.setdefault(int(c), []).append(qi)
        allowed = sorted(routed)
        # deterministic predicate on the partition column -> partition pruning
        pref = F.split(F.col("shard"), "_").getItem(0).cast("int")
        shard_nodes = shard_nodes.filter(pref.isin(allowed))
        shard_edges = shard_edges.filter(pref.isin(allowed))

    def serve(key, nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=["query_id", "_id", "_distance"])
        if len(nodes_pdf) < 1:
            return empty
        shard = str(key[0])
        if routed is None:
            q_idx = range(len(qvecs))
        else:
            q_idx = routed.get(int(shard.split("_")[0]), [])
            if not q_idx:
                return empty
        ids = nodes_pdf["id"].to_numpy()
        loc = {i: j for j, i in enumerate(ids)}
        X = np.stack(nodes_pdf["v"].to_numpy()).astype(np.float64)
        adj: list[list[int]] = [[] for _ in range(len(ids))]
        for s, t in zip(edges_pdf["src"].to_numpy(), edges_pdf["dst"].to_numpy()):
            js, jt = loc.get(s), loc.get(t)
            if js is not None and jt is not None:
                adj[js].append(jt)
        # shard entry: medoid, the same navigational choice _local_build made
        start = int(((X - X.mean(axis=0)) ** 2).sum(axis=1).argmin())
        seeds: list[int] | None = None
        result_filter: set[int] | None = None
        if filtered_mode:
            flt_pos = np.flatnonzero(nodes_pdf["_flt"].to_numpy())
            if not len(flt_pos):
                return empty  # no filtered point lives in this shard
            result_filter = set(int(j) for j in flt_pos)
            # seed order: filtered ids ascending, capped at search_size
            # (the reference's roaring-iterator seeding, search.go:40-44)
            order = np.argsort(ids[flt_pos].astype(str), kind="stable")
            seeds = [int(j) for j in flt_pos[order][:search_size]]
        rows = []
        for qi in q_idx:
            qid, qv = qvecs[qi]
            vis_ids, vis_dists = _greedy_search(
                X, adj, start, qv, search_size, metric,
                seeds=seeds, result_filter=result_filter,
            )
            for j, dd in zip(vis_ids[:k], vis_dists[:k]):
                rows.append((qid, ids[int(j)], float(dd)))
        return pd.DataFrame(rows, columns=["query_id", "_id", "_distance"])

    per_shard = (
        shard_nodes.groupBy("shard")
        .cogroup(shard_edges.groupBy("shard"))
        .applyInPandas(serve, "query_id string, _id string, _distance double")
    )
    # overlap replicas surface the same id from several shards: dedup, then
    # the global cut (rounded-distance order with id tiebreak, FIXTURES rule)
    w = Window.partitionBy("query_id").orderBy(
        F.round("_distance", 4).asc(), F.col("_id").asc()
    )
    return (
        per_shard.groupBy("query_id", "_id")
        .agg(F.min("_distance").alias("_distance"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def vamana_pack(
    shard_nodes: DataFrame, shard_edges: DataFrame, dtype: str = "float64"
) -> DataFrame:
    """Pack each shard's subgraph into ONE row of binary blobs — the
    serving-artifact layout (shard, cent, n, ids, vecs, indptr, indices,
    start).

    Why: :func:`vamana_serve` cogroups the (shard, id, v) node table with
    the (shard, src, dst) edge table per pass — at 1M vectors that is a
    ~60M-row shuffle and a Python dict-build per task before a single beam
    runs. Packing runs that cogroup ONCE at build time and stores per shard
    a row-major vector matrix, a CSR adjacency (indptr/indices int32), the
    id list, and the precomputed medoid start. Serving becomes a shuffle-
    free scan of one row per shard: ``np.frombuffer`` decode, then beams.
    This is the Spark table analogue of DiskANN's on-disk index layout
    (vectors + adjacency in one blob per node block); the reference's
    shard cache plays the same role (cache/manager.go decodes a shard once
    and serves many requests from it).

    ``cent`` (the coarse-centroid prefix of the shard key) is split out as
    a column so the artifact can be written ``partitionBy("cent")`` and
    query routing prunes whole directories.

    ``dtype="float64"`` keeps distances bit-identical to
    :func:`vamana_serve` (parity-tested); pass ``"float32"`` to halve the
    artifact size when serving precision is acceptable.
    """
    np_dtype = np.dtype(dtype)

    def pack(key, nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(nodes_pdf) < 1:
            return pd.DataFrame(
                columns=["shard", "cent", "n", "ids", "vecs", "indptr", "indices", "start"]
            )
        shard = str(key[0])
        ids = nodes_pdf["id"].to_numpy()
        X = np.stack(nodes_pdf["v"].to_numpy()).astype(np_dtype)
        loc = {i: j for j, i in enumerate(ids)}
        n = len(ids)
        heads: list[list[int]] = [[] for _ in range(n)]
        for s, t in zip(edges_pdf["src"].to_numpy(), edges_pdf["dst"].to_numpy()):
            js, jt = loc.get(s), loc.get(t)
            if js is not None and jt is not None:
                heads[js].append(jt)
        counts = np.asarray([len(h) for h in heads], dtype=np.int32)
        indptr = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=indptr[1:])
        indices = (
            np.concatenate([np.asarray(h, dtype=np.int32) for h in heads if h])
            if indptr[-1]
            else np.empty(0, dtype=np.int32)
        )
        # same medoid-start formula vamana_serve computes per pass
        start = int(((X - X.mean(axis=0)) ** 2).sum(axis=1).argmin())
        return pd.DataFrame(
            {
                "shard": [shard],
                "cent": [int(shard.split("_")[0])],
                "n": [n],
                "ids": [ids.astype(str).tolist()],
                "vecs": [np.ascontiguousarray(X).tobytes()],
                "indptr": [indptr.tobytes()],
                "indices": [indices.tobytes()],
                "start": [start],
            }
        )

    return (
        shard_nodes.groupBy("shard")
        .cogroup(shard_edges.groupBy("shard"))
        .applyInPandas(
            pack,
            "shard string, cent int, n int, ids array<string>, vecs binary, "
            "indptr binary, indices binary, start int",
        )
    )


def vamana_serve_packed(
    packed: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int,
    metric: str = "euclidean",
    search_size: int = 75,
    centroids: np.ndarray | None = None,
    nprobe: int | None = None,
    dtype: str = "float64",
) -> DataFrame:
    """Distributed Vamana serving over the :func:`vamana_pack` artifact.

    Identical semantics to :func:`vamana_serve` (same greedy beam, same
    rounded-distance global merge — parity-tested), but each task decodes
    its shards from binary blobs instead of cogrouping two row tables:
    zero shuffle before the final q x k x shards merge, and with the
    artifact written ``partitionBy("cent")`` the routing predicate prunes
    whole directories before any byte is read. ``dtype`` must match the
    pack-time dtype."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("queries must be non-empty")
    qvecs = [(str(qid), np.asarray(v, dtype=np.float64)) for qid, v in queries]
    np_dtype = np.dtype(dtype)

    routed: dict[int, list[int]] | None = None
    if nprobe is not None and centroids is not None and nprobe < len(centroids):
        Q = np.stack([v for _, v in qvecs])
        d = (
            (Q**2).sum(axis=1)[:, None]
            - 2.0 * (Q @ centroids.T)
            + (centroids**2).sum(axis=1)[None, :]
        )
        near = np.argsort(d, axis=1)[:, :nprobe]
        routed = {}
        for qi, cents_for_q in enumerate(near):
            for c in cents_for_q:
                routed.setdefault(int(c), []).append(qi)
        packed = packed.filter(F.col("cent").isin(sorted(routed)))

    def serve(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if routed is None:
                    q_idx = list(range(len(qvecs)))
                else:
                    q_idx = routed.get(int(row["cent"]), [])
                    if not q_idx:
                        continue
                n = int(row["n"])
                X = np.frombuffer(row["vecs"], dtype=np_dtype).reshape(n, -1)
                # one float64 view/copy per shard row, not per query
                Xd = X.astype(np.float64, copy=False)
                indptr = np.frombuffer(row["indptr"], dtype=np.int32)
                indices = np.frombuffer(row["indices"], dtype=np.int32)
                adj = np.split(indices, indptr[1:-1])
                ids = np.asarray(row["ids"], dtype=object)
                start = int(row["start"])
                for qi in q_idx:
                    qid, qv = qvecs[qi]
                    vis_ids, vis_dists = _greedy_search(
                        Xd, adj, start, qv,
                        search_size, metric,
                    )
                    for j, dd in zip(vis_ids[:k], vis_dists[:k]):
                        rows.append((qid, ids[int(j)], float(dd)))
            if rows:
                yield pd.DataFrame(rows, columns=["query_id", "_id", "_distance"])

    per_shard = packed.mapInPandas(
        serve, "query_id string, _id string, _distance double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("_distance", 4).asc(), F.col("_id").asc()
    )
    return (
        per_shard.groupBy("query_id", "_id")
        .agg(F.min("_distance").alias("_distance"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Serving / validation helpers (driver-side, over the exported graph)


def beam_search(
    adj: dict[str, list[str]],
    vectors: dict[str, np.ndarray],
    entry_id: str,
    q: np.ndarray,
    k: int,
    search_size: int,
    metric: str = "euclidean",
) -> list[tuple[str, float]]:
    """Greedy beam search over the exported graph — the serving path the
    edge table feeds (mirrors search.go:9-102 on the client side)."""
    from semadb_spark.functions.distances import python_distance

    def d(i: str) -> float:
        return python_distance(metric, vectors[i], q)

    dists = {entry_id: d(entry_id)}
    beam = [entry_id]
    visited: set[str] = set()
    while True:
        beam.sort(key=lambda i: dists[i])
        beam = beam[:search_size]
        nxt = next((i for i in beam if i not in visited), None)
        if nxt is None:
            break
        visited.add(nxt)
        for n in adj.get(nxt, []):
            if n not in dists:
                dists[n] = d(n)
            if n not in visited and n not in beam:
                beam.append(n)
    ranked = sorted(visited, key=lambda i: (dists[i], i))[:k]
    return [(i, dists[i]) for i in ranked]


def bfs_reachable(adj: dict[str, list[str]], entry_id: str) -> set[str]:
    """Connectivity check from the entry node (the reference's
    checkConnectivity test invariant, vamana_test.go:29-46)."""
    seen = {entry_id}
    frontier = [entry_id]
    while frontier:
        nxt = []
        for u in frontier:
            for vtx in adj.get(u, []):
                if vtx not in seen:
                    seen.add(vtx)
                    nxt.append(vtx)
        frontier = nxt
    return seen
