"""Approximate nearest-neighbour search — the 100 TB scale path.

The reference serves ANN with a Vamana/DiskANN graph
(shard/index/vamana/*, ~1000 LoC of per-query pointer chasing) — an
architecture that fights Spark's execution model (SURVEY.md §7 "Exact before
approximate"). The Spark-first substitutes, same contract (recall/QPS tradeoff
against the exact scan):

- **IVF** (inverted file index): batch KMeans (pyspark.ml) learns ``nlist``
  centroids; vectors are assigned to their nearest centroid partition. A
  query probes the ``nprobe`` nearest centroids and exact-reranks only those
  partitions — at scale the table is *stored partitioned by centroid id*, so
  probing is partition pruning (reads ~nprobe/nlist of the data).
- **Random-projection LSH**: ``tables`` independent sets of ``bits``
  hyperplanes; sign patterns form bucket keys. Candidates = union over
  tables of same-bucket rows, exact-reranked. Equivalent to Spark ML's
  BucketedRandomProjectionLSH but with NumPy-batched signature computation
  and direct control of the candidate join.

Both build steps are Spark batch jobs (the north-star sweet spot); both
serve query *batches* (single query = batch of 1).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from semadb_spark.functions.distances import numpy_distance_matrix

# -- IVF ----------------------------------------------------------------------


class IVFIndex:
    """Inverted-file index: centroids + centroid-assigned vectors."""

    def __init__(self, centroids: np.ndarray, assigned: DataFrame, vec_col: str, id_col: str):
        self.centroids = centroids  # (nlist, dim) driver-side, broadcast into kernels
        self.assigned = assigned  # original columns + centroid_id
        self.vec_col = vec_col
        self.id_col = id_col


def _assign_encode_scan(
    base: DataFrame,
    vec_col: str,
    id_col: str,
    cents: np.ndarray,
    encode_fn,
    code_col: str,
    value_dtype,
    keep_vectors: bool,
) -> DataFrame:
    """ONE ``mapInArrow`` pass over the corpus producing
    ``(centroid_id, id, code[, vec])`` — nearest-centroid assignment AND
    quantizer encoding fused into a single kernel. The chained
    ``encode(assign(df))`` form pays two JVM<->Python Arrow round-trips of
    the full float column; fusing them halves the build's Python traffic
    (the dominant cost of the quantized index builds at 1M x 100d).
    ``encode_fn``: ``(n, d) float64 -> (n, w)`` codes."""
    import pyarrow as pa

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    cents = np.asarray(cents, dtype=np.float64)
    c_sq = (cents**2).sum(axis=1)
    spark_value = LongType() if value_dtype == np.int64 else IntegerType()
    vec_field = [f for f in base.schema.fields if f.name == vec_col]
    out_fields = [
        StructField("centroid_id", IntegerType()),
        StructField(id_col, StringType()),
        StructField(code_col, ArrayType(spark_value)),
    ] + (vec_field if keep_vectors else [])
    src = base.select(F.col(id_col).cast("string").alias(id_col), F.col(vec_col))

    def kernel(batches):
        from semadb_spark.functions.distances import arrow_list_matrix

        pa_value = pa.int64() if value_dtype == np.int64 else pa.int32()
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(0)
            col = batch.column(1)
            X = arrow_list_matrix(col, dtype=np.float64)
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ cents.T) + c_sq[None, :]
            cid = pa.array(d.argmin(axis=1).astype(np.int32))
            codes = encode_fn(X)
            w = codes.shape[1]
            codes_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * w),
                pa.array(codes.ravel().astype(value_dtype, copy=False), type=pa_value),
            )
            arrays = [cid, ids, codes_arr] + ([col] if keep_vectors else [])
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in out_fields]
            )

    return src.mapInArrow(kernel, StructType(out_fields))


def ivf_build(
    df: DataFrame,
    vec_col: str,
    id_col: str = "_id",
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 25,
    sample_cap: int | None = None,
) -> IVFIndex:
    """Fit coarse centroids on a bounded sample (driver-side vectorized
    Lloyd — see functions/kmeans.py for why this beats a distributed fit for
    index builds), then assign every vector distributed.

    At scale, persist ``index.assigned`` with
    ``.write.partitionBy("centroid_id")`` so a probe prunes file groups.
    """
    from semadb_spark.functions.kmeans import (
        DEFAULT_SAMPLE_CAP,
        assign_centroids,
        collect_vector_sample,
        kmeans_np,
    )

    sample = collect_vector_sample(
        df, vec_col, cap=sample_cap or DEFAULT_SAMPLE_CAP, seed=seed
    )
    centroids = kmeans_np(sample, nlist, seed=seed, max_iter=max_iter)
    assigned = assign_centroids(
        df.filter(F.col(vec_col).isNotNull()), vec_col, centroids
    )
    # Centroid-contiguous layout (shuffle-free): each Arrow batch the search
    # kernel sees then holds one-or-few centroids, so it emits
    # O(queries_probing x k) rows per batch instead of per (batch x every
    # centroid present) — the same locality partitionBy("centroid_id") gives
    # the persisted form at full scale.
    assigned = assigned.sortWithinPartitions("centroid_id")
    return IVFIndex(centroids, assigned, vec_col, id_col)


def ivf_search(
    index: IVFIndex,
    queries: Sequence[tuple],
    metric: str,
    k: int,
    nprobe: int = 4,
    candidate_ids: DataFrame | None = None,
    compute_dtype: str = "float64",
) -> DataFrame:
    """Batch ANN search: probe ``nprobe`` centroid partitions per query, exact
    rerank within them. -> (query_id, id, _distance, _rank).

    ``candidate_ids`` (one id column) restricts the rerank to a pre-filter
    set — the reference's filtered-ANN mode, where only filtered ids enter
    the result set and recall is optimistic
    (docs/content/docs/search/filtered.md:49-51): a match outside the probed
    cells is missed, exactly as a match outside the beam is missed there.
    The probe still prunes partitions first, so the semi-join touches
    ~nprobe/nlist of the index, never the table.

    Kernel shape (the serving hot path): ``mapInArrow`` reshapes each Arrow
    batch's list column into one contiguous ``(n, d)`` matrix (zero-copy —
    no per-row objects), runs one GEMM per (centroid, probing-queries)
    group, and accumulates candidates across the whole task so only the
    per-TASK top-k per query reaches the global merge —
    ``O(tasks x q x k)`` shuffle rows however large the index is.
    ``compute_dtype="float32"`` halves kernel memory traffic (serving mode;
    recall is measured at the served precision). Oracle-gated paths keep the
    float64 default so distances are bit-identical to the SQL oracle."""
    queries = list(queries)
    if not queries:
        raise ValueError("ivf_search requires at least one query")
    qids = [str(q[0]) for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    # centroid shortlist per query (driver-side: nlist x q tiny matrix)
    cdist = numpy_distance_matrix(metric, index.centroids, qmat)  # (nlist, q)
    probe_sets = [
        frozenset(int(c) for c in np.argsort(cdist[:, j])[:nprobe]) for j in range(len(qids))
    ]
    all_probed = sorted(set().union(*probe_sets))
    # invert: centroid -> indices of the queries probing it, so the kernel
    # computes each centroid's rows against exactly its probing queries
    # (computing the full (rows x all-queries) matrix and masking wastes a
    # (1 - nprobe/nlist) fraction of the FLOPs — at nprobe 8 / nlist 128
    # that is 94% of the work)
    probing_queries: dict[int, np.ndarray] = {
        c: np.asarray([j for j, ps in enumerate(probe_sets) if c in ps], dtype=np.int64)
        for c in all_probed
    }
    # ONE pruned scan, no join: the isin filter prunes centroid partitions
    # when the index table is stored partitionBy("centroid_id"); per-query
    # probe membership is a mask inside the kernel (the query batch rides in
    # the closure). Each Arrow batch emits only its local top-k per query, so
    # the final merge sees O(batches x q x k) rows however big the table is.
    candidates = index.assigned.filter(F.col("centroid_id").isin(all_probed))
    id_col, vec_col = index.id_col, index.vec_col
    if candidate_ids is not None:
        flt = candidate_ids.select(
            F.col(candidate_ids.columns[0]).cast("string").alias(id_col)
        )
        candidates = candidates.withColumn(
            id_col, F.col(id_col).cast("string")
        ).join(flt, id_col, "left_semi")
    out_schema = f"query_id string, {id_col} string, _distance double"
    dtype = np.float32 if compute_dtype == "float32" else np.float64
    qmat_t = qmat.astype(dtype)
    q_sq = (qmat_t * qmat_t).sum(axis=1)
    qid_arr = np.asarray(qids, dtype=object)

    def rerank(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import (
            arrow_list_matrix,
            id_order_ranks,
            topk_per_group,
        )

        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cids = batch.column(0).to_numpy(zero_copy_only=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            vecs = arrow_list_matrix(batch.column(2), dtype=dtype)
            if metric == "euclidean":
                x_sq = (vecs * vecs).sum(axis=1)
            # per-centroid dense compute: rows of centroid c meet only the
            # queries probing c (computing rows x ALL queries and masking
            # would waste a (1 - nprobe/nlist) fraction of the FLOPs)
            order = np.argsort(cids, kind="stable")
            cs = cids[order]
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            bounds = np.r_[starts, n]
            for gi in range(len(starts)):
                rows = order[bounds[gi] : bounds[gi + 1]]
                qidx = probing_queries.get(int(cs[bounds[gi]]))
                if qidx is None or not len(qidx):
                    continue
                v = vecs[rows]
                prod = v @ qmat_t[qidx].T  # (n_c, q_c) — the one GEMM
                if metric == "euclidean":
                    dists = x_sq[rows][:, None] - 2.0 * prod + q_sq[qidx][None, :]
                elif metric == "dot":
                    dists = -prod
                elif metric == "cosine":
                    dists = 1.0 - prod
                else:  # rare metrics: shared float64 kernel
                    dists = numpy_distance_matrix(metric, v, qmat[qidx])
                take = min(k, len(rows))
                # exact (distance, id) top-k per group: gather the kth-
                # distance tie class, resolve it numerically (see
                # knn_topk_scan)
                kth = np.partition(dists, take - 1, axis=0)[take - 1]  # (q_c,)
                sel_rows, sel_cols = np.nonzero(dists <= kth[None, :])
                keep = topk_per_group(
                    sel_cols,
                    dists[sel_rows, sel_cols],
                    ranks[rows[sel_rows]],
                    take,
                )
                sel_rows, sel_cols = sel_rows[keep], sel_cols[keep]
                acc_q.append(qidx[sel_cols])
                acc_id.append(ids[rows[sel_rows]])
                acc_d.append(dists[sel_rows, sel_cols].astype(np.float64))
        if not acc_q:
            return
        # per-task trim: only this task's top-k per query survives to the
        # global merge (P5 per-shard trim)
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id).astype(object)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv, k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qid_arr[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=pa.string()),
                pa.array(dv[keep], type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    cand_local_topk = candidates.select(
        "centroid_id", F.col(id_col).cast("string").alias(id_col), vec_col
    ).mapInArrow(rerank, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("_distance").asc(), F.col(id_col).asc())
    return cand_local_topk.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


# -- IVF-PQ -------------------------------------------------------------------


class IVFPQIndex:
    """Coarse IVF centroids + PQ codes per row: the serving scan reads
    ``m`` bytes per row inside only the probed centroid partitions."""

    def __init__(self, centroids: np.ndarray, books, coded: DataFrame, floats: DataFrame, vec_col: str, id_col: str):
        self.centroids = centroids
        self.books = books  # PQCodebooks
        self.coded = coded  # (centroid_id, id_col, pq_code)
        self.floats = floats  # original frame (id_col, vec_col) for rerank
        self.vec_col = vec_col
        self.id_col = id_col


def ivfpq_build(
    df: DataFrame,
    vec_col: str,
    id_col: str = "_id",
    nlist: int = 128,
    num_subvectors: int = 8,
    num_centroids: int = 256,
    metric: str = "euclidean",
    seed: int = 42,
    sample_cap: int | None = None,
    keep_vectors: bool = True,
) -> IVFPQIndex:
    """Coarse quantizer (IVF) + product codes in one pass: one bounded
    sample feeds both k-means fits; assignment and encoding run distributed
    over a single scan. At scale persist ``index.coded`` with
    ``partitionBy("centroid_id")`` — a probe then prunes file groups AND
    each pruned row costs ``m`` bytes, not ``4 * dim`` (the Faiss IVFPQ
    layout, re-expressed as partitioned parquet).

    ``keep_vectors`` stores the float vector next to its code (DiskANN
    layout) so serving ADC-prefilters and exact-reranks in ONE pass —
    see the fused IVF-BQ twin. Pass False for a codes-only index."""
    from semadb_spark.functions.kmeans import (
        DEFAULT_SAMPLE_CAP,
        collect_vector_sample,
        kmeans_np,
    )
    from semadb_spark.operators.quantize import _sub_distances, pq_fit

    sample = collect_vector_sample(
        df, vec_col, cap=sample_cap or DEFAULT_SAMPLE_CAP, seed=seed
    )
    centroids = kmeans_np(sample, nlist, seed=seed)
    books = pq_fit(
        df,
        vec_col,
        num_subvectors=num_subvectors,
        num_centroids=num_centroids,
        metric=metric,
        seed=seed,
        sample_cap=sample_cap,
        sample=sample,  # one bounded collect feeds both fits
    )
    m, _, sublen = books.centroids.shape

    def pq_codes(X: np.ndarray) -> np.ndarray:
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for i in range(m):
            sub = X[:, i * sublen : (i + 1) * sublen]
            codes[:, i] = _sub_distances(books, sub, i).argmin(axis=1)
        return codes

    base = df.filter(F.col(vec_col).isNotNull())
    coded = _assign_encode_scan(
        base, vec_col, id_col, centroids, pq_codes, "pq_code", np.int32, keep_vectors,
    ).sortWithinPartitions("centroid_id")
    return IVFPQIndex(centroids, books, coded, base, vec_col, id_col)


def ivfpq_search(
    index: IVFPQIndex,
    queries: Sequence[tuple],
    metric: str,
    k: int,
    nprobe: int = 8,
    oversample: int = 10,
    candidate_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF-PQ serving: probe ``nprobe`` cells per query, ADC-score
    only those cells' codes, exact-rerank — fused in-batch when the index
    keeps vectors (one pruned pass, no rerank join; same recipe as the
    fused IVF-BQ kernel), else via a bounded broadcast-pool join.

    The scan cost per query is ``nprobe/nlist`` of the corpus at ``m``
    bytes per row. ``oversample=0`` serves raw ADC distances with no
    float traffic at all. ``candidate_ids`` restricts the scan to a
    pre-filter id set (optimistic filtered-ANN semantics, as IVF/IVF-BQ)."""
    from semadb_spark.operators.quantize import pq_adc_table

    queries = list(queries)
    if not queries:
        raise ValueError("ivfpq_search requires at least one query")
    qids = [str(q[0]) for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    cdist = numpy_distance_matrix(metric, index.centroids, qmat)  # (nlist, q)
    probe_sets = [
        frozenset(int(c) for c in np.argsort(cdist[:, j])[:nprobe])
        for j in range(len(qids))
    ]
    all_probed = sorted(set().union(*probe_sets))
    probing_queries: dict[int, np.ndarray] = {
        c: np.asarray([j for j, ps in enumerate(probe_sets) if c in ps], dtype=np.int64)
        for c in all_probed
    }
    books = index.books
    tables = np.stack([pq_adc_table(books, q[1]) for q in queries]).astype(
        np.float32
    )  # (q, m, kc)
    m = books.num_subvectors
    take_n = max(k * oversample, k)
    id_col = index.id_col
    qid_arr = np.asarray(qids, dtype=object)
    out_schema = f"query_id string, {id_col} string, _distance double"

    coded = index.coded
    if candidate_ids is not None:
        flt = candidate_ids.select(
            F.col(candidate_ids.columns[0]).cast("string").alias(id_col)
        )
        coded = coded.withColumn(id_col, F.col(id_col).cast("string")).join(
            flt, id_col, "left_semi"
        )

    if oversample and index.vec_col in index.coded.columns:
        return _ivfpq_search_fused(
            index, coded, qmat, tables, probing_queries, all_probed, metric,
            k, take_n, m, qid_arr, out_schema,
        )

    def adc_scan(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import (
            arrow_list_matrix,
            id_order_ranks,
            topk_per_group,
        )

        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cids = batch.column(0).to_numpy(zero_copy_only=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            codes = arrow_list_matrix(batch.column(2)).astype(np.int64, copy=False)
            order = np.argsort(cids, kind="stable")
            cs = cids[order]
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            bounds = np.r_[starts, n]
            for gi in range(len(starts)):
                rows = order[bounds[gi] : bounds[gi + 1]]
                qidx = probing_queries.get(int(cs[bounds[gi]]))
                if qidx is None or not len(qidx):
                    continue
                sub = tables[qidx]  # (q_c, m, kc)
                grp_codes = codes[rows]
                dists = np.zeros((len(qidx), len(rows)), dtype=np.float32)
                for i in range(m):
                    dists += sub[:, i, grp_codes[:, i]]
                take = min(take_n, len(rows))
                # exact (distance, id) cut of the kth-distance tie class
                # (see knn_topk_scan)
                kth = np.partition(dists, take - 1, axis=1)[:, take - 1]  # (q_c,)
                sel_q, sel_cols = np.nonzero(dists <= kth[:, None])
                keep = topk_per_group(
                    sel_q,
                    dists[sel_q, sel_cols],
                    ranks[rows[sel_cols]],
                    take,
                )
                sel_q, sel_cols = sel_q[keep], sel_cols[keep]
                acc_q.append(qidx[sel_q])
                acc_id.append(ids[rows[sel_cols]])
                acc_d.append(dists[sel_q, sel_cols].astype(np.float64))
        if not acc_q:
            return
        # per-task trim to the oversampled take_n per query before shuffle
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id).astype(object)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv, take_n)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qid_arr[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=pa.string()),
                pa.array(dv[keep], type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    candidates = (
        coded.filter(F.col("centroid_id").isin(all_probed))
        .select("centroid_id", F.col(id_col).cast("string").alias(id_col), "pq_code")
        .mapInArrow(adc_scan, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    if not oversample:
        return candidates.withColumn("_rank", F.row_number().over(w)).filter(
            F.col("_rank") <= k
        )
    pool = (
        candidates.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= take_n)
        .select("query_id", id_col)
    )
    qidx_map = {qids[i]: i for i in range(len(qids))}
    vec_col = index.vec_col

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qsel = qmat[pdf["query_id"].map(qidx_map).to_numpy()]
            d = _pairwise_metric(metric, vecs, qsel)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "_distance": d}
            )

    floats = index.floats.select(
        F.col(index.id_col).cast("string").alias(id_col), vec_col
    )
    scored = floats.join(F.broadcast(pool), id_col).mapInPandas(rerank, out_schema)
    return scored.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


def _ivfpq_search_fused(
    index: IVFPQIndex,
    coded: DataFrame,
    qmat: np.ndarray,
    tables: np.ndarray,
    probing_queries: dict,
    all_probed: list,
    metric: str,
    k: int,
    take_n: int,
    m: int,
    qid_arr: np.ndarray,
    out_schema: str,
) -> DataFrame:
    """Single-pass IVF-PQ serving over a ``keep_vectors`` index: per Arrow
    batch, ADC-prefilter each probed cell's codes to a per-query pool of
    ``take_n``, gather only the pool rows' float vectors from the same
    batch, exact-rerank with one small GEMM, emit per-task exact top-k —
    the PQ twin of :func:`_ivfbq_search_fused` (same recall-dominance
    argument: per-task pools are supersets of the global pool)."""
    id_col = index.id_col
    vec_col = index.vec_col

    def fused(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import (
            arrow_list_matrix,
            id_order_ranks,
            topk_per_group,
        )

        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cids = batch.column(0).to_numpy(zero_copy_only=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            codes = arrow_list_matrix(batch.column(2)).astype(np.int64, copy=False)
            vecs = arrow_list_matrix(batch.column(3), dtype=np.float64)
            order = np.argsort(cids, kind="stable")
            cs = cids[order]
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            bounds = np.r_[starts, n]
            for gi in range(len(starts)):
                rows = order[bounds[gi] : bounds[gi + 1]]
                qidx = probing_queries.get(int(cs[bounds[gi]]))
                if qidx is None or not len(qidx):
                    continue
                sub = tables[qidx]  # (q_c, m, kc)
                grp_codes = codes[rows]
                adc = np.zeros((len(qidx), len(rows)), dtype=np.float32)
                for i in range(m):
                    adc += sub[:, i, grp_codes[:, i]]
                take = min(take_n, len(rows))
                kth = np.partition(adc, take - 1, axis=1)[:, take - 1]
                sel_q, sel_cols = np.nonzero(adc <= kth[:, None])
                keep = topk_per_group(
                    sel_q, adc[sel_q, sel_cols], ranks[rows[sel_cols]], take
                )
                sel_q, sel_cols = sel_q[keep], sel_cols[keep]
                uniq, inv = np.unique(sel_cols, return_inverse=True)
                exact = numpy_distance_matrix(
                    metric, qmat[qidx], vecs[rows[uniq]]
                )  # (q_c, u)
                acc_q.append(qidx[sel_q])
                acc_id.append(ids[rows[sel_cols]])
                acc_d.append(exact[sel_q, inv].astype(np.float64))
        if not acc_q:
            return
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id).astype(object)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv, k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qid_arr[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=pa.string()),
                pa.array(dv[keep], type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    scored = (
        coded.filter(F.col("centroid_id").isin(all_probed))
        .select(
            "centroid_id",
            F.col(id_col).cast("string").alias(id_col),
            "pq_code",
            vec_col,
        )
        .mapInArrow(fused, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


def _pairwise_metric(metric: str, vecs: np.ndarray, qsel: np.ndarray) -> np.ndarray:
    """Row-wise distance between aligned (n, d) matrices."""
    if metric == "euclidean":
        return ((vecs - qsel) ** 2).sum(axis=1)
    if metric == "dot":
        return -(vecs * qsel).sum(axis=1)
    if metric == "cosine":
        return 1.0 - (vecs * qsel).sum(axis=1)
    raise ValueError(f"ivfpq rerank: unsupported metric {metric}")


# -- IVF-BQ -------------------------------------------------------------------


class IVFBQIndex:
    """Coarse IVF centroids + packed binary codes per row: the serving scan
    reads d bits per row inside only the probed centroid partitions — the
    coarse quantizer does the navigation a graph gives the reference, the
    binary codes keep the in-cell ranking cheap (binary.go semantics for
    the codes; the layout is Faiss-IVF-style partitioned parquet)."""

    def __init__(
        self, centroids, thresholds, coded, floats, vec_col, id_col,
        threshold_source: str = "unknown",
    ):
        self.centroids = centroids  # (nlist, dim)
        self.thresholds = thresholds  # per-dim or scalar
        self.coded = coded  # (centroid_id, id_col, bq_code)
        self.floats = floats  # original (id_col, vec_col) for rerank
        self.vec_col = vec_col
        self.id_col = id_col
        # provenance marker: "corpus_mean" (bq_fit over every row),
        # "sample_mean" (bounded k-means sample), "explicit", or "unknown"
        # (the constructor default — a reconstruction path that failed to
        # thread the persisted provenance must not silently relabel the
        # artifact as corpus-fitted) — persist
        # this with the quantizer meta so a rebuilt index can tell whether
        # its codes are comparable to an older artifact's
        self.threshold_source = threshold_source


def ivfbq_build(
    df: DataFrame,
    vec_col: str,
    id_col: str = "_id",
    nlist: int = 128,
    thresholds=None,
    seed: int = 42,
    sample_cap: int | None = None,
    keep_vectors: bool = True,
    sample_thresholds: bool = False,
) -> IVFBQIndex:
    """Coarse k-means (bounded sample) + per-dim mean-threshold binary
    codes (binary.go:152-175), assigned and encoded in one distributed
    pass. At scale persist ``index.coded`` with
    ``partitionBy("centroid_id")`` so a probe prunes file groups.

    ``keep_vectors`` stores the float vector NEXT TO its code in the index
    rows (DiskANN's layout choice — full-precision vectors live with the
    graph on the same shard, disk_index semantics) so serving can
    hamming-prefilter and exact-rerank in ONE pass over the probed cells
    with no join back to the base table. Costs index storage (codes are
    ~3% of the floats); pass False for a codes-only index — search then
    falls back to the two-phase rerank join against ``index.floats``.

    Threshold fit: the default is the exact full-corpus per-dim mean
    (``bq_fit`` semantics, one distributed agg — binary.go:152-175 means
    over the stored points). ``sample_thresholds=True`` opts into reusing
    the bounded k-means sample's mean instead, saving that corpus pass;
    the reference itself fits on the bounded triggerThreshold prefix
    (binary.go:145-175), so the shortcut matches its spirit, but skewed
    corpora can diverge — hence opt-in, never a silent default, and the
    index records ``threshold_source`` so artifacts are auditable."""
    from semadb_spark.functions.kmeans import (
        DEFAULT_SAMPLE_CAP,
        collect_vector_sample,
        kmeans_np,
    )
    from semadb_spark.operators.quantize import bq_fit, encode_bits_np

    sample = collect_vector_sample(
        df, vec_col, cap=sample_cap or DEFAULT_SAMPLE_CAP, seed=seed
    )
    centroids = kmeans_np(sample, nlist, seed=seed)
    if thresholds is not None:
        thr, thr_src = np.asarray(thresholds, dtype=np.float64), "explicit"
    elif sample_thresholds:
        thr, thr_src = sample.mean(axis=0), "sample_mean"
    else:
        thr, thr_src = np.asarray(bq_fit(df, vec_col), dtype=np.float64), "corpus_mean"
    base = df.filter(F.col(vec_col).isNotNull())
    coded = _assign_encode_scan(
        base, vec_col, id_col, centroids,
        lambda X: encode_bits_np(X, thr), "bq_code", np.int64, keep_vectors,
    ).sortWithinPartitions("centroid_id")
    return IVFBQIndex(
        centroids, thr, coded, base, vec_col, id_col, threshold_source=thr_src
    )


def ivfbq_search(
    index: IVFBQIndex,
    queries: Sequence[tuple],
    k: int,
    nprobe: int = 8,
    oversample: int = 10,
    rerank_metric: str = "euclidean",
    candidate_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch IVF-BQ serving: probe ``nprobe`` cells per FLOAT query,
    hamming-score only those cells' packed codes against the bit-encoded
    query, exact-rerank with ``rerank_metric`` — fused in-batch when the
    index keeps vectors (see :func:`_ivfbq_search_fused`), else via a
    bounded broadcast-pool join.

    Scan cost per query is ``nprobe/nlist`` of the corpus at d BITS per
    row. ``oversample=0`` serves raw hamming distances. ``candidate_ids``
    (one id column) restricts the scan to a pre-filter set — the
    reference's filtered-ANN mode (optimistic recall,
    docs/content/docs/search/filtered.md:49-51): the probe still prunes
    cells first, so the semi-join touches ~nprobe/nlist of the index."""
    from semadb_spark.operators.quantize import encode_bits_np

    queries = list(queries)
    if not queries:
        raise ValueError("ivfbq_search requires at least one query")
    qids = [str(q[0]) for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    cdist = numpy_distance_matrix("euclidean", index.centroids, qmat)  # (nlist, q)
    probe_sets = [
        frozenset(int(c) for c in np.argsort(cdist[:, j])[:nprobe])
        for j in range(len(qids))
    ]
    all_probed = sorted(set().union(*probe_sets))
    probing_queries: dict[int, np.ndarray] = {
        c: np.asarray([j for j, ps in enumerate(probe_sets) if c in ps], dtype=np.int64)
        for c in all_probed
    }
    qcodes = encode_bits_np(qmat, np.asarray(index.thresholds))  # (q, words)
    take_n = max(k * oversample, k)
    id_col = index.id_col
    qid_arr = np.asarray(qids, dtype=object)
    out_schema = f"query_id string, {id_col} string, _distance double"

    coded = index.coded
    if candidate_ids is not None:
        flt = candidate_ids.select(
            F.col(candidate_ids.columns[0]).cast("string").alias(id_col)
        )
        coded = coded.withColumn(id_col, F.col(id_col).cast("string")).join(
            flt, id_col, "left_semi"
        )

    if oversample and index.vec_col in index.coded.columns:
        return _ivfbq_search_fused(
            index, coded, qmat, qcodes, probing_queries, all_probed, k, take_n,
            rerank_metric, qid_arr, out_schema,
        )

    def ham_scan(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import (
            arrow_list_matrix,
            id_order_ranks,
            topk_per_group,
        )

        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cids = batch.column(0).to_numpy(zero_copy_only=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            codes = arrow_list_matrix(batch.column(2), dtype=np.int64)
            order = np.argsort(cids, kind="stable")
            cs = cids[order]
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            bounds = np.r_[starts, n]
            for gi in range(len(starts)):
                rows = order[bounds[gi] : bounds[gi + 1]]
                qidx = probing_queries.get(int(cs[bounds[gi]]))
                if qidx is None or not len(qidx):
                    continue
                # (q_c, n_c) uint16 — contiguous per-query partition axis
                dists = numpy_distance_matrix("hamming", qcodes[qidx], codes[rows])
                take = min(take_n, len(rows))
                kth = np.partition(dists, take - 1, axis=1)[:, take - 1]
                sel_q, sel_cols = np.nonzero(dists <= kth[:, None])
                keep = topk_per_group(
                    sel_q, dists[sel_q, sel_cols], ranks[rows[sel_cols]], take
                )
                sel_q, sel_cols = sel_q[keep], sel_cols[keep]
                acc_q.append(qidx[sel_q])
                acc_id.append(ids[rows[sel_cols]])
                acc_d.append(dists[sel_q, sel_cols].astype(np.float64))
        if not acc_q:
            return
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id).astype(object)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv, take_n)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qid_arr[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=pa.string()),
                pa.array(dv[keep], type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    candidates = (
        coded.filter(F.col("centroid_id").isin(all_probed))
        .select("centroid_id", F.col(id_col).cast("string").alias(id_col), "bq_code")
        .mapInArrow(ham_scan, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    if not oversample:
        return candidates.withColumn("_rank", F.row_number().over(w)).filter(
            F.col("_rank") <= k
        )
    pool = (
        candidates.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= take_n)
        .select("query_id", id_col)
    )
    qidx_map = {qids[i]: i for i in range(len(qids))}
    vec_col = index.vec_col

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qsel = qmat[pdf["query_id"].map(qidx_map).to_numpy()]
            d = _pairwise_metric(rerank_metric, vecs, qsel)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "_distance": d}
            )

    floats = index.floats.select(
        F.col(index.id_col).cast("string").alias(id_col), vec_col
    )
    scored = floats.join(F.broadcast(pool), id_col).mapInPandas(rerank, out_schema)
    return scored.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


def _ivfbq_search_fused(
    index: IVFBQIndex,
    coded: DataFrame,
    qmat: np.ndarray,
    qcodes: np.ndarray,
    probing_queries: dict,
    all_probed: list,
    k: int,
    take_n: int,
    rerank_metric: str,
    qid_arr: np.ndarray,
    out_schema: str,
) -> DataFrame:
    """Single-pass IVF-BQ serving over a ``keep_vectors`` index: per Arrow
    batch, hamming-prefilter each probed cell's codes to a per-query pool of
    ``take_n``, gather ONLY the pool rows' float vectors from the same batch,
    exact-rerank them with one small GEMM, and emit the per-task exact top-k.
    No rerank join, no second scan, no broadcast pool — the two extra Spark
    jobs (global hamming window + pool x floats join) that dominated the
    two-phase path's latency collapse into the one pruned scan.

    Recall is >= the two-phase path at equal ``oversample``: each task
    reranks its own full hamming pool, so the union the merge sees contains
    the global hamming pool the two-phase variant reranks. The final window
    orders by exact distance with id tie-break — same output contract.
    """
    id_col = index.id_col
    vec_col = index.vec_col

    def fused(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import (
            arrow_list_matrix,
            id_order_ranks,
            topk_per_group,
        )

        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cids = batch.column(0).to_numpy(zero_copy_only=False)
            ids = batch.column(1).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            codes = arrow_list_matrix(batch.column(2), dtype=np.int64)
            vecs = arrow_list_matrix(batch.column(3), dtype=np.float64)
            order = np.argsort(cids, kind="stable")
            cs = cids[order]
            starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
            bounds = np.r_[starts, n]
            for gi in range(len(starts)):
                rows = order[bounds[gi] : bounds[gi + 1]]
                qidx = probing_queries.get(int(cs[bounds[gi]]))
                if qidx is None or not len(qidx):
                    continue
                ham = numpy_distance_matrix("hamming", qcodes[qidx], codes[rows])
                take = min(take_n, len(rows))
                kth = np.partition(ham, take - 1, axis=1)[:, take - 1]
                sel_q, sel_cols = np.nonzero(ham <= kth[:, None])
                keep = topk_per_group(
                    sel_q, ham[sel_q, sel_cols], ranks[rows[sel_cols]], take
                )
                sel_q, sel_cols = sel_q[keep], sel_cols[keep]
                # exact rerank of the pool, in-batch: one GEMM over the
                # pool's unique rows x this cell's probing queries, then a
                # gather of the (query, row) pairs actually selected
                uniq, inv = np.unique(sel_cols, return_inverse=True)
                exact = numpy_distance_matrix(
                    rerank_metric, qmat[qidx], vecs[rows[uniq]]
                )  # (q_c, u)
                acc_q.append(qidx[sel_q])
                acc_id.append(ids[rows[sel_cols]])
                acc_d.append(exact[sel_q, inv].astype(np.float64))
        if not acc_q:
            return
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id).astype(object)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv, k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qid_arr[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=pa.string()),
                pa.array(dv[keep], type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    scored = (
        coded.filter(F.col("centroid_id").isin(all_probed))
        .select(
            "centroid_id",
            F.col(id_col).cast("string").alias(id_col),
            "bq_code",
            vec_col,
        )
        .mapInArrow(fused, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


# -- Random-projection LSH ----------------------------------------------------


class RPLSHIndex:
    def __init__(self, planes: np.ndarray, buckets: DataFrame, df: DataFrame, vec_col: str, id_col: str):
        self.planes = planes  # (tables, bits, dim)
        self.buckets = buckets  # (id, table, bucket)
        self.df = df
        self.vec_col = vec_col
        self.id_col = id_col


def _bucket_ids(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) x (tables, bits, d) -> (n, tables) integer bucket keys."""
    n_tables, bits, _ = planes.shape
    out = np.zeros((vecs.shape[0], n_tables), dtype=np.int64)
    weights = 1 << np.arange(bits, dtype=np.int64)
    for t in range(n_tables):
        signs = (vecs @ planes[t].T) > 0  # (n, bits)
        out[:, t] = signs.astype(np.int64) @ weights
    return out


def rplsh_planes(tables: int, bits: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic (tables, bits, dim) hyperplane tensor. Shared by the
    index build and the oracle generator, so a hash gate can re-derive the
    exact bucketing from (tables, bits, dim, seed) alone."""
    return np.random.RandomState(seed).normal(size=(tables, bits, dim))


def rplsh_build(
    df: DataFrame,
    vec_col: str,
    dim: int,
    id_col: str = "_id",
    tables: int = 4,
    bits: int = 12,
    seed: int = 42,
) -> RPLSHIndex:
    """Compute per-table bucket keys for every vector (one mapInPandas pass,
    no shuffle). At scale, write the bucket table bucketed by (table, bucket)."""
    planes = rplsh_planes(tables, bits, dim, seed)
    out_schema = f"{id_col} string, table int, bucket long"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            b = _bucket_ids(vecs, planes)  # (n, tables)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].astype(str).to_numpy(), tables),
                    "table": np.tile(np.arange(tables, dtype=np.int32), n),
                    "bucket": b.reshape(-1),
                }
            )

    buckets = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).cast("string").alias(id_col), vec_col)
        .mapInPandas(assign, out_schema)
    )
    return RPLSHIndex(planes, buckets, df, vec_col, id_col)


def rplsh_search(
    index: RPLSHIndex,
    queries: Sequence[tuple],
    metric: str,
    k: int,
    candidate_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch ANN via bucket-match candidates + exact rerank.
    -> (query_id, id, _distance, _rank).

    ``candidate_ids`` (one-column DataFrame) applies the R4 pre-filter
    BEFORE the rerank join — optimistic filtered-ANN semantics, the same
    left-semi shape as ``ivf_search`` (keeps the four ANN routes
    API-symmetric; results are a subset of the unfiltered search and every
    row satisfies the filter, but fewer than k rows may return when the
    filter thins the probed buckets)."""
    queries = list(queries)
    if not queries:
        raise ValueError("rplsh_search requires at least one query")
    qids = [str(q[0]) for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    qb = _bucket_ids(qmat, index.planes)  # (q, tables)
    spark = index.df.sparkSession
    id_col = index.id_col
    # Arrow-path local frame (session.local_df): a pickled-RDD probe would
    # force a Python-worker round-trip just to BUILD the broadcast side.
    from semadb_spark.session import local_df

    probe = local_df(
        spark,
        [
            (qid, t, int(qb[j, t]))
            for j, qid in enumerate(qids)
            for t in range(index.planes.shape[0])
        ],
        "query_id string, table int, bucket long",
    )
    cand_ids = (
        index.buckets.join(F.broadcast(probe), ["table", "bucket"])
        .select("query_id", id_col)
        .distinct()
    )
    if candidate_ids is not None:
        flt = candidate_ids.select(
            F.col(candidate_ids.columns[0]).cast("string").alias(id_col)
        )
        cand_ids = cand_ids.join(flt, id_col, "left_semi")
    cand = cand_ids.join(
        index.df.select(F.col(id_col).cast("string").alias(id_col), index.vec_col),
        id_col,
    )
    qlookup = {qid: qmat[j] for j, qid in enumerate(qids)}
    vec_col = index.vec_col
    out_schema = f"query_id string, {id_col} string, _distance double"

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            frames = []
            for qid, grp in pdf.groupby("query_id"):
                vecs = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
                d = numpy_distance_matrix(metric, vecs, qlookup[qid][None, :])[:, 0]
                take = min(k, len(d))
                idx = np.argpartition(d, take - 1)[:take]
                idx = idx[np.argsort(d[idx], kind="stable")]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: grp[id_col].to_numpy()[idx],
                            "_distance": d[idx],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    local = cand.mapInPandas(rerank, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("_distance").asc(), F.col(id_col).asc())
    return local.withColumn("_rank", F.row_number().over(w)).filter(F.col("_rank") <= k)


def recall_at_k(approx: DataFrame, exact: DataFrame, id_col: str = "_id") -> float:
    """Mean fraction of exact top-k ids recovered per query (the reference's
    own validation method, shard/index/flat/flat_test.go:134-191)."""
    a = approx.select("query_id", F.col(id_col).cast("string").alias("id"))
    e = exact.select("query_id", F.col(id_col).cast("string").alias("id"))
    per_q = (
        e.join(a.withColumn("hit", F.lit(1)), ["query_id", "id"], "left")
        .groupBy("query_id")
        .agg(F.avg(F.coalesce(F.col("hit"), F.lit(0))).alias("recall"))
    )
    row = per_q.agg(F.avg("recall").alias("r")).first()
    return float(row["r"]) if row["r"] is not None else 0.0
