"""Vector quantizers: binary (BQ) and product (PQ).

Parity targets (reference, Go):
- BQ fit = per-dimension mean threshold over the stored vectors
  (shard/vectorstore/binary.go:145-178, two-pass: mean then encode);
  encode sets bit i iff ``v[i] > threshold[i]``, LSB-first into uint64 words
  (shard/vectorstore/binary.go:103-129).
- Hamming / jaccard distances over the packed words: popcount of XOR /
  1 - |AND|/|OR| (distance/distance.go:45-67). Float vectors queried with
  hamming/jaccard are force-binarized at threshold 0.5
  (shard/vectorstore/vectorstore.go:51-73).
- PQ fit = independent k-means per subvector slice, centroid ids are the
  code (shard/vectorstore/product.go:175-236); cosine is remapped to
  euclidean for part-wise sums (product.go:49-60); query-time distance is
  the asymmetric distance table: per-subvector distance from the query
  slice to each centroid, summed by code (product.go:238-276).

Spark shape:
- Fit is a batch aggregation job (the reference's Fit() walks the item
  cache single-node; here it's one pass of map-side partial sums / a
  pyspark.ml KMeans per subvector — the part of a vector DB that genuinely
  parallelizes).
- Encode is an Arrow-batched pandas UDF (NumPy matrix ops per batch — the
  idiomatic Spark analogue of the reference's SIMD kernels,
  distance/distance_amd64.go:19-27).
- Query-time distances stay JVM-side: ``bit_count`` over packed longs for
  BQ, a broadcast literal distance-table fold for PQ ADC — whole-stage
  codegen, no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "bq_fit",
    "bq_encode",
    "bq_encode_expr",
    "bq_distance_expr",
    "bq_topk",
    "bq_topk_batch",
    "PQCodebooks",
    "pq_fit",
    "pq_encode",
    "pq_adc_table",
    "pq_adc_distance_expr",
    "pq_adc_topk",
    "pq_adc_topk_batch",
    "QuantizedIndex",
    "build_quantized_index",
    "quantized_topk",
]


# ---------------------------------------------------------------------------
# Binary quantizer


def bq_fit(df: DataFrame, vec_col: str) -> np.ndarray:
    """Per-dimension mean thresholds (binary.go:152-175).

    One pass: each partition emits a (sum-vector, count) partial via
    mapInPandas; the driver reduces O(partitions x d) doubles. No shuffle of
    the vectors themselves — scales to arbitrarily many rows.
    """

    def partial(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import arrow_list_matrix

        acc = None
        n = 0
        for batch in batches:
            col = batch.column(0)
            if col.null_count:
                col = col.drop_null()
            if len(col) == 0:
                continue
            m = arrow_list_matrix(col, dtype=np.float64)
            acc = m.sum(axis=0) if acc is None else acc + m.sum(axis=0)
            n += m.shape[0]
        if acc is not None:
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc.tolist()]), pa.array([n], type=pa.int64())],
                names=["s", "n"],
            )

    parts = (
        df.select(vec_col)
        .mapInArrow(partial, "s array<double>, n long")
        .collect()
    )
    if not parts:
        raise ValueError("bq_fit: no vectors to fit")
    total = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    count = sum(r["n"] for r in parts)
    return total / count


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, d) bool -> (n, ceil(d/64)) int64, bit i%64 of word i//64 set per
    binary.go:113-128 (LittleEndian, LSB-first)."""
    n, d = bits.shape
    words = (d + 63) // 64
    padded = np.zeros((n, words * 64), dtype=np.uint64)
    padded[:, :d] = bits
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    packed = (padded.reshape(n, words, 64) * weights).sum(axis=2, dtype=np.uint64)
    return packed.view(np.int64)


def encode_bits_np(vecs: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """Strictly-greater thresholding (binary.go:122: ``v > threshold[i]``)."""
    return _pack_bits(vecs > thresholds)


def _append_encoded(df: DataFrame, vec_col: str, out_col: str, value_dtype, fn) -> DataFrame:
    """Pass-through Arrow kernel appending ``fn((n, d) float64) -> (n, w)``
    codes as a list column. One contiguous reshape + one vectorized encode
    per batch — no per-row Python objects (the np.stack over millions of
    small arrays dominated round-3 build times). Null vectors -> null code
    (slow correct fallback; builders filter nulls upstream)."""
    from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

    spark_value = LongType() if value_dtype == np.int64 else IntegerType()
    vec_idx = df.columns.index(vec_col)
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(spark_value))]
    )

    def kernel(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import arrow_list_matrix

        pa_value = pa.int64() if value_dtype == np.int64 else pa.int32()
        names = None
        for batch in batches:
            if names is None:
                names = batch.schema.names + [out_col]
            n = batch.num_rows
            col = batch.column(vec_idx)
            if n == 0:
                codes_arr = pa.array([], type=pa.list_(pa_value))
            elif col.null_count == 0:
                codes = fn(arrow_list_matrix(col, dtype=np.float64))
                w = codes.shape[1]
                codes_arr = pa.ListArray.from_arrays(
                    pa.array(np.arange(n + 1, dtype=np.int32) * w),
                    pa.array(codes.ravel().astype(value_dtype, copy=False), type=pa_value),
                )
            else:
                vals = col.to_pylist()
                codes_arr = pa.array(
                    [
                        None
                        if v is None
                        else fn(np.asarray(v, dtype=np.float64)[None, :])[0].tolist()
                        for v in vals
                    ],
                    type=pa.list_(pa_value),
                )
            yield pa.RecordBatch.from_arrays(list(batch.columns) + [codes_arr], names=names)

    return df.mapInArrow(kernel, out_schema)


def bq_encode(
    df: DataFrame,
    vec_col: str,
    thresholds: np.ndarray | Sequence[float] | float = 0.5,
    out_col: str = "bq_code",
) -> DataFrame:
    """Add packed ``array<long>`` codes. A scalar threshold reproduces the
    forced 0.5 binarization for hamming/jaccard inputs
    (vectorstore.go:51-73)."""
    thr = np.asarray(thresholds, dtype=np.float64)
    return _append_encoded(
        df, vec_col, out_col, np.int64, lambda X: encode_bits_np(X, thr)
    )


def bq_encode_expr(
    vec_col: Column | str, dim: int, thresholds: Sequence[float] | float = 0.5
) -> Column:
    """Pure-Column binarize + bit-pack: ``array<float>`` -> packed
    ``array<long>``, bit i%64 of word i//64 set iff ``v[i] > threshold[i]``
    (binary.go:113-128 layout, same as :func:`encode_bits_np`).

    This is the query-time D8 path (float vectors searched with
    hamming/jaccard are force-binarized at 0.5,
    shard/vectorstore/vectorstore.go:51-73): staying JVM-side keeps the scan
    in whole-stage codegen with no Arrow round-trip. The expression has one
    term per dimension — fine through a few hundred dims; prefer the
    pandas-UDF :func:`bq_encode` for building persisted code columns at
    d >> 512.
    """
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    thr = (
        [float(thresholds)] * dim
        if isinstance(thresholds, (int, float))
        else [float(t) for t in thresholds]
    )
    words = []
    for w in range((dim + 63) // 64):
        bits = [
            F.when(
                F.element_at(c, w * 64 + i + 1) > F.lit(thr[w * 64 + i]),
                # shiftleft(1L, 63) wraps to min-long in the JVM — a python
                # literal 1 << 63 would overflow the long literal instead
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(min(64, dim - w * 64))
        ]
        # balanced OR tree: depth log2(64) instead of a 64-deep linear fold
        # (deep expression chains fall out of codegen)
        while len(bits) > 1:
            bits = [
                bits[i].bitwiseOR(bits[i + 1]) if i + 1 < len(bits) else bits[i]
                for i in range(0, len(bits), 2)
            ]
        words.append(bits[0])
    return F.array(*words)


def _code_lit(code: Sequence[int]) -> Column:
    return F.array(*[F.lit(int(w)).cast("long") for w in code])


def bq_distance_expr(code_col: Column | str, query_code: Sequence[int], metric: str) -> Column:
    """JVM-side hamming/jaccard over packed words (distance.go:45-67)."""
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    q = _code_lit(query_code)
    if metric == "hamming":
        per_word = F.zip_with(c, q, lambda a, b: F.bit_count(a.bitwiseXOR(b)))
        return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x).cast("double")
    if metric == "jaccard":
        inter = F.aggregate(
            F.zip_with(c, q, lambda a, b: F.bit_count(a.bitwiseAND(b))),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        union = F.aggregate(
            F.zip_with(c, q, lambda a, b: F.bit_count(a.bitwiseOR(b))),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        # union == 0 -> distance 0 (distance.go:62-64)
        return F.when(union == 0, F.lit(0.0)).otherwise(
            1.0 - inter.cast("double") / union.cast("double")
        )
    raise ValueError(f"bq metric must be hamming or jaccard, got {metric}")


def bq_topk(
    codes_df: DataFrame,
    code_col: str,
    query_vector: Sequence[float],
    thresholds: np.ndarray | Sequence[float] | float,
    metric: str,
    k: int,
    id_col: str = "_id",
) -> DataFrame:
    """Top-k by quantized distance. The query vector is encoded driver-side
    with the same thresholds (DistanceFromFloat, binary.go:182-199); the scan
    is a codegen'd bit_count fold + TakeOrderedAndProject — no Python."""
    thr = np.asarray(thresholds, dtype=np.float64)
    qcode = encode_bits_np(np.asarray(query_vector, dtype=np.float64)[None, :], thr)[0]
    scored = codes_df.filter(F.col(code_col).isNotNull()).withColumn(
        "_distance", bq_distance_expr(code_col, qcode.tolist(), metric)
    )
    return scored.orderBy(F.col("_distance").asc(), F.col(id_col).asc()).limit(k)


def bq_topk_batch(
    codes_df: DataFrame,
    code_col: str,
    floats_df: DataFrame,
    vec_col: str,
    queries: Sequence[tuple],
    thresholds: np.ndarray | Sequence[float] | float,
    k: int,
    oversample: int = 10,
    rerank_metric: str = "euclidean",
    id_col: str = "_id",
) -> DataFrame:
    """Batched BQ serving: oversample + exact rerank.

    The standard recipe for low-bit binary codes — a hamming scan over the
    packed codes (d bits of memory traffic per row) collects a
    ``k * oversample`` candidate pool per query; the pool (bounded:
    queries x k x oversample rows, broadcast-joined) is reranked with the
    exact ``rerank_metric`` on the float vectors. Recovers most of the
    recall the 1-bit codes lose while still scanning codes, not floats.
    The reference serves BQ distances raw inside the graph search
    (shard/vectorstore/binary.go:182-199) — with 784-bit mnist codes that
    is enough resolution; at 64-128 dims it is not, hence the rerank.

    ``queries`` is a driver-side list of ``(query_id, float_vector)``.
    Returns (query_id, id_col, _distance) rows, top-k per query by the
    rerank metric.
    """
    from .knn import knn_topk_scan

    qlist = list(queries)
    thr = np.asarray(thresholds, dtype=np.float64)
    qmat = np.stack([np.asarray(q[1], dtype=np.float64) for q in qlist])
    qcodes = encode_bits_np(qmat, thr)
    code_queries = [(str(qlist[i][0]), qcodes[i].tolist()) for i in range(len(qlist))]
    pool = knn_topk_scan(
        codes_df, code_col, code_queries, "hamming", k * oversample, id_col=id_col
    ).select("query_id", id_col)
    cands = floats_df.select(id_col, vec_col).join(F.broadcast(pool), id_col)

    qidx = {str(q[0]): i for i, q in enumerate(qlist)}
    id_type = floats_df.schema[id_col].dataType.simpleString()
    out_schema = f"query_id string, {id_col} {id_type}, _distance double"

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = qmat[pdf["query_id"].map(qidx).to_numpy()]
            if rerank_metric == "euclidean":
                d = ((vecs - q) ** 2).sum(axis=1)
            elif rerank_metric == "dot":
                d = -(vecs * q).sum(axis=1)
            elif rerank_metric == "cosine":
                d = 1.0 - (vecs * q).sum(axis=1)
            else:
                raise ValueError(f"bq_topk_batch: unsupported rerank metric {rerank_metric}")
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "_distance": d}
            )

    scored = cands.mapInPandas(rerank, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


# ---------------------------------------------------------------------------
# Product quantizer


@dataclass
class PQCodebooks:
    """(num_subvectors, num_centroids, subvector_len) centroid tensor +
    the distance metric used for encode/ADC (product.go:29-40)."""

    centroids: np.ndarray
    metric: str

    @property
    def num_subvectors(self) -> int:
        return self.centroids.shape[0]

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[1]

    @property
    def subvector_len(self) -> int:
        return self.centroids.shape[2]


def _effective_metric(metric: str) -> str:
    # Cosine can't sum part-wise; for normalized vectors euclidean is
    # proportional, so the reference remaps (product.go:49-60).
    if metric == "cosine":
        return "euclidean"
    if metric not in ("euclidean", "dot"):
        raise ValueError(f"pq metric must be euclidean, cosine or dot, got {metric}")
    return metric


def pq_fit(
    df: DataFrame,
    vec_col: str,
    num_subvectors: int,
    num_centroids: int,
    metric: str = "euclidean",
    seed: int = 42,
    sample_cap: int | None = None,
    sample: np.ndarray | None = None,
) -> PQCodebooks:
    """Per-subvector k-means codebooks via pyspark.ml (product.go:175-236;
    the reference's utils.KMeans is euclidean, as is ml's).

    ``sample_cap`` bounds the training set at scale — codebook quality
    converges long before the full corpus is seen (one bounded collect feeds
    all m sub-fits; see functions/kmeans.py). Pass ``sample`` to reuse an
    already-collected training matrix (ivfpq_build shares one collect
    between the coarse and product fits) — fits are identical because the
    limit()-bounded collect is deterministic for a given frame and cap.
    """
    from semadb_spark.functions.kmeans import (
        DEFAULT_SAMPLE_CAP,
        collect_vector_sample,
        kmeans_np,
    )

    metric = _effective_metric(metric)
    if sample is None:
        vecs = df.select(F.col(vec_col).alias("v"))
        sample = collect_vector_sample(
            vecs, "v", cap=sample_cap or DEFAULT_SAMPLE_CAP, seed=seed
        )
    d = sample.shape[1]
    if d % num_subvectors != 0:
        raise ValueError(
            f"vector length {d} must be divisible by num subvectors {num_subvectors}"
        )
    sublen = d // num_subvectors
    if len(sample) * num_centroids >= 2_000_000:
        # the m sub-fits are independent pure-NumPy jobs; run them as one
        # m-task Spark job instead of 20 x ~2s serialized on the driver
        # core (the dominant cost of ivfpq_build at 1M x 100d). Same
        # kmeans_np + per-sub seed on every path => bit-identical books.
        sc = df.sparkSession.sparkContext
        bc = sc.broadcast(sample)

        def _fit(i: int):
            from semadb_spark.functions.kmeans import kmeans_np as _km

            s = bc.value
            return i, _km(
                s[:, i * sublen : (i + 1) * sublen], num_centroids, seed=seed + i
            )

        fitted = dict(
            sc.parallelize(range(num_subvectors), num_subvectors).map(_fit).collect()
        )
        bc.unpersist()
        books = [fitted[i] for i in range(num_subvectors)]
    else:
        books = [
            kmeans_np(
                sample[:, i * sublen : (i + 1) * sublen], num_centroids, seed=seed + i
            )
            for i in range(num_subvectors)
        ]
    return PQCodebooks(centroids=np.stack(books), metric=metric)


def _sub_distances(books: PQCodebooks, sub: np.ndarray, i: int) -> np.ndarray:
    """Distances from slice batch ``sub`` (n, sublen) to codebook i's
    centroids -> (n, k). Squared L2 (distance/puredist.go:3-10) or negated
    dot (distance.go:17-21)."""
    cents = books.centroids[i]  # (k, sublen)
    if books.metric == "dot":
        return -(sub @ cents.T)
    # squared-L2 via the expansion trick: one (n, sublen) @ (sublen, k)
    # GEMM and two rank-1 broadcasts — the (n, k, sublen) diff temp of the
    # einsum form churned ~100 MB per 10k-row batch per subvector and
    # dominated the 1M-row encode pass
    return (
        (sub * sub).sum(axis=1)[:, None]
        - 2.0 * (sub @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )


def pq_encode(
    df: DataFrame, vec_col: str, books: PQCodebooks, out_col: str = "pq_code"
) -> DataFrame:
    """Add ``array<int>`` centroid-id codes (product.go:136-160). Arrow
    pass-through kernel, argmin over the codebook per subvector — batch
    matrix ops."""
    cents = books.centroids
    m, _, sublen = cents.shape

    def encode(vecs: np.ndarray) -> np.ndarray:
        codes = np.empty((vecs.shape[0], m), dtype=np.int32)
        for i in range(m):
            sub = vecs[:, i * sublen : (i + 1) * sublen]
            codes[:, i] = _sub_distances(books, sub, i).argmin(axis=1)
        return codes

    return _append_encoded(df, vec_col, out_col, np.int32, encode)


def pq_adc_table(books: PQCodebooks, query_vector: Sequence[float]) -> np.ndarray:
    """Asymmetric distance table (m, k): query slice -> each centroid
    (product.go:243-263)."""
    q = np.asarray(query_vector, dtype=np.float64)
    m, k, sublen = books.centroids.shape
    table = np.empty((m, k))
    for i in range(m):
        table[i] = _sub_distances(books, q[None, i * sublen : (i + 1) * sublen], i)[0]
    return table


def pq_adc_distance_expr(code_col: Column | str, table: np.ndarray) -> Column:
    """Sum of table lookups by code (product.go:265-276) as a pure JVM
    expression: the (m x k) table rides along as a literal array (it is tiny
    — the broadcast analogue of the reference keeping it in an outer
    closure), indexed ``i*k + code[i]``."""
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    m, k = table.shape
    flat = F.array(*[F.lit(float(x)) for x in table.ravel()])
    picked = F.transform(c, lambda code, i: F.element_at(flat, i * k + code + 1))
    return F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)


def pq_adc_topk(
    codes_df: DataFrame,
    code_col: str,
    books: PQCodebooks,
    query_vector: Sequence[float],
    k: int,
    id_col: str = "_id",
) -> DataFrame:
    """Top-k by ADC distance over the code column only — the scan never
    touches the original vectors (the point of PQ: memory traffic is m bytes
    per row instead of 4d)."""
    table = pq_adc_table(books, query_vector)
    scored = codes_df.filter(F.col(code_col).isNotNull()).withColumn(
        "_distance", pq_adc_distance_expr(code_col, table)
    )
    return scored.orderBy(F.col("_distance").asc(), F.col(id_col).asc()).limit(k)


def pq_adc_topk_batch(
    codes_df: DataFrame,
    code_col: str,
    books: PQCodebooks,
    queries: Sequence[tuple],
    k: int,
    id_col: str = "_id",
) -> DataFrame:
    """Batched ADC serving: top-k per query over the code column only.

    The per-query (m, k) ADC tables are stacked into one (q, m, k) array
    that rides into each task inside the Arrow UDF closure
    (broadcast-equivalent; q x m x k doubles — 1024 queries x 8 x 256 is
    16 MB). Each Arrow batch scores rows against every query with m
    NumPy gathers (``tables[:, i, codes[:, i]]`` — the batch analogue of
    product.go:265-276's per-row table walk) and emits only its local
    top-k per query, so the global merge sees O(batches x q x k) rows at
    any corpus size.
    """
    from pyspark.sql import Window

    qlist = list(queries)
    qids = np.array([str(q[0]) for q in qlist], dtype=object)
    q_range = np.arange(len(qlist))
    # float32 LUTs: ADC is memory-bandwidth bound — halving the gathered
    # bytes nearly halves the scan time, and 7 significant digits is far
    # beyond quantization noise (recall gates are threshold booleans)
    tables = np.stack([pq_adc_table(books, q[1]) for q in qlist]).astype(
        np.float32
    )  # (q, m, k)
    m = books.num_subvectors
    id_type = codes_df.schema[id_col].dataType.simpleString()
    out_schema = f"query_id string, {id_col} {id_type}, _distance double"

    def local_topk(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import (
            arrow_list_matrix,
            id_order_ranks,
            topk_per_group,
        )

        id_pa_type = None
        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if id_pa_type is None:
                id_pa_type = batch.column(0).type
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            ranks = id_order_ranks(ids)
            codes = arrow_list_matrix(batch.column(1)).astype(np.int64, copy=False)
            take = min(k, n)
            # query-chunked accumulation: the (chunk, n) slab and its gather
            # temp stay cache-resident (a full (q, n) slab at 1024 queries x
            # 10k rows is 40 MB x m rewrites — allocation churn dominated
            # the scan); the gather tables[:, i, codes[:, i]] is already
            # (chunk, n), so no per-subquantizer transpose copies
            CH = 128
            for qlo in range(0, len(qids), CH):
                sub = tables[qlo : qlo + CH]
                dists = np.zeros((sub.shape[0], n), dtype=np.float32)
                for i in range(m):
                    dists += sub[:, i, codes[:, i]]
                # exact (distance, id) cut: gather the kth-distance tie
                # class (ADC distances collide often — identical codes give
                # identical sums), resolve numerically to exactly k
                kth = np.partition(dists, take - 1, axis=1)[:, take - 1]
                sel_q, sel_cols = np.nonzero(dists <= kth[:, None])
                keep = topk_per_group(
                    sel_q, dists[sel_q, sel_cols], ranks[sel_cols], take
                )
                sel_q, sel_cols = sel_q[keep], sel_cols[keep]
                acc_q.append(q_range[qlo : qlo + CH][sel_q])
                acc_id.append(ids[sel_cols])
                acc_d.append(dists[sel_q, sel_cols].astype(np.float64))
        if not acc_q:
            return
        # per-task trim: only this task's top-k per query survives to the
        # global merge
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv.astype(object), k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qids[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=id_pa_type),
                pa.array(dv[keep], type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    candidates = (
        codes_df.filter(F.col(code_col).isNotNull())
        .select(id_col, code_col)
        .mapInArrow(local_topk, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return candidates.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


def pq_topk_batch(
    codes_df: DataFrame,
    code_col: str,
    floats_df: DataFrame,
    vec_col: str,
    books: PQCodebooks,
    queries: Sequence[tuple],
    k: int,
    oversample: int = 10,
    rerank_metric: str = "euclidean",
    id_col: str = "_id",
) -> DataFrame:
    """Batched PQ serving: ADC oversample + exact rerank.

    Same recipe as :func:`bq_topk_batch`: the ADC scan over the codes
    (m bytes of traffic per row) collects ``k * oversample`` candidates
    per query; the bounded pool (queries x k x oversample rows,
    broadcast-joined against the float table) is reranked with the exact
    metric. With 8 bits per subvector the raw ADC ordering is noisy on
    high-entropy corpora — reranking through the float vectors recovers
    the recall the codes lose while the corpus-sized scan still never
    touches a float vector (vectorstore.go:75+ serves codes-only the same
    way; the rerank pool is the Spark-native bounded refinement).
    """
    pool = pq_adc_topk_batch(
        codes_df, code_col, books, queries, k * oversample, id_col=id_col
    ).select("query_id", id_col)

    qlist = list(queries)
    qmat = np.stack([np.asarray(q[1], dtype=np.float64) for q in qlist])
    qidx = {str(q[0]): i for i, q in enumerate(qlist)}
    id_type = floats_df.schema[id_col].dataType.simpleString()
    out_schema = f"query_id string, {id_col} {id_type}, _distance double"
    cands = floats_df.select(id_col, vec_col).join(F.broadcast(pool), id_col)

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = qmat[pdf["query_id"].map(qidx).to_numpy()]
            if rerank_metric == "euclidean":
                d = ((vecs - q) ** 2).sum(axis=1)
            elif rerank_metric == "dot":
                d = -(vecs * q).sum(axis=1)
            elif rerank_metric == "cosine":
                d = 1.0 - (vecs * q).sum(axis=1)
            else:
                raise ValueError(
                    f"pq_topk_batch: unsupported rerank metric {rerank_metric}"
                )
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "_distance": d}
            )

    scored = cands.mapInPandas(rerank, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return scored.withColumn("_rank", F.row_number().over(w)).filter(
        F.col("_rank") <= k
    )


# ---------------------------------------------------------------------------
# Schema-declared quantized serving (vectorstore.go:75+: any vector index
# with a quantizer declaration serves transparently through its codes)


@dataclass
class QuantizedIndex:
    """Built quantizer artifact a vector property serves from.

    ``codes``: (id_col, code_col) frame — the ONLY thing the query-time scan
    touches (the point of quantization: m bytes / d bits of memory traffic
    per row instead of 4d). ``kind`` is "binary" (thresholds + bit metric)
    or "product" (codebooks, ADC)."""

    kind: str
    codes: DataFrame
    code_col: str
    id_col: str = "_id"
    thresholds: np.ndarray | None = None  # binary
    metric: str = "hamming"  # binary quantizer distance (quantizer.go:38)
    books: PQCodebooks | None = None  # product


def build_quantized_index(
    df: DataFrame,
    vec_col: str,
    quantizer: dict,
    id_col: str = "_id",
    metric: str = "euclidean",
    seed: int = 42,
) -> QuantizedIndex:
    """Fit + encode per the reference's quantizer declaration
    (models/quantizer.go):

    - binary: threshold = declared scalar, else per-dim means fit on up to
      ``triggerThreshold`` points (binary.go:145-178's trigger semantics —
      the fit happens once a bounded sample is seen, then freezes);
    - product: per-subvector k-means with ``numCentroids`` codebooks fit on
      up to ``triggerThreshold`` sampled points (product.go:175-236).
    """
    qt = quantizer.get("type")
    if qt == "binary":
        b = quantizer["binary"]
        if b.get("threshold") is not None:
            thr = np.asarray(float(b["threshold"]))
        else:
            thr = bq_fit(df, vec_col)
        codes = bq_encode(df.select(id_col, vec_col), vec_col, thr)
        return QuantizedIndex(
            kind="binary",
            codes=codes.select(id_col, "bq_code"),
            code_col="bq_code",
            id_col=id_col,
            thresholds=thr,
            metric=b["distanceMetric"],
        )
    if qt == "product":
        p = quantizer["product"]
        books = pq_fit(
            df,
            vec_col,
            num_subvectors=int(p["numSubVectors"]),
            num_centroids=int(p["numCentroids"]),
            metric=metric,
            seed=seed,
            sample_cap=int(p.get("triggerThreshold", 10_000)),
        )
        codes = pq_encode(df.select(id_col, vec_col), vec_col, books)
        return QuantizedIndex(
            kind="product",
            codes=codes.select(id_col, "pq_code"),
            code_col="pq_code",
            id_col=id_col,
            books=books,
        )
    raise ValueError(f"unknown quantizer type {qt}")


def quantized_topk(
    index: QuantizedIndex, query_vector: Sequence[float], k: int
) -> DataFrame:
    """Top-k over the code column only (the serving scan). The query rides
    in as-is: binary encodes it with the stored thresholds
    (DistanceFromFloat, binary.go:182-199); product builds the ADC table
    (product.go:243-263)."""
    if index.kind == "binary":
        return bq_topk(
            index.codes, index.code_col, query_vector, index.thresholds,
            index.metric, k, id_col=index.id_col,
        )
    return pq_adc_topk(
        index.codes, index.code_col, index.books, query_vector, k,
        id_col=index.id_col,
    )


def pq_centroid_dists(books: PQCodebooks) -> np.ndarray:
    """Symmetric centroid-to-centroid table (m, k, k) — the reference
    precomputes this for point-to-point distances during graph maintenance
    (product.go:216-232, DistanceFromPoint product.go:279-305)."""
    m, k, _ = books.centroids.shape
    out = np.empty((m, k, k))
    for i in range(m):
        cents = books.centroids[i]
        if books.metric == "dot":
            out[i] = -(cents @ cents.T)
        else:
            diff = cents[:, None, :] - cents[None, :, :]
            out[i] = np.einsum("abd,abd->ab", diff, diff)
    return out
