"""Exact k-nearest-neighbour search (reference parity:
shard/index/flat/flat.go:76-132 — single-threaded scan with a bounded
insertion-sorted top-k; here: a distributed scan with per-partition top-k).

Two physical strategies, same semantics:

1. ``knn_topk`` / ``knn_topk_batch`` — **Column-expression path**. The
   distance is a JVM-side expression; ``orderBy(dist).limit(k)`` compiles to
   ``TakeOrderedAndProject`` (per-partition bounded top-k + driver merge —
   exactly the reference's insertion-sort scan, distributed). This path is
   bit-for-bit reproducible in the DuckDB oracle.

2. ``knn_topk_scan`` — **NumPy kernel path** for query batches at scale.
   ``mapInPandas`` computes an Arrow-batched distance matrix per partition
   (the SIMD analogue, distance/distance_amd64.go) and emits only the local
   top-k per query, so the shuffle input is ``O(partitions * q * k)`` instead
   of ``O(n * q)``. A final tiny per-query window picks the global top-k.

Ties are broken by id ascending (deterministic; FIXTURES.md determinism rule).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from semadb_spark.functions.distances import (
    as_double_array,
    distance_expr,
    numpy_distance_matrix,
)


def query_vector_lit(vector: Sequence[float]) -> Column:
    """Literal query vector as array<double>."""
    return F.array(*[F.lit(float(v)) for v in vector])


def distance_to_query(vec_col: Column | str, vector: Sequence[float], metric: str) -> Column:
    vec_col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return distance_expr(metric, as_double_array(vec_col), query_vector_lit(vector))


def knn_topk(
    df: DataFrame,
    vec_col: str,
    query_vector: Sequence[float],
    metric: str,
    k: int,
    id_col: str = "_id",
) -> DataFrame:
    """Exact top-k for one query vector: input rows + ``_distance``.

    Rows with a null vector are skipped (missing properties are never indexed,
    models/index.go:125-131). Output is sorted (distance, id) ascending.
    """
    scored = df.filter(F.col(vec_col).isNotNull()).withColumn(
        "_distance", distance_to_query(vec_col, query_vector, metric)
    )
    return scored.orderBy(F.col("_distance").asc(), F.col(id_col).asc()).limit(k)


def knn_topk_batch(
    df: DataFrame,
    vec_col: str,
    queries: DataFrame,
    metric: str,
    k: int,
    id_col: str = "_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query via broadcast cross-join + per-query window.

    Correctness-oracle friendly (pure SQL); the window shuffles the full
    ``n x q`` cross product by query id — use :func:`knn_topk_scan` when the
    batch is large.
    """
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    joined = (
        df.filter(F.col(vec_col).isNotNull())
        .crossJoin(q)
        .withColumn(
            "_distance",
            distance_expr(
                metric, as_double_array(F.col(vec_col)), as_double_array(F.col(query_vec_col))
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop(query_vec_col)
    )


def knn_topk_scan(
    df: DataFrame,
    vec_col: str,
    queries: Iterable[tuple],
    metric: str,
    k: int,
    id_col: str = "_id",
) -> DataFrame:
    """Exact top-k per query, scale path.

    ``queries`` is a small driver-side list of ``(query_id, vector)`` (the
    serving batch). The query matrix rides into each task inside the Arrow
    UDF closure (broadcast-equivalent); each Arrow batch emits only its local
    top-k per query, so the post-scan reduce handles
    ``O(num_batches * q * k)`` rows regardless of table size.
    """
    qlist = list(queries)
    qids = [str(q[0]) for q in qlist]
    # Bit metrics take packed int64 words; a float64 round-trip corrupts
    # words >= 2^53 (see numpy_distance_matrix).
    qdtype = np.int64 if metric in ("hamming", "jaccard") else np.float64
    qmat = np.asarray([q[1] for q in qlist], dtype=qdtype)
    qid_arr = np.asarray(qids, dtype=object)
    q_range = np.arange(len(qids))
    id_field = df.schema[id_col]
    id_type = id_field.dataType.simpleString()
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
            vecs = arrow_list_matrix(
                batch.column(1), dtype=np.int64 if qdtype is np.int64 else None
            )
            # (q, n) orientation: the per-query kth-distance partition then
            # runs along the CONTIGUOUS axis (axis=0 on a C-ordered matrix
            # is a strided column walk that cost as much as the distances)
            dists = numpy_distance_matrix(metric, qmat, vecs)  # (q, n)
            take = min(k, n)
            # batch-local EXACT top-k under (distance, id): a bare
            # argpartition keeps an arbitrary member of a boundary tie
            # class (bit metrics tie constantly; replicated corpora tie
            # even under float metrics). The kth-distance cut gathers the
            # tie class, then an all-numeric lexsort (id_order_ranks)
            # resolves it to exactly k rows per query.
            kth = np.partition(dists, take - 1, axis=1)[:, take - 1]  # (q,)
            sel_q, sel_rows = np.nonzero(dists <= kth[:, None])
            ranks = id_order_ranks(ids)
            keep = topk_per_group(
                sel_q, dists[sel_q, sel_rows], ranks[sel_rows], take
            )
            sel_q, sel_rows = sel_q[keep], sel_rows[keep]
            acc_q.append(sel_q)
            acc_id.append(ids[sel_rows])
            acc_d.append(dists[sel_q, sel_rows])
        if not acc_q:
            return
        qi = np.concatenate(acc_q)
        idv = np.concatenate(acc_id)
        dv = np.concatenate(acc_d)
        keep = topk_per_group(qi, dv, idv.astype(object), k)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qid_arr[qi[keep]], type=pa.string()),
                pa.array(idv[keep], type=id_pa_type),
                pa.array(dv[keep].astype(np.float64), type=pa.float64()),
            ],
            names=["query_id", id_col, "_distance"],
        )

    candidates = (
        df.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .mapInArrow(local_topk, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_distance").asc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
    )


def with_hybrid_score(
    ranked: DataFrame, weight: float = 1.0, distance_col: str = "_distance"
) -> DataFrame:
    """Attach `_score`/`_hybridScore` per the reference's vector convention:
    HybridScore = -1 * weight * distance (flat.go:79-110)."""
    return ranked.withColumn("_score", F.lit(None).cast("double")).withColumn(
        "_hybridScore", F.lit(-1.0) * F.lit(float(weight)) * F.col(distance_col)
    )
