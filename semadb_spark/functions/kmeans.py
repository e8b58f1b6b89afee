"""Seeded k-means for index builds (IVF coarse centroids, PQ codebooks).

The reference runs a single-node Lloyd's over vectors collected in memory
(utils/kmeans.go, used by the product quantizer product.go:175-236). The
Spark-scale shape of the same idea:

- **Fit on a bounded sample** collected to the driver and clustered with
  vectorized NumPy (k-means++ init + Lloyd). Codebook/centroid quality
  converges long before the full corpus is seen, so the sample cap — not the
  table size — bounds fit cost at 100 TB. (pyspark.ml.KMeans distributes the
  fit, but each iteration is a full-table job; for index builds whose k is
  small that is strictly worse than sample-and-fit.)
- **Assign distributed**: the argmin-over-centroids encode runs as an
  Arrow-batched pandas UDF over the full table, centroids riding in the
  closure (broadcast-equivalent).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

DEFAULT_SAMPLE_CAP = 131_072


def kmeans_np(
    X: np.ndarray, k: int, seed: int = 42, max_iter: int = 25, tol: float = 1e-6
) -> np.ndarray:
    """k-means++ init + Lloyd iterations, fully vectorized. -> (k, d).

    Deterministic for a given (X, k, seed). If fewer distinct points than k,
    surplus centroids repeat the first point (the reference likewise allows
    degenerate/empty clusters, utils/kmeans.go)."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    rng = np.random.default_rng(seed)
    if n <= k:
        centers = np.repeat(X[:1], k, axis=0)
        centers[:n] = X
        return centers
    # k-means++ with incremental min-distance bookkeeping: O(nkd) total
    centers = np.empty((k, d))
    centers[0] = X[rng.integers(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers[i] = X[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((X - centers[i]) ** 2).sum(axis=1))
    x_sq = (X**2).sum(axis=1)[:, None]
    prev_inertia = np.inf
    for _ in range(max_iter):
        # squared L2 via the expansion trick: one GEMM per iteration
        dists = x_sq - 2.0 * (X @ centers.T) + (centers**2).sum(axis=1)[None, :]
        labels = dists.argmin(axis=1)
        inertia = dists[np.arange(n), labels].sum()
        # scatter-add mean update via per-dimension bincount: d passes over
        # X instead of k boolean-mask scans (the per-cluster loop dominated
        # codebook fits — 20 subquantizers x 256 centroids x 25 iterations;
        # np.add.at is an order of magnitude slower than bincount here)
        sums = np.empty((k, d))
        for di in range(d):
            sums[:, di] = np.bincount(labels, weights=X[:, di], minlength=k)
        counts = np.bincount(labels, minlength=k).astype(np.float64)
        nonempty = counts > 0
        centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        if prev_inertia - inertia <= tol * max(abs(prev_inertia), 1.0):
            break
        prev_inertia = inertia
    return centers


def collect_vector_sample(
    df: DataFrame, vec_col: str, cap: int = DEFAULT_SAMPLE_CAP, seed: int = 42
) -> np.ndarray:
    """Bounded driver-side sample of non-null vectors -> (n<=cap, d).

    limit() short-circuits the scan: Spark stops launching tasks once enough
    rows arrive, so on a 100 TB table this reads O(cap) rows, not the table.
    """
    rows = df.select(vec_col).filter(F.col(vec_col).isNotNull()).limit(cap).collect()
    if not rows:
        raise ValueError("no vectors to sample")
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])


def assign_centroids(
    df: DataFrame, vec_col: str, centroids: np.ndarray, out_col: str = "centroid_id"
) -> DataFrame:
    """Nearest-centroid id per row; null vectors -> null id.

    ``mapInArrow`` pass-through kernel: the list column reshapes to one
    contiguous ``(n, d)`` matrix (no per-row objects — the np.stack over a
    million small arrays dominated the round-3 index-build time), one GEMM
    per batch, and the input batch is forwarded untouched with the id
    column appended."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = np.asarray(centroids, dtype=np.float64)
    c_sq = (cents**2).sum(axis=1)
    vec_idx = df.columns.index(vec_col)
    out_schema = StructType(df.schema.fields + [StructField(out_col, IntegerType())])

    def assign(batches):
        import pyarrow as pa

        from semadb_spark.functions.distances import arrow_list_matrix

        names = None
        for batch in batches:
            if names is None:
                names = batch.schema.names + [out_col]
            n = batch.num_rows
            col = batch.column(vec_idx)
            if n == 0:
                ids = pa.array([], type=pa.int32())
            elif col.null_count == 0:
                X = arrow_list_matrix(col, dtype=np.float64)
                d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ cents.T) + c_sq[None, :]
                ids = pa.array(d.argmin(axis=1).astype(np.int32))
            else:
                vals = col.to_pylist()
                mask = np.asarray([v is not None for v in vals])
                out = np.full(n, -1, dtype=np.int32)
                if mask.any():
                    X = np.asarray(
                        [v for v in vals if v is not None], dtype=np.float64
                    )
                    d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ cents.T) + c_sq[None, :]
                    out[mask] = d.argmin(axis=1).astype(np.int32)
                ids = pa.array(
                    [int(v) if m else None for v, m in zip(out, mask)],
                    type=pa.int32(),
                )
            yield pa.RecordBatch.from_arrays(list(batch.columns) + [ids], names=names)

    return df.mapInArrow(assign, out_schema)
