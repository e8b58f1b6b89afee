"""Distance function library (reference parity: distance/distance.go).

Semantics pinned to the reference:
- ``euclidean`` is the **squared** L2 distance (distance/distance.go:14-16,
  distance/puredist.go:3-10) — monotonic shortcut, no sqrt.
- ``dot`` is the **negated** inner product so lower = closer
  (distance/distance.go:19-21).
- ``cosine`` is ``1 - <x,y>`` and assumes pre-normalized vectors
  (distance/distance.go:23-25; the bench loader normalizes,
  internal/loadhdf5/loadhdf5.go:57-61). Use :func:`l2_normalize` first when
  inputs are not unit vectors.
- ``haversine`` takes [lat, lon] degree pairs, returns meters, R=6371000
  (distance/distance.go:27-43).
- ``hamming`` / ``jaccard`` operate on bit-packed uint64 arrays
  (distance/distance.go:45-67); floats are binarized at threshold 0.5 first
  (shard/vectorstore/vectorstore.go:51-73) — see
  :mod:`semadb_spark.operators.quantize`.

Two tiers, both distributed:
1. **Column expressions** (this module): higher-order functions
   (``zip_with``/``aggregate``) evaluated JVM-side — no Python in the loop.
   Used by the query compiler so Catalyst keeps pushdown/pruning.
2. **NumPy batch kernels** (``numpy_kernels``): Arrow-batched matrix ops for
   the brute-force top-k scan (the idiomatic Spark analogue of the
   reference's AVX2 SIMD kernels, distance/distance_amd64.go:19-27).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0  # distance/distance.go:31

# Bit-metric kernels walk (row x query) tiles of this shape: the uint64
# XOR + scratch buffers are 2 x 4096 x 128 x 8 B = 8 MB — small enough to
# stay near-cache under many concurrent workers (see numpy_distance_matrix).
_BIT_QUERY_CHUNK = 128
_BIT_ROW_BLOCK = 4096

# Column-expression tier ------------------------------------------------------


def as_double_array(c: Column | str) -> Column:
    """Cast array<float> to array<double> so arithmetic is double-precision
    (and bit-for-bit comparable with the DuckDB oracle)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def euclidean_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (reference ``euclidean``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_distance(a: Column, b: Column) -> Column:
    """Negated inner product: lower = closer."""
    return -_dot(a, b)


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - <a,b>; assumes unit vectors (normalize first otherwise)."""
    return F.lit(1.0) - _dot(a, b)


def l2_normalize(a: Column) -> Column:
    """a / ||a||_2 (null-safe: zero vectors stay zero).

    NOTE the norm aggregate sits inside the per-element ``transform``
    lambda, so interpreted HOF evaluation recomputes it for EVERY element —
    O(d^2) per row. Fine for one-off columns; on a hot frame use
    :func:`with_l2_normalized`, which stages the norm in its own projection
    (bit-identical results, measured 4.5x faster on 2000x64d)."""
    norm = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when(norm > 0, F.transform(a, lambda x: x / norm)).otherwise(a)


def with_l2_normalized(df, vec: Column, out: str):
    """``df`` plus column ``out`` = vec / ||vec||_2 (same null/zero semantics
    as :func:`l2_normalize`, bit-identical values: same left-fold sum of
    squares, same per-element division).

    The squared norm is computed in its OWN projection so the per-element
    division reads a row attribute; inlining it (as ``l2_normalize`` does)
    makes interpreted HOF evaluation recompute the whole aggregate per
    element — O(d^2) per row, measured 0.43 s vs 0.09 s for a 2000x64d scan
    (guide §1.2 step 2: per-task work). Catalyst keeps the projections
    split because the aggregate producer is non-cheap and referenced twice
    (CollapseProject's duplication guard)."""
    tmp_v, tmp_n = f"__{out}_v", f"__{out}_nsq"
    staged = df.withColumn(tmp_v, vec).withColumn(
        tmp_n, F.aggregate(F.col(tmp_v), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    res = staged.withColumn(
        out,
        F.when(
            F.col(tmp_n) > 0,
            F.transform(F.col(tmp_v), lambda x: x / F.sqrt(F.col(tmp_n))),
        ).otherwise(F.col(tmp_v)),
    )
    return res.drop(tmp_v, tmp_n)


def haversine_distance(a: Column, b: Column) -> Column:
    """Great-circle meters between [lat, lon] degree pairs."""
    lat_x = F.radians(F.element_at(a, 1))
    lon_x = F.radians(F.element_at(a, 2))
    lat_y = F.radians(F.element_at(b, 1))
    lon_y = F.radians(F.element_at(b, 2))
    sin_dlat = F.sin((lat_x - lat_y) / 2)
    sin_dlon = F.sin((lon_x - lon_y) / 2)
    h = sin_dlat * sin_dlat + F.cos(lat_x) * F.cos(lat_y) * sin_dlon * sin_dlon
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR over bit-packed long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double")


def jaccard_distance(a: Column, b: Column) -> Column:
    """1 - popcount(AND)/popcount(OR) over bit-packed long arrays; 0 when the
    union is empty (distance/distance.go:56-67)."""
    inter = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    union = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.when(union == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - inter.cast("double") / union.cast("double")
    )


_FLOAT_DISTANCES = {
    "euclidean": euclidean_sq,
    "dot": dot_distance,
    "cosine": cosine_distance,
    "haversine": haversine_distance,
}
_BIT_DISTANCES = {"hamming": hamming_distance, "jaccard": jaccard_distance}


def distance_expr(metric: str, a: Column, b: Column) -> Column:
    """Distance Column by metric name (reference GetFloatDistanceFn /
    GetBitDistanceFn, distance/distance.go:69-95)."""
    if metric in _FLOAT_DISTANCES:
        return _FLOAT_DISTANCES[metric](a, b)
    if metric in _BIT_DISTANCES:
        return _BIT_DISTANCES[metric](a, b)
    raise ValueError(f"unknown distance function: {metric}")


FLOAT_METRICS = tuple(_FLOAT_DISTANCES)
BIT_METRICS = tuple(_BIT_DISTANCES)


# NumPy batch-kernel tier -----------------------------------------------------


def numpy_distance_matrix(metric: str, data: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """(n, d) x (q, d) -> (n, q) distance matrix.

    Float metrics return float64; hamming returns exact integer counts as
    uint16 (4x less matrix traffic — every value is exactly representable
    in the float64 the serving paths ultimately emit).

    Vectorized matrix math over Arrow batches — the Spark analogue of the
    reference's SIMD kernels. Used by the partition-local top-k scan.
    """
    if metric in ("hamming", "jaccard"):
        # Bit metrics take packed words, NOT floats: a float64 round-trip
        # rounds away significant bits >= 2^53 and silently corrupts
        # popcounts. int64 -> uint64 via view keeps all 64 bits.
        # Query-chunked, word-at-a-time, with PREALLOCATED buffers and
        # in-place SWAR: the kernel is memory-bandwidth bound, and the
        # naive (n, chunk, words) tensor + fresh temporaries per op ran 5x
        # slower at 32-way worker parallelism.
        a, b = _as_uint64_words(data), _as_uint64_words(queries)
        n, w = a.shape
        qn = b.shape[0]
        if b.shape[1] != w:
            raise ValueError(
                f"bit-metric word-count mismatch: data has {w} packed words, "
                f"queries have {b.shape[1]}"
            )
        # Cache-blocked tiles: the (rows x queries) pair space is walked in
        # (_BIT_ROW_BLOCK x _BIT_QUERY_CHUNK) tiles whose XOR/scratch
        # buffers stay cache-resident, so the ~10 SWAR passes per tile cost
        # cache bandwidth, not RAM bandwidth — full-width chunks saturated
        # the memory bus under 32-way worker parallelism (17.8s/task for
        # work that runs in 0.74s solo). Hamming RESULTS are exact integer
        # counts (<= 64*words) returned as uint16: 4x less matrix traffic
        # for the downstream partition/compare, values exactly representable
        # in the float64 the callers ultimately emit.
        a_cols = [np.ascontiguousarray(a[:, wi]) for wi in range(w)]
        b_cols = [np.ascontiguousarray(b[:, wi]) for wi in range(w)]
        ch = min(_BIT_QUERY_CHUNK, qn) or 1
        rb = min(_BIT_ROW_BLOCK, n) or 1
        x = np.empty((rb, ch), dtype=np.uint64)
        t = np.empty((rb, ch), dtype=np.uint64)
        acc = np.empty((rb, ch), dtype=np.uint16)
        hamming = metric == "hamming"
        out = np.empty((n, qn), dtype=np.uint16 if hamming else np.float64)
        acc2 = None if hamming else np.empty((rb, ch), dtype=np.uint16)
        for r0 in range(0, n, rb):
            rh = min(rb, n - r0)
            for lo in range(0, qn, ch):
                width = min(ch, qn - lo)
                xv, tv = x[:rh, :width], t[:rh, :width]
                accv = acc[:rh, :width]
                accv[:] = 0
                if hamming:
                    for wi in range(w):
                        np.bitwise_xor(
                            a_cols[wi][r0 : r0 + rh, None],
                            b_cols[wi][lo : lo + width][None, :],
                            out=xv,
                        )
                        _popcount_inplace(xv, tv)
                        np.add(accv, xv, out=accv, casting="unsafe")
                    out[r0 : r0 + rh, lo : lo + width] = accv
                    continue
                unionv = acc2[:rh, :width]
                unionv[:] = 0
                for wi in range(w):
                    aw = a_cols[wi][r0 : r0 + rh, None]
                    bw = b_cols[wi][lo : lo + width][None, :]
                    np.bitwise_and(aw, bw, out=xv)
                    _popcount_inplace(xv, tv)
                    np.add(accv, xv, out=accv, casting="unsafe")
                    np.bitwise_or(aw, bw, out=xv)
                    _popcount_inplace(xv, tv)
                    np.add(unionv, xv, out=unionv, casting="unsafe")
                with np.errstate(divide="ignore", invalid="ignore"):
                    o = 1.0 - accv / unionv
                o[unionv == 0] = 0.0
                out[r0 : r0 + rh, lo : lo + width] = o
        return out
    data = np.asarray(data, dtype=np.float64)
    queries = np.asarray(queries, dtype=np.float64)
    if metric == "euclidean":
        # ||x-q||^2 = ||x||^2 - 2 x.q + ||q||^2 computed stably via cdist-style
        d2 = (
            (data * data).sum(axis=1)[:, None]
            - 2.0 * data @ queries.T
            + (queries * queries).sum(axis=1)[None, :]
        )
        return np.maximum(d2, 0.0)
    if metric == "dot":
        return -(data @ queries.T)
    if metric == "cosine":
        return 1.0 - data @ queries.T
    if metric == "haversine":
        lat_x, lon_x = np.radians(data[:, 0])[:, None], np.radians(data[:, 1])[:, None]
        lat_y, lon_y = np.radians(queries[:, 0])[None, :], np.radians(queries[:, 1])[None, :]
        sin_dlat = np.sin((lat_x - lat_y) / 2.0)
        sin_dlon = np.sin((lon_x - lon_y) / 2.0)
        h = sin_dlat**2 + np.cos(lat_x) * np.cos(lat_y) * sin_dlon**2
        return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(h, 1.0)))
    raise ValueError(f"unknown distance function: {metric}")


def _as_uint64_words(x) -> np.ndarray:
    """Coerce packed-word input to uint64 losslessly (int64 words from Spark
    arrive signed; a float detour would round bits >= 2^53)."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating):
        # caller handed floats — only exact for words < 2^53, best effort
        x = x.astype(np.int64)
    return x.astype(np.int64, copy=False).view(np.uint64)


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount_inplace(x: np.ndarray, t: np.ndarray) -> None:
    """SWAR 64-bit popcount of uint64 ``x`` IN PLACE (``t`` is a same-shape
    scratch buffer): ~7 elementwise ops per word with zero allocations —
    numpy < 2.0 has no np.bitwise_count, and both a shift-loop fallback
    (64 passes) and a fresh-temporary SWAR are bandwidth-bound disasters
    under 32-way worker parallelism."""
    np.right_shift(x, np.uint64(1), out=t)
    t &= _M1
    x -= t
    np.right_shift(x, np.uint64(2), out=t)
    t &= _M2
    x &= _M2
    x += t
    np.right_shift(x, np.uint64(4), out=t)
    x += t
    x &= _M4
    x *= _H01
    np.right_shift(x, np.uint64(56), out=x)


def _popcount(x: np.ndarray) -> np.ndarray:
    """Allocating popcount wrapper (tests / small inputs)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    x = np.ascontiguousarray(x).astype(np.uint64, copy=True)
    _popcount_inplace(x, np.empty_like(x))
    return x


def arrow_list_matrix(col, dtype=None) -> np.ndarray:
    """Arrow ``ListArray`` of uniform-length numeric lists -> ``(n, d)``
    ndarray without per-row Python objects.

    ``col.flatten()`` honors slice offsets and yields the contiguous child
    values — one zero-copy buffer view instead of the ``np.stack`` over n
    object arrays that dominates kernel time on 1M-row batches. Falls back
    to the object path for ragged lists or nulls (never expected from the
    isNotNull-filtered scans that feed the kernels, but correct if hit).
    """
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype or np.float64)
    if col.null_count == 0:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if (widths == widths[0]).all() and widths[0] > 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(n, int(widths[0]))
            return mat.astype(dtype, copy=False) if dtype is not None else mat
    mat = np.stack(
        [np.asarray(v, dtype=dtype) for v in col.to_pylist()]
    )
    return mat


def topk_per_group(
    group_keys: np.ndarray, primary: np.ndarray, tiebreak: np.ndarray, k: int
) -> np.ndarray:
    """Indices of the first-k rows per group under (primary asc, tiebreak
    asc) — the vectorized per-task trim used before a global top-k merge.
    Returns positions into the input arrays, grouped by key, sorted."""
    order = np.lexsort((tiebreak, primary, group_keys))
    gk = group_keys[order]
    starts = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1]])
    counts = np.diff(np.r_[starts, len(gk)])
    pos_in_group = np.arange(len(gk)) - np.repeat(starts, counts)
    return order[pos_in_group < k]


def id_order_ranks(ids: np.ndarray) -> np.ndarray:
    """Dense rank of each id under its natural sort order (lexical for
    strings, numeric for ints) — a NUMERIC tiebreak proxy valid within one
    batch. Composite (distance, rank) selection is then an all-numeric
    lexsort: exact-k per batch even when distances tie in the thousands
    (hamming has 65 distinct values; PQ codes duplicate across a clustered
    corpus), where tie-INCLUSIVE cuts ballooned and object-id lexsorts
    dominated the scan."""
    if ids.dtype == object:
        ids = ids.astype(str)
    order = np.argsort(ids, kind="stable")
    ranks = np.empty(len(ids), dtype=np.int64)
    ranks[order] = np.arange(len(ids), dtype=np.int64)
    return ranks


def python_distance(metric: str, x, y) -> float:
    """Scalar reference implementation for tests (mirrors puredist.go)."""
    return float(numpy_distance_matrix(metric, np.array([x]), np.array([y]))[0, 0])


def haversine_py(x, y) -> float:
    latx, lonx = math.radians(x[0]), math.radians(x[1])
    laty, lony = math.radians(y[0]), math.radians(y[1])
    sd_lat = math.sin((latx - laty) / 2)
    sd_lon = math.sin((lonx - lony) / 2)
    a = sd_lat * sd_lat + math.cos(latx) * math.cos(laty) * sd_lon * sd_lon
    return EARTH_RADIUS_M * 2 * math.asin(math.sqrt(a))
