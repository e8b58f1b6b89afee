"""Distance kernel parity tests (mirrors reference distance/distance_test.go:
pure vs SIMD equality + known-value cases incl. haversine London-Paris)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from semadb_spark.functions import distances as D


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        ("a", [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        ("b", [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),
        ("c", [-1.5, 2.5, 0.5], [0.5, -0.5, 1.5]),
    ]
    return spark.createDataFrame(rows, "id string, x array<double>, y array<double>")


def _one(df, expr):
    return {r["id"]: r["d"] for r in df.select("id", expr.alias("d")).collect()}


def test_euclidean_is_squared(vec_df):
    got = _one(vec_df, D.euclidean_sq(F.col("x"), F.col("y")))
    assert got["a"] == pytest.approx(27.0)  # (3^2)*3, squared — no sqrt
    assert got["b"] == pytest.approx(3.0)


def test_dot_is_negated(vec_df):
    got = _one(vec_df, D.dot_distance(F.col("x"), F.col("y")))
    assert got["a"] == pytest.approx(-32.0)


def test_cosine(vec_df):
    got = _one(vec_df, D.cosine_distance(F.col("x"), F.col("y")))
    assert got["a"] == pytest.approx(1.0 - 32.0)


def test_haversine_london_paris(spark):
    # Reference test case distance/distance_test.go: London -> Paris ~343.5km
    df = spark.createDataFrame(
        [([51.5007, -0.1246], [48.8567, 2.3508])], "x array<double>, y array<double>"
    )
    got = df.select(D.haversine_distance(F.col("x"), F.col("y")).alias("d")).first()["d"]
    assert got == pytest.approx(343_500, rel=0.01)
    assert got == pytest.approx(D.haversine_py([51.5007, -0.1246], [48.8567, 2.3508]))


def test_hamming_jaccard(spark):
    df = spark.createDataFrame(
        [([0b1100, 0b1010], [0b1010, 0b1010])], "x array<long>, y array<long>"
    )
    got = df.select(
        D.hamming_distance(F.col("x"), F.col("y")).alias("h"),
        D.jaccard_distance(F.col("x"), F.col("y")).alias("j"),
    ).first()
    assert got["h"] == 2.0  # 1100^1010 = 0110 -> 2 bits
    # AND: 1000,1010 -> 3 bits; OR: 1110,1010 -> 5 bits
    assert got["j"] == pytest.approx(1 - 3 / 5)


def test_jaccard_empty_union(spark):
    df = spark.createDataFrame([([0, 0], [0, 0])], "x array<long>, y array<long>")
    assert df.select(D.jaccard_distance(F.col("x"), F.col("y")).alias("j")).first()["j"] == 0.0


def test_numpy_matches_column_exprs(spark, vec_df):
    rows = vec_df.collect()
    for metric in ("euclidean", "dot", "cosine"):
        col = _one(vec_df, D.distance_expr(metric, F.col("x"), F.col("y")))
        for r in rows:
            np_val = D.python_distance(metric, r["x"], r["y"])
            assert np_val == pytest.approx(col[r["id"]], rel=1e-12, abs=1e-12)


def test_numpy_matrix_shapes():
    data = np.random.RandomState(0).rand(50, 8)
    queries = np.random.RandomState(1).rand(5, 8)
    for metric in ("euclidean", "dot", "cosine", "haversine"):
        d = data[:, :2] if metric == "haversine" else data
        q = queries[:, :2] if metric == "haversine" else queries
        m = D.numpy_distance_matrix(metric, d, q)
        assert m.shape == (50, 5)
        assert np.isfinite(m).all()
    if hasattr(np, "bitwise_count") or True:
        bits = np.array([[12, 10]], dtype=np.float64)
        qb = np.array([[10, 10]], dtype=np.float64)
        assert D.numpy_distance_matrix("hamming", bits, qb)[0, 0] == 2.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "x array<double>")
    rows = df.select(D.l2_normalize(F.col("x")).alias("n")).collect()
    assert rows[0]["n"] == pytest.approx([0.6, 0.8])
    assert rows[1]["n"] == [0.0, 0.0]
    norm = sum(v * v for v in rows[0]["n"])
    assert math.isclose(norm, 1.0)


def test_bit_metrics_high_words_exact():
    # int64 words with significant bits >= 2^53 must not round through
    # float64: two words differing only in the low bit, with bit 62 set.
    a = np.array([[(1 << 62) | 1]], dtype=np.int64)
    b = np.array([[1 << 62]], dtype=np.int64)
    assert D.numpy_distance_matrix("hamming", a, b)[0, 0] == 1.0
    # jaccard: |AND|=1 (bit 62), |OR|=2 -> 0.5
    assert D.numpy_distance_matrix("jaccard", a, b)[0, 0] == 0.5
    # negative int64 (bit 63 set when packed) round-trips via uint64 view
    neg = np.array([[-(2**63)]], dtype=np.int64)  # only bit 63 set
    zero = np.array([[0]], dtype=np.int64)
    assert D.numpy_distance_matrix("hamming", neg, zero)[0, 0] == 1.0
