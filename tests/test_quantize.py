"""Quantizer tests: BQ known-value packing/distances (mirrors
distance/distance_test.go known-value cases + binary.go encode docs) and PQ
recall vs the exact brute-force oracle (the reference's Test_Recall pattern,
shard/index/flat/flat_test.go:134-191)."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from semadb_spark.operators.knn import knn_topk
from semadb_spark.operators.quantize import (
    PQCodebooks,
    bq_encode,
    bq_fit,
    bq_topk,
    bq_topk_batch,
    encode_bits_np,
    pq_adc_table,
    pq_adc_topk,
    pq_centroid_dists,
    pq_encode,
    pq_fit,
)


def test_pack_bits_known_values():
    # binary.go:113-121 example: threshold 0.5, [0.1, 0.6, 0.7, 0.4] -> 0110
    code = encode_bits_np(np.array([[0.1, 0.6, 0.7, 0.4]]), np.float64(0.5))
    assert code.shape == (1, 1) and code[0, 0] == 0b0110
    # strict inequality: v == threshold -> bit 0
    code = encode_bits_np(np.array([[0.5, 0.6]]), np.float64(0.5))
    assert code[0, 0] == 0b10
    # >64 dims spills into a second word, LSB-first
    v = np.zeros((1, 65))
    v[0, 64] = 1.0
    code = encode_bits_np(v, np.float64(0.5))
    assert code.shape == (1, 2) and code[0, 0] == 0 and code[0, 1] == 1
    # bit 63 exercises the sign bit of the int64 view
    v = np.zeros((1, 64))
    v[0, 63] = 1.0
    assert encode_bits_np(v, np.float64(0.5))[0, 0] == np.int64(-(2**63))


def test_bq_fit_is_per_dim_mean(spark):
    df = spark.createDataFrame(
        [Row(v=[0.0, 4.0]), Row(v=[2.0, 0.0]), Row(v=[4.0, 2.0])]
    ).repartition(3)
    thr = bq_fit(df, "v")
    assert np.allclose(thr, [2.0, 2.0])


def test_bq_hamming_topk_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    vecs = rng.random((60, 32))
    df = spark.createDataFrame(
        [Row(_id=f"{i:03d}", v=[float(x) for x in vecs[i]]) for i in range(60)]
    )
    thr = bq_fit(df, "v")
    codes = bq_encode(df, "v", thr)
    q = vecs[0]
    got = bq_topk(codes, "bq_code", q, thr, "hamming", 10).select("_id", "_distance").collect()
    # numpy oracle
    bits = vecs > thr
    qbits = q > thr
    dists = (bits != qbits).sum(axis=1)
    order = sorted(range(60), key=lambda i: (dists[i], f"{i:03d}"))[:10]
    assert [r._id for r in got] == [f"{i:03d}" for i in order]
    assert [int(r._distance) for r in got] == [int(dists[i]) for i in order]


def test_bq_topk_batch_full_oversample_is_exact(spark):
    # with the candidate pool covering the whole table, oversample+rerank
    # degenerates to the exact scan — results must match knn_topk exactly
    rng = np.random.default_rng(11)
    vecs = rng.random((50, 16))
    df = spark.createDataFrame(
        [Row(_id=f"{i:03d}", v=[float(x) for x in vecs[i]]) for i in range(50)]
    )
    thr = bq_fit(df, "v")
    codes = bq_encode(df, "v", thr).select("_id", "bq_code")
    queries = [("q0", [float(x) for x in vecs[3]]), ("q1", [float(x) for x in vecs[17]])]
    got = (
        bq_topk_batch(codes, "bq_code", df, "v", queries, thr, 5, oversample=10)
        .orderBy("query_id", "_rank")
        .collect()
    )
    for qid, qv in queries:
        exact = knn_topk(df, "v", qv, "euclidean", 5).select("_id", "_distance").collect()
        mine = [r for r in got if r.query_id == qid]
        assert [r._id for r in mine] == [r._id for r in exact]
        assert np.allclose([r._distance for r in mine], [r._distance for r in exact])


def test_bq_topk_batch_partial_oversample_recall(spark):
    # modest oversample on clustered data should beat raw-hamming recall
    rng = np.random.default_rng(23)
    centers = rng.normal(size=(4, 24))
    vecs = centers[np.arange(200) % 4] + rng.normal(scale=0.3, size=(200, 24))
    df = spark.createDataFrame(
        [Row(_id=f"{i:03d}", v=[float(x) for x in vecs[i]]) for i in range(200)]
    )
    thr = bq_fit(df, "v")
    codes = bq_encode(df, "v", thr).select("_id", "bq_code")
    q = [float(x) for x in (centers[1] + rng.normal(scale=0.3, size=24))]
    got = bq_topk_batch(codes, "bq_code", df, "v", [("q", q)], thr, 10, oversample=8)
    exact_ids = {r._id for r in knn_topk(df, "v", q, "euclidean", 10).collect()}
    got_ids = {r._id for r in got.collect()}
    assert len(got_ids & exact_ids) >= 7  # >=0.7 recall with 8x oversample


def test_bq_jaccard_known_values(spark):
    # jaccard = 1 - |AND|/|OR| (distance.go:56-67); binarized at 0.5
    df = spark.createDataFrame(
        [
            Row(_id="same", v=[1.0, 1.0, 0.0, 0.0]),
            Row(_id="half", v=[1.0, 0.0, 1.0, 0.0]),
            Row(_id="disj", v=[0.0, 0.0, 1.0, 1.0]),
            Row(_id="zero", v=[0.0, 0.0, 0.0, 0.0]),
        ]
    )
    codes = bq_encode(df, "v", 0.5)
    got = {
        r._id: r._distance
        for r in bq_topk(codes, "bq_code", [1.0, 1.0, 0.0, 0.0], 0.5, "jaccard", 4).collect()
    }
    assert got["same"] == 0.0
    assert got["half"] == pytest.approx(1 - 1 / 3)
    assert got["disj"] == 1.0
    assert got["zero"] == 1.0  # union non-empty (query bits), no overlap
    # union empty only when BOTH sides are zero (distance.go:62-64)
    got0 = {
        r._id: r._distance
        for r in bq_topk(codes, "bq_code", [0.0, 0.0, 0.0, 0.0], 0.5, "jaccard", 4).collect()
    }
    assert got0["zero"] == 0.0


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select(F.col("vec_id").cast("string").alias("_id"), F.col("embedding").alias("v"))
    )
    df.cache().count()
    yield df
    df.unpersist()


def test_pq_encode_shape_and_range(spark, emb):
    books = pq_fit(emb, "v", num_subvectors=8, num_centroids=16, seed=1)
    assert books.centroids.shape == (8, 16, 8)
    codes = pq_encode(emb, "v", books).select("pq_code").collect()
    arr = np.array([r.pq_code for r in codes])
    assert arr.shape[1] == 8
    assert arr.min() >= 0 and arr.max() < 16


def test_pq_adc_recall_vs_exact(spark, emb):
    """Reference accepts >= limit/2 true neighbours (vamana_test.go:230-253);
    PQ is lossier than the graph so we assert the same floor at k=10."""
    books = pq_fit(emb, "v", num_subvectors=8, num_centroids=16, seed=1)
    codes = pq_encode(emb, "v", books).cache()
    q = [float(x) for x in emb.filter(F.col("_id") == "7").head()[1]]
    approx = {r._id for r in pq_adc_topk(codes, "pq_code", books, q, 10).collect()}
    exact = {r._id for r in knn_topk(emb, "v", q, "euclidean", 10).collect()}
    assert len(approx & exact) >= 5
    codes.unpersist()


def test_pq_adc_topk_batch_matches_single_query(spark, emb):
    from semadb_spark.operators.quantize import pq_adc_topk_batch

    books = pq_fit(emb, "v", num_subvectors=8, num_centroids=16, seed=1)
    codes = pq_encode(emb, "v", books).cache()
    queries = []
    for qid in ("3", "7", "11"):
        queries.append((f"q{qid}", [float(x) for x in emb.filter(F.col("_id") == qid).head()[1]]))
    batch = pq_adc_topk_batch(codes, "pq_code", books, queries, 5)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r._id, r._distance))
    for qid, qv in queries:
        single = [
            (r._id, r._distance)
            for r in pq_adc_topk(codes, "pq_code", books, qv, 5).collect()
        ]
        mine = sorted(got[qid], key=lambda t: (t[1], t[0]))
        assert [t[0] for t in mine] == [t[0] for t in single]
        assert np.allclose([t[1] for t in mine], [t[1] for t in single])
    codes.unpersist()


def test_pq_adc_self_distance_smallest(spark, emb):
    books = pq_fit(emb, "v", num_subvectors=8, num_centroids=16, seed=1)
    codes = pq_encode(emb, "v", books)
    q = [float(x) for x in emb.filter(F.col("_id") == "3").head()[1]]
    top = pq_adc_topk(codes, "pq_code", books, q, 3).collect()
    assert "3" in {r._id for r in top}


def test_pq_dot_metric_and_centroid_dists():
    rng = np.random.default_rng(3)
    cents = rng.random((2, 4, 3))
    books = PQCodebooks(centroids=cents, metric="dot")
    q = rng.random(6)
    table = pq_adc_table(books, q)
    assert table.shape == (2, 4)
    assert table[0, 1] == pytest.approx(-(q[:3] @ cents[0, 1]))
    cd = pq_centroid_dists(books)
    assert cd.shape == (2, 4, 4)
    assert cd[1, 0, 2] == pytest.approx(-(cents[1, 0] @ cents[1, 2]))


def test_pq_rejects_bad_params(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(emb, "v", num_subvectors=7, num_centroids=4)
    with pytest.raises(ValueError, match="metric"):
        pq_fit(emb, "v", num_subvectors=8, num_centroids=4, metric="hamming")


# -- schema-declared quantized serving (vectorstore.go:75+) -------------------


def test_quantizer_schema_validation():
    from semadb_spark.schema import IndexSchema

    ok = {
        "v": {"type": "vectorFlat", "vectorFlat": {
            "vectorSize": 4, "distanceMetric": "euclidean",
            "quantizer": {"type": "binary", "binary": {"threshold": 0.0, "distanceMetric": "hamming"}},
        }}
    }
    assert IndexSchema.from_json(ok)["v"].quantizer["type"] == "binary"
    bad_cases = [
        {"type": "nope"},
        {"type": "binary"},  # params missing (quantizer.go:16-18)
        {"type": "binary", "binary": {"distanceMetric": "euclidean"}},
        {"type": "product"},
        {"type": "product", "product": {"numCentroids": 1, "numSubVectors": 4, "triggerThreshold": 2000}},
        {"type": "product", "product": {"numCentroids": 16, "numSubVectors": 1, "triggerThreshold": 2000}},
        {"type": "product", "product": {"numCentroids": 16, "numSubVectors": 4, "triggerThreshold": 10}},
    ]
    for q in bad_cases:
        bad = {"v": {"type": "vectorFlat", "vectorFlat": {
            "vectorSize": 4, "distanceMetric": "euclidean", "quantizer": q}}}
        with pytest.raises(ValueError):
            IndexSchema.from_json(bad)
    # type "none" = plain serving
    none = {"v": {"type": "vectorFlat", "vectorFlat": {
        "vectorSize": 4, "distanceMetric": "euclidean", "quantizer": {"type": "none"}}}}
    assert IndexSchema.from_json(none)["v"].quantizer is None


def test_quantized_serving_via_collection(spark, tmp_path):
    # End-to-end: schema declares a binary quantizer; after
    # build_quantized_index, search serves from the persisted codes with
    # quantized (hamming) distances — including the pre-filtered path.
    from semadb_spark.collection import Collection

    rng = np.random.default_rng(9)
    X = rng.normal(size=(120, 8))
    rows = [Row(_id=f"{i:03d}", v=[float(x) for x in X[i]], grp=int(i % 3)) for i in range(120)]
    schema = {
        "v": {"type": "vectorFlat", "vectorFlat": {
            "vectorSize": 8, "distanceMetric": "euclidean",
            "quantizer": {"type": "binary", "binary": {"threshold": 0.0, "distanceMetric": "hamming"}},
        }},
        "grp": {"type": "integer"},
    }
    coll = Collection.create(spark, str(tmp_path / "qcoll"), schema, num_buckets=4)
    coll.insert(spark.createDataFrame(rows))
    assert coll.build_quantized_index("v") == "binary"

    req = {"query": {"property": "v", "vectorFlat": {"vector": [float(x) for x in X[5]], "operator": "near", "limit": 10}}}
    got = coll.search(req).select("_id", "_distance").collect()
    # quantized self-distance is 0 and distances are integer-valued hamming
    assert got[0]["_id"] == "005" and got[0]["_distance"] == 0.0
    assert all(float(r["_distance"]).is_integer() for r in got)
    # oracle: brute-force hamming over sign bits
    bits = X > 0.0
    qb = bits[5]
    hd = (bits != qb).sum(axis=1)
    best = sorted(range(120), key=lambda i: (hd[i], f"{i:03d}"))[:10]
    assert [r["_id"] for r in got] == [f"{i:03d}" for i in best]

    # filtered quantized search: results restricted to grp == 1
    freq = {"query": {"property": "v", "vectorFlat": {
        "vector": [float(x) for x in X[5]], "operator": "near", "limit": 5,
        "filter": {"property": "grp", "integer": {"operator": "equals", "value": 1}},
    }}}
    fgot = coll.search(freq).select("_id").collect()
    assert all(int(r["_id"]) % 3 == 1 for r in fgot) and len(fgot) == 5


def test_pq_serving_via_collection(spark, tmp_path):
    from semadb_spark.collection import Collection
    from semadb_spark.operators.knn import knn_topk

    rng = np.random.default_rng(4)
    X = rng.normal(size=(300, 16))
    rows = [Row(_id=f"{i:03d}", v=[float(x) for x in X[i]]) for i in range(300)]
    schema = {
        "v": {"type": "vectorFlat", "vectorFlat": {
            "vectorSize": 16, "distanceMetric": "euclidean",
            "quantizer": {"type": "product", "product": {
                "numCentroids": 32, "numSubVectors": 4, "triggerThreshold": 1000}},
        }},
    }
    coll = Collection.create(spark, str(tmp_path / "pqcoll"), schema, num_buckets=4)
    coll.insert(spark.createDataFrame(rows))
    assert coll.build_quantized_index("v") == "product"
    req = {"query": {"property": "v", "vectorFlat": {"vector": [float(x) for x in X[9]], "operator": "near", "limit": 10}}}
    got = {r["_id"] for r in coll.search(req).select("_id").collect()}
    exact = {r["_id"] for r in knn_topk(coll.df(), "v", [float(x) for x in X[9]], "euclidean", 10).collect()}
    # ADC recall well above chance (10/300); codes-only serving works
    assert len(got & exact) >= 3


def test_pq_topk_batch_rerank_matches_exact(spark, emb):
    # with enough oversample the reranked result IS the exact top-k: the
    # pool contains the true neighbours and the rerank orders them exactly
    from semadb_spark.operators.quantize import pq_topk_batch

    books = pq_fit(emb, "v", num_subvectors=8, num_centroids=16, seed=1)
    codes = pq_encode(emb, "v", books).cache()
    queries = []
    for qid in ("3", "11"):
        queries.append((f"q{qid}", [float(x) for x in emb.filter(F.col("_id") == qid).head()[1]]))
    out = pq_topk_batch(codes.select("_id", "pq_code"), "pq_code", emb, "v", books, queries, 5, oversample=20)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r._distance, r._id))
    for qid, qv in queries:
        exact = [r._id for r in knn_topk(emb, "v", qv, "euclidean", 5).collect()]
        mine = [i for _, i in sorted(got[qid])]
        assert len(set(mine) & set(exact)) >= 4, (qid, mine, exact)
    codes.unpersist()
