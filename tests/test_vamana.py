"""Vamana build/delete tests mirroring the reference invariants:
connectivity from the start node after build and after delete
(vamana_test.go:29-46 checkConnectivity), recall vs the exact oracle
(vamana_test.go:230-253 requires >= limit/2 true neighbours), degree bound
respected everywhere."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semadb_spark.operators import vamana as vm
from semadb_spark.operators.knn import knn_topk


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


@pytest.fixture(scope="module")
def index(emb):
    return vm.vamana_build(
        emb, "v", "_id", degree_bound=32, alpha=1.2, search_size=40, num_shards=3, seed=7
    )


def _export(index, emb):
    adj: dict[str, list[str]] = {}
    for r in index.edges.collect():
        adj.setdefault(r.src, []).append(r.dst)
    vectors = {r._id: np.asarray(r.v, dtype=np.float64) for r in emb.collect()}
    return adj, vectors


def test_degree_bound_and_edge_sanity(index, emb):
    deg = index.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg <= 32
    n = emb.count()
    assert index.edges.count() <= n * 32
    # no self loops
    assert index.edges.filter(F.col("src") == F.col("dst")).count() == 0


def test_connectivity_from_entry(index, emb):
    adj, vectors = _export(index, emb)
    reachable = vm.bfs_reachable(adj, index.entry_id)
    assert len(reachable) == len(vectors)  # every point searchable


def test_recall_vs_exact(index, emb):
    adj, vectors = _export(index, emb)
    ids = sorted(vectors)[:10]
    total, hit = 0, 0
    for qid in ids:
        q = vectors[qid]
        approx = {i for i, _ in vm.beam_search(adj, vectors, index.entry_id, q, 10, index.search_size)}
        exact = {r._id for r in knn_topk(emb, "v", [float(x) for x in q], "euclidean", 10).collect()}
        hit += len(approx & exact)
        total += len(exact)
        assert len(approx & exact) >= 5  # reference floor: limit/2
    assert hit / total >= 0.8  # aggregate recall well above the floor


def test_delete_repairs_graph(spark, index, emb):
    victims = [r._id for r in emb.orderBy("_id").limit(5).collect() if r._id != index.entry_id][:3]
    pruned = vm.vamana_delete(index, emb, victims, vec_col="v", id_col="_id")
    # deleted ids gone from both edge endpoints
    assert pruned.edges.filter(
        F.col("src").isin(victims) | F.col("dst").isin(victims)
    ).count() == 0
    # degree bound still respected
    deg = pruned.edges.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert deg <= 32
    # still fully connected over the surviving nodes
    adj: dict[str, list[str]] = {}
    for r in pruned.edges.collect():
        adj.setdefault(r.src, []).append(r.dst)
    survivors = {r._id for r in emb.collect()} - set(victims)
    reachable = vm.bfs_reachable(adj, index.entry_id)
    assert reachable == survivors


def test_delete_entry_rejected(index, emb):
    with pytest.raises(ValueError, match="entry node"):
        vm.vamana_delete(index, emb, [index.entry_id], vec_col="v", id_col="_id")
