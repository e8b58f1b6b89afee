"""Multi-tenancy / user-plan quota tests (reference models/userplan.go,
httpapi/middleware/appheaders.go, cluster/rpchandlers.go:168-180,
cluster/actions.go:190-198, shard/shard.go:287-291)."""

import pytest

from semadb_spark.tenancy import QuotaError, UserPlan, Workspace, resolve_plan

SCHEMA = {
    "v": {"type": "vectorFlat", "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"}},
    "tag": {"type": "string", "string": {}},
}

PLAN = UserPlan(
    name="basic",
    max_collections=2,
    max_collection_point_count=5,
    max_point_size=256,
    shard_backup_count=2,
)


def test_plan_resolution_parity():
    plans = {"BASIC": {"name": "basic", "maxCollections": 1,
                       "maxCollectionPointCount": 10, "maxPointSize": 100}}
    p = resolve_plan(plans, "BASIC")
    assert p.max_collections == 1 and p.max_point_size == 100
    with pytest.raises(ValueError, match="unknown user plan"):
        resolve_plan(plans, "NOPE")


def test_max_collections(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path), "alice", PLAN)
    ws.create_collection("a", SCHEMA)
    ws.create_collection("b", SCHEMA)
    with pytest.raises(QuotaError, match="maximum number of collections"):
        ws.create_collection("c", SCHEMA)
    assert ws.list_collections() == ["a", "b"]
    # another user's namespace is independent
    ws2 = Workspace(spark, str(tmp_path), "bob", PLAN)
    assert ws2.list_collections() == []
    ws2.create_collection("a", SCHEMA)
    # dropping frees the slot
    ws.drop_collection("b")
    ws.create_collection("c", SCHEMA)
    assert ws.list_collections() == ["a", "c"]


def test_max_collection_point_count(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path), "alice", PLAN)
    ws.create_collection("a", SCHEMA)
    pts = [{"v": [float(i), 0.0], "tag": "x"} for i in range(4)]
    assert ws.insert_points("a", pts) == 4
    with pytest.raises(QuotaError, match="point count"):
        ws.insert_points("a", [{"v": [9.0, 9.0]}, {"v": [8.0, 8.0]}])
    # exactly filling the quota is allowed
    assert ws.insert_points("a", [{"v": [7.0, 7.0]}]) == 1
    assert ws.get_collection("a").count() == 5


def test_max_point_size_encoded(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path), "alice", PLAN)
    ws.create_collection("a", SCHEMA)
    big = {"v": [1.0, 2.0], "blob": "x" * 500}  # msgpack-encoded > 256 bytes
    with pytest.raises(QuotaError, match="maximum point size"):
        ws.insert_points("a", [{"v": [0.0, 0.0]}, big])
    assert ws.get_collection("a").count() == 0  # nothing partially inserted


def test_insert_df_point_count_quota(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path), "alice", PLAN)
    ws.create_collection("a", SCHEMA)
    df = spark.createDataFrame(
        [(str(i), [float(i), 0.0], None) for i in range(6)],
        "_id string, v array<float>, tag string",
    )
    with pytest.raises(QuotaError, match="point count"):
        ws.insert_df("a", df)
    assert ws.insert_df("a", df.limit(5)) == 5


def test_backup_policy_rotates_to_plan_count(spark, tmp_path):
    ws = Workspace(spark, str(tmp_path), "alice", PLAN)
    coll = ws.create_collection("a", SCHEMA)
    for i in range(4):  # four snapshots beyond the initial empty one
        ws.insert_points("a", [{"v": [float(i), 0.0]}])
    removed = ws.apply_backup_policy("a")
    assert len(removed) >= 1
    import os

    for v in removed:
        assert not os.path.exists(os.path.join(coll.path, f"v{v}"))
    # collection still reads fully after rotation
    assert ws.get_collection("a").count() == 4


def test_workspace_full_lifecycle(spark, tmp_path):
    """create -> insert -> search -> update -> delete entirely through the
    Workspace facade (the v2 request lifecycle, SURVEY §3)."""
    ws = Workspace(spark, str(tmp_path), "u1", plan=PLAN)
    ws.create_collection("prods", {
        "category": {"type": "string", "string": {"caseSensitive": False}},
    })
    ida = "00000000-0000-4000-8000-00000000000a"
    idb = "00000000-0000-4000-8000-00000000000b"
    ws.insert_points("prods", [
        {"_id": ida, "category": "shoes"},
        {"_id": idb, "category": "hats"},
    ])
    hits = ws.search("prods", {"query": {"property": "category", "string": {
        "operator": "equals", "value": "SHOES"}}, "limit": 5}).collect()
    assert [r["_id"] for r in hits] == [ida]
    updated = ws.update_points("prods", [{"_id": idb, "category": "caps"}])
    assert updated == [idb]
    hits2 = ws.search("prods", {"query": {"property": "category", "string": {
        "operator": "equals", "value": "caps"}}, "limit": 5}).collect()
    assert [r["_id"] for r in hits2] == [idb]
    assert ws.delete_points("prods", [ida, "00000000-0000-4000-8000-0000000000ff"]) == [ida]
    assert ws.get_collection("prods").count() == 1


def test_update_points_batch_cap_and_size(spark, tmp_path):
    """UpdatePointsRequest validations (httpapi/v2/handlers.go:314,356):
    1..100 points per batch, each re-checked against maxPointSize — without
    the size check a tenant could update small points into large ones."""
    ws = Workspace(spark, str(tmp_path), "alice", PLAN)
    ws.create_collection("a", SCHEMA)
    pid = "00000000-0000-4000-8000-000000000001"
    ws.insert_points("a", [{"_id": pid, "v": [1.0, 2.0], "tag": "small"}])
    with pytest.raises(ValueError, match="1..100"):
        ws.update_points("a", [])
    with pytest.raises(ValueError, match="1..100"):
        ws.update_points(
            "a", [{"_id": pid, "tag": f"t{i}"} for i in range(101)]
        )
    with pytest.raises(QuotaError, match="maximum point size"):
        ws.update_points("a", [{"_id": pid, "tag": "x" * 500}])
    # the rejected oversize update must not have partially applied
    hits = ws.search("a", {"query": {"property": "tag", "string": {
        "operator": "equals", "value": "small"}}, "limit": 5}).collect()
    assert [r["_id"] for r in hits] == [pid]
