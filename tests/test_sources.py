"""S1 ingest-path tests mirroring the reference's decode/validation cases
(httpapi/v2/handlers_test.go invalid-payload cases, models/index.go
CheckCompatibleMap coercions, models/point.go _id extraction)."""

import json

import pytest

from semadb_spark.schema import IndexSchema
from semadb_spark.sources.points import (
    PointValidationError,
    coerce_point,
    extract_id,
    points_to_df,
    read_json_points,
)

SCHEMA = IndexSchema.from_json(
    {
        "vec": {"type": "vectorFlat", "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"}},
        "desc": {"type": "text", "text": {}},
        "category": {"type": "string", "string": {}},
        "size": {"type": "integer", "integer": {}},
        "price": {"type": "float", "float": {}},
        "tags": {"type": "stringArray", "stringArray": {}},
        "nested.score": {"type": "integer", "integer": {}},
    }
)


def test_coerce_happy_path_with_json_numbers():
    # JSON decodes every number as float: ints arrive as floats (index.go:196-210)
    p = coerce_point(
        {"vec": [1, 2.5], "size": 42.0, "price": 3, "tags": ["a", "b"], "extra": "kept"},
        SCHEMA,
    )
    assert p["vec"] == [1.0, 2.5]
    assert p["size"] == 42 and isinstance(p["size"], int)
    assert p["price"] == 3.0 and isinstance(p["price"], float)
    assert p["extra"] == "kept"  # unknown fields pass (schemaless payload)


def test_coerce_missing_properties_skip():
    assert coerce_point({"size": 1}, SCHEMA)["size"] == 1  # nothing else required


@pytest.mark.parametrize(
    "bad",
    [
        {"vec": [1.0]},  # wrong size
        {"vec": "memes"},  # convertToVector error case (index.go:76-80)
        {"vec": [1.0, "x"]},
        {"desc": 7},
        {"category": True},
        {"size": "big"},
        {"size": True},  # bool is not an integer
        {"price": "cheap"},
        {"tags": ["a", 1]},
        {"nested": {"score": "high"}},
        {"nested": "flat"},  # expected nested map
    ],
)
def test_coerce_rejects(bad):
    with pytest.raises(PointValidationError):
        coerce_point(bad, SCHEMA)


def test_coerce_nested_dotted():
    p = coerce_point({"nested": {"score": 9.0, "other": "x"}}, SCHEMA)
    assert p["nested"]["score"] == 9 and p["nested"]["other"] == "x"


def test_extract_id():
    assert extract_id({"_id": "b0d8c9e0-6f0a-4f9b-a0c6-2f3d4e5a6b7c"}).startswith("b0d8c9e0")
    generated = extract_id({})
    assert len(generated) == 36
    with pytest.raises(PointValidationError, match="invalid id format"):
        extract_id({"_id": "not-a-uuid"})
    with pytest.raises(PointValidationError, match="invalid id type"):
        extract_id({"_id": 5})
    with pytest.raises(PointValidationError, match="missing _id"):
        extract_id({}, create_new=False)


def test_points_to_df_typed_and_payload(spark):
    df = points_to_df(
        spark,
        [
            {"vec": [1, 2], "size": 5.0, "note": {"a": 1}},
            {"_id": "b0d8c9e0-6f0a-4f9b-a0c6-2f3d4e5a6b7c", "category": "x"},
        ],
        SCHEMA,
    )
    rows = {(r.size, r.category): r for r in df.collect()}
    assert df.schema["size"].dataType.typeName() == "long"
    assert df.schema["vec"].dataType.simpleString() == "array<float>"
    r0 = rows[(5, None)]
    assert json.loads(r0.payload["note"]) == {"a": 1}
    assert rows[(None, "x")]._id == "b0d8c9e0-6f0a-4f9b-a0c6-2f3d4e5a6b7c"


def test_points_to_df_batch_bounds(spark):
    with pytest.raises(PointValidationError, match="batch size"):
        points_to_df(spark, [], SCHEMA)


def test_read_json_points(spark, tmp_path):
    path = str(tmp_path / "pts.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"_id": "b0d8c9e0-6f0a-4f9b-a0c6-2f3d4e5a6b7c", "vec": [1, 2], "size": 3}) + "\n")
        f.write(json.dumps({"vec": [4, 5], "price": 9.5}) + "\n")
    df = read_json_points(spark, path, SCHEMA)
    assert df.count() == 2
    assert df.filter("_id is null").count() == 0  # generated where missing
    assert df.schema["vec"].dataType.simpleString() == "array<float>"

    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as f:
        f.write(json.dumps({"vec": [1, 2, 3]}) + "\n")
    with pytest.raises(PointValidationError, match="vector of size 2"):
        read_json_points(spark, bad, SCHEMA)


def test_load_hdf5_import_gated(spark):
    """S6: the HDF5 bench loader raises a clear error without h5py (the
    optional dependency is absent in this environment by design)."""
    import pytest as _pytest

    from semadb_spark.sources.hdf5 import load_hdf5

    try:
        import h5py  # noqa: F401

        _pytest.skip("h5py present; loader exercised in environments with it")
    except ImportError:
        pass
    with _pytest.raises(ImportError, match="h5py"):
        load_hdf5(spark, "/nonexistent.hdf5")
