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


def test_msgpack_codec_roundtrip_all_families():
    from semadb_spark.sources import msgpack_codec as mp

    cases = [
        None,
        True,
        False,
        0,
        1,
        127,
        128,
        255,
        256,
        65535,
        65536,
        2**32,
        2**64 - 1,
        -1,
        -32,
        -33,
        -128,
        -129,
        -32768,
        -32769,
        -(2**31) - 1,
        -(2**63),
        3.14159,
        -0.0,
        "",
        "a" * 31,
        "a" * 32,
        "a" * 256,
        "ünïcôde 中文",
        b"",
        b"\x00\xff" * 200,
        [],
        [1, "two", [3.0, None]],
        list(range(20)),  # > fixarray
        {},
        {"k": "v", "n": {"deep": [1, 2]}},
        {f"k{i}": i for i in range(20)},  # > fixmap
    ]
    for c in cases:
        assert mp.unpackb(mp.packb(c)) == c, c
    # known-value spot checks against the public spec examples
    assert mp.packb(None) == b"\xc0"
    assert mp.packb(7) == b"\x07"
    assert mp.packb(-3) == b"\xfd"
    assert mp.packb("abc") == b"\xa3abc"
    assert mp.packb([1, 2]) == b"\x92\x01\x02"
    assert mp.unpackb(b"\xca\x3f\x80\x00\x00") == 1.0  # float32
    assert mp.unpackb(b"\xd4\x05\x2a") == mp.ExtType(5, b"\x2a")  # fixext1
    with pytest.raises(mp.MsgpackError):
        mp.unpackb(b"\x92\x01")  # truncated array
    with pytest.raises(mp.MsgpackError):
        mp.unpackb(b"\x01\x02")  # trailing bytes


def test_points_from_msgpack_parity_with_json(spark):
    """The msgpack body flows through the identical coercion path as JSON —
    round-trip every coercion case (httpapi/utils/encdec.go parity)."""
    from semadb_spark.sources import msgpack_codec as mp
    from semadb_spark.sources.points import points_from_msgpack

    good = [
        {"vec": [1, 2.5], "size": 42.0, "price": 3, "tags": ["a", "b"], "extra": "kept"},
        {"_id": "b0d8c9e0-6f0a-4f9b-a0c6-2f3d4e5a6b7c", "category": "x"},
        {"nested": {"score": 9.0, "other": "x"}},
    ]
    df = points_from_msgpack(spark, mp.packb({"points": good}), SCHEMA)
    ref = points_to_df(spark, [dict(p) for p in good], SCHEMA)
    assert df.schema == ref.schema
    got = {r.category: r for r in df.collect()}
    assert got["x"]._id == "b0d8c9e0-6f0a-4f9b-a0c6-2f3d4e5a6b7c"
    assert df.count() == 3

    # bare-list body also accepted
    assert points_from_msgpack(spark, mp.packb(good), SCHEMA).count() == 3

    # every JSON reject case rejects identically via msgpack
    rejects = [
        {"vec": [1.0]},
        {"vec": "memes"},
        {"vec": [1.0, "x"]},
        {"desc": 7},
        {"category": True},
        {"size": "big"},
        {"size": True},
        {"price": "cheap"},
        {"tags": ["a", 1]},
        {"nested": {"score": "high"}},
        {"nested": "flat"},
    ]
    for bad in rejects:
        with pytest.raises(PointValidationError):
            points_from_msgpack(spark, mp.packb({"points": [bad]}), SCHEMA)

    with pytest.raises(PointValidationError, match="points"):
        points_from_msgpack(spark, mp.packb({"other": 1}), SCHEMA)
    with pytest.raises(PointValidationError, match="list of point maps"):
        points_from_msgpack(spark, mp.packb("nope"), SCHEMA)


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
