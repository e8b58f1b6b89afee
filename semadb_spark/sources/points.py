"""Point ingest: JSON/dict decode, validation, coercion (the S1 path).

Parity with the reference's request decode + schema check:
- `CheckCompatibleMap` (models/index.go:109-246): per indexed property —
  missing properties skip; vectors coerce to float32 lists with an exact
  length check (convertToVector models/index.go:76-106); text/string must
  be strings; integer accepts any int/float width and truncates to int64
  (JSON decodes every number as float64, models/index.go:196-210); float
  accepts float widths (and JSON integers, indistinguishable after JSON
  decode); stringArray coerces element-wise; dotted properties descend
  nested maps (models/index.go:115-152). Unknown fields always pass
  through (schemaless payload).
- `_id` extraction (models/point.go:14-35): must be a UUID string when
  present; generated otherwise. Batch bounds 1-10000 points
  (httpapi/v2/handlers.go:228-252).

Request batches are driver-sized by contract (<=10k points per insert), so
coercion runs driver-side and the result becomes a typed DataFrame ready
for Collection.insert. Bulk corpus loads should land as parquet and skip
this path entirely.
"""

from __future__ import annotations

import json
import math
import uuid as _uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession, types as T

from semadb_spark.schema import IndexSchema

MAX_BATCH_SIZE = 10_000  # httpapi/v2/handlers.go:241


class PointValidationError(ValueError):
    pass


def _to_vector(v: Any, prop: str, size: int) -> list[float]:
    if not isinstance(v, (list, tuple)):
        raise PointValidationError(f"expected a vector for property {prop}, got {type(v).__name__}")
    out = []
    for f in v:
        if isinstance(f, bool) or not isinstance(f, (int, float)):
            raise PointValidationError(f"expected float in vector for property {prop}, got {type(f).__name__}")
        if not math.isfinite(float(f)):
            raise PointValidationError(f"non-finite value in vector for property {prop}")
        out.append(float(f))
    if len(out) != size:
        raise PointValidationError(
            f"expected vector of size {size} for property {prop}, got {len(out)}"
        )
    return out


def coerce_point(point: dict, schema: IndexSchema) -> dict:
    """Validate + coerce one point dict in place-semantics (returns a new
    dict). Mirrors CheckCompatibleMap property-by-property."""
    out = json.loads(json.dumps(point)) if any("." in p for p in schema) else dict(point)
    for prop, sval in schema.items():
        # dotted descent (models/index.go:115-152)
        parts = prop.split(".")
        m = out
        skip = False
        for i, part in enumerate(parts[:-1]):
            nxt = m.get(part)
            if nxt is None:
                skip = True
                break
            if not isinstance(nxt, dict):
                raise PointValidationError(f"expected nested map for property {part}")
            m = nxt
        k = parts[-1]
        if skip or k not in m:
            continue
        v = m[k]
        t = sval.type
        if t in ("vectorFlat", "vectorVamana"):
            m[k] = _to_vector(v, k, sval.vector_size)
        elif t in ("text", "string"):
            if not isinstance(v, str):
                raise PointValidationError(f"expected string for property {k}, got {type(v).__name__}")
        elif t == "integer":
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise PointValidationError(f"expected integer number for property {k}, got {type(v).__name__}")
            m[k] = int(v)
        elif t == "float":
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise PointValidationError(f"expected floating point number for property {k}, got {type(v).__name__}")
            m[k] = float(v)
        elif t == "stringArray":
            if not isinstance(v, (list, tuple)) or any(not isinstance(s, str) for s in v):
                raise PointValidationError(f"expected string array for property {k}")
            m[k] = list(v)
    return out


def extract_id(point: dict, create_new: bool = True) -> str:
    """UUID `_id` extraction (models/point.go:14-35); removes the key."""
    if "_id" not in point:
        if create_new:
            return str(_uuid.uuid4())
        raise PointValidationError("missing _id field")
    raw = point.pop("_id")
    if not isinstance(raw, str):
        raise PointValidationError(f"invalid id type, expected string got {type(raw).__name__}")
    try:
        return str(_uuid.UUID(raw))
    except ValueError as e:
        raise PointValidationError(f"invalid id format, {e}") from None


def points_to_df(
    spark: SparkSession, points: Sequence[dict], schema: IndexSchema
) -> DataFrame:
    """Decode a request batch into a typed DataFrame: `_id` + typed indexed
    columns (+ `payload map<string,string>` carrying the non-indexed fields
    as JSON values — the schemaless blob of the reference's msgpack rows).
    """
    if not 0 < len(points) <= MAX_BATCH_SIZE:
        raise PointValidationError(
            f"batch size must be between 1 and {MAX_BATCH_SIZE}, got {len(points)}"
        )
    struct = schema.struct_type()
    indexed_roots = {f.name for f in struct.fields}
    rows = []
    for p in points:
        cp = coerce_point(dict(p), schema)
        pid = extract_id(cp)
        row: dict[str, Any] = {"_id": pid}
        payload: dict[str, str] = {}
        for key, val in cp.items():
            if key in indexed_roots:
                row[key] = val
            else:
                payload[key] = json.dumps(val, sort_keys=True)
        row["payload"] = payload
        rows.append(row)
    full = T.StructType(
        list(struct.fields)
        + [T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True)]
    )
    return spark.createDataFrame(rows, full)


def points_from_msgpack(
    spark: SparkSession, data: bytes, schema: IndexSchema
) -> DataFrame:
    """application/msgpack request-body variant of S1.

    The reference decodes JSON or msgpack bodies into the same request
    struct (httpapi/utils/encdec.go:30-60, msgpack decoder pointed at the
    json struct tags) — so here the msgpack bytes decode to the same point
    dicts and flow through the identical coercion path as JSON
    (`points_to_df`). Accepts either the InsertPointsRequest shape
    ``{"points": [...]}`` (httpapi/v2/handlers.go:228-252) or a bare list.
    """
    from semadb_spark.sources import msgpack_codec

    obj = msgpack_codec.unpackb(data)
    if isinstance(obj, dict):
        if "points" not in obj:
            raise PointValidationError("msgpack body missing 'points' field")
        obj = obj["points"]
    if not isinstance(obj, list) or any(not isinstance(p, dict) for p in obj):
        raise PointValidationError("msgpack body must be a list of point maps")
    return points_to_df(spark, obj, schema)


def read_json_points(
    spark: SparkSession, path: str, schema: IndexSchema
) -> DataFrame:
    """File variant of S1 for larger drops: newline-delimited JSON decoded
    by Spark, then cast/validated against the collection schema. Vector
    length violations surface as a raised error (checked via one scan)."""
    from pyspark.sql import functions as F

    struct = schema.struct_type()
    raw = spark.read.json(path)
    cols = []
    for f in struct.fields:
        if f.name == "_id":
            present = F.col("_id") if "_id" in raw.columns else F.lit(None)
            cols.append(
                F.coalesce(present.cast("string"), F.expr("uuid()")).alias("_id")
            )
        elif f.name in raw.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    out = raw.select(*cols)
    for prop, sval in schema.items():
        if "." in prop or sval.type not in ("vectorFlat", "vectorVamana"):
            continue
        bad = out.filter(
            F.col(prop).isNotNull() & (F.size(F.col(prop)) != sval.vector_size)
        ).head(1)
        if bad:
            raise PointValidationError(
                f"expected vector of size {sval.vector_size} for property {prop}"
            )
    return out
