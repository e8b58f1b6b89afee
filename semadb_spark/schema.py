"""Collection index schema: validation + Spark type mapping.

Parity with the reference's ``IndexSchema`` (models/index.go:10-73,
parameter structs models/index.go:248-340, value coercion
models/index.go:109-246). A collection's JSON schema maps property names to
``{"type": <indexType>, <typeParams>}``; properties may be dotted paths into
nested structs ("nested.vector", models/index.go:115-152).

Spark type mapping (SURVEY.md §1.2): vector -> array<float>, text/string ->
string, integer -> long, float -> double, stringArray -> array<string>.
Non-indexed payload lives in whatever extra columns the DataFrame carries.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

INDEX_TYPES = (
    "vectorFlat",
    "vectorVamana",
    "text",
    "string",
    "integer",
    "float",
    "stringArray",
)
DISTANCE_METRICS = ("euclidean", "cosine", "dot", "hamming", "jaccard", "haversine")
MAX_VECTOR_SIZE = 4096  # models/index.go:249
QUANTIZER_TYPES = ("none", "binary", "product")  # models/quantizer.go:5-9


@dataclass
class IndexSchemaValue:
    type: str
    params: dict[str, Any] = field(default_factory=dict)

    # -- parameter accessors with reference defaults ------------------------
    @property
    def vector_size(self) -> int:
        return int(self.params.get("vectorSize", 0))

    @property
    def distance_metric(self) -> str:
        return self.params.get("distanceMetric", "euclidean")

    @property
    def case_sensitive(self) -> bool:
        return bool(self.params.get("caseSensitive", False))

    @property
    def quantizer(self) -> dict[str, Any] | None:
        """The reference's optional per-vector-index quantizer declaration
        (models/index.go:251,281; struct models/quantizer.go). ``None`` or
        type "none" means plain float serving."""
        q = self.params.get("quantizer")
        if q is None or q.get("type") == "none":
            return None
        return q

    def validate(self) -> None:
        if self.type not in INDEX_TYPES:
            raise ValueError(f"unknown index type {self.type}")
        if self.type in ("vectorFlat", "vectorVamana"):
            vs = self.vector_size
            if not (1 <= vs <= MAX_VECTOR_SIZE):
                raise ValueError(
                    f"vector size must be between 1 and {MAX_VECTOR_SIZE}, got {vs}"
                )
            dm = self.distance_metric
            if dm not in DISTANCE_METRICS:
                raise ValueError(f"unknown distance metric {dm}")
            if dm == "haversine" and vs != 2:
                raise ValueError(
                    f"haversine distance metric requires vector size 2 got {vs}"
                )
            if self.type == "vectorVamana":
                ss = int(self.params.get("searchSize", 75))
                db = int(self.params.get("degreeBound", 64))
                alpha = float(self.params.get("alpha", 1.2))
                if not (25 <= ss <= 75):
                    raise ValueError(f"search size must be between 25 and 75, got {ss}")
                if not (32 <= db <= 64):
                    raise ValueError(f"degree bound must be between 32 and 64, got {db}")
                if not (1.1 <= alpha <= 1.5):
                    raise ValueError(f"alpha must be between 1.1 and 1.5, got {alpha}")
            self._validate_quantizer()
        elif self.type == "text":
            analyser = self.params.get("analyser", "standard")
            if analyser != "standard":
                raise ValueError(f"unknown analyser {analyser}")

    def _validate_quantizer(self) -> None:
        """Mirror Quantizer.Validate (models/quantizer.go:11-28) and the
        per-type parameter bindings (quantizer.go:30-77)."""
        q = self.params.get("quantizer")
        if q is None:
            return
        qt = q.get("type")
        if qt not in QUANTIZER_TYPES:
            raise ValueError(f"unknown quantizer type {qt}")
        if qt == "binary":
            b = q.get("binary")
            if b is None:
                raise ValueError("binary quantizer parameters not provided")
            if b.get("distanceMetric") not in ("hamming", "jaccard"):
                raise ValueError(
                    "invalid distance metric for binary quantization, got "
                    f"{b.get('distanceMetric')}"
                )
            if b.get("threshold") is None:
                tt = int(b.get("triggerThreshold", 0))
                if not (0 <= tt <= 50000):
                    raise ValueError(
                        f"triggerThreshold must be between 0 and 50000, got {tt}"
                    )
        elif qt == "product":
            p = q.get("product")
            if p is None:
                raise ValueError("product quantizer parameters not provided")
            nc = int(p.get("numCentroids", 0))
            ns = int(p.get("numSubVectors", 0))
            tt = int(p.get("triggerThreshold", 0))
            if not (2 <= nc <= 256):
                raise ValueError(f"numCentroids must be between 2 and 256, got {nc}")
            if ns < 2:
                raise ValueError(f"numSubVectors must be at least 2, got {ns}")
            if not (1000 <= tt <= 10000):
                raise ValueError(
                    f"triggerThreshold must be between 1000 and 10000, got {tt}"
                )

    def spark_type(self) -> T.DataType:
        if self.type in ("vectorFlat", "vectorVamana"):
            return T.ArrayType(T.FloatType())
        if self.type in ("text", "string"):
            return T.StringType()
        if self.type == "integer":
            return T.LongType()
        if self.type == "float":
            return T.DoubleType()
        if self.type == "stringArray":
            return T.ArrayType(T.StringType())
        raise ValueError(f"unknown index type {self.type}")


class IndexSchema(dict):
    """{property -> IndexSchemaValue}; property may be a dotted path."""

    @classmethod
    def from_json(cls, obj: str | dict) -> "IndexSchema":
        if isinstance(obj, str):
            obj = json.loads(obj)
        schema = cls()
        for prop, value in obj.items():
            vtype = value.get("type")
            if vtype is None:
                raise ValueError(f"missing type for property {prop}")
            # Reference nests params under a key named after the type, e.g.
            # {"type": "vectorFlat", "vectorFlat": {...}}; also accept flat.
            params = dict(value.get(vtype) or {})
            for k, v in value.items():
                if k not in ("type", vtype):
                    params.setdefault(k, v)
            schema[prop] = IndexSchemaValue(type=vtype, params=params)
        schema.validate()
        return schema

    def to_json(self) -> str:
        return json.dumps(
            {p: {"type": v.type, v.type: v.params} for p, v in self.items()},
            sort_keys=True,
        )

    def validate(self) -> None:
        for v in self.values():
            v.validate()

    def struct_type(self, id_col: str = "_id") -> T.StructType:
        """Typed columns for indexed properties; dotted paths become nested
        structs. Payload columns are outside the schema's scope."""
        fields: dict[str, Any] = {id_col: T.StringType()}
        nested: dict[str, dict] = {}
        for prop, v in sorted(self.items()):
            if "." in prop:
                root, rest = prop.split(".", 1)
                nested.setdefault(root, {})[rest] = v.spark_type()
            else:
                fields[prop] = v.spark_type()
        for root, subfields in nested.items():
            fields[root] = T.StructType(
                [T.StructField(k, t, True) for k, t in sorted(subfields.items())]
            )
        return T.StructType([T.StructField(k, t, k != id_col) for k, t in fields.items()])
