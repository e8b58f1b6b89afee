"""Multi-tenancy: user plans and per-user collection namespaces.

Parity targets (reference, Go):
- ``UserPlan`` mirrors models/userplan.go:3-15 (maxCollections,
  maxCollectionPointCount, maxPointSize, shardBackupFrequency/Count).
- Plan resolution mirrors the appheaders middleware: requests carry
  X-User-Id / X-Plan-Id; an unknown plan id is a request error
  (httpapi/middleware/appheaders.go:23-46).
- Quota enforcement sites:
  * collection create counts the user's existing collections against
    maxCollections (cluster/rpchandlers.go:168-180);
  * point insert checks current + incoming against maxCollectionPointCount
    (cluster/actions.go:190-198);
  * each point's ENCODED size is checked against maxPointSize
    (shard/shard.go:287-291; v1 handlers encode with msgpack/binary — here
    the same msgpack codec measures the wire size).

Spark shape: a Workspace is a directory namespace ``root/user_id/<name>``
over :class:`~semadb_spark.collection.Collection`. The quota checks are
driver-side metadata operations (directory listing, manifest counts) — no
cluster RPC needed; Spark jobs only run for the insert itself.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

from semadb_spark.collection import Collection
from semadb_spark.schema import IndexSchema


class QuotaError(ValueError):
    """A user-plan limit was exceeded."""


@dataclass(frozen=True)
class UserPlan:
    """models/userplan.go:3-15."""

    name: str
    max_collections: int
    max_collection_point_count: int
    max_point_size: int
    shard_backup_frequency: int = 3600
    shard_backup_count: int = 3

    @classmethod
    def from_dict(cls, d: dict) -> "UserPlan":
        return cls(
            name=d["name"],
            max_collections=int(d["maxCollections"]),
            max_collection_point_count=int(d["maxCollectionPointCount"]),
            max_point_size=int(d["maxPointSize"]),
            shard_backup_frequency=int(d.get("shardBackupFrequency", 3600)),
            shard_backup_count=int(d.get("shardBackupCount", 3)),
        )


def resolve_plan(plans: dict[str, UserPlan | dict], plan_id: str) -> UserPlan:
    """appheaders.go:38-42: unknown plan ids are a request error."""
    if plan_id not in plans:
        raise ValueError(f"unknown user plan {plan_id}")
    p = plans[plan_id]
    return p if isinstance(p, UserPlan) else UserPlan.from_dict(p)


class Workspace:
    """A user's collection namespace under ``root/user_id/``.

    The reference keys every collection by (userId, collectionId) in the
    cluster key-value store; here the same namespace is a directory level,
    and the plan travels with the workspace handle the way the decoded
    middleware context travels with a request.
    """

    def __init__(
        self, spark: SparkSession, root: str, user_id: str, plan: UserPlan
    ) -> None:
        if not user_id or os.sep in user_id or user_id.startswith("."):
            raise ValueError(f"invalid user id {user_id!r}")
        self.spark = spark
        self.root = root
        self.user_id = user_id
        self.plan = plan
        self._dir = os.path.join(root, user_id)

    # -- collection lifecycle ----------------------------------------------
    def list_collections(self) -> list[str]:
        if not os.path.isdir(self._dir):
            return []
        return sorted(
            n
            for n in os.listdir(self._dir)
            if os.path.exists(os.path.join(self._dir, n, "_schema.json"))
        )

    def _collection_path(self, name: str) -> str:
        if not name or os.sep in name or name.startswith("."):
            raise ValueError(f"invalid collection name {name!r}")
        return os.path.join(self._dir, name)

    def create_collection(
        self, name: str, index_schema: dict | str | IndexSchema, **kwargs: Any
    ) -> Collection:
        existing = self.list_collections()
        if len(existing) >= self.plan.max_collections:
            # cluster/rpchandlers.go:173-176
            raise QuotaError(
                f"maximum number of collections reached: {self.plan.max_collections}"
            )
        return Collection.create(
            self.spark, self._collection_path(name), index_schema, **kwargs
        )

    def get_collection(self, name: str) -> Collection:
        return Collection.open(self.spark, self._collection_path(name))

    def drop_collection(self, name: str) -> None:
        import shutil

        path = self._collection_path(name)
        if not os.path.exists(os.path.join(path, "_schema.json")):
            raise ValueError(f"no collection at {path}")
        shutil.rmtree(path)

    # -- quota-checked ingest ----------------------------------------------
    def insert_points(self, name: str, points: Sequence[dict]) -> int:
        """Request-path insert with the plan's two point quotas applied.

        Encoded-size parity: the reference rejects a point whose binary
        (msgpack) encoding exceeds maxPointSize (shard/shard.go:287-291);
        the same codec measures the same bytes here.
        """
        from semadb_spark.sources import msgpack_codec
        from semadb_spark.sources.points import points_to_df

        for i, p in enumerate(points):
            size = len(msgpack_codec.packb(p))
            if size > self.plan.max_point_size:
                raise QuotaError(
                    f"point {i} exceeds maximum point size {size} > "
                    f"{self.plan.max_point_size}"
                )
        coll = self.get_collection(name)
        current = coll.count()
        if current + len(points) > self.plan.max_collection_point_count:
            # cluster/actions.go:194-197
            raise QuotaError(
                f"maximum collection point count reached: "
                f"{self.plan.max_collection_point_count}"
            )
        df = points_to_df(self.spark, points, coll.schema)
        return coll.insert(df)

    def insert_df(self, name: str, df: DataFrame, id_col: str = "_id") -> int:
        """Bulk-frame insert with the point-count quota (the size check is a
        request-decode concern; typed frames have no wire encoding)."""
        coll = self.get_collection(name)
        incoming = df.count()
        if coll.count() + incoming > self.plan.max_collection_point_count:
            raise QuotaError(
                f"maximum collection point count reached: "
                f"{self.plan.max_collection_point_count}"
            )
        return coll.insert(df, id_col=id_col)

    # -- search / DML passthroughs ------------------------------------------
    def search(self, name: str, request: dict) -> DataFrame:
        """Request-path search: the v2 lifecycle's third leg
        (httpapi/v2/handlers.go search handler) so a Workspace covers
        create -> insert -> search without dropping to the Collection.
        Search has no plan quota in the reference (limits are request
        validation, models/search.go:45-47, enforced by the compiler)."""
        return self.get_collection(name).search(request)

    def update_points(self, name: str, updates: Sequence[dict]) -> list[str]:
        """Request-path update with the same validations as insert: the
        reference's UpdatePointsRequest caps batches to 1..100 points
        (httpapi/v2/handlers.go:314, binding:"required,max=100,min=1,dive")
        and each point's encoded size is re-checked against the plan's
        maxPointSize (httpapi/v2/handlers.go:356) — without the size check
        a tenant could bypass the quota by updating small points into large
        ones. Returns the updated ids (the reference reports per-point
        outcomes)."""
        from semadb_spark.sources import msgpack_codec
        from semadb_spark.sources.points import points_to_df

        if not 1 <= len(updates) <= 100:
            raise ValueError(
                f"update batch must contain 1..100 points, got {len(updates)}"
            )
        for i, p in enumerate(updates):
            size = len(msgpack_codec.packb(p))
            if size > self.plan.max_point_size:
                raise QuotaError(
                    f"update {i} exceeds maximum point size {size} > "
                    f"{self.plan.max_point_size}"
                )
        coll = self.get_collection(name)
        return coll.update(points_to_df(self.spark, updates, coll.schema))

    def delete_points(self, name: str, ids: Sequence[str]) -> list[str]:
        """Request-path delete (missing ids are no-ops, W3); returns the
        ids actually removed."""
        return self.get_collection(name).delete(list(ids))

    # -- backup policy ------------------------------------------------------
    def apply_backup_policy(self, name: str) -> list[int]:
        """Rotate snapshots to the plan's shardBackupCount (the reference
        prunes old shard backups beyond the plan's count; snapshot versions
        are this engine's backups, S7)."""
        coll = self.get_collection(name)
        return coll.vacuum(keep_versions=max(1, self.plan.shard_backup_count))
