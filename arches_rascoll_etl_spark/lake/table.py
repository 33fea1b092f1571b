"""LakeTable interface — the engine's sink abstraction.

The engine targets Iceberg semantics: atomic snapshot commits, MERGE INTO
upserts (copy-on-write), schema evolution, idempotent commit ids, time
travel. The sandbox has no Iceberg runtime jar and no network (pyspark 4.1.2
ships 287 jars, none iceberg*), so the production-shaped implementation here
is :class:`~arches_rascoll_etl_spark.lake.parquet_snapshot.SnapshotTable`,
a pure-Parquet copy-on-write snapshot store reproducing those semantics.
On a cluster with Iceberg available, :class:`IcebergTable` is the drop-in
(same method surface, delegating to ``MERGE INTO`` SQL).

This generalizes the reference's sink trio: full-replace staging tables
(arches_rascoll/ref_collection.py:238-246), idempotent
``INSERT … WHERE pk NOT IN (…)`` (ref_collection.py:305-314), and the
CSV checkpoint snapshots (ref_collection.py:227-235).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class MergeStats:
    batch_id: str
    applied: bool
    rows_in: int = 0
    upserts: int = 0
    deletes: int = 0
    affected_buckets: list[int] = field(default_factory=list)
    total_buckets: int = 0
    snapshot_version: int | None = None
    wall_ms: float = 0.0
    skipped_reason: str | None = None

    def as_dict(self) -> dict[str, Any]:
        return dict(self.__dict__)


class LakeTable(ABC):
    """Keyed, snapshot-versioned upsert table."""

    @abstractmethod
    def exists(self) -> bool: ...

    @abstractmethod
    def read(self, version: int | None = None) -> DataFrame:
        """Current table state, or a past snapshot (time travel)."""

    @abstractmethod
    def merge(self, batch: DataFrame, batch_id: str, summary: dict | None = None) -> MergeStats:
        """Upsert a change batch (LWW per key; op=='D' deletes). Idempotent
        on ``batch_id``: re-merging an applied batch is a no-op."""

    @abstractmethod
    def committed_batch_ids(self) -> set[str]: ...


class IcebergTable(LakeTable):
    """Drop-in backend for real Iceberg catalogs (requires the Iceberg
    runtime jar — unavailable in this sandbox; methods compile the same
    operations to ``MERGE INTO`` SQL)."""

    def __init__(self, spark, identifier: str, key_cols=("repo", "path"), order_cols=("commit_seq", "commit")):
        try:
            spark.sql("SELECT 1").collect()
            jvm_ok = True
        except Exception:  # pragma: no cover
            jvm_ok = False
        self.spark, self.identifier = spark, identifier
        self.key_cols, self.order_cols = list(key_cols), list(order_cols)
        if not self._iceberg_available():
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use "
                "lake.parquet_snapshot.SnapshotTable (same interface)."
            ) if jvm_ok else RuntimeError("no spark")

    def _iceberg_available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
            return True
        except Exception:
            return False

    def exists(self) -> bool:  # pragma: no cover - needs iceberg
        return self.spark.catalog.tableExists(self.identifier)

    def read(self, version: int | None = None) -> DataFrame:  # pragma: no cover
        if version is None:
            return self.spark.table(self.identifier)
        return self.spark.read.option("snapshot-id", version).table(self.identifier)

    def merge(self, batch: DataFrame, batch_id: str, summary=None) -> MergeStats:  # pragma: no cover
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        newer = " OR ".join(
            f"s.{c} > t.{c}" for c in self.order_cols
        )
        batch.createOrReplaceTempView("_merge_src")
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t USING _merge_src s ON {on}
            WHEN MATCHED AND s.op = 'D' AND ({newer}) THEN DELETE
            WHEN MATCHED AND ({newer}) THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *
            """
        )
        return MergeStats(batch_id=batch_id, applied=True)

    def committed_batch_ids(self) -> set[str]:  # pragma: no cover
        rows = self.spark.sql(
            f"SELECT summary['batch-id'] AS b FROM {self.identifier}.snapshots"
        ).collect()
        return {r.b for r in rows if r.b is not None}
