"""Replay driver — binlog/WAL tail → lake upsert, exactly-once, resumable.

The batch loop the reference runs by hand (stage → generate SQL → psql in
order, README.md:29-42) becomes a driver that replays micro-batches of the
change log into a LakeTable with two-level idempotence:

1. checkpoint manifest of applied batch ids (fast skip on resume);
2. the lake's committed ``batch-id`` snapshot summaries (correct skip even
   when the crash landed between lake commit and checkpoint write).

Kill/resume is therefore safe at *any* point; tests inject failures on both
sides of the commit boundary.

Also the Structured Streaming adapter: ``stream_into_table`` runs the same
merge via ``foreachBatch``, giving exactly-once with Spark's own streaming
checkpoint for offset tracking plus ours for apply tracking.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Iterable

from pyspark.sql import DataFrame

from ..lake.table import LakeTable
from .checkpoint import Checkpoint
from .metrics import LineageLog, batch_record, partition_lineage


class InjectedFailure(RuntimeError):
    """Raised by tests to simulate a mid-replay crash."""


def _merge_with_retry(table: LakeTable, df: DataFrame, bid: str, attempts: int = 3):
    """Apply one batch, retrying on optimistic-concurrency conflicts.

    A CommitConflictError means another writer claimed our snapshot version
    first; the merge is simply redone against the new head — safe because
    application is idempotent on batch id (if the *other* writer applied
    this very batch, the redo is a no-op skip)."""
    from ..lake.parquet_snapshot import CommitConflictError

    for attempt in range(attempts):
        try:
            return table.merge(df, batch_id=bid)
        except CommitConflictError:
            if attempt == attempts - 1:
                raise
    raise AssertionError("unreachable")


@dataclass
class ReplayResult:
    applied: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    events: int = 0
    wall_sec: float = 0.0
    stats: list = field(default_factory=list)  # MergeStats per applied batch

    @property
    def events_per_sec(self) -> float:
        return self.events / self.wall_sec if self.wall_sec else 0.0


def replay(
    table: LakeTable,
    checkpoint: Checkpoint,
    batch_provider: Callable[[int], DataFrame],
    batch_ids: Iterable[int],
    lineage: LineageLog | None = None,
    collect_partition_lineage: bool = True,
    fail_before_merge: int | None = None,
    fail_before_checkpoint: int | None = None,
) -> ReplayResult:
    """Apply each batch exactly once, resumable from the checkpoint.

    ``fail_before_merge=k`` / ``fail_before_checkpoint=k`` inject a crash
    for kill/resume tests — before the lake commit of batch k, or after the
    lake commit but before the checkpoint record (the dangerous window).
    """
    res = ReplayResult()
    t_start = time.time()
    applied_ckpt = checkpoint.applied_batch_ids()
    for b in batch_ids:
        bid = str(b)
        if bid in applied_ckpt:
            res.skipped.append(bid)
            continue
        df = batch_provider(b)
        if fail_before_merge == b:
            raise InjectedFailure(f"before merge of batch {bid}")
        t0 = time.time()
        stats = _merge_with_retry(table, df, bid)
        if fail_before_checkpoint == b:
            raise InjectedFailure(f"after merge, before checkpoint of batch {bid}")
        part_lineage = (
            partition_lineage(df) if (collect_partition_lineage and stats.applied) else []
        )
        rec = batch_record(bid, stats.as_dict(), part_lineage, t0)
        if lineage is not None:
            lineage.append(rec)
        checkpoint.record(bid, stats.snapshot_version, rec)
        if stats.applied:
            res.applied.append(bid)
            res.events += stats.rows_in
            res.stats.append(stats)
        else:
            res.skipped.append(bid)
    res.wall_sec = time.time() - t_start
    return res


def stream_into_table(
    stream_df: DataFrame,
    table: LakeTable,
    checkpoint: Checkpoint,
    spark_checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Structured Streaming sink: micro-batches merge into the lake table.

    Uses ``foreachBatch`` — the canonical pattern for custom exactly-once
    sinks: Spark's streaming checkpoint guarantees each epoch is delivered
    at-least-once, and the lake's batch-id idempotence upgrades that to
    exactly-once application.
    """

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        stats = _merge_with_retry(table, batch_df, f"epoch-{epoch_id}")
        checkpoint.record(f"epoch-{epoch_id}", stats.snapshot_version, stats.as_dict())

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", spark_checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
