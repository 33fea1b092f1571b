"""Transaction-boundary-consistent batching — CDC atomicity.

A binlog/WAL tail carries SOURCE TRANSACTION ids (Debezium
``source.txId``; the reference's per-entity load scripts are each "one
transaction" applied atomically by psql, README.md:29-42). A micro-batch
cut that lands mid-transaction would publish a table state that never
existed in the source database — half an order, a debit without its
credit. The fix is to defer the tail transaction(s) of each batch to the
next one, so every merge applies only WHOLE transactions.

Two completeness rules, matching what real connectors provide:

* **Ordering rule** (default, no markers needed): binlog commit order is
  serial — every event of transaction T precedes the first event of any
  T' > T. Within the accumulated view (previous carryover ∪ this batch),
  a transaction is therefore known complete iff an event with a strictly
  greater txid is present. Only the maximal txid is deferred.
* **End-marker rule** (``end_col``): Debezium's transaction metadata
  marks a txn's last event. A transaction applies iff its end marker has
  arrived; everything else defers, regardless of ordering.

Events with a NULL txid are non-transactional (schema changes, heartbeat
rows): they apply immediately under both rules.

Both splits are pure DataFrame algebra over the micro-batch only — one
tiny max() aggregate (ordering rule) or one semi/anti join against the
batch's own ended-txid set (marker rule); the 100 TB table is never
touched. Deferred rows are persisted per batch by the replay driver
(streaming/pipeline.py) so kill/resume reconstructs the carryover from
disk instead of recomputing the whole log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_txn_complete(
    batch: DataFrame, txid_col: str, end_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split a micro-batch into (applyable, deferred) by transaction
    completeness. ``batch`` should already include the previous batch's
    deferred carryover. Deterministic: same input ⇒ same split, so a
    crashed-and-resumed batch recomputes byte-identical halves."""
    if end_col is not None:
        ended = (
            batch.where(F.col(end_col).cast("boolean"))
            .select(txid_col)
            .distinct()
        )
        is_txn = F.col(txid_col).isNotNull()
        applyable = batch.where(~is_txn).unionByName(
            batch.where(is_txn).join(ended, on=txid_col, how="left_semi")
        )
        deferred = batch.where(is_txn).join(ended, on=txid_col, how="left_anti")
        return applyable, deferred
    mx = batch.agg(F.max(F.col(txid_col)).alias("m")).collect()[0]["m"]
    if mx is None:  # empty batch or all non-transactional
        return batch, batch.limit(0)
    keep = F.col(txid_col).isNull() | (F.col(txid_col) < F.lit(mx))
    return batch.where(keep), batch.where(F.col(txid_col) == F.lit(mx))
