"""Slowly-changing-dimension Type-2 materialization from a change log.

The reference loader keeps only the final overwrite per primary key
(arches_rascoll/ref_collection.py:95-97 — later duplicate-pk rows replace
earlier field values); downstream consumers of a CDC feed routinely need
the *history* instead: every version of a key as a row with a validity
interval. This module derives that SCD2 shape from the same ordered change
stream the LWW merge consumes, so a user can materialize both the current
state (operators/lww.py) and the full history from one log.

Semantics
---------
Given changes ``(keys..., order_col, op, payload...)``:

* every upsert (``op == upsert_op``) version becomes one history row,
  valid from its own ordering value (inclusive) to the NEXT change's
  ordering value for the same key (exclusive) — the next upsert supersedes
  it, a delete closes it;
* a delete emits no row of its own, but still terminates its
  predecessor's interval (``lead`` is computed over ALL ops *before*
  filtering to upserts);
* the newest upsert with no successor is open-ended
  (``valid_to_seq IS NULL``) and flagged ``is_current`` — unless a later
  delete removed the key, in which case no open row exists.

Scale
-----
One shuffle on the key columns, then a per-key ordered window (``lead``)
— no global sort; each key's history is an independent task. Hot keys cost
one task the key's version count (the same bound as any per-key history
operator); for the pathological single-key log, range-partition on
(keys, order) first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_VALID_FROM = "valid_from_seq"
_VALID_TO = "valid_to_seq"
_IS_CURRENT = "is_current"


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    order_col: str,
    op_col: str = "op",
    upsert_op: str = "U",
) -> DataFrame:
    """Materialize SCD Type-2 validity intervals from an ordered change
    log. Returns ``(keys..., payload..., valid_from_seq, valid_to_seq,
    is_current)`` with one row per upsert version (see module docstring
    for interval semantics)."""
    payload = [
        c for c in changes.columns
        if c not in keys and c not in (order_col, op_col)
    ]
    w = Window.partitionBy(*keys).orderBy(order_col)
    closed = changes.withColumn(_VALID_TO, F.lead(order_col).over(w))
    return closed.where(F.col(op_col) == upsert_op).select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in payload],
        F.col(order_col).alias(_VALID_FROM),
        F.col(_VALID_TO),
        F.col(_VALID_TO).isNull().alias(_IS_CURRENT),
    )


def maintain_scd2(
    history,
    changes: DataFrame,
    keys: Sequence[str],
    order_col: str,
    batch_seq: int,
    batch_id: str,
    op_col: str = "op",
    upsert_op: str = "U",
):
    """Maintain an SCD2 history LAKE table incrementally from one ordered
    change batch — cost O(changed keys), never a full-log recompute.

    ``history`` is a :class:`~..lake.parquet_snapshot.SnapshotTable` keyed
    on ``(*keys, valid_from_seq)`` and ordered on ``_scd_seq`` (this
    call's ``batch_seq`` — pass a monotone integer per maintenance call;
    the first call bootstraps an empty table). The update is two pieces,
    merged as ONE exactly-once batch:

    * intra-batch intervals: :func:`scd2_history` over the batch alone;
    * boundary closes: each touched key's currently-OPEN row (from the
      live table) gets ``valid_to = first new change's order`` — an
      upsert of the SAME (keys, valid_from) row at a higher ``_scd_seq``,
      so LWW replaces the open version in place. A batch that starts with
      a delete closes the open row and (until a later upsert) leaves the
      key with no current version — exactly the full-recompute semantics.

    Precondition (same ordering guarantee the CDC replay relies on):
    every ``order_col`` value in this batch is greater than every already-
    applied value FOR THE SAME KEY — then the incrementally-maintained
    table equals ``scd2_history`` over the concatenated log at every
    version (tests/test_scd.py asserts this per batch).

    Scale: one window over the batch, one semi-join of the live history
    against the batch's touched keys (AQE broadcasts the small key set;
    when the history table records stats on ``is_current`` the open-row
    scan also file-prunes), and one bucketed merge of O(batch + touched
    open rows)."""
    new_hist = scd2_history(changes, keys, order_col, op_col, upsert_op)
    firsts = changes.groupBy(*keys).agg(
        F.min(F.col(order_col)).alias("_first_new")
    )
    if history.exists():
        live = history.read()
        closed = (
            live.where(F.col(_VALID_TO).isNull())
            .join(firsts, on=list(keys))
            .withColumn(_VALID_TO, F.col("_first_new"))
            .withColumn(_IS_CURRENT, F.lit(False))
            .drop("_first_new", "_scd_seq")
        )
        batch_rows = closed.unionByName(new_hist)
    else:
        batch_rows = new_hist
    batch_rows = batch_rows.select(
        "*",
        F.lit(int(batch_seq)).alias("_scd_seq"),
        F.lit("U").alias(history.op_col),
    )
    history.merge(batch_rows, batch_id=batch_id)
    return history
