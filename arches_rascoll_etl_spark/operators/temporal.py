"""Temporal operators Spark lacks as built-ins: as-of join, sessionization,
tumbling-window aggregation.

The reference is batch-only with no time semantics (SURVEY.md §2.8); these
generalize its per-key ordering habits (ref_collection.py:415 ORDER BY) to
the event-time operators a CDC/training-data pipeline needs.

Scale notes:
* ``asof_join`` — the union+window formulation: ONE shuffle on the join
  keys, no range-join blowup, no per-row Python. Both inputs are tagged,
  unioned, and each left row picks up the most recent right payload via
  ``last(ignorenulls)`` over an ordered window. This is how as-of joins are
  done at 100 TB: cost = sort within key partitions, skew handled by AQE.
* ``sessionize`` — gap-based session ids via lag + running sum, one window.
* ``tumbling_window_agg`` — built-in ``F.window`` (epoch-aligned), plain
  hash agg with map-side combine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def _us(col):
    """Epoch microseconds of a timestamp column; TIMESTAMP_NTZ (parquet
    isAdjustedToUTC=false) is cast to session-TZ timestamp first (session is
    pinned to UTC in session.py, so the instant is preserved)."""
    return F.unix_micros(col.cast("timestamp"))


_SIDE = "_asof_side"
_PAY = "_asof_rpay"
_TIE = "_asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    tie_cols: Sequence[str] = (),
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest ``ts_col`` <= its own, per ``on`` key (left join: no match →
    nulls).

    ``tie_cols`` (right-side columns) break exact-``ts`` ties
    deterministically — the greatest tie tuple wins. ``tolerance_us``
    nulls out matches older than the given microseconds.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts_col]
    right_cols = list(right_cols)

    pay = F.struct(
        _us(F.col(ts_col)).alias("_rts_us"),
        *[F.col(c) for c in right_cols],
    )
    pay_type = right.select(pay.alias(_PAY)).schema[0].dataType
    tie = (
        F.struct(*[F.col(c) for c in tie_cols]) if tie_cols else F.lit(0)
    )
    tie_type = right.select(tie.alias(_TIE)).schema[0].dataType

    r = right.select(
        *on,
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias(_SIDE),
        tie.alias(_TIE),
        pay.alias(_PAY),
    )
    l = left.select(
        "*",
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(tie_type).alias(_TIE),
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows (side 0) sort before left rows at equal ts → inclusive <=;
    # among equal-ts right rows the greatest tie tuple is last → wins
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PAY, ignorenulls=True).over(w)
    if tolerance_us is not None:
        matched = F.when(
            _us(F.col(ts_col)) - matched["_rts_us"] <= tolerance_us, matched
        )
    out = (
        u.withColumn(_PAY, matched)
        .where(F.col(_SIDE) == 1)
        .drop(_SIDE, _TIE)
    )
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(_PAY)[c].alias(f"r_{c}") for c in right_cols],
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session numbers per key: a new session starts when
    the time since the previous event exceeds ``gap_minutes``. Adds a
    ``session_n`` column (1-based, per key). One window, one shuffle."""
    keys = list(key_cols)
    gap_us = int(gap_minutes * 60 * 1_000_000)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tie_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    us = _us(F.col(ts_col))
    prev = F.lag(us).over(w)
    boundary = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_n", F.sum(boundary).over(wsum).cast("long"))


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    group_cols: Sequence[str],
    *aggs,
) -> DataFrame:
    """Epoch-aligned tumbling-window aggregation (batch twin of the
    Structured Streaming windowed agg). Emits ``w_start_us`` (long) instead
    of a timestamp so results compare exactly across engines."""
    return (
        df.groupBy(F.window(ts_col, width).alias("_w"), *group_cols)
        .agg(*aggs)
        .withColumn("w_start_us", _us(F.col("_w.start")))
        .drop("_w")
    )


_PIT_PAY = "_pit_pay"
_PIT_SIDE = "_pit_side"
_PIT_ORD = "_pit_ord"


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    on: Sequence[str],
    seq_col: str,
    valid_from: str = "valid_from_seq",
    valid_to: str = "valid_to_seq",
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Point-in-time join of facts against an SCD2 history: each fact row
    picks up the history version whose validity interval contains its
    ``seq_col`` value (``valid_from <= seq`` and ``seq < valid_to``, open
    ``valid_to IS NULL`` intervals match everything after ``valid_from``).
    Left join: a fact probing before the key's first version, or inside a
    gap a delete opened, gets NULLs. Right payload columns come back
    prefixed ``r_``.

    The reference's loader only ever keeps the final overwrite per key
    (arches_rascoll/ref_collection.py:95-97); this is the companion read
    that CDC consumers of the full history need — "what did this record
    look like when this fact happened?".

    Scale: because SCD2 intervals are non-overlapping per key, the interval
    join is exactly a backward as-of join on ``valid_from`` plus a
    ``valid_to`` post-filter — so this is the union+window formulation
    (ONE shuffle on the join keys, per-key sort, no range-join/cartesian
    blowup, no per-row Python), not a BroadcastNestedLoop range join.
    A naive ``ON from <= seq AND seq < to`` equi+range join degenerates to
    per-key cross products on hot keys; this stays O(n log n) per key.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [
            c
            for c in history.columns
            if c not in on and c not in (valid_from, valid_to, "is_current")
        ]
    right_cols = list(right_cols)

    pay = F.struct(
        F.col(valid_to).alias("_vto"),
        *[F.col(c) for c in right_cols],
    )
    pay_type = history.select(pay.alias(_PIT_PAY)).schema[0].dataType

    h = history.select(
        *on,
        F.col(valid_from).cast("long").alias(_PIT_ORD),
        F.lit(0).alias(_PIT_SIDE),
        pay.alias(_PIT_PAY),
    )
    f = facts.select(
        "*",
        F.col(seq_col).cast("long").alias(_PIT_ORD),
        F.lit(1).alias(_PIT_SIDE),
        F.lit(None).cast(pay_type).alias(_PIT_PAY),
    )
    u = f.unionByName(h, allowMissingColumns=True)

    # history rows (side 0) sort before facts at equal seq -> a version is
    # valid AT its own valid_from (inclusive lower bound)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_PIT_ORD).asc(), F.col(_PIT_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PIT_PAY, ignorenulls=True).over(w)
    # exclusive upper bound: a match whose interval closed at or before the
    # probe seq is a gap (the key was deleted there) -> NULL payload
    matched = F.when(
        matched["_vto"].isNull() | (F.col(_PIT_ORD) < matched["_vto"]), matched
    )
    out = (
        u.withColumn(_PIT_PAY, matched)
        .where(F.col(_PIT_SIDE) == 1)
    )
    return out.select(
        *facts.columns,
        *[F.col(_PIT_PAY)[c].alias(f"r_{c}") for c in right_cols],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    group_cols: Sequence[str],
    *aggs,
) -> DataFrame:
    """Epoch-aligned SLIDING (hopping) window aggregation — each event
    contributes to ``width / slide`` overlapping windows (the moving-rate
    view tumbling windows can't express). Built on the native
    ``F.window(ts, width, slide)`` one-to-many expansion: Catalyst plans
    the window explode + ONE hash aggregation with map-side combine —
    the input is replicated ``width/slide``× before the partial agg, so
    keep the ratio small at scale (a 1h window sliding by 1s is 3600×
    replication; compose tumbling sub-windows + a second rollup instead).
    Emits ``w_start_us`` (long) for engine-exact comparison."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("_w"), *group_cols)
        .agg(*aggs)
        .withColumn("w_start_us", _us(F.col("_w.start")))
        .drop("_w")
    )
